package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InvertedIndex

/** Inverted-index contracts the streaming equality test doesn't pin:
  * bucket partition pruning at the serving scan, the monotone-id
  * append contract, and stats accounting for zero-token docs. */
class InvertedIndexSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshIndex(): String = {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_invidx_spec_").toString
    InvertedIndex.append(spark,
      Seq((1L, "aa bb cc"), (2L, "bb cc dd"), (3L, ""))
        .toDF("doc_id", "text"), idx)
    idx
  }

  test("serving scan prunes to the query terms' buckets") {
    val idx = freshIndex()
    val df = InvertedIndex.bm25Query(spark, idx, Seq("bb"), k = 5)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse(fail("no file scan with PartitionFilters in plan"))
    assert(!scan.contains("PartitionFilters: []"),
      s"postings scan reads every bucket:\n$scan")
  }

  test("zero-token docs count toward corpus stats but write no postings") {
    val idx = freshIndex()
    val Some((wm, nDocs, sumDl)) = InvertedIndex.readStats(spark, idx)
    assert(wm === 3L && nDocs === 3L && sumDl === 6L)
    assert(spark.read.parquet(s"$idx/postings")
      .filter(col("doc_id") === 3L).count() === 0L)
  }

  test("monotone-id contract: interleaved batch fails loudly, replay is skipped") {
    val idx = freshIndex()
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.append(spark,
        Seq((2L, "xx yy"), (9L, "yy zz")).toDF("doc_id", "text"), idx)
    }
    assert(e.getMessage.contains("monotone"))
    // exact replay of the indexed range: skipped, stats unchanged
    val before = InvertedIndex.readStats(spark, idx)
    InvertedIndex.append(spark,
      Seq((1L, "aa bb cc"), (2L, "bb cc dd"), (3L, ""))
        .toDF("doc_id", "text"), idx)
    assert(InvertedIndex.readStats(spark, idx) === before)
  }

  test("querying an absent index fails loudly") {
    val e = intercept[RuntimeException] {
      InvertedIndex.bm25Query(spark, "/tmp/graft_no_such_index",
        Seq("aa"), k = 5)
    }
    assert(e.getMessage.contains("no inverted index"))
  }
}
