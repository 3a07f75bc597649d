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

  test("watermark-inside-batch appends the uncovered suffix; replay is skipped") {
    val idx = freshIndex() // wm=3, n=3, sum_dl=6
    // a batch straddling the watermark (the shape a crash between the
    // postings write and the sidecar promote — or a zero-token-tail
    // stats rebuild — leaves behind on replay): covered ids are
    // skipped (first write wins), the uncovered suffix appends, and
    // the ingest CONVERGES instead of wedging on an all-or-nothing
    // contract check
    InvertedIndex.append(spark,
      Seq((2L, "xx yy"), (9L, "yy zz")).toDF("doc_id", "text"), idx)
    assert(InvertedIndex.readStats(spark, idx) === Some((9L, 4L, 8L)))
    // doc 2's already-indexed content stands; its replayed variant was
    // not re-indexed
    assert(InvertedIndex.bm25Query(spark, idx, Seq("xx"), k = 5)
      .count() === 0L)
    assert(InvertedIndex.bm25Query(spark, idx, Seq("zz"), k = 5)
      .count() === 1L)
    // exact replay of an indexed range: skipped, stats unchanged
    val before = InvertedIndex.readStats(spark, idx)
    InvertedIndex.append(spark,
      Seq((1L, "aa bb cc"), (2L, "bb cc dd"), (3L, ""))
        .toDF("doc_id", "text"), idx)
    assert(InvertedIndex.readStats(spark, idx) === before)
  }

  test("zero-token-tail rebuild converges on replay instead of wedging") {
    val idx = freshIndex() // true stats (3, 3, 6); doc 3 is zero-token
    // lose the sidecar: the rebuild from postings is stale-LOW
    // (doc 3 invisible) — wm 2 inside the original batch range
    java.nio.file.Files.delete(java.nio.file.Paths.get(idx, "_stats"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idx, "._stats.crc"))
    assert(InvertedIndex.readStats(spark, idx) === Some((2L, 2L, 6L)))
    // the at-least-once replay of the ORIGINAL batch must converge the
    // stats back to truth (append the wm<id suffix: just zero-token
    // doc 3), not throw
    InvertedIndex.append(spark,
      Seq((1L, "aa bb cc"), (2L, "bb cc dd"), (3L, ""))
        .toDF("doc_id", "text"), idx)
    assert(InvertedIndex.readStats(spark, idx) === Some((3L, 3L, 6L)))
    // no duplicate postings rows were appended for docs 1-2
    assert(spark.read.parquet(s"$idx/postings")
      .groupBy("doc_id", "term").count().filter(col("count") > 1)
      .count() === 0L)
  }

  test("missing or corrupt _stats sidecar is rebuilt from the postings") {
    val idx = freshIndex()
    val statsPath = java.nio.file.Paths.get(idx, "_stats")
    // corrupt in place (the crash-mid-write shape the temp+rename swap
    // makes rare but a torn disk can still produce)
    java.nio.file.Files.write(statsPath, "garbage,not".getBytes("UTF-8"))
    // rebuild from postings: docs 1,2 have postings (dl=3 each); the
    // zero-token doc 3 is invisible to postings, so the rebuilt stats
    // are the documented stale-LOW recovery (wm 2 < true 3) — safe,
    // because a stale-low watermark only re-admits an idempotent replay
    assert(InvertedIndex.readStats(spark, idx) === Some((2L, 2L, 6L)))
    // the rebuild re-wrote the sidecar: next read is sidecar-served
    assert(new String(java.nio.file.Files.readAllBytes(statsPath), "UTF-8")
      === "2,2,6")
    // serving still works off the recovered stats
    assert(InvertedIndex.bm25Query(spark, idx, Seq("bb"), k = 5)
      .count() === 2L)
    // a deleted sidecar recovers the same way
    java.nio.file.Files.delete(statsPath)
    assert(InvertedIndex.readStats(spark, idx) === Some((2L, 2L, 6L)))
    // and the index keeps accepting appends after recovery
    InvertedIndex.append(spark,
      Seq((4L, "dd ee")).toDF("doc_id", "text"), idx)
    assert(InvertedIndex.readStats(spark, idx) === Some((4L, 3L, 8L)))
  }

  test("compactPostings: one sorted file per bucket, replay dups folded, serving unchanged") {
    val idx = freshIndex()
    // replay append: watermark covers it, skipped — force raw dup rows
    // instead by appending a later batch twice around a wiped sidecar
    InvertedIndex.append(spark,
      Seq((4L, "bb ee"), (5L, "ee ff")).toDF("doc_id", "text"), idx)
    // simulate the stale-watermark crash: sidecar says 3, rows for 4-5
    // are already on disk, so the replayed batch re-appends them.
    // (Drop Hadoop's .crc sidecar too — a direct java.nio write would
    // otherwise fail checksum on read and route into stats RECOVERY,
    // which reads the true watermark from the postings.)
    val statsPath = java.nio.file.Paths.get(idx, "_stats")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idx, "._stats.crc"))
    java.nio.file.Files.write(statsPath, "3,3,6".getBytes("UTF-8"))
    InvertedIndex.append(spark,
      Seq((4L, "bb ee"), (5L, "ee ff")).toDF("doc_id", "text"), idx)
    // byte-identical dup rows present; read-time fold hides them
    val before = InvertedIndex.bm25Query(spark, idx, Seq("bb", "ee"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    assert(spark.read.parquet(s"$idx/postings")
      .groupBy("doc_id", "term").count().filter(col("count") > 1)
      .count() > 0, "test setup failed to produce replay duplicates")
    InvertedIndex.compactPostings(spark, idx)
    // physical shape: exactly one parquet file per bucket dir
    val bucketDirs = java.nio.file.Files.list(
        java.nio.file.Paths.get(idx, "postings")).iterator()
    bucketDirs.forEachRemaining { p =>
      if (java.nio.file.Files.isDirectory(p)) {
        val files = java.nio.file.Files.list(p).iterator()
        var one: java.nio.file.Path = null
        var n = 0
        files.forEachRemaining { f =>
          if (f.toString.endsWith(".parquet")) { n += 1; one = f }
        }
        assert(n === 1, s"bucket ${p.getFileName} has $n files")
        // and the file IS (term, doc_id)-sorted — the dynamic-partition
        // writer would silently destroy a sort that does not lead with
        // the partition column, so assert the physical row order
        val rows = spark.read.parquet(one.toString)
          .select("term", "doc_id").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(rows === rows.sorted,
          s"bucket ${p.getFileName} rows not (term, doc_id)-sorted: $rows")
      }
    }
    // logical shape: dups gone, serving identical, stats untouched
    assert(spark.read.parquet(s"$idx/postings")
      .groupBy("doc_id", "term").count().filter(col("count") > 1)
      .count() === 0L)
    val after = InvertedIndex.bm25Query(spark, idx, Seq("bb", "ee"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    assert(after.toSeq === before.toSeq, "compaction changed serving")
    assert(InvertedIndex.readStats(spark, idx) === Some((5L, 5L, 10L)))
    // crash recovery: a stranded old dir with no live postings restores
    val f = new org.apache.hadoop.fs.Path(s"$idx/postings")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.rename(new org.apache.hadoop.fs.Path(s"$idx/postings"),
      new org.apache.hadoop.fs.Path(s"$idx/postings__compact_old")))
    InvertedIndex.recoverCompact(spark, idx)
    assert(InvertedIndex.bm25Query(spark, idx, Seq("bb"), k = 10)
      .count() === 3L) // bb lives in docs 1, 2, 4
  }

  test("querying an absent index fails loudly") {
    val e = intercept[RuntimeException] {
      InvertedIndex.bm25Query(spark, "/tmp/graft_no_such_index",
        Seq("aa"), k = 5)
    }
    assert(e.getMessage.contains("no inverted index"))
  }
}
