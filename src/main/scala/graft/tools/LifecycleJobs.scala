package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.InvertedIndex

/** Spark-JOB accounting for the two slowest bench floors — the
  * text_bm25_versioned (6.73 s) and text_bm25_deleted (5.94 s)
  * lifecycle certificates: both are build→mutate→compact→query
  * SEQUENCES, so their cost is a sum of many small jobs, and the audit
  * question is whether any stage re-tokenizes or re-scans the corpus
  * more than once. This tool replays each certificate's exact fixture
  * steps with a job-start listener between named boundaries and prints
  * one (step, jobs, seconds) row per stage — the table committed to
  * docs/BENCH_NOTES.md.
  *
  * Usage: `runMain graft.tools.LifecycleJobs [sfDir]` (default
  * sf0.01 — the correctness fixture the floors' shape follows; the
  * floors themselves are sf0.1 timings of the same sequence).
  */
object LifecycleJobs {

  private val Terms = Seq("the", "data", "model", "learning", "neural")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val markers = new java.util.concurrent.atomic.AtomicInteger
    val MarkerDesc = "graft_jobs_barrier"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (MarkerDesc == j.properties.getProperty("spark.job.description"))
          markers.incrementAndGet()
        else jobs.incrementAndGet()
    })
    // Deterministic listener drain: the async bus delivers events FIFO
    // per listener, so a MARKER job submitted after a step's last
    // action is observed by the listener only after every one of the
    // step's own job-start events — a fixed sleep attributed jobs to
    // the wrong step on a loaded host (the committed per-step table
    // must be exact, it is adjudicated). The marker is excluded from
    // the count by its job description. Bounded wait: a bus that takes
    // >30 s to deliver one event is a hang worth failing loudly on.
    def barrier(): Unit = {
      val before = markers.get()
      spark.sparkContext.setJobDescription(MarkerDesc)
      try spark.range(1).count()
      finally spark.sparkContext.setJobDescription(null)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (markers.get() == before) {
        if (System.nanoTime() > deadline)
          sys.error("listener bus did not deliver the barrier marker in 30 s")
        Thread.sleep(5)
      }
    }
    val rows = collection.mutable.ArrayBuffer.empty[(String, String, Int, Double)]
    def step[T](cert: String, name: String)(body: => T): T = {
      barrier() // stragglers from the prior step land before the snapshot
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = body
      val secs = (System.nanoTime() - t0) / 1e9 // timed BEFORE the flush
      barrier() // flush this step's events before reading the counter
      rows += ((cert, name, jobs.get() - j0, secs))
      r
    }

    val d = Tables.documents(spark, sfDir)
    val half = d.agg(max(col("doc_id"))).first().getLong(0) / 2

    // ===== text_bm25_versioned: the exact fixture sequence =====
    locally {
      val root = java.nio.file.Files
        .createTempDirectory("graft_jobs_vers_").toString
      step("text_bm25_versioned", "buildVersioned(half1)") {
        InvertedIndex.buildVersioned(spark,
          d.filter(col("doc_id") <= half), root)
      }
      step("text_bm25_versioned", "appendVersioned(half2)") {
        InvertedIndex.appendVersioned(spark,
          d.filter(col("doc_id") > half), root)
      }
      step("text_bm25_versioned", "deleteDocs(%13)") {
        InvertedIndex.deleteDocs(spark,
          InvertedIndex.resolveVersioned(spark, root),
          d.filter(col("doc_id") % 13 === 0).select("doc_id"))
      }
      val pre = InvertedIndex.resolveVersioned(spark, root)
      step("text_bm25_versioned", "compactVersioned") {
        InvertedIndex.compactVersioned(spark, root)
      }
      step("text_bm25_versioned", "bm25Query(grace gen)") {
        InvertedIndex.bm25Query(spark, pre, Terms, k = 20).collect()
      }
      step("text_bm25_versioned", "bm25QueryVersioned(live gen)") {
        InvertedIndex.bm25QueryVersioned(spark, root, Terms, k = 20)
          .collect()
      }
    }

    // ===== text_bm25_deleted: the exact fixture sequence =====
    locally {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_jobs_del_").toString
      step("text_bm25_deleted", "append(half1)") {
        InvertedIndex.append(spark, d.filter(col("doc_id") <= half), idx)
      }
      step("text_bm25_deleted", "append(half2)") {
        InvertedIndex.append(spark, d.filter(col("doc_id") > half), idx)
      }
      val t1 = d.filter(col("doc_id") % 13 === 0).select("doc_id")
      step("text_bm25_deleted", "deleteDocs(%13)") {
        InvertedIndex.deleteDocs(spark, idx, t1)
      }
      step("text_bm25_deleted", "deleteDocs(%13) replay") {
        InvertedIndex.deleteDocs(spark, idx, t1)
      }
      step("text_bm25_deleted", "compactPostings") {
        InvertedIndex.compactPostings(spark, idx)
      }
      step("text_bm25_deleted", "deleteDocs(%17)") {
        InvertedIndex.deleteDocs(spark, idx,
          d.filter(col("doc_id") % 17 === 0).select("doc_id"))
      }
      step("text_bm25_deleted", "bm25Query") {
        InvertedIndex.bm25Query(spark, idx, Terms, k = 20).collect()
      }
    }

    println("certificate\tstep\tjobs\tseconds")
    rows.foreach { case (c, s, j, t) => println(f"$c\t$s\t$j\t$t%.2f") }
    println(f"TOTALS\ttext_bm25_versioned\t${rows.filter(_._1 == "text_bm25_versioned").map(_._3).sum}\t${rows.filter(_._1 == "text_bm25_versioned").map(_._4).sum}%.2f")
    println(f"TOTALS\ttext_bm25_deleted\t${rows.filter(_._1 == "text_bm25_deleted").map(_._3).sum}\t${rows.filter(_._1 == "text_bm25_deleted").map(_._4).sum}%.2f")
    spark.stop()
  }
}
