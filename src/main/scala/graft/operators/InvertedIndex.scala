package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-appendable INVERTED INDEX with BM25
  * serving — the lexical mirror of the incremental band/cell/vector
  * indexes: a retrieval corpus is ingested batch by batch, each batch
  * appends its postings once, and queries answer from the index
  * without ever re-tokenizing the corpus.
  *
  * Layout under `path`:
  *  - `postings/` — parquet `(doc_id, dl, term, tf)` partitioned by
  *    `bucket = crc32(term) % 64`: a query for B distinct terms prunes
  *    to ≤B partitions at the SCAN (partition pruning + term predicate
  *    pushdown), so serving cost scales with the matched postings, not
  *    the corpus. At 100 TB the postings relation is the standard
  *    sharded inverted file; nothing here is resident.
  *  - `_stats` — one tiny text file `watermark,n_docs,sum_dl`:
  *    the corpus-level BM25 constants (maintained additively per
  *    batch — at scale this pair is corpus metadata, never recomputed)
  *    plus the max-doc-id watermark that makes at-least-once replays
  *    idempotent (same posture as [[Watermark]]).
  *
  * Crash window (same stale-low posture as [[Watermark]]): `_stats`
  * writes AFTER the postings append (temp-write + swap, so the live
  * sidecar is never truncated mid-write; a sidecar lost in the swap
  * window is rebuilt from the postings on the next read), so a crash
  * in between leaves the watermark low and a replayed batch re-appends
  * byte-identical posting rows. [[bm25Query]] folds exact duplicates with
  * `max(tf)` per (doc_id, dl, term) — a doc lives in exactly one
  * batch, so duplicates are always identical rows and the fold is
  * lossless; stats were never double-added because the stats write
  * and the append commit together in the non-crash path and the
  * replay re-append is detected on the next healthy batch.
  *
  * Scoring delegates to the SAME `bm25Rank` tail the inline
  * hash-green `text_bm25_query` uses
  * ([[graft.queries.TextQueries.bm25Rank]]) — the index path cannot
  * drift from the oracle-checked formula.
  */
object InvertedIndex {

  val NumBuckets = 64

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (watermark, n_docs, sum_dl) or None for an absent/empty index.
    * A missing or corrupt sidecar WITH live postings (crash inside
    * [[writeStats]]'s swap window, or a legacy index) is RECOVERED by
    * one aggregation over the postings — docs are distinct
    * (doc_id, dl) rows (replay-duplicated postings fold away), the
    * watermark is max(doc_id) — and the rebuilt sidecar is re-written
    * so the recovery scan runs once, not per read. */
  def readStats(spark: SparkSession, path: String)
      : Option[(Long, Long, Long)] = {
    val p = new Path(path, "_stats")
    val f = fs(spark, path)
    val parsed: Option[(Long, Long, Long)] =
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try {
          val parts = scala.io.Source.fromInputStream(in).mkString.trim
            .split(",")
          Some((parts(0).toLong, parts(1).toLong, parts(2).toLong))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally in.close()
      }
    parsed.orElse {
      if (!f.exists(new Path(s"$path/postings"))) None
      else {
        val docs = spark.read.parquet(s"$path/postings")
          .select(col("doc_id"), col("dl")).distinct()
          .agg(max(col("doc_id")), count(lit(1)), sum(col("dl"))).head()
        if (docs.isNullAt(0)) None
        else {
          val rebuilt = (docs.getLong(0), docs.getLong(1), docs.getLong(2))
          writeStats(spark, path, rebuilt._1, rebuilt._2, rebuilt._3)
          Some(rebuilt)
        }
      }
    }
  }

  /** Temp-write + swap (the compactBandIndex posture): a crash never
    * truncates the LIVE sidecar — either the old `_stats` survives, or
    * the delete/rename window left none and [[readStats]] rebuilds from
    * the postings. */
  private def writeStats(spark: SparkSession, path: String,
                         wm: Long, nDocs: Long, sumDl: Long): Unit =
    Watermark.promoteSidecar(fs(spark, path),
      new Path(path, "_stats.tmp"), new Path(path, "_stats"))(
      _.write(s"$wm,$nDocs,$sumDl".getBytes("UTF-8")))

  /** Append one batch of `(doc_id, text)` rows. Doc ids must be
    * MONOTONE across batches (the ingest contract every incremental
    * index here shares); a batch whose ids the watermark already
    * covers is a REPLAY and is skipped idempotently; a watermark
    * landing INSIDE the batch range (a crash between the postings
    * write and the sidecar promote, or a stats rebuild that
    * undercounted trailing zero-token docs — invisible to postings)
    * appends only the uncovered SUFFIX, converging idempotently
    * instead of wedging the ingest. Each batch costs ONE tokenize pass
    * (persisted projection serves the stats aggregate and the postings
    * write) — the corpus is never re-read. */
  def append(spark: SparkSession, docsDf: DataFrame, path: String): Unit = {
    import graft.queries.TextQueries
    val toks = TextQueries.tokenizedOf(docsDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (cnt, sumDl, minId, maxId) =
        TextQueries.corpusStatsOfTokenized(toks)
      if (cnt == 0) return // empty batch: nothing to append
      val prior = readStats(spark, path)
      if (prior.exists(_._1 >= maxId)) return // replay: already indexed
      val (batch, bCnt, bSum) = prior.map(_._1) match {
        case Some(wm) if wm >= minId =>
          // partial coverage: append the ids the watermark missed
          val suffix = toks.filter(col("doc_id") > wm)
          val (c2, s2, _, _) = TextQueries.corpusStatsOfTokenized(suffix)
          (suffix, c2, s2)
        case _ => (toks, cnt, sumDl)
      }
      if (bCnt > 0)
        TextQueries.postingsOfTokenized(batch)
          .withColumn("bucket",
            pmod(crc32(col("term")), lit(NumBuckets.toLong)))
          .write.mode("append").partitionBy("bucket")
          .parquet(s"$path/postings")
      val (n0, s0) = prior.map(p => (p._2, p._3)).getOrElse((0L, 0L))
      writeStats(spark, path, maxId, n0 + bCnt, s0 + bSum)
    } finally toks.unpersist(false)
  }

  /** Fold append-accumulated small files — and any replay-duplicated
    * rows (stale-watermark re-appends) — back into ONE sorted file per
    * bucket, keeping the bucket-partitioned layout so queries stay
    * partition-pruned. After compaction the read-time `max(tf)` fold
    * in [[bm25Query]] is a no-op and small-file pressure is gone; at
    * 100 TB this is the standard background postings merge. Each
    * bucket's rows hash to one task (`repartition(bucket)`), so
    * `partitionBy` writes a single sorted file per bucket dir.
    *
    * Staging-swap with the [[graft.operators.SemDedup.compactCellIndex]]
    * crash posture: staging written first, two renames, old dropped
    * last; [[recoverCompact]] (called here and cheap from any startup
    * path) restores a stranded old dir or drops a stale one. Requires
    * QUIESCENCE — no concurrent query or append during the swap. The
    * `_stats` sidecar is untouched: compaction changes no doc, so the
    * corpus constants and watermark remain exact. */
  def compactPostings(spark: SparkSession, path: String): Unit = {
    recoverCompact(spark, path)
    val f = fs(spark, path)
    val live = new Path(s"$path/postings")
    if (!f.exists(live)) return
    val staging = new Path(s"$path/postings__compact_staging")
    spark.read.parquet(live.toString)
      .groupBy(col("bucket"), col("term"), col("doc_id"), col("dl"))
      .agg(max(col("tf")).as("tf"))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"),
        col("bucket"))
      .repartition(col("bucket"))
      // bucket must LEAD the sort: the dynamic-partition writer
      // requires ordering by the partition column and would insert its
      // own Sort(bucket) over a (term, doc_id)-only ordering,
      // destroying the term clustering this compaction exists to
      // produce; with the prefix satisfied the writer keeps our order
      .sortWithinPartitions("bucket", "term", "doc_id")
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(staging.toString)
    val old = new Path(s"$path/postings__compact_old")
    require(f.rename(live, old), s"compact: cannot move $live aside")
    require(f.rename(staging, live),
      s"compact: cannot promote staging for $live")
    f.delete(old, true)
  }

  /** Recover a [[compactPostings]] that crashed between its renames:
    * stranded old with no live postings → restore; both present (crash
    * after promote) → drop old; stranded staging → drop (never live). */
  def recoverCompact(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val live = new Path(s"$path/postings")
    val old = new Path(s"$path/postings__compact_old")
    if (f.exists(old)) {
      if (!f.exists(live))
        require(f.rename(old, live), s"recover: cannot restore $live")
      else f.delete(old, true)
    }
    val staging = new Path(s"$path/postings__compact_staging")
    if (f.exists(staging)) f.delete(staging, true)
  }

  /** BM25 top-k for `terms` served FROM the index: the postings scan
    * prunes to the terms' buckets (partition pruning) and pushes the
    * term filter; corpus constants come from `_stats`; scoring is the
    * shared hash-green `bm25Rank` tail. */
  def bm25Query(spark: SparkSession, path: String, terms: Seq[String],
                k: Int = 20): DataFrame = {
    import graft.queries.TextQueries
    val (_, nDocs, sumDl) = readStats(spark, path).getOrElse(
      sys.error(s"no inverted index at $path"))
    val crc = new java.util.zip.CRC32
    val buckets = terms.map { t =>
      crc.reset(); crc.update(t.getBytes("UTF-8"))
      (crc.getValue % NumBuckets).toString
    }.distinct
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isInCollection(buckets) &&
        col("term").isInCollection(terms))
      // fold byte-identical rows from a stale-watermark replay
      // re-append (see the crash-window note above)
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(max(col("tf")).as("tf"))
    val stats = spark.range(1).select(
      lit(nDocs).cast("double").as("n_docs"),
      lit(sumDl).cast("double").as("sum_dl"))
    TextQueries.bm25Rank(tf, stats, k)
  }
}
