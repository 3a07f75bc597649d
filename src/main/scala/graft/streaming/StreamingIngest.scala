package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.VectorFunctions._

/** Structured-Streaming extension surface (SURVEY M6) — the reference is
  * batch-only (SURVEY §1.4), so these are the engine's streaming-native
  * additions for a continuously-fed corpus: micro-batch vector ingest
  * into indexable blocks, watermarked event-time analytics, stateful
  * streaming dedup, and running per-key statistics via the typed
  * state API. All are plan-shape-identical between batch and streaming
  * DataFrames (tested with MemoryStream).
  */
object StreamingIngest {

  case class EventIn(ts: java.sql.Timestamp, event_type: String, value: Double)
  case class TypeStats(event_type: String, n: Long, sum: Double)
  case class DocIn(doc_id: Long, fingerprint: String)

  /** Vector micro-batch ingest: validate dim, L2-normalize, stamp the
    * fixed-cardinality set id, carry the norm — rows land partitioned by
    * `block_id` so each parquet block is independently indexable (the
    * unit the RoarGraph build job consumes). */
  def vectorIngest(vecs: DataFrame, cardinality: Int = 4,
                   blockRows: Long = 100000L): DataFrame =
    vecs.select(col("vec_id"), col("embedding"))
      .withColumn("norm", vecNorm(col("embedding")))
      .filter(col("norm") > 0)
      .select(
        col("vec_id"),
        vecScale(col("embedding"), col("norm")).as("embedding"),
        (col("vec_id") / cardinality).cast("long").as("set_id"),
        (col("vec_id") / blockRows).cast("long").as("block_id"))

  /** Watermarked tumbling-window event analytics (event-time, late data
    * bounded by the 2-minute watermark). */
  def windowedEventStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(avg("value"), 6).as("avg_value"))

  /** Stateful streaming dedup: first occurrence of each fingerprint wins,
    * across micro-batches — the streaming face of `dedup_exact`. */
  def streamingDedup(ds: Dataset[DocIn]): Dataset[DocIn] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.fingerprint)
      .flatMapGroupsWithState[Boolean, DocIn](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          if (state.exists) Iterator.empty
          else { state.update(true); it.take(1) }
      }
  }

  /** One banded MinHash key of one document — the streaming unit of the
    * batch near-dup candidate generator ([[graft.operators.MinHashLsh]]):
    * a doc contributes one row per band. */
  case class BandedDoc(doc_id: Long, band: Int, key: String)

  /** A streaming near-dup CANDIDATE: `doc_id` collided with the bucket
    * first claimed by `first_doc_id` on `band`. */
  case class BandCollision(doc_id: Long, first_doc_id: Long, band: Int)

  /** Streaming near-dup candidate generation — the streaming face of the
    * batch MinHash-LSH banded self-join: state is keyed by (band, key)
    * and holds the FIRST doc to claim that bucket; every later doc
    * hashing into the bucket emits a (doc, first_claimant, band)
    * candidate, across micro-batches. Downstream exact verification
    * (Jaccard / cosine on the pair) and cluster resolution
    * ([[graft.operators.ConnectedComponents]]) run as the same batch
    * operators this repo already oracle-checks — this stage only has to
    * produce the SAME candidate pairs the batch banded join would.
    *
    * State is one long per occupied bucket (bounded by the number of
    * distinct band keys, the same working set the batch shuffle
    * materializes); at 100 TB the state store is RocksDB-backed and
    * partitioned by the same (band, key) hash the batch join shuffles
    * on. Candidates keyed to the FIRST claimant (not all prior members)
    * keep per-bucket state O(1) — pair volume is the hot-bucket-bounded
    * candidate set, exactly like the batch operator's skew posture. */
  def streamingBandCollisions(ds: Dataset[BandedDoc]): Dataset[BandCollision] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState[Long, BandCollision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), it, state) =>
          val rows = it.toSeq.sortBy(_.doc_id) // batch-internal determinism
          val first = state.getOption.getOrElse {
            val f = rows.head.doc_id
            state.update(f)
            f
          }
          rows.iterator.filter(_.doc_id != first)
            .map(b => BandCollision(b.doc_id, first, band))
      }
  }

  /** `foreachBatch` face of the persisted band-key index
    * ([[graft.operators.MinHashLsh.writeBandIndex]]) — the production
    * posture once band-key state outgrows the state store: resident
    * keys live as parquet (~0.1% of corpus bytes), not per-key
    * streaming state. Each micro-batch of shingle hashes (doc_id, h)
    * is banded, probes the resident index with its keys BROADCAST
    * (zero shuffle of resident rows), appends the discovered pairs to
    * `pairsOut` stamped with `batch_id`, then appends its own keys to
    * the index — so batch N+1 dedups against everything before it.
    * The first batch bootstraps: within-batch pairs only, then its
    * keys become the index. foreachBatch is at-least-once, and the
    * index side is replay-safe the same way
    * [[incrementalSemDedupBatch]] is: a batch whose ids the watermark
    * already covers re-emits identical pairs (its own resident copies
    * are excluded from the probe, so no spurious self-collisions) and
    * skips the re-append.
    *
    * CONSUMER CONTRACT for `pairsOut`: a replayed batch re-appends its
    * (identical) pair rows under the SAME `batch_id` — the stamp
    * identifies which batch produced a row, it cannot distinguish an
    * original from its replay. Downstream reads must therefore be
    * DISTINCT over the pair columns, e.g.
    * `SELECT DISTINCT doc_a, doc_b, n_shared_bands FROM pairsOut`
    * (per batch_id or globally — the replayed rows are byte-identical,
    * so distinct recovers exactly-once semantics). The specs read the
    * sink this way; non-distinct aggregates over `pairsOut` (row
    * counts, sums) are NOT replay-safe by design.
    *
    * Returns the (sink-shaped) function to hand to
    * `writeStream.foreachBatch`. */
  def incrementalDedupBatch(indexPath: String, pairsOut: String,
                            numHashes: Int = 8, rowsPerBand: Int = 2)
      : (DataFrame, Long) => Unit = { (shingles, batchId) =>
    import graft.operators.{MinHashLsh, Watermark}
    val spark = shingles.sparkSession
    val keys = MinHashLsh.bandKeys(shingles, numHashes, rowsPerBand)
      .persist() // consumed twice: the probe and the index append
    try {
      val mm = keys.agg(min(col("doc_id")), max(col("doc_id"))).first()
      if (!mm.isNullAt(1)) { // empty batch: nothing to probe or append
        val wm = Watermark.read(spark, indexPath, "doc_id")
        require(wm.forall(w => w < mm.getLong(0) || w >= mm.getLong(1)),
          s"incrementalDedupBatch needs monotone doc ids across ingests: " +
            s"resident watermark ${wm.get} lands inside the batch id " +
            s"range [${mm.getLong(0)}, ${mm.getLong(1)}] — not a replay, " +
            "not an append")
        val isReplay = wm.exists(_ >= mm.getLong(1))
        val resident =
          if (wm.isDefined)
            // readBandIndex, not a bare scan: tombstoned (taken-down)
            // docs must not seed pairs against new batches
            MinHashLsh.readBandIndex(spark, indexPath)
              .filter(col("doc_id") < mm.getLong(0))
          else keys.limit(0) // bootstrap: empty resident, within-batch only
        MinHashLsh.incrementalPairs(resident, keys)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(pairsOut)
        if (!isReplay) MinHashLsh.appendBandIndex(keys, indexPath)
      }
    } finally keys.unpersist()
  }

  /** foreachBatch driver for INCREMENTAL SEMANTIC dedup — the
    * [[incrementalDedupBatch]] posture on the embedding side: per
    * micro-batch, assign rows to seeded-centroid cells, mark the batch
    * against the resident cell index + itself (partition-pruned probe,
    * [[graft.operators.SemDedup.incrementalMark]]), append the marks
    * `batch_id`-stamped, append the batch to the cell index. Batch N+1
    * dedups against everything prior; the monotone-id ingest contract
    * is validated inside incrementalMark. First batch bootstraps from
    * an empty index (within-batch marking only).
    *
    * REPLAY-SAFE: foreachBatch is at-least-once, and a crash between
    * the index append and the checkpoint commit re-delivers a batch
    * whose ids are already resident. The watermark sidecar recognizes
    * that replay (watermark ≥ the batch's max id): the marks are
    * recomputed identically (incrementalMark excludes the batch's own
    * resident copies) and re-emitted under the same `batch_id` stamp,
    * and the index append is SKIPPED — the stream makes progress
    * instead of tripping the monotone-id check forever. As with
    * [[incrementalDedupBatch]]'s pairs sink, the replayed mark rows are
    * byte-identical and carry the SAME batch_id, so `marksOut` readers
    * must be DISTINCT over (id, cell, is_dup[, batch_id]) — the stamp
    * alone cannot drop a replay. */
  def incrementalSemDedupBatch(indexPath: String, marksOut: String,
                               centroids: Array[Array[Float]], tau: Double)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    import graft.operators.SemDedup
    val spark = batch.sparkSession
    val rows = batch.persist() // consumed twice: the probe and the append
    try {
      val mm = rows.agg(min(col("id")), max(col("id"))).first()
      if (!mm.isNullAt(1)) { // empty batch: nothing to mark or append
        val wm = SemDedup.readWatermark(spark, indexPath)
        val isReplay = wm.exists(_ >= mm.getLong(1))
        val marks =
          if (wm.isDefined)
            SemDedup.incrementalMark(spark, indexPath, centroids, rows, tau)
          else SemDedup.mark(rows, centroids, tau) // bootstrap: batch-only
        marks.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(marksOut)
        if (!isReplay) SemDedup.appendCellIndex(rows, centroids, indexPath)
      }
    } finally rows.unpersist()
  }

  /** foreachBatch face of the persisted INVERTED index
    * ([[graft.operators.InvertedIndex]]) — the lexical retrieval
    * corpus ingested as a stream: each `(doc_id, text)` micro-batch
    * appends its postings once (one tokenize + one keyed groupBy; the
    * corpus is never re-read) and bumps the additive corpus stats
    * (`n_docs`, `sum_dl`) BM25 serving reads. REPLAY-SAFE the same
    * way every incremental index here is: `InvertedIndex.append`
    * skips batches whose ids the `_stats` watermark already covers
    * and fails loudly on partial overlaps; the stale-watermark
    * double-append crash window is folded at read by `bm25Query`'s
    * duplicate-row fold (identical rows, `max(tf)` — lossless). */
  def incrementalBm25Batch(indexPath: String)
      : (DataFrame, Long) => Unit = { (batch, _) =>
    graft.operators.InvertedIndex.append(batch.sparkSession, batch,
      indexPath)
  }

  /** Streaming ANN ingest — the foreachBatch body that keeps a
    * persisted SHARDED index continuously searchable while vectors
    * stream in. Per micro-batch: validate ids are a dense continuation
    * of the corpus ([[graft.index.ShardedIndex.appendDelta]]'s
    * contract, checked there), append the batch as a DELTA shard (its
    * own small RoarGraph — immediately served by both Df search
    * paths), and when the accumulated delta fraction reaches
    * `compactAt`, fold every delta back into the strided base layout
    * ([[graft.index.ShardedIndex.compact]] — disk-to-disk, never
    * resident).
    *
    * REPLAY-SAFE under foreachBatch's at-least-once contract: a batch
    * whose ids all fall below the indexed row count was already
    * appended by a previous (crashed-after-write) attempt — skipped
    * idempotently, the same posture as the band/cell index sidecars. A
    * PARTIALLY overlapping batch is neither a clean replay nor a clean
    * continuation and fails loudly in appendDelta's density check.
    * Returns (updated ref, action ∈ skip-empty | skip-replay |
    * append | append+compact) — the caller holds the ref across
    * batches (driver-side var in the foreachBatch closure, the
    * standard pattern). */
  def ingestVectorBatch(spark: org.apache.spark.sql.SparkSession,
                        batch: org.apache.spark.sql.DataFrame,
                        ref: graft.index.ShardedIndexRef,
                        params: graft.index.BuildParams,
                        compactAt: Double = 0.25)
      : (graft.index.ShardedIndexRef, String) = {
    import graft.index.ShardedIndex
    val rows = batch.select(col("vec_id"), col("embedding"))
    val stats = rows.agg(count(col("vec_id")), max(col("vec_id"))).head()
    if (stats.getLong(0) == 0L) return (ref, "skip-empty")
    // SELF-HEAL a compact() that crashed past its point of no return
    // (committed compact_staging: the staged corpus is the only
    // complete copy, and appendDelta refuses to land on top of it —
    // correctly, for a batch caller). A RESTARTED stream must make
    // progress without operator action, so the foreachBatch body
    // finishes the stranded fold itself before touching the batch;
    // re-running compact from a committed staging is the documented
    // recovery and is idempotent.
    val base =
      if (ShardedIndex.hasStrandedCompactStaging(spark, ref))
        ShardedIndex.compact(spark, ref, params)
      else ref
    val existing = ShardedIndex.totalRows(spark, base)
    if (stats.getLong(1) < existing) return (base, "skip-replay")
    val appended = ShardedIndex.appendDelta(spark, rows, base, params)
    // CRASH CONTRACT, pinned by StreamingSpec via the hook below: a
    // crash here — after the delta landed, before the caller records
    // the new ref — re-delivers the batch against the PRE-append ref.
    // totalRows over that ref excludes the orphan delta, so the replay
    // is not a skip: appendDelta re-validates the same dense window and
    // OVERWRITES the same delta dir — byte-convergent, never a
    // double-append (delta slot j is a pure function of the ref).
    if (spark.conf.getOption("spark.graft.test.ingestFailAfterAppend")
        .contains("true"))
      throw new IllegalStateException(
        "ingestVectorBatch: injected crash after delta append")
    // Cross-PROCESS form of the same crash window (ForkedJvmSpec): the
    // conf value is a signal-file path — write it (tmp+rename, so the
    // observer never reads a partial file) and HANG; the test harness
    // SIGKILLs this JVM here, i.e. with the delta fully landed and the
    // caller's ref never updated. No finally blocks run.
    spark.conf.getOption("spark.graft.test.ingestHangAfterAppend")
      .foreach { sig =>
        val tmp = java.nio.file.Paths.get(sig + ".tmp")
        java.nio.file.Files.write(tmp, "appended".getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(sig),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Thread.sleep(600000)
      }
    if (ShardedIndex.deltaFraction(spark, appended) >= compactAt)
      (ShardedIndex.compact(spark, appended, params), "append+compact")
    else (appended, "append")
  }

  /** Streaming TAKEDOWN face — the foreachBatch body a deployment
    * points at its deletion feed (DSAR queue, license-revocation
    * topic): each micro-batch of doc ids is applied to every index the
    * corpus serves through, in one call. Deletion is idempotent BY
    * CONSTRUCTION on every index (append-only tombstones; already-
    * tombstoned ids append nothing), so foreachBatch's at-least-once
    * replay needs no watermark here at all — a replayed batch
    * converges to the same tombstone set and reports zero new
    * deletions. Pass only the paths the deployment actually maintains;
    * masks are live on the next query against each index with no
    * re-registration (disk is the truth). Returns the per-face newly-
    * deleted counts (a replayed batch returns all zeros), for the
    * caller's audit sink. */
  def takedownBatch(invertedIndexPath: Option[String] = None,
                    bandIndexPath: Option[String] = None,
                    cellIndexPath: Option[String] = None,
                    shardedIndexPath: Option[String] = None,
                    ivfPqIndexPath: Option[String] = None,
                    sq8IndexPath: Option[String] = None,
                    shardedVersionedRoot: Option[String] = None,
                    invertedVersionedRoot: Option[String] = None,
                    ivfPqVersionedRoot: Option[String] = None,
                    sq8VersionedRoot: Option[String] = None,
                    bandVersionedRoot: Option[String] = None,
                    cellVersionedRoot: Option[String] = None)
      : (DataFrame, Long) => Map[String, Long] = { (ids, _) =>
    val spark = ids.sparkSession
    // EXACTLY one column, by contract: silently picking columns.head
    // of a wider feed (e.g. a Kafka projection's (ts, doc_id)) would
    // tombstone epoch values across every index — fail loudly instead
    require(ids.columns.length == 1,
      s"takedownBatch expects a single-id-column batch, got " +
        s"(${ids.columns.mkString(", ")}) — select the id column first")
    // one stable id relation for all faces (each face renames to its
    // own id column); persist so six anti-join probes don't re-execute
    // the upstream (e.g. a Kafka-source projection) six times
    val docIds = ids.select(col(ids.columns.head).cast("long").as("id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def as(name: String) = docIds.select(col("id").as(name))
      // CRASH CONTRACT: the fan-out is not transactional across faces
      // — a crash mid-fan leaves the earlier faces deleted and the
      // later ones not. That is SAFE by replay: every per-face delete
      // is idempotent (append-only tombstones; already-tombstoned ids
      // append nothing), so foreachBatch's at-least-once redelivery
      // converges all faces to the same survivor set. The test hook
      // below (`spark.graft.test.takedownFailAfter` = N) injects the
      // crash after N applied faces so StreamingSpec can pin exactly
      // that contract.
      val failAfter = spark.conf
        .getOption("spark.graft.test.takedownFailAfter")
        .map(_.toInt).getOrElse(Int.MaxValue)
      // cross-PROCESS form ("N:sigPath"): after N faces applied, write
      // the signal file and HANG — ForkedJvmSpec SIGKILLs this JVM
      // mid-fan-out, leaving the earlier faces deleted and the later
      // ones untouched (the window the replay-idempotence claim covers)
      val hangAfter = spark.conf
        .getOption("spark.graft.test.takedownHangAfter")
        .map { v =>
          val Array(n, p) = v.split(":", 2); (n.toInt, p)
        }
      var applied = 0
      def face(name: String)(body: => Long): (String, Long) = {
        if (applied >= failAfter)
          throw new IllegalStateException(
            s"takedownBatch: injected crash after $applied faces")
        hangAfter.foreach { case (n, sig) =>
          if (applied == n) {
            val tmp = java.nio.file.Paths.get(sig + ".tmp")
            java.nio.file.Files.write(tmp,
              s"applied $applied".getBytes("UTF-8"))
            java.nio.file.Files.move(tmp, java.nio.file.Paths.get(sig),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            Thread.sleep(600000)
          }
        }
        val n = body; applied += 1; name -> n
      }
      Seq(
        invertedIndexPath.map(p => face("inverted")(
          graft.operators.InvertedIndex.deleteDocs(spark, p, as("doc_id")))),
        bandIndexPath.map(p => face("band")(
          graft.operators.MinHashLsh.deleteFromBandIndex(spark, p,
            as("doc_id")))),
        cellIndexPath.map(p => face("cell")(
          graft.operators.SemDedup.deleteFromCellIndex(spark, p, as("id")))),
        shardedIndexPath.map(p => face("sharded")(
          graft.index.ShardedIndex.deleteFromIndex(spark, p, as("gid")))),
        ivfPqIndexPath.map(p => face("ivfpq")(
          graft.operators.IvfPq.deleteFromIndex(spark, p, as("d_id")))),
        sq8IndexPath.map(p => face("sq8")(
          graft.operators.Sq8Ann.deleteFromIndex(spark, p, as("d_id")))),
        // generation-versioned serving faces: the tombstone lands in
        // the LIVE generation (manifest-resolved per batch — a feed
        // registered before a compaction keeps working after the
        // pointer flip; the deletes-during-compact window stays the
        // writers' single-writer contract)
        shardedVersionedRoot.map(r => face("sharded_versioned")(
          graft.index.ShardedIndex.deleteVersioned(spark, r, as("gid")))),
        invertedVersionedRoot.map(r => face("inverted_versioned")(
          graft.operators.InvertedIndex.deleteVersioned(spark, r,
            as("doc_id")))),
        ivfPqVersionedRoot.map(r => face("ivfpq_versioned")(
          graft.operators.IvfPq.deleteVersioned(spark, r, as("d_id")))),
        sq8VersionedRoot.map(r => face("sq8_versioned")(
          graft.operators.Sq8Ann.deleteVersioned(spark, r, as("d_id")))),
        bandVersionedRoot.map(r => face("band_versioned")(
          graft.operators.MinHashLsh.deleteVersioned(spark, r,
            as("doc_id")))),
        cellVersionedRoot.map(r => face("cell_versioned")(
          graft.operators.SemDedup.deleteVersioned(spark, r, as("id"))))
      ).flatten.toMap
    } finally docIds.unpersist(false)
  }

  /** One MAINTENANCE-LOOP tick over a deployment's versioned roots —
    * the poll a serving deployment schedules (timer thread, cron, or a
    * foreachBatch heartbeat) beside the ingest and takedown feeds:
    * each face's `maybeCompactVersioned` checks its own re-arming
    * triggers (un-erased deleted fraction, small-file pressure; the
    * sharded face adds delta fraction, per-shard skew, and the growth
    * re-shard via `targetShardRows`) and folds into a successor
    * generation ONLY when one fires — readers never paused, writers
    * serialized by the per-root lease (a tick racing an ingest stream
    * on the same root fails loudly rather than corrupting; schedule
    * ticks on the writer loop, the same discipline as any single
    * maintenance window). Returns face → live generation dir after
    * the tick, for the caller's audit sink. */
  def maintenanceTick(spark: org.apache.spark.sql.SparkSession,
                      shardedRoot: Option[(String, graft.index.BuildParams)] = None,
                      invertedRoot: Option[String] = None,
                      ivfPqRoot: Option[String] = None,
                      sq8Root: Option[String] = None,
                      bandRoot: Option[String] = None,
                      cellRoot: Option[String] = None,
                      maxDeletedFrac: Double = 0.2,
                      targetShardRows: Long = 0,
                      committer: String = ""): Map[String, String] =
    Seq(
      shardedRoot.map { case (r, params) => "sharded" ->
        graft.index.ShardedIndex.maybeCompactVersioned(spark, r, params,
          maxDeletedFrac = maxDeletedFrac,
          targetShardRows = targetShardRows, committer = committer).path },
      invertedRoot.map(r => "inverted" -> graft.operators.InvertedIndex
        .maybeCompactVersioned(spark, r, maxDeletedFrac,
          committer = committer)),
      ivfPqRoot.map(r => "ivfpq" -> graft.operators.IvfPq
        .maybeCompactVersioned(spark, r, maxDeletedFrac,
          committer = committer)),
      sq8Root.map(r => "sq8" -> graft.operators.Sq8Ann
        .maybeCompactVersioned(spark, r, maxDeletedFrac,
          committer = committer)),
      bandRoot.map(r => "band" -> graft.operators.MinHashLsh
        .maybeCompactVersioned(spark, r, maxDeletedFrac,
          committer = committer)),
      cellRoot.map(r => "cell" -> graft.operators.SemDedup
        .maybeCompactVersioned(spark, r, maxDeletedFrac,
          committer = committer))
    ).flatten.toMap

  /** Running per-event-type counters via the typed state API
    * (`mapGroupsWithState`) — update-mode output of (n, Σvalue). */
  def runningTypeStats(ds: Dataset[EventIn]): Dataset[TypeStats] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .mapGroupsWithState[(Long, Double), TypeStats](GroupStateTimeout.NoTimeout) {
        case (key, it, state) =>
          var (n, s) = state.getOption.getOrElse((0L, 0.0))
          it.foreach { e => n += 1; s += e.value }
          state.update((n, s))
          TypeStats(key, n, math.rint(s * 1e6) / 1e6)
      }
  }
}
