package graft.index

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession

/** Corpus-size-aware SEARCH budget policy — the serving-time answer to
  * the flat-budget recall droop the 100× sweep measured
  * (`SWEEP_SF10.tsv`: every flat-budget arm's recall@1000 fell or froze
  * between 50× and 100×; sharded 0.98→0.84, roar 0.82→0.72).
  *
  * Two knobs grow exploration with the corpus, and they compose:
  *
  *  1. **Shard count** (the natural one): [[ShardedIndex.autoShards]]
  *     holds shard SIZE fixed, so a corpus that grows by delta-ingest
  *     (or is rebuilt bigger) gets more shards, and effective
  *     exploration = per-shard budget × shards grows linearly with the
  *     data while per-shard memory stays bounded.
  *  2. **Per-shard budget** (this object): when rows-PER-SHARD grew
  *     past the registration-time size — delta batches bigger than
  *     base shards, or a corpus rebuilt denser at the same shard
  *     count — the registered beam budget is scaled by the per-shard
  *     growth ratio, so a registration keeps its recall posture
  *     without re-registration. The IVF-PQ tier has the same erosion
  *     shape with different words — `appendIndex` growth makes every
  *     probed cell denser while nlist stays fixed — so its registered
  *     ADC fetch (`nCand`) scales through this same function
  *     ([[graft.plans.AnnIndexRegistry.registerIvfPq]]).
  *
  * Reference behavior generalized: the reference adapts beam
  * allocation WITHIN a query (`/root/reference/src/index_bipartite.cpp`
  * adaptive pq sizing); nothing there adapts ACROSS corpus growth
  * because its index is rebuild-only. A delta-ingesting deployment
  * needs the across-growth half, which is this policy.
  *
  * Confs (read from the EXECUTING session per query):
  *  - `spark.graft.ann.budget.policy` — `auto` (default: scale with
  *    per-shard growth) or `flat` (registration-time budget verbatim,
  *    the pre-round-12 behavior).
  *  - `spark.graft.ann.budget.maxScale` — ceiling on the growth ratio
  *    (default 64): a runaway un-compacted index must degrade recall
  *    before it degrades latency unboundedly; crossing the ceiling is
  *    the signal to compact/re-shard.
  */
object BudgetPolicy {

  // Last scaled budget actually applied — test/observability hook
  // (same posture as ShardedIndex's residency counters).
  private[graft] val lastScaledL = new AtomicInteger(0)
  private[graft] def lastAppliedL: Int = lastScaledL.get()

  /** Effective per-shard beam budget for a registration made at
    * `regRowsPerShard` now serving `curRowsPerShard`. Never shrinks
    * below the registered budget (a compacted/smaller corpus keeps its
    * registered recall posture). */
  def scaledL(spark: SparkSession, registeredL: Int,
              regRowsPerShard: Double, curRowsPerShard: Double): Int = {
    val policy = spark.conf.get("spark.graft.ann.budget.policy", "auto")
    val l =
      if (policy == "flat" || regRowsPerShard <= 0 ||
          curRowsPerShard <= regRowsPerShard) registeredL
      else {
        val maxScale =
          spark.conf.get("spark.graft.ann.budget.maxScale", "64").toDouble
        val ratio = math.min(curRowsPerShard / regRowsPerShard, maxScale)
        math.ceil(registeredL * ratio).toInt
      }
    lastScaledL.set(l)
    l
  }
}
