package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded graph tier — the 100 TB path past the broadcast ceiling
  * (SURVEY §7.3). [[VectorStore.fromDf]]/[[CsrGraph.collect]] materialize
  * one corpus copy per executor, which holds to the reference's own scale
  * (10M × 200d ≈ 8 GB) and no further; this tier partitions the corpus
  * into `nShards` strided sub-corpora (global id g lives in shard
  * g % nShards with local id g / nShards — dense ids stay dense, so the
  * per-shard [[VectorStore]] contract holds), builds one RoarGraph per
  * shard, and answers a query by searching EVERY shard with the same
  * budget and merging through the ordinary bounded rerank/top-k tail.
  *
  * Scale posture: each shard's graph+vectors is 1/nShards of the corpus —
  * pick nShards so a SHARD is broadcastable and the corpus axis is
  * unbounded. Per-shard searches are independent (no cross-shard state),
  * so the fan-out is embarrassingly parallel; the union carries
  * O(queries × budget × nShards) candidate rows into the existing
  * partial-aggregated rerank — no new shuffle shape. Recall can only
  * improve over a single equal-budget graph (each shard's beam explores
  * its sub-corpus exhaustively w.r.t. the budget; the IndexSpec gate
  * holds it ≥ the broadcast tier's 0.95 bar).
  *
  * The strided (round-robin) id split is deliberate: contiguous-range
  * shards would inherit any locality in id order (e.g. clustered inserts)
  * and skew per-shard difficulty; striding gives every shard a uniform
  * sample, which keeps the per-shard graphs statistically alike (same
  * reason the reference samples training queries uniformly).
  */
final class ShardedIndex(val shards: IndexedSeq[ShardHandle], val nShards: Int)
    extends Serializable

/** One shard's built index plus its registered broadcasts. */
final case class ShardHandle(idx: RoarIndex, graphB: Broadcast[CsrGraph],
                             vecsB: Broadcast[VectorStore], shard: Int)

object ShardedIndex {

  /** Build one RoarGraph per strided shard of `emb` (vec_id, embedding).
    * Builds run sequentially on the driver loop (each build is itself a
    * distributed job); shard count is a layout knob, not a parallelism
    * knob. */
  def build(spark: SparkSession, emb: DataFrame, params: BuildParams,
            nShards: Int): ShardedIndex = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val shards = (0 until nShards).map { s =>
      val shardDf = emb.filter(col("vec_id") % nShards === s)
        .select((col("vec_id") / nShards).cast("long").as("vec_id"),
          col("embedding"))
      val idx = GraphBuild.build(spark, shardDf, shardDf, params)
      ShardHandle(idx,
        spark.sparkContext.broadcast(idx.graph),
        spark.sparkContext.broadcast(idx.vecs), s)
    }
    new ShardedIndex(shards, nShards)
  }

  /** G9 multivector adaptive search across all shards: per-shard
    * [[BeamSearch.searchMultiDf]] with the SAME budget, local ids mapped
    * back to global (g = local · nShards + shard), results unioned for
    * the caller's rerank/top-k merge. Output: (qset_id, d_id). */
  def searchMultiDf(spark: SparkSession, querySets: DataFrame,
                    sharded: ShardedIndex, metricName: String, minPq: Int,
                    maxPq: Int, budget: Int, adaptive: Boolean): DataFrame =
    sharded.shards.map { h =>
      BeamSearch.searchMultiDf(spark, querySets, h.graphB, h.vecsB,
        metricName, minPq, maxPq, budget, adaptive)
        .select(col("qset_id"),
          (col("d_id") * sharded.nShards + h.shard).as("d_id"))
    }.reduce(_ unionAll _)

  /** G8 single-vector twin: per-shard beam search, global ids, union;
    * caller applies the bounded per-query top-k merge. Output:
    * (q_id, d_id, score). */
  def searchSingleDf(spark: SparkSession, queries: DataFrame,
                     sharded: ShardedIndex, metricName: String, l: Int,
                     k: Int): DataFrame =
    sharded.shards.map { h =>
      BeamSearch.searchSingleDf(spark, queries, h.graphB, h.vecsB,
        metricName, l, k)
        .select(col("q_id"),
          (col("d_id") * sharded.nShards + h.shard).as("d_id"),
          col("score"))
    }.reduce(_ unionAll _)
}
