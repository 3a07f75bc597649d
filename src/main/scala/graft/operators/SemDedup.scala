package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup — Abbas et al., "SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication",
  * 2023): cluster the embedding space, then mark near-duplicates ONLY
  * within each cluster — the published recipe that turns embedding
  * near-dup detection from O(N²) into O(Σ cell²) with cells ~N/nlist.
  *
  * Duplicate rule (deterministic greedy-by-id, the partition-invariant
  * stand-in for the paper's "keep one point per ε-neighborhood"): a row
  * is marked duplicate iff SOME lower-id row in the SAME cell has
  * quantized cosine ≥ τ. The minimum id of every cell-local similarity
  * chain always survives; cross-cell near-dups are missed by design —
  * that is SemDeDup's documented recall trade, and the LSH threshold
  * path ([[LshAnn.thresholdPairs]]) covers the cell-boundary-free
  * variant.
  *
  * Spark shape: assignment is one broadcast-centroid `mapPartitions`
  * pass (no shuffle); the pair scan is a cell-keyed equi-join — shuffle
  * on the cell key, never an all-pairs cross join; the dup set is a
  * bounded id-only projection. Everything downstream of the seeded
  * centroid pick is deterministic double arithmetic (the
  * [[IvfAnn.knnSeeded]] recipe), so the whole pipeline hash-checks in
  * DuckDB — the rare dedup operator whose PRODUCTION path is the
  * oracle-checked path.
  *
  * Reference anchor: the reference dedups exact vector sets only
  * (`/root/reference/tests/test_deduplicate_vec_sets.cpp`); SemDeDup is
  * the published embedding-space generalization an LLM-corpus pipeline
  * runs at 100 TB.
  */
object SemDedup {

  /** Mark duplicates over `corpus` (columns `id`, `vec`) against the
    * given centroids. Output: (id, cell, is_dup 0/1) — one row per
    * corpus row. */
  def mark(corpus: DataFrame, centroids: Array[Array[Float]],
           tau: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val ssB = spark.sparkContext.broadcast(IvfAnn.seedNorms(centroids))
    val assigned = corpus.select(col("id"), col("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val ss = ssB.value
        it.map { case (id, v) =>
          (id, v, IvfAnn.seededTopCells(v, ss, 1)(0))
        }
      }.toDF("id", "vec", "cell")
    val a = assigned.select(col("cell"), col("id").as("a_id"),
      col("vec").as("a_vec"))
    val b = assigned.select(col("cell"), col("id").as("b_id"),
      col("vec").as("b_vec"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(round(vecDot(col("a_vec"), col("b_vec")) /
        (vecNorm(col("a_vec")) * vecNorm(col("b_vec"))), 9) >= tau)
      .select(col("b_id").as("id")).distinct()
    assigned.select(col("id"), col("cell"))
      .join(dropped.withColumn("_dup", lit(1L)), Seq("id"), "left_outer")
      .select(col("id"), col("cell").cast("long").as("cell"),
        coalesce(col("_dup"), lit(0L)).as("is_dup"))
  }

  /** [[mark]] with corpus-seeded centroids (md5-ranked rows — the
    * [[IvfAnn.seededCentroids]] pick), end-to-end deterministic. */
  def markSeeded(corpus: DataFrame, nlist: Int, tau: Double): DataFrame = {
    val d = corpus.select(col("id").as("d_id"), col("vec").as("d_vec"))
    mark(corpus, IvfAnn.seededCentroids(d, nlist), tau)
  }
}
