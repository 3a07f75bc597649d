package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Random-hyperplane LSH approximate k-NN — the scale path for similarity
  * search when no graph index exists (and the LLM-pipeline embedding
  * near-dup primitive). SURVEY §7.1's MLlib note: we use a plain
  * relational formulation instead of `BucketedRandomProjectionLSH` so the
  * whole plan stays in whole-stage codegen and DuckDB-compatible shapes.
  *
  * Shape: sign-bit signature over `numPlanes` seeded Gaussian hyperplanes,
  * banded into `numBands` keys; candidate generation is an EQUI-join on
  * (band, key) — a hash-shuffle on short strings, never an all-pairs
  * cross join; exact cosine rerank + bounded-heap top-k runs only on
  * bucket collisions. Recall is tunable via planes/bands (asserted ≥0.9
  * vs the exact j1 oracle in LlmPipelineSpec).
  */
object LshAnn {

  /** Deterministic Gaussian hyperplanes (fixed seed → reproducible plans). */
  def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Vector dim: the caller's hint if given (saves a tiny probe job per
    * call), else derived from the first row — with a clear error instead
    * of a bare NoSuchElementException when the input is empty. */
  private def dimOf(df: DataFrame, vecCol: String, hint: Int): Int =
    if (hint > 0) hint
    else df.select(size(col(vecCol))).limit(1).collect() match {
      case Array(r) => r.getInt(0)
      case _ => sys.error(
        s"LshAnn: cannot derive vector dim from empty input ('$vecCol'); pass dim explicitly")
    }

  /** Add (id-col untouched) an exploded (band, key) pair per row. */
  private def banded(df: DataFrame, vecCol: String, planesLit: Column,
                     numBands: Int, rowsPerBand: Int): DataFrame = {
    // native fused-loop dot per plane (no per-plane zip_with allocation)
    val bits = transform(planesLit, p =>
      when(vecDot(p, col(vecCol)) >= 0, "1").otherwise("0"))
    val bandKeys = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        array_join(slice(bits, b * rowsPerBand + 1, rowsPerBand), "").as("key"))
    }
    df.withColumn("bk", explode(array(bandKeys: _*)))
      .withColumn("band", col("bk.band"))
      .withColumn("key", col("bk.key"))
      .drop("bk")
  }

  /** Approximate top-k cosine neighbors from `queries` (q_id, q_vec) to
    * `data` (d_id, d_vec). Output: (q_id, rank, d_id, score), scores
    * 9-decimal-quantized like the exact path. */
  def knn(queries: DataFrame, data: DataFrame, k: Int,
          numPlanes: Int = 12, rowsPerBand: Int = 2,
          seed: Long = 42L, excludeSelf: Boolean = false,
          dim: Int = 0): DataFrame = {
    require(numPlanes % rowsPerBand == 0, "numPlanes must divide into bands")
    val numBands = numPlanes / rowsPerBand
    val dimV = dimOf(queries, "q_vec", dim)
    val planesLit = typedLit(planes(numPlanes, dimV, seed))
    val qb = banded(queries.withColumn("q_norm", vecNorm(col("q_vec"))),
      "q_vec", planesLit, numBands, rowsPerBand)
    val db = banded(data.withColumn("d_norm", vecNorm(col("d_vec"))),
      "d_vec", planesLit, numBands, rowsPerBand)
    val cands = qb.join(db, Seq("band", "key"))
      .select(col("q_id"), col("q_vec"), col("q_norm"),
        col("d_id"), col("d_vec"), col("d_norm"))
      .dropDuplicates("q_id", "d_id")
    val scored0 = cands.withColumn("score",
      round(vecDot(col("q_vec"), col("d_vec")) /
        (col("q_norm") * col("d_norm")), 9))
    val scored =
      if (excludeSelf) scored0.filter(col("q_id") =!= col("d_id")) else scored0
    TopK.perGroupAgg(scored, Seq(col("q_id")),
      col("score"), col("d_id"), k, idName = "d_id")
  }

  /** Global top-N most-similar vector pairs (id_a < id_b) — the
    * scale-safe form of embedding-cosine near-dup. Candidates come from
    * a banded equi-join on (band, key) — a hash shuffle on short keys,
    * never an N×N cross join — then exact cosine rerank + bounded global
    * top-N (TakeOrderedAndProject).
    *
    * Input: (id, vec). Output: (id_a, id_b, cos) with the same
    * quantized ordering as the exhaustive oracle (rank on round(cos,9),
    * ties by ids, emit round(cos,6)).
    *
    * The default 24 bands × 2 bits is sized so that candidate recall on
    * the fixtures is exactly 1.0 even at the moderate cosines (~0.44) of
    * random data — per-pair miss probability (1-p²)^24 ≈ 2e-6 at
    * cos 0.44 (p = 1-θ/π) — asserted against the exhaustive formulation
    * in LlmPipelineSpec. At production near-dup thresholds (cos ≥ 0.9)
    * far smaller configs prune far harder; this knob is the
    * recall/candidate-volume dial. */
  def nearDupPairs(vectors: DataFrame, topN: Int,
                   numPlanes: Int = 48, rowsPerBand: Int = 2,
                   seed: Long = 42L, dim: Int = 0): DataFrame = {
    require(numPlanes % rowsPerBand == 0, "numPlanes must divide into bands")
    val numBands = numPlanes / rowsPerBand
    val dimV = dimOf(vectors, "vec", dim)
    val planesLit = typedLit(planes(numPlanes, dimV, seed))
    val base = vectors.withColumn("norm", vecNorm(col("vec")))
    val a = banded(base.select(col("id").as("id_a"), col("vec").as("va"),
      col("norm").as("na")), "va", planesLit, numBands, rowsPerBand)
    val b = banded(base.select(col("id").as("id_b"), col("vec").as("vb"),
      col("norm").as("nb")), "vb", planesLit, numBands, rowsPerBand)
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("va"), col("vb"),
        col("na"), col("nb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos",
        round(vecDot(col("va"), col("vb")) / (col("na") * col("nb")), 9))
      .orderBy(col("cos").desc, col("id_a").asc, col("id_b").asc)
      .limit(topN)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
