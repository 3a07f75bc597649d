package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash-LSH candidate-pair generation, extracted from the
  * `dedup_minhash_pairs` query so the hot-band skew behavior is testable
  * on synthetic fixtures. Semantics are EXACTLY the oracle-checked
  * query's (split-hash md5 signatures, lexicographic min, banded md5
  * keys, self-equi-join on (band, key)) — do not change the arithmetic
  * without re-certifying the DuckDB hash compare.
  *
  * Skew posture: the shuffle key is the band hash, so the one pathology
  * is a HOT BUCKET — thousands of near-identical docs sharing a band
  * signature land on one reducer, which then emits O(bucket²) pairs.
  * Salting cannot fix a self-join (a salted copy would miss same-key
  * pairs across salt groups); the correct lever is AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.*`), which splits the oversized join
  * partition and replicates the matching side — LlmPipelineSpec asserts
  * the split actually engages on a hot-band fixture. Past that, bucket
  * caps (drop buckets over a size bound, documented recall loss) are the
  * production escape hatch.
  */
object MinHashLsh {

  /** Candidate pairs from shingle hashes `sh` (doc_id, h = md5 hex of the
    * shingle). Output: (doc_a, doc_b, n_shared_bands), doc_a < doc_b. */
  def bandedPairs(sh: DataFrame, numHashes: Int = 8,
                  rowsPerBand: Int = 2): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    val sigs = (1 to numHashes).map(r =>
      min(substring(col("h"), (r - 1) * 4 + 1, 4)).as(s"sig$r"))
    val signed = sh.groupBy("doc_id").agg(sigs.head, sigs.tail: _*)
    val bandCols = (0 until numBands).map { b =>
      val parts = (1 to rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("key")).as(s"b$b")
    }
    val banded = signed.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"),
        explode(array((0 until numBands).map(b => col(s"b$b")): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }
}
