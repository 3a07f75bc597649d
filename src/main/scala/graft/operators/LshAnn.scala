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

  /** Add (id-col untouched) an exploded (band int, key long) pair per
    * row. The signature is ONE fused codegen loop
    * ([[graft.functions.expressions.VecLshBandKeysExpr]]) — plane dots,
    * sign bits, and per-band key packing with zero per-plane allocation;
    * the packed long keys also keep the band equi-join's shuffle keys
    * fixed-width. */
  private def banded(df: DataFrame, vecCol: String, planesFlat: Array[Double],
                     rowsPerBand: Int): DataFrame =
    df.select(col("*"),
      posexplode(vecLshBands(col(vecCol), planesFlat, rowsPerBand))
        .as(Seq("band", "key")))

  /** Deduplicated candidate ID PAIRS for a query→data LSH probe —
    * exposed so tests can assert the measured candidate VOLUME stays
    * ≪ |Q|·|D| (the guard against a regression to an effective cross
    * join). Output: (q_id, d_id), one row per colliding pair across any
    * band.
    *
    * Ids only, deliberately: the banded explode duplicates every row
    * once per band, so carrying vectors here would push numBands copies
    * of each vector (plus two vectors per surviving candidate) through
    * the band shuffle and the dedup exchange. Pairs are two longs; the
    * scoring callers join the vectors back exactly once per side. */
  def candidates(queries: DataFrame, data: DataFrame,
                 numPlanes: Int, rowsPerBand: Int,
                 seed: Long = 42L, dim: Int = 0): DataFrame = {
    require(numPlanes % rowsPerBand == 0, "numPlanes must divide into bands")
    require(rowsPerBand >= 8,
      s"rowsPerBand=$rowsPerBand gives a ${1 << rowsPerBand}-key band space; " +
        "< 8 bits degenerates toward an all-pairs join (candidate volume " +
        "~bands/2^bits of |Q|x|D| per band)")
    val dimV = dimOf(queries, "q_vec", dim)
    val planesFlat = planes(numPlanes, dimV, seed).flatten.toArray
    candidatesWithPlanes(queries, data, planesFlat, rowsPerBand)
  }

  /** Candidate pairs for an EXPLICIT plane matrix (flattened row-major)
    * — the shared tail of the Gaussian and corpus-seeded paths. */
  private def candidatesWithPlanes(queries: DataFrame, data: DataFrame,
                                   planesFlat: Array[Double],
                                   rowsPerBand: Int): DataFrame = {
    val qb = banded(queries, "q_vec", planesFlat, rowsPerBand)
      .select(col("band"), col("key"), col("q_id"))
    val db = banded(data, "d_vec", planesFlat, rowsPerBand)
      .select(col("band"), col("key"), col("d_id"))
    qb.join(db, Seq("band", "key"))
      .select(col("q_id"), col("d_id"))
      .dropDuplicates("q_id", "d_id")
  }

  /** Corpus-SEEDED hyperplanes: the `numPlanes` corpus vectors of
    * smallest (md5(id), id) rank, flattened row-major — the same
    * training-free seeding trick as [[IvfAnn.knnSeeded]], and for the
    * same reason: a deterministic, ORACLE-EXPRESSIBLE plane matrix
    * (DuckDB re-derives it from the same table with the same md5
    * ranking), where the Gaussian planes of [[planes]] are reproducible
    * in the JVM only. Bounded collect: numPlanes × dim doubles. */
  def seededPlanesFlat(data: DataFrame, idCol: String, vecCol: String,
                       numPlanes: Int): Array[Double] = {
    val rows = data
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        md5(col(idCol).cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("id")).limit(numPlanes)
      .select(col("v")).collect()
    require(rows.length == numPlanes,
      s"seeded planes: corpus has only ${rows.length} rows, need $numPlanes")
    rows.flatMap(_.getSeq[Float](0).map(_.toDouble))
  }

  /** Oracle-checkable LSH kNN twin: same banding/scoring machinery as
    * [[knn]] but over corpus-seeded planes, so the ENTIRE pipeline
    * (plane pick → sign-bit band keys → bucket equi-join → exact cosine
    * rerank → top-k) is deterministic double arithmetic DuckDB can
    * hash-check (query `knn_lsh_seeded`). [[knn]] keeps the Gaussian
    * planes (better-conditioned buckets) as the production path. */
  def knnSeeded(queries: DataFrame, data: DataFrame, k: Int,
                numPlanes: Int = 64, rowsPerBand: Int = 8,
                excludeSelf: Boolean = false): DataFrame = {
    val planesFlat = seededPlanesFlat(data, "d_id", "d_vec", numPlanes)
    val cands = candidatesWithPlanes(queries, data, planesFlat, rowsPerBand)
    val scored0 = scorePairs(cands, queries, data)
    val scored =
      if (excludeSelf) scored0.filter(col("q_id") =!= col("d_id")) else scored0
    TopK.perGroupAgg(scored, Seq(col("q_id")),
      col("score"), col("d_id"), k, idName = "d_id")
  }

  /** Exact cosine on candidate pairs: vectors joined back once per side,
    * scored with the oracle arithmetic. No broadcast hint on either side:
    * the query side is small in the interactive knn shape but is the FULL
    * training corpus when GraphBuild(knnSource="lsh") feeds the build, so
    * a forced broadcast would hit the driver/8 GB ceiling exactly where
    * the operator is supposed to scale — AQE picks broadcast-hash on its
    * own whenever the runtime size is actually under the threshold. */
  private def scorePairs(pairs: DataFrame, queries: DataFrame,
                         data: DataFrame): DataFrame =
    pairs
      .join(data.select(col("d_id"), col("d_vec"),
        vecNorm(col("d_vec")).as("d_norm")), Seq("d_id"))
      .join(queries.select(col("q_id"), col("q_vec"),
        vecNorm(col("q_vec")).as("q_norm")), Seq("q_id"))
      .withColumn("score",
        round(vecDot(col("q_vec"), col("d_vec")) /
          (col("q_norm") * col("d_norm")), 9))

  /** Approximate top-k cosine neighbors from `queries` (q_id, q_vec) to
    * `data` (d_id, d_vec). Output: (q_id, rank, d_id, score), scores
    * 9-decimal-quantized like the exact path.
    *
    * Default banding: 16 bands × 8 bits (256-key band space) — honest
    * LSH that prunes. Per-band collision p^8 (p = 1-θ/π), so recall
    * concentrates on genuinely-near neighbors (cos ≥ ~0.8) while the
    * uncorrelated bulk collides at ≈16·(1/2)^8 ≈ 6% — the recall ≥0.9 +
    * candidate-volume <20% gates in LlmPipelineSpec run on a clustered
    * fixture, the data regime LSH exists for. (On a uniform-random corpus
    * no sign-LSH parameterization is simultaneously selective and
    * high-recall: the neighbor/bulk angle gap is too thin. The exact
    * paths — KnnJoin/KnnKernel/PairKernel — are the right tool there.) */
  def knn(queries: DataFrame, data: DataFrame, k: Int,
          numPlanes: Int = 128, rowsPerBand: Int = 8,
          seed: Long = 42L, excludeSelf: Boolean = false,
          dim: Int = 0): DataFrame = {
    val cands = candidates(queries, data, numPlanes, rowsPerBand, seed, dim)
    val scored0 = scorePairs(cands, queries, data)
    val scored =
      if (excludeSelf) scored0.filter(col("q_id") =!= col("d_id")) else scored0
    TopK.perGroupAgg(scored, Seq(col("q_id")),
      col("score"), col("d_id"), k, idName = "d_id")
  }

  /** Thresholded near-dup pairs — ALL pairs with cosine ≥ `tau`
    * (id_a < id_b), the 100 TB-shaped embedding near-dup primitive:
    * candidates come from a banded equi-join on (band, key) — a hash
    * shuffle on short keys, never an N×N cross join — and only bucket
    * collisions are rerank-scored. Contrast [[PairKernel.globalTopPairs]],
    * which answers the EXACT global-top-N question by scanning all pairs.
    *
    * Input: (id, vec). Output: (id_a, id_b, cos) with cos ≥ tau, cos
    * rounded to 6 decimals. UNORDERED by contract: the result is a pair
    * SET, and a global sort inside the operator would range-partition the
    * full result for every caller, whether or not downstream needs order.
    * Presentation ordering ((cos desc, ids asc)) belongs at the sink or
    * query boundary — e.g. the dedup_embedding_threshold query orders its
    * (output-sized) result before dumping.
    *
    * Banding AUTO-SCALES with corpus size by default (rowsPerBand = 0):
    * fixed band bits make the uncorrelated-bulk candidate volume grow
    * ~n²/2^bits per band — fine at one scale, quadratic at the next (the
    * sf1 scale smoke trips on it at 10× with 12 fixed bits). Auto mode
    * sets bits = max(12, ⌈log₂ n⌉ + 2), so bulk volume per band stays
    * ≈ n²/4n = n/4 (linear), and sizes the band count to hold ≥0.98
    * expected recall for cos ≥ 0.95 near-dups (collision p = 1 − θ/π per
    * plane): bands = ⌈ln(0.02)/ln(1 − p^bits)⌉. At the test fixture
    * (n≈1000) this lands on the proven 12-bit/12-band regime; at 100k it
    * moves to ~19 bits × 28 bands. Explicit rowsPerBand/numPlanes
    * override auto for callers pinning a regime.
    *
    * `nRows`: caller-supplied row-count hint for auto-banding. Auto mode
    * only needs the corpus size to pick band bits, and most callers (the
    * dedup query, any pipeline that just counted its corpus) already know
    * it — without the hint the operator pays one extra full corpus scan
    * per invocation just to size the bands. Unset (≤0) falls back to
    * `count()`. */
  def thresholdPairs(vectors: DataFrame, tau: Double,
                     numPlanes: Int = 0, rowsPerBand: Int = 0,
                     seed: Long = 42L, dim: Int = 0,
                     nRows: Long = -1L): DataFrame = {
    val q = vectors.select(col("id").as("q_id"), col("vec").as("q_vec"))
    val d = vectors.select(col("id").as("d_id"), col("vec").as("d_vec"))
    val (planesN, bitsN) =
      if (rowsPerBand > 0) {
        (if (numPlanes > 0) numPlanes else 16 * rowsPerBand, rowsPerBand)
      } else {
        val n = (if (nRows > 0) nRows else vectors.count()).toDouble.max(2)
        val bits = math.max(12,
          math.ceil(math.log(n) / math.log(2)).toInt + 2)
        val p = 1.0 - math.acos(0.95) / math.Pi
        val bands = math.ceil(
          math.log(0.02) / math.log(1.0 - math.pow(p, bits))).toInt.max(8)
        (bands * bits, bits)
      }
    val withNorm = vectors.select(col("id"), col("vec"),
      vecNorm(col("vec")).as("norm"))
    // self-join: both vector join-backs hit the same (possibly huge)
    // corpus, so neither side is broadcast here — two hash joins on id
    candidates(q, d, planesN, bitsN, seed, dim)
      .filter(col("q_id") < col("d_id"))
      .join(withNorm.select(col("id").as("q_id"), col("vec").as("q_vec"),
        col("norm").as("q_norm")), Seq("q_id"))
      .join(withNorm.select(col("id").as("d_id"), col("vec").as("d_vec"),
        col("norm").as("d_norm")), Seq("d_id"))
      .withColumn("cos",
        round(vecDot(col("q_vec"), col("d_vec")) /
          (col("q_norm") * col("d_norm")), 9))
      .filter(col("cos") >= tau)
      .select(col("q_id").as("id_a"), col("d_id").as("id_b"),
        round(col("cos"), 6).as("cos"))
  }

  /** Oracle-checkable thresholded-near-dup twin of [[thresholdPairs]]:
    * corpus-seeded planes and a PINNED banding regime (the auto-banding
    * formula depends on the runtime row count, which a static oracle SQL
    * cannot follow), so candidate generation + threshold rerank are
    * hash-checked end-to-end in DuckDB (query
    * `dedup_embedding_threshold_seeded`). Production path remains
    * [[thresholdPairs]] (auto-scaled Gaussian banding, recall+volume
    * gates): a PINNED regime's bulk-collision volume grows ~n²/2^bits —
    * measured 6.4× at the 10× sf1 smoke (vs 2.3× for the auto-banded
    * production query) — so this twin is the ORACLE arm at fixture
    * scales, not a scale path. Output contract identical: unordered
    * (id_a, id_b, cos ≥ tau) pair set, cos 6-decimal. */
  def thresholdPairsSeeded(vectors: DataFrame, tau: Double,
                           numPlanes: Int = 144,
                           rowsPerBand: Int = 12): DataFrame = {
    val planesFlat = seededPlanesFlat(vectors, "id", "vec", numPlanes)
    val q = vectors.select(col("id").as("q_id"), col("vec").as("q_vec"))
    val d = vectors.select(col("id").as("d_id"), col("vec").as("d_vec"))
    val withNorm = vectors.select(col("id"), col("vec"),
      vecNorm(col("vec")).as("norm"))
    candidatesWithPlanes(q, d, planesFlat, rowsPerBand)
      .filter(col("q_id") < col("d_id"))
      .join(withNorm.select(col("id").as("q_id"), col("vec").as("q_vec"),
        col("norm").as("q_norm")), Seq("q_id"))
      .join(withNorm.select(col("id").as("d_id"), col("vec").as("d_vec"),
        col("norm").as("d_norm")), Seq("d_id"))
      .withColumn("cos",
        round(vecDot(col("q_vec"), col("d_vec")) /
          (col("q_norm") * col("d_norm")), 9))
      .filter(col("cos") >= tau)
      .select(col("q_id").as("id_a"), col("d_id").as("id_b"),
        round(col("cos"), 6).as("cos"))
  }
}
