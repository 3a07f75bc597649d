package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector kernels over `array<float>` columns.
  *
  * Re-expresses the reference's SIMD distance kernels
  * (`/root/reference/include/efanna2e/distance.h:21-225` — AVX-512 L2 /
  * inner-product) as Catalyst higher-order functions (`zip_with` +
  * `aggregate`), which stay inside whole-stage codegen and double as the
  * DuckDB-checkable SQL spec. Accumulation is float32→float64 promoted,
  * sequential left-fold over array order, so results are deterministic
  * regardless of parallelism.
  *
  * Sign convention: the reference negates inner product so that
  * "smaller = closer" everywhere (`distance.h:222`). This engine uses
  * SIMILARITY (higher = better) everywhere instead; adapters at fixture
  * boundaries negate where binary parity matters.
  */
object VectorFunctions {

  /** ⟨a,b⟩ accumulated in double. distance.h:91-225 (un-negated). */
  def vecDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Σ (a_i − b_i)² — squared L2. distance.h:21-89. */
  def vecL2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** Σ a_i² (squared norm; the FastL2 norm cache, distance.h:226-321). */
  def vecNormSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** ‖a‖₂ */
  def vecNorm(a: Column): Column = sqrt(vecNormSq(a))

  /** cosine(a, b) = ⟨a,b⟩ / (‖a‖‖b‖). The reference gets cosine by
    * L2-normalizing at load then taking IP (`index_bipartite.cpp:37-39`);
    * this form works on un-normalized input. */
  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** L2-normalize (util.h:214-229). NOTE: inline use recomputes the norm
    * per element under Catalyst — for hot paths materialize the norm in a
    * separate column first (see [[vecScale]]), or use the codegen
    * expression in graft.functions.expressions. */
  def vecNormalize(a: Column): Column = vecScale(a, vecNorm(a))

  /** a / s with float output, keeping `array<float>` type stable. */
  def vecScale(a: Column, s: Column): Column =
    transform(a, x => (x.cast("double") / s.cast("double")).cast("float"))

  /** Element-wise mean of an array column across rows — the centroid used
    * for the entry-point medoid (`index_bipartite.cpp:2007-2018`).
    * Aggregate: sums each position in double then divides by count. */
  def vecMeanAgg(a: Column, dim: Int): Column = {
    val sums = (0 until dim).map(i => sum(element_at(a, i + 1).cast("double")))
    val n = count(lit(1))
    array(sums.map(s => (s / n)): _*)
  }
}
