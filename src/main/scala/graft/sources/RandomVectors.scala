package graft.sources

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S14 — seeded random-vector source (`GenerateRandomVectorsAndStore`,
  * `/root/reference/src/utility_methods.cpp:104-154`: Gaussian rows,
  * L2-normalized). Determinism is PER-ROW (seed ⊕ id), so output is
  * identical under any partitioning / parallelism — unlike a naive
  * per-partition RNG. */
object RandomVectors {

  /** `gen_rand_ids` parity (`/root/reference/tests/gen_rand_ids.cpp`):
    * a seeded sample of distinct ids from [0, maxId) — the input of the
    * vector-set splitter (S16). Per-draw determinism like [[df]]. */
  def randomIds(spark: SparkSession, n: Int, maxId: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rnd = new Random(seed)
    val picked = scala.collection.mutable.LinkedHashSet.empty[Long]
    while (picked.size < math.min(n.toLong, maxId)) picked += math.abs(rnd.nextLong()) % maxId
    picked.toSeq.toDF("id")
  }

  def df(spark: SparkSession, n: Long, dim: Int, seed: Long = 42L,
         normalize: Boolean = true): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val rnd = new Random(seed ^ (id * 0x9e3779b97f4a7c15L))
        val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
        if (normalize) {
          var s = 0.0f
          v.foreach(x => s += x * x)
          val inv = if (s > 0) (1.0 / math.sqrt(s.toDouble)).toFloat else 0.0f
          var i = 0
          while (i < dim) { v(i) *= inv; i += 1 }
        }
        (id, v.toSeq)
      }
    }.toDF("vec_id", "embedding")
  }
}
