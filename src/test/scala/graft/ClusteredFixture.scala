package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic clustered vector fixture — the data regime LSH banding
  * exists for (and the regime real embedding corpora live in: near-dups
  * and semantic clusters, not uniform-random directions). `nClusters`
  * unit centers, `perCluster` points each at relative noise `rho`, so
  * same-cluster cosine ≈ 1/(1+rho²) (~0.92 at rho=0.3) while
  * cross-cluster cosine concentrates near 0. Ids are dense 0..N-1 with
  * cluster = id / perCluster.
  */
object ClusteredFixture {

  def df(spark: SparkSession, nClusters: Int = 20, perCluster: Int = 50,
         dim: Int = 32, rho: Double = 0.3, seed: Long = 7L): DataFrame = {
    val rnd = new Random(seed)
    def gaussian(n: Int): Array[Double] = Array.fill(n)(rnd.nextGaussian())
    val sigma = rho / math.sqrt(dim) // per-dim noise -> total noise norm ~rho
    val rows = (0 until nClusters).flatMap { c =>
      val center0 = gaussian(dim)
      val cn = math.sqrt(center0.map(x => x * x).sum)
      val center = center0.map(_ / cn)
      (0 until perCluster).map { i =>
        val v = center.map(x => (x + sigma * rnd.nextGaussian()).toFloat)
        ((c.toLong * perCluster + i, v))
      }
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }
}
