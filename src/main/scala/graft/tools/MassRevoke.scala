package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.index.{BuildParams, ShardedIndex}
import graft.queries.IndexQueries
import graft.sources.Sinks

/** Wall-clock cost of a MASS-REVOCATION generation flip — the
  * 30%-of-corpus takedown wave that breaks the bounded-mask contract
  * the driver-array sidecar writer assumes. GenerationSpec pins the
  * two writers byte-identical at fixture scale; this prices them at
  * 100×: the same build + 30% deleteVersioned + compactVersioned
  * lifecycle, once with the erasure set riding the driver
  * (`spark.graft.ann.deadSidecar.maxDriverIds` above the set size)
  * and once through the distributive join writer (threshold 1). The
  * interesting outputs: the distributive flip costs about the same
  * wall clock (the rebuild dominates; the sidecar writes are a few
  * small jobs either way) while the driver path's peak driver
  * footprint scales with the revocation and the distributive path's
  * does not — at a real 100 TB wave (billions of ids) only the
  * distributive path completes at all.
  *
  * Usage: `runMain graft.tools.MassRevoke [sfDir] [nShards] [frac]
  * [outDir] [params]` — defaults /tmp/graft_sf10, 20, 0.3,
  * stdout-only, `fixture`. Committed artifact: SWEEP_REVOKE.tsv.
  */
object MassRevoke {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val nShards = args.lift(1).map(_.toInt).getOrElse(20)
    val frac = args.lift(2).map(_.toDouble).getOrElse(0.3)
    val outDir = args.lift(3).filter(_.nonEmpty)
    val params = args.lift(4).getOrElse("fixture") match {
      case "ref" => IndexQueries.FixtureParams.copy(
        mSq = 100, mPjbp = 35, lPjpq = 100)
      case _ => IndexQueries.FixtureParams
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graft.index.residentShards", nShards.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = run(spark, sfDir, nShards, frac, params)
    println("mode\trows\tdeleted\tcompact_sec")
    rows.foreach { case (m, n, d, sec) =>
      println(f"$m\t$n\t$d\t$sec%.1f") }
    outDir.foreach { dir =>
      import spark.implicits._
      Sinks.writeTsv(rows.toDF("mode", "rows", "deleted", "compact_sec"),
        dir)
    }
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, nShards: Int, frac: Double,
          params: BuildParams): Seq[(String, Long, Long, Double)] = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val every = math.max(1L, math.round(1.0 / frac))
    def lifecycle(mode: String): (String, Long, Long, Double, String) = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_revoke_$mode").toString
      ShardedIndex.buildVersioned(spark, emb, params, nShards, root)
      val wave = spark.range(0, n).filter(col("id") % every === 0)
        .select(col("id").as("gid"))
      val deleted = ShardedIndex.deleteVersioned(spark, root, wave)
      val t0 = System.nanoTime()
      val ref = ShardedIndex.compactVersioned(spark, root, params)
      val sec = (System.nanoTime() - t0) / 1e9
      (mode, n, deleted, sec, ref.path)
    }
    spark.conf.set("spark.graft.ann.deadSidecar.maxDriverIds",
      (n * 2).toString) // force the driver-array writer
    val drv = lifecycle("driver")
    spark.conf.set("spark.graft.ann.deadSidecar.maxDriverIds", "1")
    val dist = lifecycle("distributive")
    spark.conf.unset("spark.graft.ann.deadSidecar.maxDriverIds")
    // the two writers must agree sidecar-for-sidecar (the fixture-scale
    // GenerationSpec property, re-asserted at this scale)
    (0 until nShards).foreach { s =>
      def deadSet(p: String): Set[Long] =
        spark.read.parquet(s"$p/shard$s/dead")
          .select(col("vec_id")).as[Long].collect().toSet
      require(deadSet(drv._5) == deadSet(dist._5),
        s"sidecar divergence between writers on shard $s")
    }
    Seq(drv, dist).map { case (m, nn, d, sec, _) => (m, nn, d, sec) }
  }
}
