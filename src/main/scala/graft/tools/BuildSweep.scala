package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{ScaleSmoke, Tables}
import graft.index.{CsrGraph, GraphBuild, ShardedIndex}
import graft.queries.IndexQueries

/** BUILD-side scale sweep — the offline half of the scale evidence. The
  * committed search sweeps (SWEEP_SF1/SF5/SF10) time the ONLINE path at
  * 10–100× data; this tool times INDEX CONSTRUCTION itself across the
  * same deterministic scale ladder, per arm:
  *
  *  - `roar_exact`   — the fixture posture: one broadcast RoarGraph,
  *    exact learn→base kNN lists (O(N²) scoring — the reference's own
  *    offline GT posture, `gen_vector_groundtruth.cpp`). The arm that
  *    must go super-linear: its curve is the baseline the scale arms
  *    are judged against.
  *  - `roar_ivf`     — same graph, kNN lists from the IVF-bucketed
  *    generator (`BuildParams.knnSource="ivf"`): the probe scan reads
  *    ~nProbe/nlist of the pairs — the list-generation posture a large
  *    corpus runs.
  *  - `sharded`      — the past-the-broadcast-ceiling layout
  *    ([[ShardedIndex.buildPersisted]]): shard count grows with the
  *    corpus, per-shard exact kNN is O((N/S)²·S) = O(N²/S), and each
  *    shard build is an independent job — the arm that parallelizes
  *    across a cluster (here sequential per shard, so wall-clock curves
  *    report the WORK, an upper bound on cluster wall-clock).
  *
  * Per row: arm, factor, n, build seconds, mean/max out-degree (the
  * quality tripwire — a scale arm that wins wall-clock by emitting a
  * degenerate graph shows up here, and the search sweeps already gate
  * its recall).
  *
  * Usage: `runMain graft.tools.BuildSweep [srcDir] [factors-csv] [out]`
  * — defaults /root/testdata/sf0.1, "1,2,5,10", SWEEP_BUILD.tsv.
  * Scaled corpora are materialized once under /tmp/graft_buildsweep/<f>
  * via [[ScaleSmoke.scaleTables]] (deterministic, similarity-breaking
  * rotations) and reused across runs.
  *
  * `SPARK_GRAFT_BUILD_ARMS` (csv, default all) restricts the arms —
  * the O(N²) `roar_exact` baseline is priced out past ~50k rows and a
  * 100× point only needs the scale arms. Output MERGES with an
  * existing TSV: re-run rows replace their (arm, factor) key, others
  * survive — so the ladder accretes one expensive point at a time.
  */
object BuildSweep {

  private def degStats(g: CsrGraph): (Double, Int) = {
    var maxd = 0
    var i = 0
    while (i < g.n) {
      val d = g.offsets(i + 1) - g.offsets(i)
      if (d > maxd) maxd = d
      i += 1
    }
    (g.nbrs.length.toDouble / math.max(g.n, 1), maxd)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,2,5,10")
      .split(",").map(_.trim.toInt).toSeq
    val out = args.lift(2).getOrElse("SWEEP_BUILD.tsv")
    val workDir = sys.env.getOrElse("SPARK_GRAFT_BUILD_WORK",
      "/tmp/graft_buildsweep")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup build (base corpus): JIT + codegen + shuffle-path
    // warmup, so the first timed row isn't JVM-cold-start inflated
    GraphBuild.build(spark, Tables.embeddings(spark, srcDir),
      Tables.embeddings(spark, srcDir), IndexQueries.FixtureParams)

    val armOrder = Seq("roar_exact", "roar_ivf", "sharded")
    val arms = sys.env.get("SPARK_GRAFT_BUILD_ARMS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(armOrder.toSet)
    require(arms.subsetOf(armOrder.toSet),
      s"unknown build arm(s) ${arms -- armOrder.toSet}")

    val header = "arm\tfactor\tn\tshards\tbuild_sec\tavg_degree\tmax_degree"
    val rows = new scala.collection.mutable.ArrayBuffer[String]

    factors.foreach { f =>
      val dir =
        if (f == 1) srcDir
        else {
          val d = s"$workDir/x$f"
          if (!Files.exists(Paths.get(d, "embeddings.parquet")))
            ScaleSmoke.scaleTables(spark, srcDir, d, f)
          d
        }
      val e = Tables.embeddings(spark, dir)
      val n = e.count()
      val params = IndexQueries.FixtureParams

      def timed[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }

      // arm: broadcast graph, exact kNN lists (the O(N²) baseline)
      if (arms("roar_exact")) {
        val (idxExact, tExact) = timed(GraphBuild.build(spark, e, e, params))
        val (avgE, maxE) = degStats(idxExact.graph)
        rows += f"roar_exact\t$f\t$n\t1\t$tExact%.1f\t$avgE%.2f\t$maxE"
        println(rows.last)
      }

      // arm: broadcast graph, IVF-bucketed kNN lists (the scale posture
      // for list generation)
      if (arms("roar_ivf")) {
        val (idxIvf, tIvf) = timed(
          GraphBuild.build(spark, e, e, params.copy(knnSource = "ivf")))
        val (avgI, maxI) = degStats(idxIvf.graph)
        rows += f"roar_ivf\t$f\t$n\t1\t$tIvf%.1f\t$avgI%.2f\t$maxI"
        println(rows.last)
      }

      // arm: persisted sharded layout — shard count grows with the
      // corpus (≈5k vectors per shard), per-shard exact kNN
      if (arms("sharded")) {
        val nShards = math.max(2, math.ceil(n / 5000.0).toInt)
        val shardPath = Files.createTempDirectory("graft_buildsweep_sh_")
        val (_, tSh) = timed(ShardedIndex.buildPersisted(
          spark, e, params, nShards, shardPath.toString))
        rows += f"sharded\t$f\t$n\t$nShards\t$tSh%.1f\t-\t-"
        println(rows.last)
      }
    }

    // merge with an existing ladder: new rows replace their
    // (arm, factor) key, untouched rows survive; order = factor-major
    // then the arm order above (the committed TSV's historical shape)
    def key(line: String): (String, Int) = {
      val c = line.split("\t"); (c(0), c(1).toInt)
    }
    val existing =
      if (Files.exists(Paths.get(out)))
        scala.io.Source.fromFile(out).getLines().drop(1)
          .filter(_.nonEmpty).toSeq
      else Seq.empty
    val fresh = rows.map(r => key(r) -> r).toMap
    val merged = (existing.filterNot(l => fresh.contains(key(l))) ++ rows)
      .sortBy { l => val (a, f) = key(l); (f, armOrder.indexOf(a)) }
    Files.write(Paths.get(out),
      ((header +: merged).mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"wrote $out (${merged.size} rows)")
    spark.stop()
  }
}
