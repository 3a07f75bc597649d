package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale smoke — the cheap tripwire for super-linear plan regressions
  * (the r3 LSH degeneration would have shown up here a round early): scale
  * the sf0.1 fixtures by `factor` (default 10× ≈ "sf1"), run every bench
  * query ONCE, and assert nothing exceeds ~10× its recorded sf0.1 time.
  *
  * Replication is deterministic and SIMILARITY-BREAKING, so data volume
  * scales linearly without manufacturing quadratic duplicate blowups that
  * would measure the replication trick instead of the plans:
  *  - embeddings: replica r rotates each vector by r coordinates (distinct
  *    directions, same norm/dim; uniform-random corpora stay uniform);
  *  - documents: replica r Caesar-shifts the letters by r (disjoint
  *    shingle/ngram/minhash spaces per replica, length preserved);
  *  - events: user/event id spaces shifted per replica (10× users, same
  *    per-user density);
  *  - orders+lineitem: order-key space shifted together (joins intact);
  *  - dims (region/nation/customer/supplier/part): copied once — the
  *    fact:dim ratio grows like a real SF bump.
  *
  * Per-query budget: factor^exp × max(base, 0.3s) — the 0.3s floor keeps
  * fixed-overhead-dominated sub-second queries from tripping on noise,
  * and exp is 1.0 except for queries whose documented growth law is
  * super-linear ([[ScaleSmoke.BudgetExponent]]: the semdedup pair's
  * balanced-IVF N^1.5 gets factor^1.5).
  * Exemption (documented super-linear SEMANTICS, not a plan defect):
  * dedup_embedding_cosine is an exact all-pairs top-N — compute is O(N²)
  * by definition (its scale path is the thresholded LSH twin).
  * semdedup / semdedup_text run UNEXEMPT since round 12: they register
  * [[graft.operators.SemDedup.markSeededAuto]] (nlist ≈ √N, the classic
  * IVF N^1.5 balance — the DuckDB oracles compute the same nlist from
  * the same count), so the production parameterization is both
  * hash-checked and inside the tripwire.
  *
  * Usage: `runMain graft.ScaleSmoke [srcDir] [factor] [workDir]`;
  * reads BENCH_LOCAL.json (env SPARK_GRAFT_BASE_BENCH overrides), writes
  * BENCH_SF1_SMOKE.json (env SPARK_GRAFT_SMOKE_OUT), exits 1 on any
  * violation.
  */
/** Standalone fixture scaler: `runMain graft.ScaleFixtures [srcDir]
  * [factor] [dstDir]` writes the [[ScaleSmoke.scaleTables]] replicated
  * tables and exits — the sf1 sweep ([[Sweep]]) and any ad-hoc scale
  * experiment share one deterministic corpus without re-running the
  * whole smoke. */
object ScaleFixtures {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val dstDir = args.lift(2).getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleSmoke.scaleTables(spark, srcDir, dstDir, factor)
    println(s"scaled $srcDir x$factor -> $dstDir")
    spark.stop()
  }
}

object ScaleSmoke {

  /** No exemptions. The one query whose COMPUTE is super-linear by
    * definition (dedup_embedding_cosine — exact all-pairs top-N; its
    * scale path is the thresholded-LSH twin) runs at scale as a
    * FIXED-SIZE SLICE instead of being skipped: the same blocked
    * kernel over the first `baseRows` ids of the scaled corpus
    * (replica 0 = the base corpus verbatim, and the vec_id bound is
    * pushed to the parquet scan). Constant work → its honest growth
    * exponent is 0; the smoke then still gates ITS ratio, so a plan
    * regression in the kernel (or a scan that stops pruning and reads
    * all 10× replicas) trips the wire the old `Exempt` entry let
    * through. */
  private val Exempt = Set.empty[String]

  /** Queries replaced by a capped-slice form at scale (see above). */
  private[graft] val CappedSlice = Set("dedup_embedding_cosine")

  private[graft] def cappedQuery(name: String, spark: SparkSession,
                                 workDir: String, baseRows: Long)
      : org.apache.spark.sql.DataFrame = name match {
    case "dedup_embedding_cosine" =>
      val e = Tables.embeddings(spark, workDir)
        .filter(col("vec_id") < baseRows)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.operators.PairKernel.globalTopPairs(spark, e, topN = 20)
    case other => sys.error(s"no capped-slice form for $other")
  }

  /** Documented super-linear queries get a budget that matches their
    * OWN growth law instead of the uniform linear bound: the semdedup
    * pair runs the balanced-IVF parameterization (nlist ≈ √N → N^1.5
    * total work), so at scale factor F its honest budget is F^1.5 ×
    * base. At the default F=10 the fixed overheads still dominate and
    * both pass the linear bound today — but the linear bound would
    * start flaking exactly when the N^1.5 term takes over (bigger
    * factors or bigger bases), turning a documented growth law into a
    * false alarm. Queries not listed here scale with exponent 1.0. */
  private val BudgetExponent = Map(
    "semdedup" -> 1.5,
    "semdedup_text" -> 1.5,
    // capped slice: work is CONSTANT in the factor (the slice is the
    // base corpus), so the honest exponent is 0; 0.5 grants the same
    // ~3× fixed-overhead headroom the linear queries get from their
    // unused factor margin without re-admitting super-linear growth
    "dedup_embedding_cosine" -> 0.5)

  /** Letters shifted by `r` within each case; digits/punct unchanged. */
  private def caesar(c: Column, r: Int): Column = {
    val lo = "abcdefghijklmnopqrstuvwxyz"
    val hi = lo.toUpperCase
    def rot(s: String) = s.drop(r % 26) + s.take(r % 26)
    translate(c, lo + hi, rot(lo) + rot(hi))
  }

  /** The documents table alone, replicated `factor`× with the
    * similarity-breaking Caesar shift (replica r shifts letters by r —
    * disjoint shingle/term spaces per replica, length preserved).
    * Extracted from [[scaleTables]] so text-face scale tools
    * ([[graft.tools.HybridServeCompact]]) can scale JUST the corpus
    * they read instead of paying for all nine tables. */
  def scaleDocuments(spark: SparkSession, src: String, dst: String,
                     factor: Int): Unit = {
    val doc = Tables.documents(spark, src)
    val nDoc = doc.count()
    (0 until factor).map { r =>
      doc.select((col("doc_id") + lit(r * nDoc)).as("doc_id"),
        caesar(col("text"), r).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
  }

  def scaleTables(spark: SparkSession, src: String, dst: String,
                  factor: Int): Unit = {
    def out(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
    def reps(f: Int => DataFrame): DataFrame =
      (0 until factor).map(f).reduce(_ unionByName _)

    val emb = Tables.embeddings(spark, src)
    val nEmb = emb.count()
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    // replica r: rotate by r mod dim; NEGATE on the second wrap (r >=
    // dim) so factors past the dimensionality stay direction-distinct
    // (cos(x, -rot(x)) = -cos(x, rot(x))) — a factor-100 sweep at dim
    // 64 would otherwise ask slice() for a negative length (and a bare
    // r%dim wrap would mint exact duplicate vectors)
    require(factor <= 2 * dim,
      s"scaleTables supports at most ${2 * dim} direction-distinct " +
        s"replicas at dim $dim (rotations + negated rotations); got $factor")
    out("embeddings", reps { r =>
      val rr = r % dim
      val rot = if (rr == 0) col("embedding")
        else concat(slice(col("embedding"), rr + 1, dim - rr),
          slice(col("embedding"), 1, rr))
      val rep = if ((r / dim) % 2 == 1)
        transform(rot, x => (-x).cast("float")) else rot
      emb.select((col("vec_id") + lit(r * nEmb)).as("vec_id"),
        rep.as("embedding"), col("label"))
    })

    scaleDocuments(spark, src, dst, factor)

    // raw read keeps ts as INT64 nanos (Tables.events' legacy conf), so
    // the scaled copy round-trips through the same loader
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = Tables.load(spark, src, "events")
    val Array(nEvent, maxUser) = ev
      .select(count(lit(1)), max(col("user_id")) + 1).first()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    out("events", reps { r =>
      ev.select((col("event_id") + lit(r * nEvent)).as("event_id"),
        col("ts"), (col("user_id") + lit(r * maxUser)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    })

    val ord = Tables.orders(spark, src)
    val li = Tables.lineitem(spark, src)
    val okSpan = ord.select(max(col("o_orderkey")) + 1).first().getLong(0)
    out("orders", reps { r =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(r * okSpan)) })
    out("lineitem", reps { r =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(r * okSpan)) })

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => out(t, Tables.load(spark, src, t)))
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val workDir = args.lift(2).getOrElse("/tmp/graft_sf1")
    val basePath = sys.env.getOrElse("SPARK_GRAFT_BASE_BENCH", "BENCH_LOCAL.json")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SMOKE_OUT", "BENCH_SF1_SMOKE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // serving posture, same as Bench: resident cache sized to the
      // fixture shard count so repeated sharded searches amortize loads
      .config("spark.graft.index.residentShards", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    scaleTables(spark, srcDir, workDir, factor)

    // same untimed warmup as Bench: one-time index builds + JIT
    for (w <- Seq("q1_agg", "g2_graph_stats", "g9_sharded")) {
      try Bench.force(SparkEntry.queries(w)(spark, workDir))
      catch { case t: Throwable =>
        System.err.println(s"WARMUP FAIL $w: ${t.getClass.getName}: ${t.getMessage}")
      }
    }
    Bench.dropLeakedBlocks(spark)

    val base: Map[String, Double] = {
      val row = spark.read.json(basePath).select("queries.*").head()
      row.schema.fieldNames.zipWithIndex
        .map { case (n, i) => n -> row.getDouble(i) }.toMap
    }

    // min-of-2 as ROUND-ROBIN passes, like Bench: a single timing is
    // hostage to one-off JIT/GC/load spikes, and adjacent reps of one
    // query share any SUSTAINED spike — separating the reps by a full
    // pass over the query list is what lets the min decorrelate them
    val names = SparkEntry.queries.keys.toIndexedSeq
    // base-corpus row count for the capped-slice queries (footer-cheap)
    val baseRows = Tables.embeddings(spark, srcDir).count()
    def queryOf(name: String) =
      if (CappedSlice(name)) cappedQuery(name, spark, workDir, baseRows)
      else SparkEntry.queries(name)(spark, workDir)
    val raw = collection.mutable.Map.empty[String, Vector[(Double, Boolean)]]
    for (_ <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      val ok =
        try { Bench.force(queryOf(name)); true }
        catch { case t: Throwable =>
          System.err.println(s"QUERY FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
          false
        }
      val rec = (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
      raw(name) = raw.getOrElse(name, Vector.empty) :+ rec
      Bench.dropLeakedBlocks(spark) // see Bench: leaked checkpoint blocks
    }
    val results = names.map { name =>
      val rs = raw(name)
      val ok = rs.forall(_._2)
      name -> (if (ok) rs.map(_._1).min else -1.0, ok)
    }

    // budget = factor^exponent × max(base, 0.3): linear queries get the
    // plain factor bound; documented super-linear queries (BudgetExponent)
    // get their own growth law, so the tripwire tests the PLAN, not the
    // declared complexity class
    def limitOf(name: String, b: Double): Double =
      math.pow(factor, BudgetExponent.getOrElse(name, 1.0)) * math.max(b, 0.3)
    val violations = results.collect {
      case (name, (sec, true))
        if !Exempt(name) && base.get(name).exists(b => sec > limitOf(name, b)) =>
        name
    }.toSeq
    val failed = results.collect { case (n, (_, false)) => n }.toSeq

    def fmt(d: Double) = f"$d%.3f"
    val qs = results.map { case (k, (sec, _)) => "\"" + k + "\":" + fmt(sec) }
      .mkString("{", ",", "}")
    val ratios = results.collect { case (k, (sec, true)) if base.contains(k) =>
      "\"" + k + "\":" + fmt(sec / math.max(base(k), 0.3))
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, (sec, true)) => sec }.sum
    // the same control basket Bench emits: the controls' median of
    // (scaled-run time / sf0.1 floor) — the SAME denominator as
    // ratio_vs_floor, so the two fields and Bench's same-named field
    // are directly comparable. Empirically the controls run ~1x their
    // sf0.1 floors even at factor 10 (scan-light, fixed-overhead-
    // dominated: the committed smoke read 0.89-1.58), so ~1 means the
    // machine window matches the floors; a smoke VIOLATION is
    // dispositioned machine when the basket moved with it. Dividing by
    // factor here (as before r18) assumed linear control scaling that
    // the data refutes, and made the field incomparable with everything
    // it sits beside.
    val resMap = results.toMap
    val ctrl = Bench.ControlQueries.flatMap { c =>
      for {
        (sec, ok) <- resMap.get(c) if ok && sec > 0
        fl <- base.get(c) if fl > 0
      } yield c -> sec / math.max(fl, 0.3)
    }
    val ctrlJson = ctrl.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val ctrlMed = fmt(if (ctrl.isEmpty) -1.0 else Bench.median(ctrl.map(_._2)))
    val json =
      s"""{"metric":"sf1_smoke","factor":$factor,"value":${fmt(total)},"unit":"sec","ctrl_ratio_vs_floor":$ctrlMed,"ctrl_ratios":$ctrlJson,"queries":$qs,"ratio_vs_floor":$ratios,"violations":${violations.map("\"" + _ + "\"").mkString("[", ",", "]")},"failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"exempt":${Exempt.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},"capped_slice":${CappedSlice.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},"base":"$basePath","src":"$srcDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
    if (violations.nonEmpty || failed.nonEmpty) {
      System.err.println(s"SCALE SMOKE FAILED: violations=$violations failed=$failed")
      sys.exit(1)
    }
  }
}
