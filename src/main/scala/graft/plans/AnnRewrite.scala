package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Descending, ExprId, Expression, LessThan, LessThanOrEqual, Literal, NamedExpression, RowNumber, SortOrder, UnsafeProjection, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}

import graft.functions.expressions.{VecChamferExpr, VecCosineExpr, VecDotExpr, VecL2SqExpr, VecMaxSimExpr}
import graft.index.{BeamSearch, CsrGraph, Metrics, VectorStore, VisitedSet}

/** SQL auto-routing of exhaustive top-k similarity queries to the ANN
  * index — the deferred `SparkStrategy` tier of SURVEY §7.4 / §2.7:
  *
  * ```sql
  * SET spark.graft.ann.rewrite=true;
  * SELECT vec_id, graft_vec_dot(embedding, <query literal>) AS score
  * FROM corpus ORDER BY score DESC LIMIT k
  * ```
  *
  * [[AnnTopKRule]] (an optimizer `Rule[LogicalPlan]`) pattern-matches the
  * `GlobalLimit(LocalLimit(Sort(desc score, Project(id, vec_dot AS
  * score))))` shape over a corpus registered in [[AnnIndexRegistry]] and
  * replaces the whole subtree with a logical [[AnnSearchNode]];
  * [[AnnStrategy]] plans it as [[AnnSearchExec]], which runs the G8 beam
  * search over the broadcast RoarGraph and then scores the candidates
  * EXACTLY (double-promoted dot over the raw vectors) — so returned
  * scores equal the original expression's values and only the candidate
  * SET is approximate. OPT-IN via `spark.graft.ann.rewrite` (default
  * off: silently trading exact for approximate results is never a
  * default).
  */
object AnnIndexRegistry {

  /** `searchVecs` is the metric-normalized store the graph was built on;
    * `rawVecs` keeps the unnormalized vectors for exact rescoring. */
  case class Entry(graphB: Broadcast[CsrGraph], searchVecsB: Broadcast[VectorStore],
                   rawVecsB: Broadcast[VectorStore], metricName: String,
                   searchL: Int)

  // keyed by (idCol, vecCol, EXACT metric name): an entry built on "l2"
  // serves ORDER-BY-l2²-ASC queries; dot-DESC prefers an "ip" entry and
  // falls back to "cosine". The exact-name key means registering a
  // cosine-metric AND an ip-metric index on the same columns keeps both
  // (they used to silently overwrite under a collapsed 'ip' kind); the
  // cosine fallback is sound for SCORES always (exact rescoring) but its
  // candidate geometry matches dot ordering only on a normalized corpus
  // — registering a cosine graph for dot routing is the registrant's
  // assertion that the corpus is normalized enough, and the recall gates
  // are the check.
  private val entries = new TrieMap[(String, String, String), (String, Entry)]

  /** Query kind → acceptable index metrics, in preference order.
    * "l2" = ORDER BY graft_vec_l2sq ASC; "cos" = ORDER BY
    * graft_vec_cosine DESC (served ONLY by cosine-metric entries —
    * their normalized geometry IS cosine ordering, no corpus caveat);
    * "dot" = ORDER BY graft_vec_dot DESC ("ip" preferred; a cosine
    * entry is the registrant's normalized-corpus assertion, see the
    * entries comment above). */
  private def routeMetrics(kind: String): Seq[String] = kind match {
    case "l2" => Seq("l2")
    case "cos" => Seq("cosine")
    case _ => Seq("ip", "cosine")
  }

  /** Canonical identity of a corpus scan: the single leaf relation under
    * (optional) attribute-only projections and subquery aliases. None if
    * anything else (Filter, Sample, Join, expression Project…) sits in the
    * plan — such a query must NOT be routed to a whole-corpus index. */
  @annotation.tailrec
  def scanFingerprint(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => scanFingerprint(child)
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      scanFingerprint(child)
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          Some("fsv1:" + fs.fileFormat.toString + ":" +
            fs.location.rootPaths.map(_.toString).sorted.mkString(","))
        case other =>
          Some("v1:" + other.getClass.getName + ":" + other.schema.catalogString)
      }
    case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      // name() alone can collide across catalogs; pin the catalog-qualified
      // identifier and the schema so a foreign same-named table never
      // routes to this corpus's index.
      Some("v2:" + v2.catalog.map(_.name()).getOrElse("") + ":" +
        v2.identifier.map(_.toString).getOrElse(v2.table.name()) + ":" +
        v2.table.columns().map(_.toString).mkString(","))
    case _ => None
  }

  /** Register an index over `corpus` (a bare scan) exposing
    * (`idCol`, `vecCol`). The rule only routes queries whose Project sits
    * DIRECTLY on this same relation — same-named columns on another table,
    * or a Filter/Sample between the Project and the scan, never match. */
  def register(corpus: org.apache.spark.sql.DataFrame, idCol: String,
               vecCol: String, entry: Entry): Unit = {
    val fp = scanFingerprint(corpus.queryExecution.optimizedPlan).getOrElse(
      sys.error("ANN registration requires a bare scan corpus (no " +
        "Filter/Join/expression-Project above the relation): " +
        corpus.queryExecution.optimizedPlan.nodeName))
    entries.put((idCol, vecCol, entry.metricName), (fp, entry))
  }

  def lookup(idCol: String, vecCol: String, kind: String): Option[Entry] =
    routeMetrics(kind).iterator
      .flatMap(m => entries.get((idCol, vecCol, m))).map(_._2)
      .nextOption()

  /** Lookup that also proves `child` IS the registered corpus relation. */
  def lookupFor(idCol: String, vecCol: String, kind: String,
                child: LogicalPlan): Option[Entry] =
    routeMetrics(kind).iterator.flatMap { m =>
      for {
        (fp, entry) <- entries.get((idCol, vecCol, m))
        childFp <- scanFingerprint(child)
        if childFp == fp
      } yield entry
    }.nextOption()

  /** The PLUGGABLE candidate tier behind the SQL route — any ANN
    * candidate generator (IVF-PQ, LSH, random-projection, user-defined)
    * can serve `ORDER BY graft_vec_* LIMIT k` by registering one of
    * these. Routed only when no graph entry matches: the graph answers
    * in one task off a broadcast; a candidate tier answers with a
    * distributed generator job + exact rescoring of the bounded
    * candidate set against the full-precision base TABLE (`data`) using
    * the routed query's OWN expression — so the registered generator
    * controls RECALL only, never score correctness, and the corpus is
    * never resident. `metricName` gates routes like the graph entries:
    * "l2" serves l2²-ASC; "ip" serves dot-DESC (an "ip" registration
    * whose generator has cosine geometry asserts a normalized-enough
    * corpus — same contract as a cosine graph). `name` shows up as the
    * node's tier in the plan. */
  case class CandidateTierEntry(
      name: String, data: org.apache.spark.sql.DataFrame,
      dataIdCol: String, dataVecCol: String, metricName: String, dim: Int,
      /** (spark, queryVec, k) → DataFrame with a `d_id` column of AT
        * LEAST the k best candidate ids (more is fine — rescoring
        * bounds the final answer). Runs on the driver at execute time;
        * must launch distributed work, not collect the corpus. */
      candidates: (SparkSession, Array[Float], Int) => org.apache.spark.sql.DataFrame,
      /** COST HINT for the tier chooser: estimated fraction of the
        * full-precision corpus bytes the COARSE stage reads per query
        * (the dominant term of a compressed-tier probe at scale — the
        * bounded rescoring join is shared by every tier). Lower wins
        * when several tiers are registered for the same (idCol, vecCol,
        * metric); ties break on the tier name. Built-in registrations
        * compute an honest value; user tiers default to 1.0 (a full
        * coarse scan) and should override. */
      costHint: Double = 1.0,
      /** Optional BATCHED generator serving the single-vector
        * query-RELATION route (`SvJoinTopKNode`): candidates for EVERY
        * collected query vector in ONE distributed job — (q_id, d_id)
        * rows, at least the k best per query (more is fine, the
        * rescore bounds the answer). null (the default) = this tier
        * serves only literal-query statements; the relation route then
        * skips it. */
      candidatesBatch: (SparkSession, Seq[(Long, Array[Float])], Int) => org.apache.spark.sql.DataFrame = null,
      /** Optional FRESH re-read of the full-precision corpus for the
        * rescoring join. `data` snapshots its file listing at
        * registration (Spark's InMemoryFileIndex); a corpus that GROWS
        * in place (delta-ingest) would silently drop post-registration
        * rows from the rescore. null (the default) = rescore against
        * the registration-time `data`. */
      dataRefresh: () => org.apache.spark.sql.DataFrame = null,
      /** True for certificate fixtures registered under a nonstandard
        * name (deleted / grown twins): reachable only by explicit
        * `spark.graft.ann.tier` preference, never by the cost race —
        * see [[chooseTier]]. */
      certificateOnly: Boolean = false,
      /** Optional path of a tiny persisted-EWMA sidecar (written
        * best-effort beside the tier's index): [[registerTier]] seeds
        * the measured-cost store from it, so a fresh session routes on
        * the PREVIOUS session's learned order instead of re-learning
        * from static hints; [[recordMeasuredCost]] keeps it current.
        * null = in-memory only (data-backed tiers with no path). */
      costSidecar: String = null) {
    /** The relation to rescore against: refreshed when the registrant
      * declared the corpus grow-in-place, else the registration
      * snapshot. */
    def liveData: org.apache.spark.sql.DataFrame =
      if (dataRefresh != null) dataRefresh() else data
  }

  /** All candidate tiers per (idCol, vecCol, metric), keyed by tier
    * name — MULTIPLE tiers may now serve one corpus (e.g. an IVF-PQ
    * codes index AND an SQ8 byte index); the chooser picks by cost. */
  private val tierEntries =
    new TrieMap[(String, String, String), Map[String, (String, CandidateTierEntry)]]

  /** MEASURED coarse-stage cost per (key, corpus fingerprint, tier
    * name): EWMA of observed seconds-per-query for the tier's
    * candidate generator, recorded by the instrumented wrappers
    * [[registerTier]] installs. The static
    * [[CandidateTierEntry.costHint]] is an a-priori bytes-fraction
    * estimate; once every open competitor for a key has real
    * measurements the chooser prefers those (same units, honestly
    * comparable), so a mis-estimated hint cannot keep routing queries
    * to the slower tier. The FINGERPRINT in the key scopes every
    * measurement to the registered relation, like the tier entries
    * themselves: two corpora sharing column names, metric, and tier
    * name must not pool one EWMA — timings from a small corpus would
    * steer routing on a large one. Saturating certificate modes
    * (`relation.exact` / `filtered.exact`) never record — their costs
    * reflect saturation, not production probes. */
  private val measuredCosts =
    new TrieMap[((String, String, String, String), String), Double]

  private[graft] def recordMeasuredCost(idCol: String, vecCol: String,
                                        metric: String, fp: String,
                                        tier: String,
                                        secPerQuery: Double): Unit = {
    val k = ((idCol, vecCol, metric, fp), tier)
    val updated = measuredCosts.updateWith(k) {
      case Some(prev) => Some(0.7 * prev + 0.3 * secPerQuery) // EWMA
      case None => Some(secPerQuery)
    }
    // best-effort persistence: a serving session's learned routing
    // order survives restart (seeded back at registerTier) instead of
    // every fresh session re-learning from static hints. THROTTLED —
    // the sidecar needs approximate freshness only, and an unthrottled
    // write is a full remote PUT per measured query batch on the
    // serving hot path: the first measurement persists immediately (a
    // short-lived session still seeds), later ones at most once per
    // `spark.graft.ann.costSidecarMinIntervalMs` (default 30 s; 0
    // restores write-every-record).
    for (u <- updated; sc <- costSidecars.get(k)) {
      val intervalMs =
        try SparkSession.active.conf
          .get("spark.graft.ann.costSidecarMinIntervalMs", "30000").toLong
        catch { case scala.util.control.NonFatal(_) => 30000L }
      val now = System.nanoTime()
      val due = sidecarLastPersist.get(k)
        .forall(last => now - last >= intervalMs * 1000000L)
      if (due) {
        sidecarLastPersist.put(k, now)
        writeCostSidecar(sc, u)
      }
    }
  }

  /** Last sidecar persist (nanos) per measured-cost key — the write
    * throttle's state. */
  private val sidecarLastPersist =
    new TrieMap[((String, String, String, String), String), Long]

  private[graft] def measuredCost(idCol: String, vecCol: String,
                                  metric: String, fp: String,
                                  tier: String): Option[Double] =
    measuredCosts.get(((idCol, vecCol, metric, fp), tier))

  /** The registered corpus fingerprint for (key, tier name) — lets
    * callers (and specs) address the fingerprint-scoped measured-cost
    * store without recomputing the scan fingerprint. */
  private[graft] def registeredFp(idCol: String, vecCol: String,
                                  metric: String,
                                  tier: String): Option[String] =
    tierEntries.get((idCol, vecCol, metric)).flatMap(_.get(tier))
      .map(_._1)

  private[graft] def clearMeasuredCosts(): Unit = {
    measuredCosts.clear()
    sidecarLastPersist.clear()
  }

  /** Persisted-EWMA sidecar path per measured-cost key, installed by
    * [[registerTier]] for path-backed tiers. */
  private val costSidecars =
    new TrieMap[((String, String, String, String), String), String]

  private def writeCostSidecar(path: String, v: Double): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration)
      val out = f.create(p, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort

  private def readCostSidecar(spark: SparkSession,
                              path: String): Option[Double] =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try scala.io.Source.fromInputStream(in).mkString.trim
          .toDoubleOption.filter(d => d > 0 && !d.isInfinite)
        finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Register a candidate tier over `corpus` (a bare scan) — same
    * fingerprint proof as [[register]], so only queries over THIS
    * relation route to it. Tiers accumulate per (idCol, vecCol,
    * metric); re-registering the same tier NAME replaces it. Selection:
    * `spark.graft.ann.tier` forces a name ("graph" forces the broadcast
    * graph; a name with no registration = no routing, exhaustive plan);
    * otherwise the lowest cost wins — measured ([[recordMeasuredCost]])
    * once every competitor has one, [[CandidateTierEntry.costHint]]
    * until then.
    *
    * The generator functions are INSTRUMENTED here: each invocation
    * eagerly materializes the (bounded, output-sized) candidate set via
    * localCheckpoint and records wall seconds per query — the coarse
    * stage is exactly what the tiers compete on, while the rescoring
    * join is shared by every route. */
  def registerTier(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                   vecCol: String, entry: CandidateTierEntry): Unit = {
    val fp = scanFingerprint(corpus.queryExecution.optimizedPlan).getOrElse(
      sys.error("ANN registration requires a bare scan corpus (no " +
        "Filter/Join/expression-Project above the relation): " +
        corpus.queryExecution.optimizedPlan.nodeName))
    val key = (idCol, vecCol, entry.metricName)
    def saturating(s: SparkSession): Boolean =
      s.conf.getOption("spark.graft.ann.relation.exact")
        .exists(_.toBoolean) ||
      s.conf.getOption("spark.graft.ann.filtered.exact")
        .exists(_.toBoolean)
    def timed(s: SparkSession, nQueries: Int)(
        body: => org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      if (saturating(s)) body
      else {
        val t0 = System.nanoTime()
        val df = body.localCheckpoint(true)
        recordMeasuredCost(idCol, vecCol, entry.metricName, fp, entry.name,
          (System.nanoTime() - t0) / 1e9 / math.max(nQueries, 1))
        df
      }
    val instrumented = entry.copy(
      candidates =
        if (entry.candidates == null) null
        else (s, qv, k) => timed(s, 1)(entry.candidates(s, qv, k)),
      candidatesBatch =
        if (entry.candidatesBatch == null) null
        else (s, qs, k) =>
          timed(s, qs.size)(entry.candidatesBatch(s, qs, k)))
    if (entry.costSidecar != null) {
      val ck = ((idCol, vecCol, entry.metricName, fp), entry.name)
      costSidecars.put(ck, entry.costSidecar)
      // seed from the persisted EWMA so the first queries of a fresh
      // session route on the prior session's measured order — but
      // never clobber a measurement this session already took
      if (!measuredCosts.contains(ck))
        readCostSidecar(corpus.sparkSession, entry.costSidecar)
          .foreach(measuredCosts.putIfAbsent(ck, _))
    }
    tierEntries.updateWith(key) {
      case Some(m) => Some(m + (entry.name -> ((fp, instrumented))))
      case None => Some(Map(entry.name -> ((fp, instrumented))))
    }
  }

  /** Pick among a key's registered tiers: the `preferred` name when
    * given; else min measured cost when EVERY open competitor has a
    * measurement (seconds are only comparable to seconds — one
    * measured tier must not race its seconds against another's
    * bytes-fraction estimate); else min (costHint, name). */
  private def chooseTier(key: (String, String, String),
                         m: Map[String, (String, CandidateTierEntry)],
                         preferred: Option[String])
      : Option[(String, CandidateTierEntry)] =
    preferred match {
      case Some(name) => m.get(name)
      case None =>
        // certificate registrations (nonstandard names — deleted /
        // grown fixtures) are reachable ONLY by explicit
        // spark.graft.ann.tier preference: the registry is
        // process-global, so letting a masked certificate tier win the
        // cost race would silently apply its deletions/fixture state
        // to unrelated queries
        val open = m.filterNot(_._2._2.certificateOnly)
        if (open.isEmpty) None
        else {
          // fingerprint-scoped lookup: each tier's measurements are
          // keyed by ITS registered relation, like the entry itself
          val measured = open.iterator.map { case (n, (fp, _)) =>
            n -> measuredCosts.get(((key._1, key._2, key._3, fp), n))
          }.toMap
          if (open.size > 1 && measured.valuesIterator.forall(_.isDefined))
            Some(open.minBy { case (name, _) =>
              (measured(name).get, name) }._2)
          else
            Some(open.minBy { case (name, (_, e)) =>
              (e.costHint, name) }._2)
        }
    }

  /** [[registerTier]] with the built-in IVF-PQ generator: candidates by
    * partition-pruned probe + ADC over a
    * [[graft.operators.IvfPq.writeIndex]] directory. Growth-aware like
    * [[registerSharded]]: post-registration [[graft.operators.IvfPq
    * .appendIndex]] growth is observed via footer counts and the ADC
    * fetch is scaled by [[graft.index.BudgetPolicy]] (same
    * `spark.graft.ann.budget.*` confs), and a non-null `refresh` lets
    * the rescoring join and the exact-mode scan follow a grow-in-place
    * corpus (the registration `data` snapshots its file listing). */
  def registerIvfPq(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                    vecCol: String, entry: IvfPqEntry,
                    refresh: () => org.apache.spark.sql.DataFrame = null,
                    name: String = "ivfpq"): Unit =
    registerIvfPqResolved(corpus, idCol, vecCol, entry, _ => entry.path,
      s"${entry.path}/_cost_ewma.$name", refresh, name)

  /** [[registerIvfPq]] over a generation-VERSIONED root
    * ([[graft.operators.IvfPq.buildVersioned]]): the generator
    * resolves the manifest per query, so routing follows every
    * compaction FLIP with no re-registration (a fixed-dir registration
    * is stranded on a retired generation after `keepGens` flips).
    * `entry.path` is the ROOT; the quantizers are the frozen
    * build-time pair and survive every fold by contract. The
    * persisted-EWMA sidecar sits at the root so it survives
    * retirement too. */
  def registerIvfPqVersioned(corpus: org.apache.spark.sql.DataFrame,
                             idCol: String, vecCol: String,
                             entry: IvfPqEntry,
                             refresh: () => org.apache.spark.sql.DataFrame = null,
                             name: String = "ivfpq"): Unit =
    registerIvfPqResolved(corpus, idCol, vecCol, entry,
      s => graft.operators.IvfPq.resolveVersioned(s, entry.path),
      s"${entry.path}/_cost_ewma.$name", refresh, name)

  private def registerIvfPqResolved(
      corpus: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, entry: IvfPqEntry,
      livePath: SparkSession => String, sidecar: String,
      refresh: () => org.apache.spark.sql.DataFrame,
      name: String): Unit = {
    import graft.index.BudgetPolicy
    import graft.operators.IvfPq
    // registration-time index size (parquet footers, no job) — the
    // baseline the budget policy scales from. With nlist FIXED at build
    // time, appendIndex growth makes every probed cell denser while a
    // flat nCand keeps returning the same candidate count — the exact
    // silent-recall-erosion shape the sharded tier's per-shard budget
    // fixes, so the same policy (and confs) governs the ADC fetch here.
    val regRows = IvfPq.indexRows(corpus.sparkSession,
      livePath(corpus.sparkSession))
    def scaledFetch(s: SparkSession, k: Int, path: String): Int =
      BudgetPolicy.scaledL(s, math.max(entry.nCand, 4 * k),
        regRows.toDouble, IvfPq.indexRows(s, path).toDouble)
    def liveData(s: SparkSession) = {
      import org.apache.spark.sql.functions.{col, expr}
      (if (refresh != null) refresh() else entry.data)
        .select(col(entry.dataIdCol).as("d_id"),
          col(entry.dataVecCol).as("d_vec"))
    }
    registerTier(corpus, idCol, vecCol, CandidateTierEntry(
      name, entry.data, entry.dataIdCol, entry.dataVecCol,
      entry.metricName,
      if (entry.centroids.isEmpty) -1 else entry.centroids(0).length,
      (s, qv, k) => {
        val path = livePath(s)
        graft.operators.IvfPq.candidateIds(s, qv, path,
          entry.centroids, entry.codebooks, entry.nProbe,
          scaledFetch(s, k, path))
      },
      candidatesBatch = (s, qs, k) => {
        import s.implicits._
        import org.apache.spark.sql.functions.{col, expr}
        val q = qs.map { case (id, v) => (id, v.toSeq) }
          .toDF("q_id", "q_vec")
        // `relation.exact=true` = the saturating certificate regime:
        // probe EVERY cell and keep every row — a generator bounded by
        // nProbe can never claim corpus saturation otherwise (the same
        // reachability-vs-saturation distinction the filtered route
        // enforces); g8_sql_ivfpq_saturated hash-proves this mode
        val exact = s.conf.getOption("spark.graft.ann.relation.exact")
          .getOrElse("false").toBoolean
        val data = liveData(s)
        val path = livePath(s)
        val (nProbe, fetch) =
          if (exact) {
            // saturate against the LARGER of corpus and index counts: a
            // grown index behind a stale (refresh-less) corpus snapshot
            // must still keep every candidate it generates
            val n = math.min(math.max(data.count(),
              IvfPq.indexRows(s, path)), Int.MaxValue.toLong).toInt
            (entry.centroids.length, n)
          } else (entry.nProbe, scaledFetch(s, k, path))
        graft.operators.IvfPq.knnOverIndexBlocked(s, q, path,
            data, entry.centroids, entry.codebooks,
            k = fetch, nProbe = nProbe, nCand = fetch)
          .select(col("q_id"), col("d_id"))
      },
      // probed-cell fraction × PQ codes-vs-float compression: the
      // coarse stage reads ~nProbe/nlist of a nSub/(4·dim)-sized layout
      costHint = {
        val dim = if (entry.centroids.isEmpty) 1
                  else entry.centroids(0).length
        val nlist = math.max(entry.centroids.length, 1)
        (entry.nProbe.toDouble / nlist) *
          (entry.codebooks.length.toDouble / (4.0 * dim))
      },
      dataRefresh = refresh,
      certificateOnly = name != "ivfpq",
      costSidecar = sidecar))
  }

  /** Constructor payload for [[registerIvfPq]]. */
  case class IvfPqEntry(path: String, data: org.apache.spark.sql.DataFrame,
                        dataIdCol: String, dataVecCol: String,
                        centroids: Array[Array[Float]],
                        codebooks: graft.operators.PqAnn.Codebooks,
                        metricName: String, nProbe: Int, nCand: Int)

  /** [[registerTier]] with the persisted SHARDED graph tier as the
    * generator — the route for a corpus past the broadcast ceiling that
    * still wants graph-quality candidates: per-shard beam search
    * through the resident-LRU lifecycle (delta shards included), ids
    * already global. `dim` can't be read off the data-free ref, so the
    * caller states it (the rule's dim gate still applies). */
  def registerSharded(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                      vecCol: String, ref: graft.index.ShardedIndexRef,
                      dim: Int, metricName: String, searchL: Int = 60,
                      refresh: () => org.apache.spark.sql.DataFrame = null,
                      name: String = "sharded"): Unit =
    registerShardedResolved(corpus, idCol, vecCol, ref,
      s => graft.index.ShardedIndex.discover(s, ref),
      s"${ref.path}/_cost_ewma.$name",
      dim, metricName, searchL, refresh, name)

  /** [[registerSharded]] over a generation-VERSIONED root
    * ([[graft.index.ShardedIndex.buildVersioned]]): the generator
    * resolves the manifest per query, so the routed SQL surface
    * follows every compaction/re-shard FLIP with no re-registration —
    * a fixed-dir registration would be stranded on a retired
    * generation after `keepGens` flips. The budget baseline comes from
    * the registration-time live generation; the persisted-EWMA sidecar
    * sits at the ROOT (it must survive retirement). */
  def registerShardedVersioned(corpus: org.apache.spark.sql.DataFrame,
                               idCol: String, vecCol: String, root: String,
                               dim: Int, metricName: String,
                               searchL: Int = 60,
                               refresh: () => org.apache.spark.sql.DataFrame = null,
                               name: String = "sharded"): Unit = {
    val reg0 = graft.index.ShardedIndex
      .resolveVersioned(corpus.sparkSession, root, metricName)
    registerShardedResolved(corpus, idCol, vecCol, reg0,
      s => graft.index.ShardedIndex.resolveVersioned(s, root, metricName),
      s"$root/_cost_ewma.$name",
      dim, metricName, searchL, refresh, name)
  }

  private def registerShardedResolved(
      corpus: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, ref: graft.index.ShardedIndexRef,
      resolve: SparkSession => graft.index.ShardedIndexRef,
      sidecar: String, dim: Int, metricName: String, searchL: Int,
      refresh: () => org.apache.spark.sql.DataFrame,
      name: String): Unit = {
    import graft.index.{BudgetPolicy, ShardedIndex}
    // registration-time per-shard size — the baseline the budget policy
    // scales from when the index grows without re-registration
    val regPerShard = ShardedIndex.totalRowsCached(corpus.sparkSession, ref)
      .toDouble / math.max(ref.nShards + ref.nDeltas, 1)
    // (discovered live ref, effective per-shard budget, per-shard fetch
    // count) for THIS query: deltas ingested after registration are
    // found on disk (one dir listing), per-shard growth scales the
    // registered beam budget (BudgetPolicy) — a month of delta-ingest
    // neither disappears from answers nor silently erodes recall — and
    // `spark.graft.ann.relation.exact=true` saturates every shard's
    // beam (l = 2·rows, all hits returned), the same certificate
    // regime as the graph tier's l = 2n (g8_sql_sharded_saturated
    // hash-proves it end-to-end).
    val warnedNoRefresh = new java.util.concurrent.atomic.AtomicBoolean(false)
    def liveState(s: SparkSession, k: Int)
        : (graft.index.ShardedIndexRef, Int, Int) = {
      val live = resolve(s)
      // growth without a refresh thunk is HALF a contract: the index
      // serves the delta candidates but the rescore join against the
      // registration-snapshot corpus drops their rows — say so loudly
      // once instead of letting delta docs vanish silently
      if (live.nDeltas > ref.nDeltas && refresh == null &&
          warnedNoRefresh.compareAndSet(false, true))
        System.err.println(
          s"graft WARN: sharded registration ($idCol,$vecCol) discovered " +
          s"${live.nDeltas - ref.nDeltas} post-registration delta(s) but " +
          "has no refresh thunk — delta rows will be searched but " +
          "dropped by the rescore join; pass refresh= to registerSharded")
      val rows = ShardedIndex.totalRowsCached(s, live)
      val exact = s.conf.getOption("spark.graft.ann.relation.exact")
        .getOrElse("false").toBoolean
      if (exact) {
        val cap = math.min(rows, (Int.MaxValue / 2).toLong).toInt.max(1)
        (live, 2 * cap, cap)
      } else {
        val perShard = rows.toDouble /
          math.max(live.nShards + live.nDeltas, 1)
        val effL = BudgetPolicy.scaledL(s, searchL, regPerShard, perShard)
        (live, math.max(effL, 4 * k), 4 * k)
      }
    }
    registerTier(corpus, idCol, vecCol, CandidateTierEntry(
      name, corpus, idCol, vecCol, metricName, dim,
      (s, qv, k) => {
        import s.implicits._
        import org.apache.spark.sql.functions.{col, expr}
        val q = Seq((0L, qv.toSeq)).toDF("q_id", "q_vec")
        val (live, l, kc) = liveState(s, k)
        graft.index.ShardedIndex
          .searchSingleDf(s, q, live, l = l, k = kc)
          .select(col("d_id"))
      },
      // beam search touches O(searchL · degree) vectors per shard — a
      // tiny read fraction once shards are resident; the honest cost is
      // shard residency churn, approximated by a small constant
      costHint = 0.02,
      // the relation route's batch form: ONE per-shard search job for
      // every collected query vector
      candidatesBatch = (s, qs, k) => {
        import s.implicits._
        import org.apache.spark.sql.functions.{col, expr}
        val q = qs.map { case (id, v) => (id, v.toSeq) }
          .toDF("q_id", "q_vec")
        val (live, l, kc) = liveState(s, k)
        graft.index.ShardedIndex
          .searchSingleDf(s, q, live, l = l, k = kc)
          .select(col("q_id"), col("d_id"))
      },
      dataRefresh = refresh,
      certificateOnly = name != "sharded",
      costSidecar = sidecar))
  }

  /** [[registerTier]] with the SQ8 byte-code tier as the generator —
    * coarse dequantized scan over the 4×-compressed codes (see
    * [[graft.operators.Sq8Ann]]); candidate ids only, exact rescoring
    * is the route's own. `encoded` is [[graft.operators.Sq8Ann.encode]]
    * output (persist it for a serving deployment); coarse geometry
    * follows `metricName` ("l2" ranks by dequantized L2², otherwise
    * dequantized cosine). Growth-aware when `indexPath`
    * names a [[graft.operators.Sq8Ann.writeIndex]] layout: the coarse
    * scan re-reads `indexPath/codes` per query (a registration-time
    * `encoded` snapshots its file listing, so
    * [[graft.operators.Sq8Ann.appendIndex]] rows would be invisible)
    * and the candidate window scales with footer-counted growth under
    * the same `spark.graft.ann.budget.*` confs — a byte-quantized
    * top-nCand window admits linearly more near-ties as the corpus
    * grows, the same erosion shape as the other tiers, just via score
    * density instead of a structural probe bound. `refresh` follows a
    * grow-in-place corpus for the rescoring join. */
  def registerSq8(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                  vecCol: String, encoded: org.apache.spark.sql.DataFrame,
                  bounds: graft.operators.Sq8Ann.Bounds,
                  metricName: String, nCand: Int = 60,
                  indexPath: String = null,
                  refresh: () => org.apache.spark.sql.DataFrame = null): Unit =
    registerSq8Resolved(corpus, idCol, vecCol, encoded, bounds, metricName,
      nCand, if (indexPath == null) null else (_ => indexPath),
      if (indexPath == null) null else s"$indexPath/_cost_ewma.sq8",
      refresh)

  /** [[registerSq8]] over a generation-VERSIONED root
    * ([[graft.operators.Sq8Ann.buildVersioned]]): the coarse scan
    * resolves the manifest per query, so routing follows every
    * compaction flip with no re-registration. The per-dimension bounds
    * are the frozen quantizer and identical in every generation
    * (compactVersioned copies them verbatim), so the caller passes the
    * build-time pair once; the persisted-EWMA sidecar sits at the
    * root. */
  def registerSq8Versioned(corpus: org.apache.spark.sql.DataFrame,
                           idCol: String, vecCol: String, root: String,
                           bounds: graft.operators.Sq8Ann.Bounds,
                           metricName: String, nCand: Int = 60,
                           refresh: () => org.apache.spark.sql.DataFrame = null): Unit =
    registerSq8Resolved(corpus, idCol, vecCol, encoded = null, bounds,
      metricName, nCand,
      s => graft.operators.Sq8Ann.resolveVersioned(s, root),
      s"$root/_cost_ewma.sq8", refresh)

  private def registerSq8Resolved(
      corpus: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, encoded: org.apache.spark.sql.DataFrame,
      bounds: graft.operators.Sq8Ann.Bounds, metricName: String,
      nCand: Int, livePath: SparkSession => String, sidecar: String,
      refresh: () => org.apache.spark.sql.DataFrame): Unit = {
    import graft.index.{BudgetPolicy, ParquetMeta}
    val regRows =
      if (livePath == null) -1L
      else ParquetMeta.rowsCached(corpus.sparkSession,
        s"${livePath(corpus.sparkSession)}/codes")
    def liveEncoded(s: SparkSession) =
      if (livePath == null) encoded
      // readCodes, not a bare scan: tombstoned (taken-down) rows must
      // not surface as candidates from a path-backed registration
      else graft.operators.Sq8Ann.readCodes(s, livePath(s))
    def fetch(s: SparkSession, k: Int): Int = {
      val base = math.max(nCand, 4 * k)
      if (regRows <= 0) base
      else BudgetPolicy.scaledL(s, base, regRows.toDouble,
        ParquetMeta.rowsCached(s, s"${livePath(s)}/codes").toDouble)
    }
    registerTier(corpus, idCol, vecCol, CandidateTierEntry(
      "sq8", corpus, idCol, vecCol, metricName, bounds.dim,
      (s, qv, k) => {
        import s.implicits._
        import org.apache.spark.sql.functions.{col, expr}
        val q = Seq((0L, qv.toSeq)).toDF("q_id", "q_vec")
        graft.operators.Sq8Ann.coarseCandidates(q, liveEncoded(s), bounds,
          fetch(s, k), excludeSelf = false,
          byL2 = metricName == "l2")
          .select(col("d_id"))
      },
      candidatesBatch = (s, qs, k) => {
        import s.implicits._
        import org.apache.spark.sql.functions.{col, expr}
        val q = qs.map { case (id, v) => (id, v.toSeq) }
          .toDF("q_id", "q_vec")
        graft.operators.Sq8Ann.coarseCandidates(q, liveEncoded(s), bounds,
          fetch(s, k), excludeSelf = false,
          byL2 = metricName == "l2")
          .select(col("q_id"), col("d_id"))
      },
      // full coarse scan over byte codes = 1/4 of the float bytes
      costHint = 0.25,
      dataRefresh = refresh,
      costSidecar = sidecar))
  }

  def lookupTier(idCol: String, vecCol: String, kind: String,
                 preferred: Option[String] = None): Option[CandidateTierEntry] =
    lookupTierWithFp(idCol, vecCol, kind, preferred).map(_._2)

  /** [[lookupTier]] plus the registered corpus fingerprint — execute-time
    * callers re-verify it against the fingerprint proven at plan time,
    * and pass the planned tier NAME as `preferred` so execution resolves
    * the same tier the chooser picked. */
  def lookupTierWithFp(idCol: String, vecCol: String, kind: String,
                       preferred: Option[String] = None)
      : Option[(String, CandidateTierEntry)] =
    routeMetrics(kind).iterator
      .flatMap(m => tierEntries.get((idCol, vecCol, m))
        .flatMap(chooseTier((idCol, vecCol, m), _, preferred)))
      .nextOption()

  /** [[lookup]] plus the registered corpus fingerprint. */
  def lookupWithFp(idCol: String, vecCol: String,
                   kind: String): Option[(String, Entry)] =
    routeMetrics(kind).iterator
      .flatMap(m => entries.get((idCol, vecCol, m)))
      .nextOption()

  def lookupTierFor(idCol: String, vecCol: String, kind: String,
                    child: LogicalPlan,
                    preferred: Option[String] = None)
      : Option[CandidateTierEntry] =
    routeMetrics(kind).iterator.flatMap { m =>
      for {
        byName <- tierEntries.get((idCol, vecCol, m))
        childFp <- scanFingerprint(child)
        // only tiers registered over THIS relation compete for the query
        (_, entry) <- chooseTier((idCol, vecCol, m),
          byName.filter { case (_, (fp, _)) => fp == childFp }, preferred)
      } yield entry
    }.nextOption()

  /** The SET-LEVEL (multivector) tier behind the flagship SQL shape
    *
    * ```sql
    * SELECT dset_id, graft_chamfer_score(<query-set literal>, vec_set)
    *   AS score
    * FROM corpus_sets ORDER BY score DESC LIMIT k
    * ```
    *
    * — the reference's `test_search_multivector_rerank` entry point
    * (tests/test_search_multivector_rerank.cpp:276-339) made reachable
    * from SQL. `data` is the set-level relation (one row per set:
    * id + `array<array<float>>` members, sub-vectors in q_sub order);
    * `candidates` runs the G9 per-sub-vector search and returns AT
    * LEAST the k best candidate `dset_id`s; the route rescores that
    * bounded set with the query's OWN chamfer expression against
    * `data`, so the registered generator controls RECALL only — scores
    * equal the exhaustive plan's bit-for-bit. `dim` = sub-vector
    * dimension (gates literal shape); `name` surfaces as the node's
    * tier. */
  case class MvEntry(
      name: String, data: org.apache.spark.sql.DataFrame,
      dataIdCol: String, dataVecCol: String, dim: Int,
      /** (spark, querySubVectors, k) → DataFrame with a `dset_id`
        * column. Driver-side at execute time; must launch distributed
        * work, never collect the corpus. */
      candidates: (SparkSession, Array[Array[Float]], Int) => org.apache.spark.sql.DataFrame,
      /** BATCHED form serving the query-RELATION route: candidates for
        * EVERY query set in ONE distributed job. Input is the bounded
        * collected query side (id, sub-vectors in sub order); output a
        * DataFrame with (`qset_id`, `dset_id`) — at least the k best
        * candidate sets per query set (more is fine, the rescore
        * bounds the answer). */
      candidatesBatch: (SparkSession, Seq[(Long, Array[Array[Float]])], Int) => org.apache.spark.sql.DataFrame,
      /** Optional FRESH re-read of the set corpus for the rescoring
        * join — same contract as [[CandidateTierEntry.dataRefresh]]:
        * a grow-in-place set relation needs it or post-registration
        * sets never rescore. */
      dataRefresh: () => org.apache.spark.sql.DataFrame = null) {
    /** The relation to rescore against (see
      * [[CandidateTierEntry.liveData]]). */
    def liveData: org.apache.spark.sql.DataFrame =
      if (dataRefresh != null) dataRefresh() else data
  }

  // keyed by (idCol, vecCol, corpus fingerprint): several set relations
  // (e.g. the standard route and a saturating-budget twin over a second
  // parquet copy) register independently and resolve by the relation a
  // query actually scans
  private val mvEntries = new TrieMap[(String, String, String), MvEntry]

  /** Register the multivector tier over `corpusSets` (a bare scan of
    * the set-level relation) — same fingerprint proof as [[register]]. */
  def registerMv(corpusSets: org.apache.spark.sql.DataFrame, idCol: String,
                 vecCol: String, entry: MvEntry): Unit = {
    val fp = scanFingerprint(corpusSets.queryExecution.optimizedPlan).getOrElse(
      sys.error("ANN registration requires a bare scan corpus (no " +
        "Filter/Join/expression-Project above the relation): " +
        corpusSets.queryExecution.optimizedPlan.nodeName))
    mvEntries.put((idCol, vecCol, fp), entry)
  }

  /** [[registerMv]] with the G9 broadcast-RoarGraph generator: the
    * adaptive multivector beam search over the SUB-vector graph (the
    * g9_multivector_search kernel), candidate sets = hit sub-vector
    * ids / c. */
  def registerMvRoar(corpusSets: org.apache.spark.sql.DataFrame,
                     idCol: String, vecCol: String,
                     graphB: Broadcast[CsrGraph],
                     vecsB: Broadcast[VectorStore],
                     metricName: String, c: Int, dim: Int,
                     budget: Int = 120, name: String = "mv_roar"): Unit = {
    // ONE distributed searchMultiDf job serves every query set in the
    // batch — the relation route's whole point (the literal route is
    // the single-set special case of the same generator)
    def batch(s: SparkSession, qsets: Seq[(Long, Array[Array[Float]])],
              k: Int): org.apache.spark.sql.DataFrame = {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, expr}
      val qdf = qsets.flatMap { case (qid, vs) =>
        vs.zipWithIndex.map { case (v, i) => (qid, i, v.toSeq) }
      }.toDF("qset_id", "q_sub", "q_vec")
      BeamSearch.searchMultiDf(s, qdf, graphB, vecsB, metricName,
          minPq = math.max(10, budget / math.max(c, 1)),
          maxPq = math.max(200, budget * 2), budget = budget,
          adaptive = true)
        .select(col("qset_id"),
          expr(s"d_id div $c").as("dset_id"))
        .distinct()
    }
    registerMv(corpusSets, idCol, vecCol, MvEntry(
      name, corpusSets, idCol, vecCol, dim,
      (s, qset, k) => {
        import org.apache.spark.sql.functions.{col, expr}
        batch(s, Seq((0L, qset)), k).select(col("dset_id"))
      },
      batch))
  }

  /** [[registerMv]] with the persisted SHARDED graph tier as the
    * generator — the SQL flagship past the broadcast ceiling: the same
    * adaptive multivector search runs per shard through the
    * resident-LRU lifecycle (delta shards included), and the chamfer
    * rescore stays the route's own. One registration call swaps the
    * flagship's physical engine with zero SQL change. Growth-aware
    * like [[registerSharded]]: post-registration deltas are discovered
    * per query, the adaptive budget scales with per-shard growth
    * (`spark.graft.ann.budget.*`), and a non-null `refresh` lets the
    * set-level rescore follow a grow-in-place corpus. */
  def registerMvSharded(corpusSets: org.apache.spark.sql.DataFrame,
                        idCol: String, vecCol: String,
                        ref: graft.index.ShardedIndexRef, c: Int, dim: Int,
                        budget: Int = 120,
                        name: String = "mv_sharded",
                        refresh: () => org.apache.spark.sql.DataFrame = null): Unit = {
    import graft.index.{BudgetPolicy, ShardedIndex}
    // same growth posture as registerSharded: deltas ingested after
    // registration are discovered on disk per query, and the adaptive
    // budget scales with per-shard growth — the flagship's set-level
    // recall survives a month of delta-ingest without re-registration
    val regPerShard = ShardedIndex.totalRowsCached(corpusSets.sparkSession,
      ref).toDouble / math.max(ref.nShards + ref.nDeltas, 1)
    val warnedNoRefresh = new java.util.concurrent.atomic.AtomicBoolean(false)
    def batch(s: SparkSession, qsets: Seq[(Long, Array[Array[Float]])],
              k: Int): org.apache.spark.sql.DataFrame = {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, expr}
      val qdf = qsets.flatMap { case (qid, vs) =>
        vs.zipWithIndex.map { case (v, i) => (qid, i, v.toSeq) }
      }.toDF("qset_id", "q_sub", "q_vec")
      val live = ShardedIndex.discover(s, ref)
      if (live.nDeltas > ref.nDeltas && refresh == null &&
          warnedNoRefresh.compareAndSet(false, true))
        System.err.println(
          s"graft WARN: mv_sharded registration ($idCol,$vecCol) " +
          s"discovered ${live.nDeltas - ref.nDeltas} post-registration " +
          "delta(s) but has no refresh thunk — delta sets will be " +
          "searched but dropped by the rescore join; pass refresh= to " +
          "registerMvSharded")
      val perShard = ShardedIndex.totalRowsCached(s, live).toDouble /
        math.max(live.nShards + live.nDeltas, 1)
      val effBudget = BudgetPolicy.scaledL(s, budget, regPerShard, perShard)
      graft.index.ShardedIndex.searchMultiDf(s, qdf, live,
          minPq = math.max(10, effBudget / math.max(c, 1)),
          maxPq = math.max(200, effBudget * 2), budget = effBudget,
          adaptive = true)
        .select(col("qset_id"),
          expr(s"d_id div $c").as("dset_id"))
        .distinct()
    }
    registerMv(corpusSets, idCol, vecCol, MvEntry(
      name, corpusSets, idCol, vecCol, dim,
      (s, qset, k) => {
        import org.apache.spark.sql.functions.{col, expr}
        batch(s, Seq((0L, qset)), k).select(col("dset_id"))
      },
      batch,
      dataRefresh = refresh))
  }

  def lookupMvFor(idCol: String, vecCol: String,
                  child: LogicalPlan): Option[MvEntry] =
    scanFingerprint(child).flatMap(fp => mvEntries.get((idCol, vecCol, fp)))

  def lookupMv(idCol: String, vecCol: String, fp: String): Option[MvEntry] =
    mvEntries.get((idCol, vecCol, fp))

  def clear(): Unit = {
    entries.clear(); tierEntries.clear(); mvEntries.clear()
  }
}

/** Logical stand-in for an index-backed top-k search. `kind` = the
  * routed query spelling: "dot" (graft_vec_dot DESC), "l2"
  * (graft_vec_l2sq ASC), "cos" (graft_vec_cosine DESC — the most
  * common similarity spelling). `tier` picks the physical answer:
  * "graph" = broadcast RoarGraph beam search (one task);
  * "ivfpq" = partition-pruned distributed probe over the codes-only
  * index (the corpus-outgrew-the-broadcast-ceiling path).
  * `fingerprint` pins the corpus relation the rule proved at plan time;
  * doExecute re-verifies it so a registry re-registration for the same
  * (idCol, vecCol, metric) over a DIFFERENT relation between planning
  * and execution fails loudly instead of answering from the wrong
  * corpus. */
case class AnnSearchNode(output: Seq[Attribute], idName: String,
                         vecName: String, queryVec: Array[Float], k: Int,
                         idFirst: Boolean,
                         kind: String = "dot",
                         tier: String = "graph",
                         fingerprint: String = "",
                         mvDim: Int = 0,
                         mvScore: String = "chamfer") extends LeafNode {
  override def maxRows: Option[Long] = Some(k.toLong)
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = k.toLong * 16)
}

/** Opaque carrier for a `LogicalPlan` fragment inside another node's
  * fields: NOT a `TreeNode`, so Catalyst's child traversal and
  * expression transforms never descend into it — the fragment rides
  * along verbatim from the optimizer rule that captured it to the
  * physical operator that re-executes it (via
  * `GraftColumnBridge.ofRows`). `toString` shows only the tag so plan
  * strings stay readable. */
case class OpaqueSubplan(plan: LogicalPlan, tag: String) {
  override def toString: String = tag
}

/** Logical stand-in for the FILTERED top-k search —
  *
  * ```sql
  * SELECT id, graft_vec_*(vec, <literal>) AS score
  * FROM corpus WHERE <pred> ORDER BY score {DESC|ASC} LIMIT k
  * ```
  *
  * — the filtered-ANN shape every metadata-constrained retrieval runs
  * (lang = 'en', source = ..., id ranges). `filtered` carries the whole
  * `Filter(pred, scan)` subtree opaquely; execution generates an
  * ESCALATING candidate stream from the routed tier (graph beam /
  * candidate generator), keeps candidates that pass the predicate (the
  * carried subplan re-executes with full parquet pushdown, constrained
  * to the candidate ids), rescores them with the query's OWN expression
  * and stops as soon as k survivors exist — or the tier saturates, at
  * which point the answer is EXACT (every corpus row the tier can reach
  * was considered). `spark.graft.ann.filtered.exact=true` jumps straight
  * to the saturating fetch (the certificate mode, mirroring
  * g9_sql_saturated). Before any search, a bounded probe
  * (`limit(preFilterMax+1).count()` on the pushed-down filtered scan)
  * detects SELECTIVE predicates: at most
  * `spark.graft.ann.filtered.preFilterMax` surviving rows (default 2k;
  * 0 disables) short-circuits to scoring them ALL — exact by
  * construction and cheaper than beam + escalation, the classic
  * brute-force-when-selective strategy. Scores always equal the
  * exhaustive plan's — bit-for-bit — only the candidate SET is
  * approximate below saturation. */
case class AnnFilteredTopKNode(output: Seq[Attribute], idName: String,
                               vecName: String, queryVec: Array[Float],
                               k: Int, idFirst: Boolean, kind: String,
                               tier: String, fingerprint: String,
                               filtered: OpaqueSubplan) extends LeafNode {
  override def maxRows: Option[Long] = Some(k.toLong)
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = k.toLong * 16)
}

/** Logical stand-in for the query-RELATION flagship route: per-query-set
  * top-k over Join(query relation, registered set corpus) by chamfer
  * DESC, one statement for ANY number of query sets — the reference
  * harness's real multiplicity (10k query sets per sweep,
  * `tests/test_search_multivector_rerank.cpp:276`). UNARY: the query
  * side stays in the plan as `child` (any subplan — relation, filter,
  * aggregate — planned and executed normally, then collected: it is
  * the bounded side of a top-k search by definition); only the
  * corpus-scoring join + rank window are replaced. `qsetId`/`qVecId`
  * pin the child's id and `array<array<float>>` columns by exprId;
  * `fingerprint` pins the corpus relation proven at plan time. */
case class MvJoinTopKNode(output: Seq[Attribute], child: LogicalPlan,
                          qsetAttr: Attribute, qVecAttr: Attribute,
                          dsetName: String, dVecName: String, k: Int,
                          tier: String, fingerprint: String, mvDim: Int,
                          score: String = "chamfer")
    extends UnaryNode {
  // qsetAttr/qVecAttr are Expression-typed fields, so they surface in
  // this node's `references` — no later rule can prune the query-side
  // vec column out from under the exec
  override protected def withNewChildInternal(c: LogicalPlan): MvJoinTopKNode =
    copy(child = c)
  override def maxRows: Option[Long] =
    child.maxRows.map(q => q * k.toLong)
  // the corpus-side id and the chamfer score are PRODUCED here (their
  // source subtree was replaced); without this the node prints with the
  // missing-input `!` marker
  override def producedAttributes: AttributeSet =
    AttributeSet(output.filterNot(child.outputSet.contains))
}

/** Logical stand-in for the SINGLE-VECTOR query-relation route:
  * per-query top-k over Join(query relation, registered corpus) by
  * `graft_vec_cosine`/`graft_vec_dot` DESC or `graft_vec_l2sq` ASC —
  * one statement for ANY number of query vectors (the reference
  * harness's G8 multiplicity, `tests/test_search_roargraph.cpp`: 10k
  * queries per sweep). Same unary posture as [[MvJoinTopKNode]]: the
  * query side survives as `child` (any subplan, executed then
  * collected — the bounded side of a top-k search by definition);
  * the corpus-scoring join + rank window are replaced. `kind` is the
  * matched spelling ("cos"/"dot"/"l2"); `tier` the chosen physical
  * generator ("graph" or a batch-capable candidate tier). */
case class SvJoinTopKNode(output: Seq[Attribute], child: LogicalPlan,
                          qAttr: Attribute, qVecAttr: Attribute,
                          dName: String, dVecName: String, k: Int,
                          kind: String, tier: String, fingerprint: String)
    extends UnaryNode {
  override protected def withNewChildInternal(c: LogicalPlan): SvJoinTopKNode =
    copy(child = c)
  override def maxRows: Option[Long] =
    child.maxRows.map(q => q * k.toLong)
  override def producedAttributes: AttributeSet =
    AttributeSet(output.filterNot(child.outputSet.contains))
}

/** Optimizer rule: exhaustive sort-limit over `graft_vec_dot` → ANN. */
object AnnTopKRule extends Rule[LogicalPlan] {

  /** NULL-bearing literals (a null array, or `array(1.0F, NULL, …)`)
    * must BAIL OUT to the exhaustive plan: the null-intolerant
    * expressions evaluate them to NULL scores (ordered last), while
    * `ArrayData.toFloatArray` would silently read the null slot as
    * 0.0f — a routed plan would then answer a DIFFERENT question than
    * the exhaustive one. */
  private def noNulls(a: ArrayData): Boolean = {
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) return false
      i += 1
    }
    true
  }

  private def asFloatArray(l: Literal): Option[Array[Float]] =
    if (l.value == null) None
    else l.dataType match {
      case ArrayType(FloatType, _) =>
        Some(l.value.asInstanceOf[ArrayData]).filter(noNulls)
          .map(_.toFloatArray())
      case ArrayType(DoubleType, _) =>
        Some(l.value.asInstanceOf[ArrayData]).filter(noNulls)
          .map(_.toDoubleArray().map(_.toFloat))
      case _ => None
    }

  private def dotOf(e: Expression): Option[(AttributeReference, Array[Float])] =
    e match {
      case VecDotExpr(a: AttributeReference, l: Literal) =>
        asFloatArray(l).map(v => (a, v))
      case VecDotExpr(l: Literal, a: AttributeReference) =>
        asFloatArray(l).map(v => (a, v))
      case _ => None
    }

  private def l2Of(e: Expression): Option[(AttributeReference, Array[Float])] =
    e match {
      case VecL2SqExpr(a: AttributeReference, l: Literal) =>
        asFloatArray(l).map(v => (a, v))
      case VecL2SqExpr(l: Literal, a: AttributeReference) =>
        asFloatArray(l).map(v => (a, v))
      case _ => None
    }

  private def cosOf(e: Expression): Option[(AttributeReference, Array[Float])] =
    e match {
      case VecCosineExpr(a: AttributeReference, l: Literal) =>
        asFloatArray(l).map(v => (a, v))
      case VecCosineExpr(l: Literal, a: AttributeReference) =>
        asFloatArray(l).map(v => (a, v))
      case _ => None
    }

  private def asFloatMatrix(l: Literal): Option[Array[Array[Float]]] =
    if (l.value == null) None
    else l.dataType match {
      case ArrayType(et @ ArrayType(FloatType, _), _) =>
        Some(l.value.asInstanceOf[ArrayData]).filter(noNulls)
          .map(_.toArray[ArrayData](et))
          .filter(_.forall(noNulls))
          .map(_.map(_.toFloatArray()))
      case ArrayType(et @ ArrayType(DoubleType, _), _) =>
        Some(l.value.asInstanceOf[ArrayData]).filter(noNulls)
          .map(_.toArray[ArrayData](et))
          .filter(_.forall(noNulls))
          .map(_.map(_.toDoubleArray().map(_.toFloat)))
      case _ => None
    }

  /** The flagship set-level shape: a set-scoring function of a QUERY-set
    * literal (first argument — both functions are asymmetric) against
    * the set column. Returns the attr, the literal matrix, and which
    * scorer ("chamfer" | "maxsim") so the rescore runs the query's own
    * function. */
  private def setScoreOf(e: Expression)
      : Option[(AttributeReference, Array[Array[Float]], String)] = e match {
    case VecChamferExpr(l: Literal, a: AttributeReference) =>
      asFloatMatrix(l).map(m => (a, m, "chamfer"))
    case VecMaxSimExpr(l: Literal, a: AttributeReference) =>
      asFloatMatrix(l).map(m => (a, m, "maxsim"))
    case _ => None
  }

  /** The query-RELATION form of the flagship set-level query — ONE
    * statement for any number of query sets:
    *
    * {{{
    * SELECT qset_id, dset_id, score FROM (
    *   SELECT q.qset_id, d.dset_id,
    *          graft_chamfer_score(q.vec_set, d.vec_set) AS score,
    *          row_number() OVER (PARTITION BY q.qset_id
    *            ORDER BY graft_chamfer_score(q.vec_set, d.vec_set) DESC,
    *                     d.dset_id ASC) AS rnk
    *   FROM query_sets q CROSS JOIN graft_mv_sets d) t
    * WHERE rnk <= k
    * }}}
    *
    * Matched against the POST-optimizer shape (this rule runs in the
    * user batch): Project over Filter(rnk ≤ k) over Window(row_number
    * partitioned by the query-side id, ordered chamfer DESC
    * [, corpus-id ASC]) over [WindowGroupLimit] over Project(chamfer
    * score/order aliases) over an unconditioned Inner/Cross Join whose
    * CORPUS side fingerprints to a registered [[AnnIndexRegistry
    * .MvEntry]]. The query side is arbitrary and survives as the
    * rewritten node's child. The outer projection may compute anything
    * over the three routed columns (round, tags, renames); referencing
    * anything else (rnk, raw vec sets) bails out to the exhaustive
    * plan. ASC chamfer order (farthest sets) never matches. */
  private def rewriteMvJoin(p: Project, outerList: Seq[NamedExpression],
                            cond: Expression, w: Window): Option[LogicalPlan] = {
    val header = w.windowExpressions match {
      case Seq(al @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(Seq(part: AttributeReference), os, _)), _)) =>
        Some((al, part, os))
      case _ => None
    }
    for {
      (rnkAlias, qsetAttr, orderSpec) <- header
      k <- cond match {
        case LessThanOrEqual(a: AttributeReference,
            Literal(k: Int, IntegerType)) if a.exprId == rnkAlias.exprId =>
          Some(k)
        case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
            if a.exprId == rnkAlias.exprId => Some(k - 1)
        case _ => None
      }
      if k > 0
      // InferWindowGroupLimit may already have inserted its per-group
      // truncation below the Window — transparent either way
      inner = w.child match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      (plist, join) <- inner match {
        case Project(pl, j: Join)
            if (j.joinType == Cross || j.joinType == Inner) &&
              j.condition.isEmpty => Some((pl, j))
        case _ => None
      }
      w0Pair <- orderSpec.headOption.collect {
        case SortOrder(a: AttributeReference, d @ (Descending | Ascending),
            _, _) => (a, d)
      }
      (w0Attr, w0Dir) = w0Pair
      tieOpt <- orderSpec.drop(1) match {
        case Seq() => Some(None)
        case Seq(SortOrder(a: AttributeReference, Ascending, _, _)) =>
          Some(Some(a))
        case _ => None
      }
      w0Child <- plist.collectFirst {
        case a @ Alias(child, _) if a.exprId == w0Attr.exprId => child
      }
      qdTriple <- w0Child match {
        case VecChamferExpr(qv: AttributeReference, dv: AttributeReference)
            if w0Dir == Descending => Some((qv, dv, "chamfer"))
        case VecMaxSimExpr(qv: AttributeReference, dv: AttributeReference)
            if w0Dir == Descending => Some((qv, dv, "maxsim"))
        case VecCosineExpr(qv: AttributeReference, dv: AttributeReference)
            if w0Dir == Descending => Some((qv, dv, "cos"))
        case VecDotExpr(qv: AttributeReference, dv: AttributeReference)
            if w0Dir == Descending => Some((qv, dv, "dot"))
        case VecL2SqExpr(qv: AttributeReference, dv: AttributeReference)
            if w0Dir == Ascending => Some((qv, dv, "l2"))
        case _ => None
      }
      (qVec, dVec, scoreName) = qdTriple
      sides <-
        if (join.left.outputSet.contains(qVec) &&
            join.right.outputSet.contains(dVec))
          Some((join.left, join.right))
        else if (join.right.outputSet.contains(qVec) &&
            join.left.outputSet.contains(dVec))
          Some((join.right, join.left))
        else None
      (qSide, dSide) = sides
      if qSide.outputSet.contains(qsetAttr) && qsetAttr.dataType == LongType
      dsetAttr <- plist.collect {
        case a: AttributeReference
            if dSide.outputSet.contains(a) && a.dataType == LongType => a
      } match {
        case Seq(one) => Some(one)
        case many => tieOpt.flatMap(t => many.find(_.exprId == t.exprId))
      }
      if tieOpt.forall(_.exprId == dsetAttr.exprId)
      scoreAlias <- plist.collectFirst {
        case a @ Alias(child, _)
            if a.exprId != w0Attr.exprId && child.semanticEquals(w0Child) => a
      }
      if outerList.forall(_.references.subsetOf(AttributeSet(
        Seq(qsetAttr, dsetAttr, scoreAlias.toAttribute))))
      fp <- AnnIndexRegistry.scanFingerprint(dSide)
      node <- scoreName match {
        case "chamfer" | "maxsim" =>
          AnnIndexRegistry.lookupMvFor(dsetAttr.name, dVec.name, dSide)
            .map(entry => MvJoinTopKNode(
              Seq(qsetAttr, dsetAttr, scoreAlias.toAttribute), qSide,
              qsetAttr, qVec, dsetAttr.name, dVec.name, k,
              entry.name, fp, entry.dim, scoreName): LogicalPlan)
        case kind =>
          // SINGLE-VECTOR relation route: same tier family as the
          // literal arm — graph first (broadcast ceiling honored),
          // otherwise a candidate tier that registered a BATCH
          // generator. Query dims gate at execute time (the query side
          // is a relation — its vectors exist only at runtime; a
          // mismatch fails loudly, exactly like the exhaustive plan's
          // expression would).
          val pref = SQLConf.get
            .getConfString("spark.graft.ann.tier", "").trim
          val ceiling = org.apache.spark.network.util.JavaUtils
            .byteStringAsBytes(SQLConf.get.getConfString(
              "spark.graft.ann.broadcastMaxBytes", "4g"))
          val graphEntry = AnnIndexRegistry
            .lookupFor(dsetAttr.name, dVec.name, kind, dSide)
          val graph = graphEntry
            .filter(_ => dSide.stats.sizeInBytes <= BigInt(ceiling))
            .map(_ => "graph")
          def tiers(p: Option[String]) = AnnIndexRegistry
            .lookupTierFor(dsetAttr.name, dVec.name, kind, dSide, p)
            .filter(_.candidatesBatch != null)
            .map(_.name)
          val tier =
            if (pref == "graph") graphEntry.map(_ => "graph")
            else if (pref.nonEmpty) tiers(Some(pref))
            else graph.orElse(tiers(None))
          tier.map(t => SvJoinTopKNode(
            Seq(qsetAttr, dsetAttr, scoreAlias.toAttribute), qSide,
            qsetAttr, qVec, dsetAttr.name, dVec.name, k,
            kind, t, fp): LogicalPlan)
      }
    } yield p.copy(child = node)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString("spark.graft.ann.rewrite", "false").toBoolean) {
      return plan
    }
    plan.transformDown {
      case p @ Project(outerList, Filter(cond, w: Window)) =>
        rewriteMvJoin(p, outerList, cond, w).getOrElse(p)
      // dot/cosine DESC (similarity) and l2² ASC (nearest) all route;
      // dot/cosine ASC / l2 DESC are farthest-point queries no ANN index
      // answers — left exhaustive by the direction⇄expression pairing
      // below. A Project pushed between the limit and the sort
      // (Catalyst's project-through-limit — e.g. a user wrapping the
      // routed query to stamp a tag column or re-round the score) is
      // TRANSPARENT: the rule matches through it and re-wraps it over
      // the search node, so the common "SELECT extras FROM (<routed
      // top-k>)" shape still routes.
      case limit @ GlobalLimit(Literal(k: Int, _), LocalLimit(_, body)) =>
        val unwrapped = body match {
          case s: Sort => Some((None: Option[Project], s))
          case p @ Project(_, s: Sort) => Some((Some(p), s))
          case _ => None
        }
        unwrapped match {
          case Some((wrapper,
              Sort(Seq(SortOrder(sortKey: AttributeReference, dir, _, _)), true,
                Project(projList, projChild), _)))
              if projList.length == 2 =>
        // FILTERED shape: a deterministic predicate between the
        // projection and the scan routes too (post-filter with
        // escalation — AnnFilteredTopKNode). The whole Filter subtree
        // is carried and re-executed, so the predicate may reference
        // ANY corpus column (including the vector itself); only
        // nondeterministic predicates bail out (they cannot be
        // re-evaluated in a second scan without changing the answer).
        val (filterCond, scanChild) = projChild match {
          case Filter(c, fc)
              if c.deterministic && SQLConf.get.getConfString(
                "spark.graft.ann.filtered", "true").toBoolean =>
            (Some(c), fc)
          case _ => (None, projChild)
        }
        val rewritten = for {
          scoreAlias <- projList.collectFirst {
            case a @ Alias(child, _) if a.exprId == sortKey.exprId => (a, child)
          }
          (vecAttr, qv, kind) <- dir match {
            case Descending =>
              dotOf(scoreAlias._2).map { case (a, v) => (a, v, "dot") }
                .orElse(cosOf(scoreAlias._2).map { case (a, v) =>
                  (a, v, "cos") })
            case Ascending =>
              l2Of(scoreAlias._2).map { case (a, v) => (a, v, "l2") }
            case _ => None
          }
          idAttr <- projList.collectFirst {
            case a: AttributeReference if a.exprId != sortKey.exprId => a
          }
          if idAttr.dataType == LongType
          // identity check: the Project must sit directly on the
          // REGISTERED relation — a Filter/Sample/Join in between, or a
          // different table that happens to share column names, bails out
          // to the exhaustive plan rather than silently searching the
          // whole registered corpus. Graph tier first (broadcast, one
          // task); otherwise the cheapest registered candidate tier by
          // costHint. `spark.graft.ann.tier` forces a tier by name
          // ("graph" = the broadcast graph; a name with no registration
          // routes nowhere — exhaustive plan, failing safe).
          // dim-mismatch gates on both: the exhaustive plan's expression
          // throws on it; the index path must not instead return
          // truncated scores — bail out so both routes fail identically.
          //
          // BROADCAST CEILING: the graph tier holds the whole corpus
          // driver/executor-resident (VectorStore broadcast — the one
          // documented scale ceiling, SURVEY §7.3). When the corpus
          // relation's estimated bytes (parquet stats via plan
          // statistics) exceed `spark.graft.ann.broadcastMaxBytes`
          // (default 4g ≈ the reference's own 10M×200d in-RAM scale),
          // the chooser SKIPS the graph entry and falls to the
          // registered candidate tiers (sharded / IVF-PQ / SQ8) —
          // the scale path — automatically. An explicit
          // `spark.graft.ann.tier=graph` force overrides the ceiling:
          // forcing a tier by name is the operator's assertion that
          // they know the memory cost.
          tier <- {
            val pref = SQLConf.get
              .getConfString("spark.graft.ann.tier", "").trim
            val ceiling = org.apache.spark.network.util.JavaUtils
              .byteStringAsBytes(SQLConf.get.getConfString(
                "spark.graft.ann.broadcastMaxBytes", "4g"))
            val graphEntry = AnnIndexRegistry
              .lookupFor(idAttr.name, vecAttr.name, kind, scanChild)
              .filter(_.rawVecsB.value.dim == qv.length)
            val graph = graphEntry
              .filter(_ => scanChild.stats.sizeInBytes <= BigInt(ceiling))
              .map(_ => "graph")
            def tiers(p: Option[String]) = AnnIndexRegistry
              .lookupTierFor(idAttr.name, vecAttr.name, kind, scanChild, p)
              .filter(_.dim == qv.length)
              .map(_.name)
            if (pref == "graph") graphEntry.map(_ => "graph")
            else if (pref.nonEmpty) tiers(Some(pref))
            else graph.orElse(tiers(None))
          }
          fp <- AnnIndexRegistry.scanFingerprint(scanChild)
        } yield filterCond match {
          case None =>
            AnnSearchNode(projList.map(_.toAttribute), idAttr.name,
              vecAttr.name, qv, k,
              idFirst = projList.head.exprId == idAttr.exprId, kind = kind,
              tier = tier, fingerprint = fp): LogicalPlan
          case Some(cond) =>
            AnnFilteredTopKNode(projList.map(_.toAttribute), idAttr.name,
              vecAttr.name, qv, k,
              idFirst = projList.head.exprId == idAttr.exprId, kind = kind,
              tier = tier, fingerprint = fp,
              filtered = OpaqueSubplan(projChild,
                "pred=" + cond.toString.take(120))): LogicalPlan
        }
        // the SET-LEVEL flagship shape: chamfer(query-set literal,
        // vec_set) DESC LIMIT k over a registered set relation; ASC is
        // a farthest-set query no index answers — left exhaustive
        val mvRewritten = for {
          scoreAlias <- projList.collectFirst {
            case a @ Alias(child, _) if a.exprId == sortKey.exprId => (a, child)
          }
          if dir == Descending
          (vecAttr, qsets, scoreName) <- setScoreOf(scoreAlias._2)
          idAttr <- projList.collectFirst {
            case a: AttributeReference if a.exprId != sortKey.exprId => a
          }
          if idAttr.dataType == LongType
          entry <- AnnIndexRegistry
            .lookupMvFor(idAttr.name, vecAttr.name, projChild)
          if qsets.nonEmpty && qsets.forall(_.length == entry.dim)
          fp <- AnnIndexRegistry.scanFingerprint(projChild)
        } yield AnnSearchNode(projList.map(_.toAttribute), idAttr.name,
          vecAttr.name, qsets.flatten, k,
          idFirst = projList.head.exprId == idAttr.exprId,
          kind = "mv", tier = entry.name, fingerprint = fp,
          mvDim = entry.dim, mvScore = scoreName)
        rewritten.orElse(mvRewritten)
          .map[LogicalPlan](n =>
            wrapper.map(w => w.copy(child = n): LogicalPlan).getOrElse(n))
          .getOrElse(limit)
          case _ => limit
        }
    }
  }
}

/** Physical planning for [[AnnSearchNode]]. */
object AnnStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AnnSearchNode => AnnSearchExec(n) :: Nil
    case n: AnnFilteredTopKNode => AnnFilteredTopKExec(n) :: Nil
    case n: MvJoinTopKNode => MvJoinTopKExec(n, planLater(n.child)) :: Nil
    case n: SvJoinTopKNode => SvJoinTopKExec(n, planLater(n.child)) :: Nil
    case _ => Nil
  }
}

/** Shared guard for the relation routes' COLLECTED query side: the
  * query relation is the bounded side of a top-k search by definition,
  * but "bounded" must be enforced, not assumed — a runaway subplan
  * would otherwise OOM the driver inside executeCollect.
  * `spark.graft.ann.relation.maxQueries` (default 100000) caps it;
  * `executeTake(cap+1)` stops reading early instead of materializing
  * the overflow. */
private[plans] object RelationQueryGuard {
  def apply(child: SparkPlan): Array[InternalRow] = {
    val cap = SQLConf.get.getConfString(
      "spark.graft.ann.relation.maxQueries", "100000").toInt
    val taken = child.executeTake(cap + 1)
    if (taken.length > cap)
      sys.error(s"query relation exceeds spark.graft.ann.relation" +
        s".maxQueries=$cap — the routed plan collects the query side; " +
        "raise the cap or run with spark.graft.ann.rewrite=false")
    taken
  }
}

/** Physical side of the query-relation flagship route: execute the
  * planned query-side child and COLLECT it (the bounded side — the
  * same posture as a broadcast exchange materializing its child), run
  * the registered generator's BATCHED candidate search (one
  * distributed job for every query set), then rescore the bounded
  * (qset, dset) candidate pairs with the query's OWN chamfer
  * expression against the corpus relation — candidates and query sets
  * broadcast, the corpus read once, never shuffled, never resident.
  * Scores equal the exhaustive plan's bit-for-bit; only the candidate
  * SET per query is approximate. Per-query top-k runs on the bounded
  * candidates via the bounded-heap aggregator (ties: id ASC — the
  * matched ORDER BY's tiebreak). */
case class MvJoinTopKExec(node: MvJoinTopKNode, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = node.output
  override protected def withNewChildInternal(c: SparkPlan): MvJoinTopKExec =
    copy(child = c)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numQueries" -> SQLMetrics.createMetric(sparkContext,
      "query sets collected"))

  override protected def doExecute(): RDD[InternalRow] = {
    val entry = AnnIndexRegistry
      .lookupMv(node.dsetName, node.dVecName, node.fingerprint)
      .getOrElse(sys.error(
        s"multivector tier for (${node.dsetName}, ${node.dVecName}, " +
          s"${node.fingerprint}) vanished"))
    val qIdx = child.output.indexWhere(_.exprId == node.qsetAttr.exprId)
    val vIdx = child.output.indexWhere(_.exprId == node.qVecAttr.exprId)
    require(qIdx >= 0 && vIdx >= 0,
      "query-side columns vanished from the planned child")
    val qsets = RelationQueryGuard(child).iterator.map { r =>
      require(!r.isNullAt(qIdx) && !r.isNullAt(vIdx),
        "NULL query set: the routed plan cannot reproduce NULL-score " +
          "ordering — run with spark.graft.ann.rewrite=false")
      val arr = r.getArray(vIdx)
      val subs = new Array[Array[Float]](arr.numElements())
      var i = 0
      while (i < subs.length) {
        require(!arr.isNullAt(i), "NULL sub-vector in query set")
        val sub = arr.getArray(i)
        var j = 0
        while (j < sub.numElements()) {
          require(!sub.isNullAt(j), "NULL component in query sub-vector")
          j += 1
        }
        val fa = sub.toFloatArray()
        require(fa.length == node.mvDim,
          s"query sub-vector dim ${fa.length} != corpus dim ${node.mvDim}")
        subs(i) = fa
        i += 1
      }
      (r.getLong(qIdx), subs)
    }.toSeq
    metrics("numQueries").add(qsets.size)
    val out: Array[(Long, Long, Double)] =
      if (qsets.isEmpty) Array.empty
      else {
        import org.apache.spark.sql.functions.{broadcast, col}
        import graft.functions.VectorFunctions.{chamferScore, maxSimScore}
        val spark = entry.data.sparkSession
        import spark.implicits._
        val cands = entry.candidatesBatch(spark, qsets, node.k)
        val qdf = qsets.map { case (id, vs) => (id, vs.map(_.toSeq).toSeq) }
          .toDF("__graft_qid", "__graft_qset")
        val scored = entry.liveData
          .join(broadcast(cands.select(col("qset_id").as("__graft_qid"),
              col("dset_id").as("__graft_cand_id"))),
            col(entry.dataIdCol) === col("__graft_cand_id"))
          .join(broadcast(qdf), Seq("__graft_qid"))
          .select(col("__graft_qid"),
            col(entry.dataIdCol).cast("long").as("__graft_did"),
            (if (node.score == "maxsim")
               maxSimScore(col("__graft_qset"), col(entry.dataVecCol))
             else chamferScore(col("__graft_qset"), col(entry.dataVecCol)))
              .cast("double").as("__graft_score"))
          // a NULL-scored corpus set (null members) is ordered last by
          // the exhaustive DESC sort — it can only appear in a top-k
          // when non-null sets run out, which a candidate route cannot
          // reproduce anyway; drop them
          .filter(col("__graft_score").isNotNull)
        graft.operators.TopK.perGroupAgg(scored, Seq(col("__graft_qid")),
            col("__graft_score"), col("__graft_did"), node.k,
            idName = "__graft_did")
          .select(col("__graft_qid"), col("__graft_did"), col("score"))
          .as[(Long, Long, Double)].collect()
      }
    val schema = node.output.map(_.dataType).toArray
    sparkContext.parallelize(out.toIndexedSeq, 1).mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      it.map { case (q, d, s) => proj(InternalRow(q, d, s)) }
    }
  }
}

/** G8 search + exact rescoring, emitted as a one-partition scan. A
  * candidate tier ("ivfpq" or any [[AnnIndexRegistry.registerTier]]
  * plug-in) instead answers via a sub-query at execute time — the
  * registered generator produces a bounded candidate-id set (for the
  * built-in IVF-PQ: a partition-pruned ADC scan of the codes index),
  * then exact rescoring with the routed query's OWN expression against
  * the base table (a broadcast-candidates join: the corpus is read,
  * never shuffled, never resident) — and emits the collected k rows.
  * Running the candidate job from the driver inside doExecute is the
  * same pattern as a broadcast exchange materializing its child. */
case class AnnSearchExec(node: AnnSearchNode) extends LeafExecNode {
  override def output: Seq[Attribute] = node.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numCandidates" -> SQLMetrics.createMetric(sparkContext,
      "candidate ids considered"))

  private def tierRows(entry: AnnIndexRegistry.CandidateTierEntry): Array[(Long, Double)] = {
    import org.apache.spark.sql.functions.{broadcast, col, typedlit}
    import graft.functions.VectorFunctions.{vecCosine, vecDot, vecL2Sq}
    val spark = entry.data.sparkSession
    import spark.implicits._
    val cands = entry.candidates(spark, node.queryVec, node.k)
    val qLit = typedlit(node.queryVec)
    val score = node.kind match {
      case "l2" => vecL2Sq(col(entry.dataVecCol), qLit)
      case "cos" => vecCosine(col(entry.dataVecCol), qLit)
      case _ => vecDot(col(entry.dataVecCol), qLit)
    }
    // candidate ids under a reserved alias: a corpus whose id column is
    // itself named d_id would otherwise make the join condition ambiguous
    val scored = entry.liveData
      .join(broadcast(cands.select(col("d_id").as("__graft_cand_id"))),
        col(entry.dataIdCol) === col("__graft_cand_id"))
      .select(col(entry.dataIdCol).cast("long").as("id"),
        score.cast("double").as("score"))
    val ordered =
      if (node.kind == "l2") scored.orderBy(col("score").asc, col("id").asc)
      else scored.orderBy(col("score").desc, col("id").asc)
    ordered.limit(node.k).as[(Long, Double)].collect()
  }

  /** Set-level route: run the registered G9 candidate generator, then
    * rescore the bounded candidate set with the query's OWN chamfer
    * expression against the set relation (broadcast-candidates join —
    * the corpus is read, never shuffled, never resident). Scores equal
    * the exhaustive plan's bit-for-bit; only the candidate SET is
    * approximate. */
  private def mvRows(entry: AnnIndexRegistry.MvEntry): Array[(Long, Double)] = {
    import org.apache.spark.sql.functions.{broadcast, col, typedlit}
    import graft.functions.VectorFunctions.{chamferScore, maxSimScore}
    val spark = entry.data.sparkSession
    import spark.implicits._
    val qsets = node.queryVec.grouped(node.mvDim).toArray
    val cands = entry.candidates(spark, qsets, node.k)
    val qLit = typedlit(qsets.map(_.toSeq).toSeq)
    val score =
      if (node.mvScore == "maxsim") maxSimScore(qLit, col(entry.dataVecCol))
      else chamferScore(qLit, col(entry.dataVecCol))
    val scored = entry.liveData
      .join(broadcast(cands.select(col("dset_id").as("__graft_cand_id"))),
        col(entry.dataIdCol) === col("__graft_cand_id"))
      .select(col(entry.dataIdCol).cast("long").as("id"),
        score.cast("double").as("score"))
    scored.orderBy(col("score").desc, col("id").asc)
      .limit(node.k).as[(Long, Double)].collect()
  }

  /** The rule proved at plan time that the query's relation IS the
    * registered corpus; a re-registration for the same (idCol, vecCol,
    * metric) over a different relation between planning and execution
    * would silently answer from the wrong corpus — fail loudly instead. */
  private def checkFingerprint(storedFp: String, what: String): Unit =
    if (node.fingerprint.nonEmpty && storedFp != node.fingerprint)
      sys.error(s"$what for (${node.idName}, ${node.vecName}) was " +
        "re-registered over a different relation after planning " +
        s"(planned ${node.fingerprint}, registry has $storedFp)")

  override protected def doExecute(): RDD[InternalRow] = {
    if (node.kind == "mv") {
      // fingerprint is part of the registry key now, so the lookup
      // itself proves the planned relation is still the registered one
      val entry = AnnIndexRegistry
        .lookupMv(node.idName, node.vecName, node.fingerprint)
        .getOrElse(sys.error(
          s"multivector tier for (${node.idName}, ${node.vecName}, " +
            s"${node.fingerprint}) vanished"))
      val rows = mvRows(entry)
      val idFirst = node.idFirst
      val schema = node.output.map(_.dataType).toArray
      return sparkContext.parallelize(rows.toIndexedSeq, 1).mapPartitions { it =>
        val proj = UnsafeProjection.create(schema)
        it.map { case (id, s) =>
          proj(if (idFirst) InternalRow(id, s) else InternalRow(s, id))
        }
      }
    }
    if (node.tier != "graph") {
      val (storedFp, entry) = AnnIndexRegistry
        .lookupTierWithFp(node.idName, node.vecName, node.kind,
          preferred = Some(node.tier))
        .getOrElse(sys.error(
          s"candidate tier '${node.tier}' for (${node.idName}, " +
            s"${node.vecName}) vanished"))
      checkFingerprint(storedFp, "candidate tier")
      val rows = tierRows(entry)
      val idFirst = node.idFirst
      val schema = node.output.map(_.dataType).toArray
      return sparkContext.parallelize(rows.toIndexedSeq, 1).mapPartitions { it =>
        val proj = UnsafeProjection.create(schema)
        it.map { case (id, s) =>
          proj(if (idFirst) InternalRow(id, s) else InternalRow(s, id))
        }
      }
    }
    val (graphFp, entry) =
      AnnIndexRegistry.lookupWithFp(node.idName, node.vecName, node.kind)
        .getOrElse(sys.error(
          s"ANN index for (${node.idName}, ${node.vecName}) vanished"))
    checkFingerprint(graphFp, "ANN index")
    val qv = node.queryVec
    val k = node.k
    val idFirst = node.idFirst
    val kind = node.kind
    val schema = node.output.map(_.dataType).toArray
    val candMetric = metrics("numCandidates")
    sparkContext.parallelize(Seq(0), 1).mapPartitions { _ =>
      val graph = entry.graphB.value
      val searchVecs = entry.searchVecsB.value
      val raw = entry.rawVecsB.value
      val metric = Metrics(entry.metricName)
      val q = if (metric.normalizeAtLoad) VectorStore.normalized(qv) else qv
      val visited = new VisitedSet(graph.n)
      val l = math.max(entry.searchL, 4 * k)
      val (queue, _, _) = BeamSearch.searchSingle(graph, searchVecs, metric,
        q, l, visited)
      candMetric.add(queue.size)
      // exact rescoring over RAW vectors — scores == the original
      // expression's values (graft_vec_dot, graft_vec_l2sq or
      // graft_vec_cosine; cosine mirrors VecCosineExpr's fused loop, so
      // values are bit-identical to the exhaustive plan's)
      require(raw.dim == qv.length,
        s"query dim ${qv.length} != corpus dim ${raw.dim}")
      val scored = (0 until queue.size).map { i =>
        val id = queue.id(i)
        val off = raw.offset(id)
        val n = raw.dim
        var s = 0.0
        var j = 0
        kind match {
          case "l2" =>
            while (j < n) {
              val d = raw.data(off + j).toDouble - qv(j).toDouble
              s += d * d
              j += 1
            }
          case "cos" =>
            var dot = 0.0
            var na = 0.0
            var nb = 0.0
            while (j < n) {
              val u = raw.data(off + j).toDouble
              val v = qv(j).toDouble
              dot += u * v; na += u * u; nb += v * v
              j += 1
            }
            s = dot / (math.sqrt(na) * math.sqrt(nb))
          case _ =>
            while (j < n) { s += raw.data(off + j).toDouble * qv(j).toDouble; j += 1 }
        }
        (id.toLong, s)
      }.sortBy { case (id, s) => (if (kind == "l2") s else -s, id) }.take(k)
      val proj = UnsafeProjection.create(schema)
      scored.iterator.map { case (id, s) =>
        val row = if (idFirst) InternalRow(id, s) else InternalRow(s, id)
        proj(row)
      }
    }
  }
}

/** Physical side of the FILTERED top-k route: escalating post-filter.
  *
  * Each round fetches a candidate stream of target size `c` from the
  * routed tier (graph beam with l=c, or the registered candidate
  * generator), re-executes the carried `Filter(pred, scan)` subplan
  * CONSTRAINED to those candidate ids (an IN filter that reaches the
  * parquet scan for bounded id sets, a broadcast-candidates join above
  * that — the corpus is never resident and never shuffled), rescores
  * survivors with the query's OWN expression, and answers when k
  * survivors exist. No k survivors → `c` quadruples and the round
  * repeats; when the tier SATURATES (the beam exhausted the reachable
  * set, or the generator returned fewer than asked) the answer is exact
  * over everything the tier can reach and escalation stops. Tier
  * REACHABILITY is not corpus coverage — a generator tier (IVF-PQ, SQ8)
  * is bounded by its probe parameters and a graph beam by connectivity —
  * so two backstops keep the route honest: (1) exact mode over a
  * NON-graph tier skips the generator entirely and scores the full
  * filtered scan (the pre-filter path — exact by construction, since a
  * generator's saturating fetch proves nothing about unprobed cells);
  * (2) when escalation ends with fewer than k survivors, the exec falls
  * back to the same exhaustive filtered scan (conf
  * `spark.graft.ann.filtered.fallbackExhaustive`, default true, metric
  * `numExhaustiveFallback`) instead of silently under-returning rows
  * the exhaustive plan would have found. Cost model
  * at scale: each round is one column-pruned, predicate+id-pushed scan
  * plus O(c) exact distances — the predicate's selectivity sets how many
  * rounds run (selective predicates escalate toward the saturating fetch,
  * which equals the exhaustive plan's cost; permissive predicates answer
  * in round one at a tiny fraction of it).
  *
  * Conf knobs (read from the executing session at execute time):
  * `spark.graft.ann.filtered.overfetch` (initial c = overfetch·k,
  * default 8), `.maxRounds` (default 6), `.exact` (jump straight to the
  * saturating fetch — the certificate mode: the answer then equals the
  * exhaustive plan's, which knn_sql_filtered hash-proves), `.isinMax`
  * (IN-pushdown vs broadcast-join switchover, default 100000).
  *
  * NULL-scored survivors (null vector cells) are dropped — the same
  * posture as MvJoinTopKExec: the exhaustive DESC sort orders them last,
  * so they only matter when non-null rows run out, which a candidate
  * route cannot reproduce anyway. */
case class AnnFilteredTopKExec(node: AnnFilteredTopKNode) extends LeafExecNode {
  override def output: Seq[Attribute] = node.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numRounds" -> SQLMetrics.createMetric(sparkContext,
      "escalation rounds (0 = pre-filter short-circuit)"),
    "numCandidates" -> SQLMetrics.createMetric(sparkContext,
      "candidate ids fetched (all rounds)"),
    "numSurvivors" -> SQLMetrics.createMetric(sparkContext,
      "rows in the answer"),
    "numPreFilterRows" -> SQLMetrics.createMetric(sparkContext,
      "filtered rows scored exhaustively by the short-circuit"),
    "numExhaustiveFallback" -> SQLMetrics.createMetric(sparkContext,
      "1 when <k survivors forced the exhaustive filtered fallback"))

  private def checkFingerprint(storedFp: String, what: String): Unit =
    if (node.fingerprint.nonEmpty && storedFp != node.fingerprint)
      sys.error(s"$what for (${node.idName}, ${node.vecName}) was " +
        "re-registered over a different relation after planning " +
        s"(planned ${node.fingerprint}, registry has $storedFp)")

  /** One candidate fetch of target size `c` → (ids, saturated). */
  private def candidateIds(c: Int): (Array[Long], Boolean) = node.tier match {
    case "graph" =>
      val (fp, entry) =
        AnnIndexRegistry.lookupWithFp(node.idName, node.vecName, node.kind)
          .getOrElse(sys.error(
            s"ANN index for (${node.idName}, ${node.vecName}) vanished"))
      checkFingerprint(fp, "ANN index")
      val graph = entry.graphB.value
      val searchVecs = entry.searchVecsB.value
      require(entry.rawVecsB.value.dim == node.queryVec.length,
        s"query dim ${node.queryVec.length} != corpus dim " +
          s"${entry.rawVecsB.value.dim}")
      val metric = Metrics(entry.metricName)
      val q = if (metric.normalizeAtLoad) VectorStore.normalized(node.queryVec)
              else node.queryVec
      // l = 2n saturates: the beam then explores every reachable node
      // (the same regime g9_sql_saturated certifies for the mv route)
      val l = math.min(math.max(c.toLong, entry.searchL.toLong), 2L * graph.n).toInt
      val visited = new VisitedSet(graph.n)
      val (queue, _, _) = BeamSearch.searchSingle(graph, searchVecs, metric,
        q, l, visited)
      val ids = Array.tabulate(queue.size)(i => queue.id(i).toLong)
      (ids, l >= graph.n || queue.size < l)
    case t =>
      val (fp, entry) = AnnIndexRegistry
        .lookupTierWithFp(node.idName, node.vecName, node.kind,
          preferred = Some(t))
        .getOrElse(sys.error(
          s"candidate tier '$t' for (${node.idName}, ${node.vecName}) " +
            "vanished"))
      checkFingerprint(fp, "candidate tier")
      val s = entry.data.sparkSession
      import s.implicits._
      import org.apache.spark.sql.functions.{col, expr}
      val ids = entry.candidates(s, node.queryVec, c)
        .select(col("d_id").cast("long")).distinct().as[Long].collect()
      (ids, ids.length < c)
  }

  /** Top-k among `ids` that survive the carried predicate (`ids` null
    * = the pre-filter short-circuit: EVERY filtered row scores), scored
    * with the routed query's own expression. */
  private def topkRows(filtered: org.apache.spark.sql.DataFrame,
                       ids: Array[Long], isinMax: Int): Array[(Long, Double)] = {
    import org.apache.spark.sql.functions.{broadcast, col, typedlit}
    import graft.functions.VectorFunctions.{vecCosine, vecDot, vecL2Sq}
    val s = filtered.sparkSession
    import s.implicits._
    val qLit = typedlit(node.queryVec)
    val score = node.kind match {
      case "l2" => vecL2Sq(col(node.vecName), qLit)
      case "cos" => vecCosine(col(node.vecName), qLit)
      case _ => vecDot(col(node.vecName), qLit)
    }
    val constrained =
      if (ids == null) filtered
      else if (ids.length <= isinMax)
        filtered.where(col(node.idName).isInCollection(ids.toSeq))
      else
        filtered.join(
          broadcast(ids.toSeq.toDF("__graft_cand_id")),
          col(node.idName) === col("__graft_cand_id"))
    val scored = constrained
      .select(col(node.idName).cast("long").as("id"),
        score.cast("double").as("score"))
      .filter(col("score").isNotNull)
    val ordered =
      if (node.kind == "l2") scored.orderBy(col("score").asc, col("id").asc)
      else scored.orderBy(col("score").desc, col("id").asc)
    ordered.limit(node.k).as[(Long, Double)].collect()
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = SparkSession.active
    def conf(key: String, dflt: String): String =
      spark.conf.getOption(key).getOrElse(dflt)
    val exact = conf("spark.graft.ann.filtered.exact", "false").toBoolean
    val overfetch = conf("spark.graft.ann.filtered.overfetch", "8").toInt
    val maxRounds = conf("spark.graft.ann.filtered.maxRounds", "6").toInt
    val isinMax = conf("spark.graft.ann.filtered.isinMax", "100000").toInt
    // pre-filter short-circuit ceiling: when the predicate keeps at most
    // this many rows, score them ALL instead of beam-searching — cheaper
    // (the candidate route re-executes the same filtered scan per round
    // anyway, plus the search) and EXACT by construction, the classic
    // brute-force-when-selective strategy every filtered-ANN system
    // runs. Default 2k; "0" disables the probe entirely.
    val preFilterMax = math.min(
      conf("spark.graft.ann.filtered.preFilterMax",
        (2L * node.k).toString).toLong,
      Int.MaxValue.toLong - 1) // the probe limit below must fit an Int
    val fallbackExhaustive =
      conf("spark.graft.ann.filtered.fallbackExhaustive", "true").toBoolean
    val filtered = org.apache.spark.sql.GraftColumnBridge
      .ofRows(spark, node.filtered.plan)
    // the probe stops reading at preFilterMax+1 rows (LocalLimit
    // short-circuit over the pushed-down scan) — bounded cost even when
    // the predicate is permissive
    val probeCnt =
      if (preFilterMax <= 0) Long.MaxValue
      else filtered.select(org.apache.spark.sql.functions.col(node.idName))
        .limit((preFilterMax + 1).toInt).count()
    var rows: Array[(Long, Double)] = Array.empty
    var round = 0
    if (probeCnt <= preFilterMax || (exact && node.tier != "graph")) {
      // exact mode over a GENERATOR tier scores the full filtered scan:
      // a generator's "returned fewer than asked" is probe-parameter
      // exhaustion, not corpus saturation — only the graph beam's
      // l >= 2n regime proves it explored everything reachable
      rows = topkRows(filtered, null, isinMax)
      if (probeCnt <= preFilterMax) metrics("numPreFilterRows").add(probeCnt)
      else metrics("numExhaustiveFallback").add(1)
    } else {
      val maxC = 1 << 26
      var c =
        if (exact) maxC
        else math.max(64L, math.min(overfetch.toLong * node.k, maxC.toLong)).toInt
      var done = false
      while (!done) {
        round += 1
        val (ids, saturated) = candidateIds(c)
        metrics("numCandidates").add(ids.length)
        rows = topkRows(filtered, ids, isinMax)
        done = rows.length >= node.k || saturated || round >= maxRounds ||
          c >= maxC
        if (!done) c = math.min(c.toLong * 4, maxC.toLong).toInt
      }
      if (rows.length < node.k && fallbackExhaustive) {
        // the tier ran out of reach (generator probe bound, graph
        // connectivity, maxRounds) with fewer than k survivors — the
        // exhaustive plan would keep scanning, so match it: one full
        // filtered scan, still pushed-down and column-pruned
        rows = topkRows(filtered, null, isinMax)
        metrics("numExhaustiveFallback").add(1)
      }
    }
    metrics("numRounds").add(round)
    metrics("numSurvivors").add(rows.length)
    val idFirst = node.idFirst
    val schema = node.output.map(_.dataType).toArray
    sparkContext.parallelize(rows.toIndexedSeq, 1).mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      it.map { case (id, s) =>
        proj(if (idFirst) InternalRow(id, s) else InternalRow(s, id))
      }
    }
  }
}

/** Physical side of the single-vector query-relation route: execute and
  * COLLECT the planned query side (bounded), run ONE batched candidate
  * job for every query vector (graph tier: distributed
  * `BeamSearch.searchSingleDf` over the broadcast graph; candidate
  * tiers: their registered BATCH generator), rescore the bounded
  * (query, candidate) pairs with the routed query's OWN expression, and
  * rank-window to k per query — ties on the corpus id ASC, exactly the
  * matched ORDER BY. Graph-tier rescoring runs against the broadcast
  * RAW vector store (zero corpus reads); tier rescoring joins the
  * bounded candidates against the registered full-precision relation
  * (read once, never shuffled, never resident). Scores equal the
  * exhaustive plan's bit-for-bit; only the candidate SET per query is
  * approximate. `spark.graft.ann.relation.exact=true` saturates the
  * graph beam (l = 2n — the g9_sql_saturated regime), making the
  * answer exact end-to-end: the certificate mode g8_sql_saturated
  * hash-proves. NULL-scored corpus rows are dropped (the
  * MvJoinTopKExec posture). */
case class SvJoinTopKExec(node: SvJoinTopKNode, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = node.output
  override protected def withNewChildInternal(c: SparkPlan): SvJoinTopKExec =
    copy(child = c)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numQueries" -> SQLMetrics.createMetric(sparkContext,
      "query vectors collected"),
    "numCandidates" -> SQLMetrics.createMetric(sparkContext,
      "candidate pairs rescored (graph tier)"))

  private def checkFingerprint(storedFp: String, what: String): Unit =
    if (node.fingerprint.nonEmpty && storedFp != node.fingerprint)
      sys.error(s"$what for (${node.dName}, ${node.dVecName}) was " +
        "re-registered over a different relation after planning " +
        s"(planned ${node.fingerprint}, registry has $storedFp)")

  override protected def doExecute(): RDD[InternalRow] = {
    val qIdx = child.output.indexWhere(_.exprId == node.qAttr.exprId)
    val vIdx = child.output.indexWhere(_.exprId == node.qVecAttr.exprId)
    require(qIdx >= 0 && vIdx >= 0,
      "query-side columns vanished from the planned child")
    val queries: Seq[(Long, Array[Float])] =
      RelationQueryGuard(child).iterator.map { r =>
        require(!r.isNullAt(qIdx) && !r.isNullAt(vIdx),
          "NULL query vector: the routed plan cannot reproduce " +
            "NULL-score ordering — run with spark.graft.ann.rewrite=false")
        val arr = r.getArray(vIdx)
        var j = 0
        while (j < arr.numElements()) {
          require(!arr.isNullAt(j), "NULL component in query vector")
          j += 1
        }
        (r.getLong(qIdx), arr.toFloatArray())
      }.toSeq
    // the rescore keys queries by id (broadcast map): duplicate ids
    // would silently collapse — fail loudly instead (the exhaustive
    // plan ranks duplicate rows independently, which a keyed candidate
    // route cannot reproduce)
    require(queries.map(_._1).distinct.lengthCompare(queries.length) == 0,
      "duplicate q_id in the query relation: the routed plan keys " +
        "candidates by query id — run with spark.graft.ann.rewrite=false")
    metrics("numQueries").add(queries.size)
    val out: Array[(Long, Long, Double)] =
      if (queries.isEmpty) Array.empty
      else {
        val spark = SparkSession.active
        import spark.implicits._
        import org.apache.spark.sql.functions.{broadcast, col, row_number}
        val kind = node.kind
        val scored: org.apache.spark.sql.DataFrame =
          if (node.tier == "graph") {
            val (fp, entry) = AnnIndexRegistry
              .lookupWithFp(node.dName, node.dVecName, kind)
              .getOrElse(sys.error(
                s"ANN index for (${node.dName}, ${node.dVecName}) vanished"))
            checkFingerprint(fp, "ANN index")
            val dim = entry.rawVecsB.value.dim
            queries.foreach { case (qid, v) =>
              require(v.length == dim,
                s"query $qid dim ${v.length} != corpus dim $dim")
            }
            val saturate = spark.conf
              .getOption("spark.graft.ann.relation.exact")
              .getOrElse("false").toBoolean
            val n = entry.graphB.value.n
            val l =
              if (saturate) 2 * n
              else math.min(math.max(entry.searchL, 4 * node.k), 2 * n)
            val qdf = queries.map { case (id, v) => (id, v.toSeq) }
              .toDF("q_id", "q_vec")
            val hits = BeamSearch.searchSingleDf(spark, qdf, entry.graphB,
              entry.searchVecsB, entry.metricName, l, k = l)
            // exact rescore off the broadcast RAW store — zero corpus
            // reads; same per-kind double loops as the literal route
            val rawB = entry.rawVecsB
            val qMapB = spark.sparkContext.broadcast(queries.toMap)
            val candMetric = metrics("numCandidates")
            hits.select(col("q_id"), col("d_id")).as[(Long, Long)]
              .mapPartitions { it =>
                val raw = rawB.value
                val qm = qMapB.value
                it.map { case (qid, did) =>
                  candMetric.add(1)
                  val qv = qm(qid)
                  val off = raw.offset(did.toInt)
                  val nd = raw.dim
                  var s = 0.0
                  var j = 0
                  kind match {
                    case "l2" =>
                      while (j < nd) {
                        val d = raw.data(off + j).toDouble - qv(j).toDouble
                        s += d * d
                        j += 1
                      }
                    case "cos" =>
                      var dot = 0.0; var na = 0.0; var nb = 0.0
                      while (j < nd) {
                        val u = qv(j).toDouble
                        val v = raw.data(off + j).toDouble
                        dot += u * v; na += u * u; nb += v * v
                        j += 1
                      }
                      s = dot / (math.sqrt(na) * math.sqrt(nb))
                    case _ =>
                      while (j < nd) {
                        s += qv(j).toDouble * raw.data(off + j).toDouble
                        j += 1
                      }
                  }
                  (qid, did, s)
                }
              }.toDF("__graft_qid", "__graft_did", "__graft_score")
          } else {
            val (fp, entry) = AnnIndexRegistry
              .lookupTierWithFp(node.dName, node.dVecName, kind,
                preferred = Some(node.tier))
              .getOrElse(sys.error(
                s"candidate tier '${node.tier}' for (${node.dName}, " +
                  s"${node.dVecName}) vanished"))
            checkFingerprint(fp, "candidate tier")
            require(entry.candidatesBatch != null,
              s"tier '${node.tier}' has no batch generator")
            queries.foreach { case (qid, v) =>
              require(v.length == entry.dim,
                s"query $qid dim ${v.length} != corpus dim ${entry.dim}")
            }
            import graft.functions.VectorFunctions.{vecCosine, vecDot, vecL2Sq}
            val cands = entry.candidatesBatch(spark, queries, node.k)
            val qdf = queries.map { case (id, v) => (id, v.toSeq) }
              .toDF("__graft_qid", "__graft_qvec")
            val scoreCol = kind match {
              case "l2" => vecL2Sq(col("__graft_qvec"), col(entry.dataVecCol))
              case "cos" => vecCosine(col("__graft_qvec"), col(entry.dataVecCol))
              case _ => vecDot(col("__graft_qvec"), col(entry.dataVecCol))
            }
            entry.liveData
              .join(broadcast(cands.select(col("q_id").as("__graft_qid"),
                  col("d_id").as("__graft_cand_id"))),
                col(entry.dataIdCol) === col("__graft_cand_id"))
              .join(broadcast(qdf), Seq("__graft_qid"))
              .select(col("__graft_qid"),
                col(entry.dataIdCol).cast("long").as("__graft_did"),
                scoreCol.cast("double").as("__graft_score"))
          }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__graft_qid"))
          .orderBy(
            if (kind == "l2") col("__graft_score").asc else col("__graft_score").desc,
            col("__graft_did").asc)
        scored.filter(col("__graft_score").isNotNull)
          .withColumn("__graft_rnk", row_number().over(w))
          .filter(col("__graft_rnk") <= node.k)
          .select(col("__graft_qid"), col("__graft_did"), col("__graft_score"))
          .as[(Long, Long, Double)].collect()
      }
    val schema = node.output.map(_.dataType).toArray
    sparkContext.parallelize(out.toIndexedSeq, 1).mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      it.map { case (q, d, s) => proj(InternalRow(q, d, s)) }
    }
  }
}
