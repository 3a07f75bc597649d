package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution — the second half of near-dup dedup.
  * Every pair generator in this repo ([[MinHashLsh.bandedPairs]],
  * [[LshAnn.thresholdPairs]], [[PairKernel.globalTopPairs]]) stops at
  * *pairs*; a training-data pipeline needs *clusters* and one canonical
  * survivor per cluster. This operator closes the gap: connected
  * components over the pair edge set, then a keep-rule.
  *
  * Algorithm: a partition-local union-find contraction pass (shrinks the
  * edge set to per-partition star forests in one scan), then alternating
  * large-star / small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) — each round is two `groupBy(min)` +
  * join shapes, i.e. pure hash shuffles on node ids with map-side
  * partial mins, nothing driver-side. Converges to per-component stars
  * centered at the minimum id in O(log² n) rounds after contraction
  * (in practice 0–2 on real near-dup graphs, < ~12 even on adversarial
  * partition-spanning chains; see DedupClusterSpec's giant-chain
  * fixture). This shape survives 100 TB:
  * no `collect()`, no driver graph, each round's state is just the edge
  * set, and a hot component (one giant near-dup cluster) degrades into a
  * star after the first rounds — after which its edges all share the hub
  * key only on the *label* side, never as a reduce key with O(cluster²)
  * output.
  *
  * Lineage: each round's edge set is checkpointed — 25 iterative
  * self-joins would otherwise stack a plan Catalyst re-optimizes (and
  * re-executes) from scratch each round. By default that is a (lazy)
  * `localCheckpoint` (executor block manager — fast, fine on local mode
  * and for fault-free batch jobs); set `spark.graft.cc.checkpointDir`
  * to a durable path and the loop switches to RELIABLE `checkpoint()`
  * so a lost executor mid-iteration recomputes from the last round's
  * files instead of restarting the whole job — the posture a multi-hour
  * 100 TB dedup run needs.
  */
object ConnectedComponents {

  /** Partition-local contraction: union-find each partition's edge slice
    * in one `mapPartitions` pass and emit (node, local-root) star edges.
    * Most near-dup graphs are forests of tiny clusters, so a single local
    * pass solves almost the whole graph and the global star rounds start
    * from a far smaller, mostly-converged edge set — typically 0–2 rounds
    * instead of 3–5. Memory is O(nodes in the partition) (a LongMap),
    * bounded by the scan's partition size, not the corpus; find() is
    * iterative, so a partition-spanning chain cannot overflow the stack.
    * Output keeps the orientation invariant (root = local min < node). */
  private def localContract(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.select(col("u"), col("v")).as[(Long, Long)]
      .mapPartitions { it =>
        val parent = collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path-compress the walked chain to the root
          while (c != r) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        // snapshot the keys BEFORE emitting: the output iterator is
        // consumed lazily and find() still path-compresses (mutates the
        // map) per element — iterating the live keysIterator would read
        // a structure under mutation
        parent.keys.toArray.iterator
          .map(n => (n, find(n))).filter(p => p._1 != p._2)
      }
      .toDF("u", "v")
  }

  /** Convergence probe: an oriented edge set (v < u everywhere) is the
    * final star forest iff no node appears as u twice (one root per node)
    * and no node is both a u and a v (stars don't chain). Because the
    * orientation invariant makes every star center its component's MIN,
    * star-shaped ⇒ the labels are final — so probing the shape directly
    * stops the loop one full round earlier than waiting for two identical
    * round signatures (the old fixed-point-confirm round was 7 stages of
    * no-op work; this is one partial-agg job on 2|E| rows). */
  private def isStarForest(e: DataFrame): Boolean = {
    val bad = e.select(explode(array(
        struct(col("u").as("n"), lit(1L).as("cu"), lit(0L).as("cv")),
        struct(col("v").as("n"), lit(0L).as("cu"), lit(1L).as("cv")))).as("x"))
      .select(col("x.n").as("n"), col("x.cu").as("cu"), col("x.cv").as("cv"))
      .groupBy("n").agg(sum("cu").as("cu"), sum("cv").as("cv"))
      .where(col("cu") > 1 || (col("cu") > 0 && col("cv") > 0))
      .limit(1).count()
    bad == 0L
  }

  /** Large-star: for every node u, link every strictly-larger neighbor v
    * to m(u) = min(Γ(u) ∪ {u}). Emitted edges keep the large→small
    * orientation (v > m always, since m ≤ u < v). No dedup here: the
    * output feeds straight into small-star, whose min-aggregation is
    * duplicate-insensitive and whose own `distinct` canonicalizes the
    * round's result — a distinct here would be a whole extra exchange
    * per round for nothing. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mv"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), least(col("mv"), col("u")).as("v"))
  }

  /** Small-star: orient every edge large→small, then for every node u
    * link every smaller neighbor (and u itself) to m(u) = min Γ⁻(u). */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val mins = oriented.groupBy("u").agg(min("v").as("mv"))
    oriented.join(mins, "u")
      .select(col("v").as("n"), col("mv"))
      .unionAll(mins.select(col("u").as("n"), col("mv")))
      .where(col("n") =!= col("mv"))
      .select(col("n").as("u"), col("mv").as("v"))
      .distinct()
  }

  /** Component labels for every node that appears in `pairs`
    * (id_a, id_b): output (id, cluster_id) with cluster_id = the
    * component's minimum id (roots label themselves). Also returns the
    * number of large+small rounds run — asserted bounded in
    * DedupClusterSpec's skew test. Fails loudly (never silently returns
    * partial labels) if `maxRounds` is hit. */
  def componentsWithRounds(pairs: DataFrame,
                           maxRounds: Int = 25): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val reliableDir =
      spark.conf.getOption("spark.graft.cc.checkpointDir").filter(_.nonEmpty)
    reliableDir.foreach { dir =>
      if (spark.sparkContext.getCheckpointDir.isEmpty)
        spark.sparkContext.setCheckpointDir(dir)
    }
    // LAZY checkpoints: the star-forest probe right after is the one
    // action that materializes each round's edge set — eager would run a
    // second, redundant job per round just to populate the same blocks.
    // Reliable mode (conf above) trades that job for durability.
    def checkpointed(df: DataFrame): DataFrame =
      if (reliableDir.isDefined) df.checkpoint() else df.localCheckpoint(false)
    // Persisted RDDs backing a checkpointed round (walked through the
    // physical plan's public dependency chain — no CacheManager entry
    // exists for localCheckpoint, so Dataset.unpersist can't reach it).
    // Used to evict round N-1's blocks once round N is materialized:
    // peak residency is 2 rounds' edge sets, not all of them — a
    // multi-hour 100 TB dedup run must not hold every round in the
    // block manager. (Reliable mode persists nothing → no-op there.)
    def persistedLeaves(df: DataFrame): Seq[RDD[_]] = {
      def walk(r: RDD[_]): Seq[RDD[_]] =
        if (r.getStorageLevel != StorageLevel.NONE) Seq(r)
        else r.dependencies.map(_.rdd).flatMap(walk)
      walk(df.queryExecution.toRdd)
    }
    // distinct AFTER contraction: the local pass shrinks the edge set
    // first (and two partitions can emit the same star edge), so the one
    // global dedup exchange runs on the contracted set, not the raw pairs
    var e = checkpointed(localContract(pairs
        .select(greatest(col("id_a"), col("id_b")).as("u"),
          least(col("id_a"), col("id_b")).as("v"))
        .where(col("u") =!= col("v")))
      .distinct())
    var rounds = 0
    var star = isStarForest(e) // materializes this round's blocks
    var eBlocks = persistedLeaves(e)
    while (!star && rounds < maxRounds) {
      val prevBlocks = eBlocks
      e = checkpointed(smallStar(largeStar(e)))
      star = isStarForest(e) // new round materialized off the old blocks…
      eBlocks = persistedLeaves(e)
      prevBlocks.foreach(_.unpersist(blocking = false)) // …then evict them
      rounds += 1
    }
    require(star,
      s"connected components did not converge in $maxRounds rounds")
    // Fixed point is a star per component: every non-root appears exactly
    // once as u with v = root; roots appear only as v.
    val labels = e.select(col("u").as("id"), col("v").as("cluster_id"))
      .unionAll(e.select(col("v").as("id"), col("v").as("cluster_id")))
      .distinct()
    (labels, rounds)
  }

  /** Labels only (common call shape). */
  def components(pairs: DataFrame, maxRounds: Int = 25): DataFrame =
    componentsWithRounds(pairs, maxRounds)._1

  /** Full cluster resolution over a document table: every doc gets a
    * cluster (docs in no pair become singletons), plus the canonical
    * survivor per the min-id keep-rule. Output:
    * (doc_id, cluster_id, is_canonical∈{0,1}).
    *
    * `docs` needs a `doc_id` column; `pairs` is any (id_a, id_b) near-dup
    * pair set over the same ids. The labels side is the (small) set of
    * docs that near-dup'd at all, so the join back to the corpus is
    * broadcast-able in the common regime — AQE picks that up from runtime
    * sizes; no hint is forced here because at pathological dup rates the
    * label set is NOT small. */
  def resolve(docs: DataFrame, pairs: DataFrame,
              maxRounds: Int = 25): DataFrame = {
    val labels = components(pairs, maxRounds)
      .withColumnRenamed("id", "doc_id")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical",
        (col("doc_id") === col("cluster_id")).cast("long"))
  }

  /** Keep-rule variant: canonical = the cluster member maximizing
    * `quality` (ties → min doc_id), for pipelines that keep the
    * highest-quality copy instead of the smallest id. `docs` needs
    * (doc_id, quality). One window per cluster — the partition key is
    * cluster_id, so a giant cluster lands on one task; that is inherent
    * to "pick 1 of the cluster" semantics and bounded by the largest
    * cluster, not the corpus. */
  def resolveByQuality(docs: DataFrame, pairs: DataFrame,
                       maxRounds: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = components(pairs, maxRounds)
      .withColumnRenamed("id", "doc_id")
    val labeled = docs.select(col("doc_id"), col("quality"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    labeled
      .withColumn("is_canonical",
        (row_number().over(w) === 1).cast("long"))
      .select(col("doc_id"), col("cluster_id"), col("is_canonical"))
  }
}
