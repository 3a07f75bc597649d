package graft.index

import scala.collection.mutable

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** HNSW baseline arm — the reference's comparison index
  * (`/root/reference/tests/hnsw/search_rerank_hnsw.cpp:134,148-149`:
  * hnswlib with `M=35, ef_construction=500, ef = budget/c`). Re-expressed
  * from the published algorithm (Malkov & Yashunin, arXiv:1603.09320):
  * layered proximity graphs, greedy 1-NN descent through the upper
  * layers, beam (`ef`) search at layer 0.
  *
  * Deviations, both deterministic-by-design: the level of node v is drawn
  * from a Random seeded by (seed, v) — insertion-order independent — and
  * neighbor selection uses the plain nearest-M rule (hnswlib's default
  * heuristic toggles; recall parity is judged by the Sweep monotone-recall
  * gate, like the RoarGraph arm).
  *
  * Sits on the same broadcast tier as [[CsrGraph]]/[[BeamSearch]]: build
  * is a driver/executor-local kernel over the packed [[VectorStore]],
  * search fans out per query partition against the broadcast index. The
  * index deliberately does NOT embed the [[VectorStore]]: search takes
  * the store as its own (shared) broadcast, so a session that already
  * broadcast the corpus (e.g. Sweep's RoarGraph arm) ships it once, not
  * once per index.
  *
  * Scale scope: the build is a DRIVER-LOCAL kernel guarded by
  * `maxBuildN`. [[Hnsw.build]] keeps the paper's strictly sequential
  * insert semantics; [[Hnsw.buildParallel]] runs deterministic
  * batch-parallel inserts (read-only concurrent searches against a
  * frozen snapshot, sequential id-order edge apply — hnswlib
  * parallelizes with fine-grained locks on shared adjacency, which is
  * scheduling-dependent; ours is bit-reproducible). Either way it is
  * the reference's BASELINE arm at fixture scale; the scale path for
  * graph ANN is the RoarGraph build (distributed stages) and the
  * sharded tier.
  */
final class HnswIndex(val m: Int,
                      val layers: Array[Array[Array[Int]]], // layer -> node -> nbrs
                      val levels: Array[Int], val entryPoint: Int,
                      val maxLevel: Int, val metricName: String,
                      val baseFingerprint: Long)
    extends Serializable {
  def neighbors(layer: Int, node: Int): Array[Int] = {
    val l = layers(layer)(node)
    if (l == null) Array.emptyIntArray else l
  }
}

object Hnsw {

  /** level(v) = floor(−ln(U(seed,v)) · 1/ln(M)) — the paper's geometric
    * level distribution, made insertion-order independent. */
  private def levelOf(v: Int, m: Int, seed: Long): Int = {
    val rnd = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + v)
    val u = math.max(rnd.nextDouble(), 1e-12)
    (-math.log(u) / math.log(m.toDouble)).toInt
  }

  /** Beam search one layer: best-first expand from `eps`, keep ≤ ef
    * closest visited. Returns (id, dist) ascending by distance. */
  private def searchLayer(vecs: VectorStore, metric: VectorMetric,
                          layers: Array[Array[Array[Int]]], layer: Int,
                          q: Array[Float], eps: Seq[Int],
                          ef: Int,
                          cmps: Array[Long] = null): mutable.ArrayBuffer[(Int, Float)] = {
    val visited = new mutable.HashSet[Int]
    // candidates: min-heap by dist; results: max-heap by dist (bounded ef)
    val cand = mutable.PriorityQueue.empty[(Float, Int)](
      Ordering.by[(Float, Int), Float](_._1).reverse)
    val res = mutable.PriorityQueue.empty[(Float, Int)](
      Ordering.by[(Float, Int), Float](_._1))
    eps.foreach { e =>
      if (visited.add(e)) {
        val d = metric.dist(vecs.data, vecs.offset(e), q, 0, vecs.dim)
        if (cmps != null) cmps(0) += 1
        cand.enqueue((d, e))
        res.enqueue((d, e))
        if (res.size > ef) res.dequeue()
      }
    }
    while (cand.nonEmpty && cand.head._1 <= res.head._1) {
      val (_, u) = cand.dequeue()
      val nbrs = layers(layer)(u)
      if (nbrs != null) {
        var i = 0
        while (i < nbrs.length) {
          val v = nbrs(i)
          if (visited.add(v)) {
            val d = metric.dist(vecs.data, vecs.offset(v), q, 0, vecs.dim)
            if (cmps != null) cmps(0) += 1
            if (res.size < ef || d < res.head._1) {
              cand.enqueue((d, v))
              res.enqueue((d, v))
              if (res.size > ef) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    val out = mutable.ArrayBuffer.from(res.dequeueAll)
    out.sortInPlaceBy(_._1)
    out.map { case (d, id) => (id, d) }
  }

  /** Keep the `max` nearest, dropping ties deterministically (id asc). */
  private def nearestM(cands: Iterable[(Int, Float)], max: Int): Array[Int] =
    cands.toSeq.sortBy { case (id, d) => (d, id) }.take(max).map(_._1).toArray

  /** Cheap corpus fingerprint stamped into the index at build time:
    * hashes (n, dim) plus the raw floats of rows 0, entryPoint and n−1.
    * [[append]] recomputes it over the grown store's first n rows, so a
    * `combined` whose prefix differs from (or reorders) the corpus the
    * base index was built over fails loudly instead of silently reusing
    * adjacency that points at the wrong vectors. Three spot rows, not a
    * full-corpus hash — O(dim), catches the realistic mistakes (wrong
    * corpus, reordered load, truncated prefix) with high probability. */
  private[index] def storeFingerprint(vecs: VectorStore, n: Int,
                                      entry: Int): Long = {
    var h = 1125899906842597L
    def mix(x: Long): Unit = h = h * 31 + x
    mix(n); mix(vecs.dim)
    if (n > 0) {
      Seq(0, math.max(entry, 0), n - 1).distinct.foreach { row =>
        val off = vecs.offset(row)
        var i = 0
        while (i < vecs.dim) {
          mix(java.lang.Float.floatToIntBits(vecs.data(off + i)).toLong)
          i += 1
        }
      }
    }
    h
  }

  /** Build with the reference arm's knobs (M=35, efConstruction=500).
    * Sequential semantics (batch size 1): every insert sees all earlier
    * nodes — the paper's algorithm exactly. */
  def build(vecs: VectorStore, metricName: String, m: Int = 35,
            efConstruction: Int = 500, seed: Long = 42L,
            maxBuildN: Int = 1 << 20): HnswIndex =
    buildBatched(vecs, metricName, m, efConstruction, seed, maxBuildN,
      maxBatch = 1, threads = 1)

  /** Batch-PARALLEL build, deterministic: nodes are processed in id order
    * in batches that ramp 1,2,4,…,`maxBatch`; within a batch every node
    * runs its greedy descent + per-layer ef-search CONCURRENTLY against
    * the frozen pre-batch graph (read-only), then edges are applied
    * sequentially in id order (forward lists, reverse-edge pruning, entry
    * update). Thread scheduling cannot affect the result — each node's
    * neighbor choice depends only on the snapshot, and the apply order is
    * fixed — so two builds are bit-identical (asserted in IndexSpec).
    *
    * The trade vs sequential: batch peers don't see each other at insert
    * time (they connect only through later reverse edges), a mild
    * sparsification bounded by the ramp (a batch is never larger than the
    * already-built graph). hnswlib's own parallel build pays a similar
    * (scheduling-DEPENDENT) deviation via fine-grained locks; ours keeps
    * determinism. Recall parity is held by the same Sweep monotone-recall
    * gate as the sequential arm. */
  def buildParallel(vecs: VectorStore, metricName: String, m: Int = 35,
                    efConstruction: Int = 500, seed: Long = 42L,
                    maxBuildN: Int = 1 << 20, maxBatch: Int = 256,
                    threads: Int = Runtime.getRuntime.availableProcessors)
      : HnswIndex =
    buildBatched(vecs, metricName, m, efConstruction, seed, maxBuildN,
      maxBatch, threads)

  /** Delta-ingest: continue the id-order insert loop of an existing
    * index over the GROWN store (`combined` = the base corpus the index
    * was built over, followed by the delta rows as ids
    * `idx.levels.length..combined.n-1`). Because node levels are a pure
    * function of (seed, id) and the insert loop only ever REPLACES
    * adjacency arrays (never mutates one in place), the prior index's
    * layers are reused by reference and stay valid — the returned index
    * shares unmodified adjacency with the base (both remain searchable).
    * Deterministic for a given ingest history; recall parity with a
    * fresh build is gated in IndexSpec (exact equality is not promised —
    * batch-ramp boundaries differ, the same trade hnswlib's insert-order
    * sensitivity accepts). The same-prefix contract is VALIDATED, not
    * assumed: the base index carries a spot fingerprint of its build
    * corpus (rows 0 / entryPoint / n−1), recomputed here over
    * `combined`'s prefix — a wrong, truncated or reordered prefix fails
    * loudly instead of silently searching stale adjacency over wrong
    * vectors. Closes the lifecycle gap of the broadcast
    * graph tiers: RoarGraph delta-ingests via [[ShardedIndex
    * .appendDelta]]; HNSW now via append (reference analog: hnswlib
    * `addPoint` on a live index, `tests/hnsw/search_rerank_hnsw.cpp`). */
  def append(idx: HnswIndex, combined: VectorStore,
             efConstruction: Int = 500, seed: Long = 42L,
             maxBuildN: Int = 1 << 20, maxBatch: Int = 256,
             threads: Int = Runtime.getRuntime.availableProcessors)
      : HnswIndex = {
    require(combined.n >= idx.levels.length,
      s"combined store (${combined.n}) smaller than the base index " +
        s"(${idx.levels.length}) — append needs base rows + delta rows")
    buildBatched(combined, idx.metricName, idx.m, efConstruction, seed,
      maxBuildN, maxBatch, threads, prior = Some(idx))
  }

  private def buildBatched(vecs: VectorStore, metricName: String, m: Int,
                           efConstruction: Int, seed: Long, maxBuildN: Int,
                           maxBatch: Int, threads: Int,
                           prior: Option[HnswIndex] = None): HnswIndex = {
    require(vecs.n <= maxBuildN,
      s"Hnsw build is a driver-local kernel (baseline arm): n=${vecs.n} " +
        s"exceeds maxBuildN=$maxBuildN. Use GraphBuild/ShardedIndex for " +
        "corpora past fixture scale, or raise maxBuildN deliberately.")
    val metric = Metrics(metricName)
    val n = vecs.n
    val levels = Array.tabulate(n)(v => levelOf(v, m, seed))
    val maxLevel = if (n > 0) levels.max else 0
    val layers = Array.fill(maxLevel + 1)(new Array[Array[Int]](n))
    val mMax0 = 2 * m
    if (n == 0) return new HnswIndex(m, layers, levels, -1, -1, metricName,
      storeFingerprint(vecs, 0, -1))
    var entry = 0
    var entryLevel = levels(0)
    prior.foreach { p =>
      // same (seed, m) ⇒ identical level prefix; anything else means the
      // caller is appending onto an index built with different knobs
      require(java.util.Arrays.equals(p.levels,
          java.util.Arrays.copyOfRange(levels, 0, p.levels.length)),
        "append: level prefix mismatch — base index built with a " +
          "different (seed, m) than this append call")
      // the combined store's first n rows must BE the base-build corpus:
      // recompute the base's spot fingerprint over this store's prefix
      require(storeFingerprint(vecs, p.levels.length, p.entryPoint) ==
          p.baseFingerprint,
        "append: combined store's first n rows differ from (or reorder) " +
          "the corpus the base index was built over — the reused " +
          "adjacency would point at wrong vectors")
      for (layer <- p.layers.indices)
        System.arraycopy(p.layers(layer), 0, layers(layer), 0,
          p.layers(layer).length)
      entry = p.entryPoint
      entryLevel = p.maxLevel
    }
    val startFrom = prior.map(_.levels.length).getOrElse(1)
    if (startFrom >= n)
      return new HnswIndex(m, layers, levels, entry, entryLevel, metricName,
        storeFingerprint(vecs, n, entry))

    /** Read-only phase for node v against the frozen graph: greedy
      * descent from the batch-start entry, then per-layer ef-search;
      * returns chosen neighbors per layer (index = layer). */
    def chooseFor(v: Int): Array[Array[Int]] = {
      val lv = levels(v)
      val q = vecs.vector(v)
      var ep = entry
      var layer = entryLevel
      while (layer > lv) {
        var changed = true
        while (changed) {
          changed = false
          val nbrs = layers(layer)(ep)
          if (nbrs != null) {
            var bestD = metric.dist(vecs.data, vecs.offset(ep), q, 0, vecs.dim)
            var i = 0
            while (i < nbrs.length) {
              val d = metric.dist(vecs.data, vecs.offset(nbrs(i)), q, 0, vecs.dim)
              if (d < bestD) { bestD = d; ep = nbrs(i); changed = true }
              i += 1
            }
          }
        }
        layer -= 1
      }
      var eps = Seq(ep)
      layer = math.min(entryLevel, lv)
      val chosen = new Array[Array[Int]](layer + 1)
      while (layer >= 0) {
        val found = searchLayer(vecs, metric, layers, layer, q, eps,
          efConstruction)
        // layer 0 connects up to M_max0 = 2M (the paper's layer-0 cap)
        val cap = if (layer == 0) mMax0 else m
        chosen(layer) = nearestM(found.map { case (id, d) => (id, d) }, cap)
        eps = found.map(_._1).toSeq
        layer -= 1
      }
      chosen
    }

    val pool =
      if (threads > 1) new java.util.concurrent.ForkJoinPool(threads) else null
    try {
      var start = startFrom
      var batch = 1
      while (start < n) {
        val end = math.min(n, start + batch)
        val results = new Array[Array[Array[Int]]](end - start)
        if (pool == null || end - start == 1) {
          var i = 0
          while (i < end - start) { results(i) = chooseFor(start + i); i += 1 }
        } else {
          // parallel read-only searches; submit/get gives happens-before
          // with the apply phases before and after
          pool.submit(new Runnable {
            def run(): Unit =
              java.util.stream.IntStream.range(0, end - start).parallel()
                .forEach(i => results(i) = chooseFor(start + i))
          }).get()
        }
        // sequential apply in id order — the only phase that writes
        var i = 0
        while (i < end - start) {
          val v = start + i
          val chosen = results(i)
          var layer = chosen.length - 1
          while (layer >= 0) {
            val cap = if (layer == 0) mMax0 else m
            layers(layer)(v) = chosen(layer)
            chosen(layer).foreach { u =>
              val cur = layers(layer)(u)
              val merged = if (cur == null) Array(v) else cur :+ v
              layers(layer)(u) =
                if (merged.length <= cap) merged
                else nearestM(merged.map(x => (x,
                  metric.dist(vecs.data, vecs.offset(x), vecs.data,
                    vecs.offset(u), vecs.dim))), cap)
            }
            layer -= 1
          }
          if (levels(v) > entryLevel) { entry = v; entryLevel = levels(v) }
          i += 1
        }
        start = end
        batch = math.min(maxBatch, batch * 2)
      }
    } finally if (pool != null) pool.shutdown()
    new HnswIndex(m, layers, levels, entry, entryLevel, metricName,
      storeFingerprint(vecs, n, entry))
  }

  /** Top-k search, `ef` beam at layer 0 (`hnsw->setEf(budget/c)` in the
    * reference arm). `vecs` is the same store the index was built over
    * (shared broadcast, see class doc). Returns (id, dist) ascending. */
  def searchKnn(idx: HnswIndex, vecs: VectorStore, q0: Array[Float], k: Int,
                ef: Int): Seq[(Int, Float)] =
    searchKnnCounted(idx, vecs, q0, k, ef)._1

  /** [[searchKnn]] plus the DISTANCE-COMPUTATION count — the
    * deterministic work measure the baseline-ordering gate (SweepSpec)
    * compares against the RoarGraph kernel's `cmps`: on a time-shared
    * VM wall-clock QPS is machine noise, while comparisons-per-query
    * is exact, machine-independent, and is the quantity the in-memory
    * kernels' QPS is proportional to. */
  def searchKnnCounted(idx: HnswIndex, vecs: VectorStore, q0: Array[Float],
                       k: Int, ef: Int): (Seq[(Int, Float)], Long) = {
    val metric = Metrics(idx.metricName)
    val q = if (metric.normalizeAtLoad) VectorStore.normalized(q0) else q0
    val cmps = Array(0L)
    var ep = idx.entryPoint
    var layer = idx.maxLevel
    while (layer > 0) {
      var changed = true
      while (changed) {
        changed = false
        val nbrs = idx.neighbors(layer, ep)
        var bestD = metric.dist(vecs.data, vecs.offset(ep), q, 0, vecs.dim)
        cmps(0) += 1
        var i = 0
        while (i < nbrs.length) {
          val d = metric.dist(vecs.data, vecs.offset(nbrs(i)), q, 0, vecs.dim)
          cmps(0) += 1
          if (d < bestD) { bestD = d; ep = nbrs(i); changed = true }
          i += 1
        }
      }
      layer -= 1
    }
    val out = searchLayer(vecs, metric, idx.layers, 0, q, Seq(ep),
      math.max(ef, k), cmps).take(k).map { case (id, d) => (id, d) }.toSeq
    (out, cmps(0))
  }

  /** Distributed search surface, shaped like
    * [[BeamSearch.searchSingleDf]]: queries (q_id, q_vec) fan out per
    * partition against the broadcast index + the SHARED corpus broadcast;
    * output (q_id, rank, d_id, score) with score = −dist (similarity
    * convention). */
  def searchDf(spark: SparkSession, queries: DataFrame, idxB: Broadcast[HnswIndex],
               vecsB: Broadcast[VectorStore], k: Int, ef: Int): DataFrame = {
    import spark.implicits._
    queries.select(col("q_id"), col("q_vec")).as[(Long, Array[Float])]
      .flatMap { case (qid, qvec) =>
        val idx = idxB.value
        searchKnn(idx, vecsB.value, qvec, k, ef).zipWithIndex.map { case ((id, d), r) =>
          (qid, r + 1, id.toLong, -d.toDouble)
        }
      }.toDF("q_id", "rank", "d_id", "score")
  }
}
