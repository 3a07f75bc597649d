package graft.index

/** W2 — bounded ordered beam queue, the semantics of the reference's
  * `NeighborPriorityQueue` (`/root/reference/include/efanna2e/neighbor.h:137-226`):
  * a capacity-L array kept sorted by (distance asc, id asc), binary-search
  * insert, and a cursor over not-yet-expanded entries
  * (`closest_unexpanded` / `has_unexpanded_node_in_k`).
  *
  * Pure executor-local data structure — one per (task, subquery); never
  * serialized.
  */
final class BeamQueue(val capacity: Int) {
  private val ids = new Array[Int](capacity)
  private val ds = new Array[Float](capacity)
  private val expanded = new Array[Boolean](capacity)
  private var _size = 0
  private var cur = 0 // lower bound for the closest unexpanded entry

  @inline def size: Int = _size
  @inline def id(i: Int): Int = ids(i)
  @inline def dist(i: Int): Float = ds(i)

  private def before(d: Float, i: Int, pos: Int): Boolean =
    d < ds(pos) || (d == ds(pos) && i < ids(pos))

  /** Insert candidate; drops the worst entry when full. Duplicate ids are
    * the caller's concern (the search kernels dedup via the visited set). */
  def insert(nid: Int, d: Float): Unit = {
    if (_size == capacity && !before(d, nid, _size - 1)) return
    var lo = 0
    var hi = _size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(d, nid, mid)) hi = mid else lo = mid + 1
    }
    val pos = lo
    val lastIdx = if (_size == capacity) _size - 1 else _size
    var i = lastIdx
    while (i > pos) {
      ids(i) = ids(i - 1); ds(i) = ds(i - 1); expanded(i) = expanded(i - 1)
      i -= 1
    }
    ids(pos) = nid; ds(pos) = d; expanded(pos) = false
    if (_size < capacity) _size += 1
    if (pos < cur) cur = pos
  }

  /** Any unexpanded entry among the first `k`? (`neighbor.h`'s
    * `has_unexpanded_node_in_k`.) */
  def hasUnexpandedInK(k: Int): Boolean = {
    while (cur < _size && expanded(cur)) cur += 1
    cur < math.min(_size, k)
  }

  /** Index of the closest unexpanded entry; marks it expanded. Call only
    * after a true [[hasUnexpandedInK]]. */
  def closestUnexpanded(): Int = {
    while (cur < _size && expanded(cur)) cur += 1
    expanded(cur) = true
    cur
  }
}

/** G14 — epoch-tagged visited set (`include/visited_list_pool.h:8-74`):
  * clearing is an epoch bump, not an O(n) wipe. One per task, reused
  * across queries; Spark task = thread, so no pool/mutex needed. */
final class VisitedSet(n: Int) {
  private val tags = new Array[Int](n)
  private var epoch = 0

  def nextEpoch(): Unit = {
    epoch += 1
    if (epoch == Int.MaxValue) { // wraparound: hard reset once in 2^31 queries
      java.util.Arrays.fill(tags, 0)
      epoch = 1
    }
  }

  @inline def visited(i: Int): Boolean = tags(i) == epoch
  @inline def visit(i: Int): Unit = tags(i) = epoch
}
