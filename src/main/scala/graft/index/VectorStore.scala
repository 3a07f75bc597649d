package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Packed row-major float matrix of a vector corpus, keyed by contiguous
  * ids 0..n-1 — the broadcast-side analog of the reference's in-RAM
  * `float* data_bp_` (`/root/reference/include/efanna2e/util.h:179-210`).
  *
  * Used as a broadcast variable by the graph kernels: at the reference's
  * own scale (10M × 200d ≈ 8 GB) one copy fits per executor; beyond that
  * the documented fallback is partitioned sub-corpora with per-partition
  * search + global top-k merge (SURVEY §7.3).
  */
final class VectorStore(val n: Int, val dim: Int, val data: Array[Float])
    extends Serializable {

  @inline def offset(row: Int): Int = row * dim

  def vector(row: Int): Array[Float] = {
    val out = new Array[Float](dim)
    System.arraycopy(data, row * dim, out, 0, dim)
    out
  }
}

object VectorStore {

  /** Collect `(id long, vec array<float>)` rows into a packed store.
    * Ids must be exactly 0..n-1 (the fixture/engine contract — positional
    * ids, SURVEY §1.1). Normalizes in float like the reference
    * (`util.h:214-229`) when the metric wants it. */
  def fromDf(df: DataFrame, idCol: String, vecCol: String,
             metric: VectorMetric): VectorStore = {
    val rows = df.select(col(idCol), col(vecCol)).collect()
    val n = rows.length
    require(n > 0, "empty vector corpus")
    val dim = rows(0).getSeq[Float](1).length
    val data = new Array[Float](n * dim)
    // per-id occupancy: a duplicate id would otherwise overwrite one slot
    // and leave another silently all-zeros (row count alone can't tell)
    val filled = new Array[Boolean](n)
    rows.foreach { r =>
      val id = r.getLong(0)
      require(id >= 0 && id < n, s"non-contiguous id $id for corpus of $n")
      require(!filled(id.toInt), s"duplicate id $id in vector corpus")
      filled(id.toInt) = true
      val v = r.getSeq[Float](1)
      require(v.length == dim, s"ragged dim at id $id")
      var i = 0
      val off = id.toInt * dim
      while (i < dim) { data(off + i) = v(i); i += 1 }
    }
    if (metric.normalizeAtLoad) {
      var row = 0
      while (row < n) {
        val off = row * dim
        var s = 0.0f
        var i = 0
        while (i < dim) { s += data(off + i) * data(off + i); i += 1 }
        val inv = if (s > 0) (1.0 / math.sqrt(s.toDouble)).toFloat else 0.0f
        i = 0
        while (i < dim) { data(off + i) *= inv; i += 1 }
        row += 1
      }
    }
    new VectorStore(n, dim, data)
  }

  /** Normalize one query vector the same way the store was (float math). */
  def normalized(v: Array[Float]): Array[Float] = {
    var s = 0.0f
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val inv = if (s > 0) (1.0 / math.sqrt(s.toDouble)).toFloat else 0.0f
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }
}
