package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate inside a bounded top-k buffer. */
case class ScoredId(score: Double, id: Long)

/** Bounded-heap per-group top-k — the scale-path replacement for the
  * rank-window form of W1 (the reference's `std::partial_sort` truncation,
  * `/root/reference/src/multivector_reranker.cpp:85-97,217-229`).
  *
  * A `row_number` window sorts entire per-group partitions (no map-side
  * partial aggregation); this Aggregator keeps at most k rows per group per
  * partition before the shuffle, so the exchange moves O(groups × k) rows
  * instead of O(input). Plans as ObjectHashAggregate (partial + final).
  *
  * Ordering: score descending, id ascending on ties — callers that need
  * oracle-stable ranks should quantize the score (e.g. `round(score, 9)`)
  * before feeding it, so near-tie float noise resolves via the id.
  * The buffer is kept sorted best-first; insert is a binary search + a
  * bounded shift (k is small: 10..1000).
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, mutable.ArrayBuffer[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  private def beats(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: mutable.ArrayBuffer[ScoredId] =
    new mutable.ArrayBuffer[ScoredId](math.min(k, 63) + 1) // k may be MaxValue (W3 full ranking)

  private def insert(buf: mutable.ArrayBuffer[ScoredId],
                     in: ScoredId): mutable.ArrayBuffer[ScoredId] = {
    if (buf.length < k || beats(in, buf.last)) {
      var lo = 0
      var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (beats(buf(mid), in)) lo = mid + 1 else hi = mid
      }
      buf.insert(lo, in)
      if (buf.length > k) buf.remove(buf.length - 1)
    }
    buf
  }

  override def reduce(buf: mutable.ArrayBuffer[ScoredId],
                      in: ScoredId): mutable.ArrayBuffer[ScoredId] =
    insert(buf, in)

  override def merge(a: mutable.ArrayBuffer[ScoredId],
                     b: mutable.ArrayBuffer[ScoredId]): mutable.ArrayBuffer[ScoredId] = {
    b.foreach(insert(a, _))
    a
  }

  /** Best-first (rank order) list of the k winners. */
  override def finish(buf: mutable.ArrayBuffer[ScoredId]): Seq[ScoredId] =
    buf.toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[ScoredId]] =
    Encoders.kryo[mutable.ArrayBuffer[ScoredId]]

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAggregator {
  /** Untyped column form: `topk(scoreCol, idCol)` →
    * `array<struct<score double, id long>>` in rank order. */
  def column(k: Int): UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[ScoredId])
}
