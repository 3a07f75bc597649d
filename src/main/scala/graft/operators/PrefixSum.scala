package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix sum over a monotone non-negative bucket
  * key — the scale backbone of sequence packing (and any "global running
  * total" shape). A single `Window.orderBy(bucket)` puts every bucket
  * row in ONE task; the two-level decomposition in pack_sequences caps
  * that at n/256 rows, which at a 10¹²-doc corpus is still ~10⁹ rows in
  * one task. This operator recurses the same decomposition a STATIC
  * number of levels: each level's within-group window is bounded by
  * `fanout` rows, group totals shrink by `fanout`× per level, and only
  * the top table (n/fanout^levels rows — sized by the CALLER to fit one
  * task) takes the final bounded global window. Static depth keeps the
  * plan a pure composition — no data-dependent `count()` jobs deciding
  * recursion, so the query stays one lazy Catalyst DAG.
  *
  * Exactness: the bucket key is monotone, so within-group exclusive
  * prefix + exclusive prefix of whole-group totals reproduces the global
  * exclusive prefix bucket-for-bucket (the same argument as the
  * two-level form, applied inductively per level).
  */
object PrefixSum {

  /** `totals`: one row per bucket, columns (`bucketCol`: non-negative
    * integral, `totalCol`: long). Returns (`bucketCol`, boff) with
    * boff = sum of `totalCol` over all strictly-smaller buckets.
    * `levels` = how many fanout-bounded decomposition levels to apply
    * before the final global window; with levels=0 this IS the single
    * bounded global window (caller asserts the table fits one task). */
  def exclusiveOffsets(totals: DataFrame, bucketCol: String,
                       totalCol: String, fanout: Int = 1 << 16,
                       levels: Int = 1): DataFrame = {
    require(fanout > 1, s"fanout must be > 1, got $fanout")
    if (levels <= 0) {
      val w = Window.orderBy(bucketCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      totals
        .withColumn("boff", coalesce(sum(col(totalCol)).over(w), lit(0L)))
        .select(col(bucketCol), col("boff"))
    } else {
      // within-parent exclusive prefix: every window here is bounded by
      // `fanout` rows and the parent groups run in parallel. The parent
      // key name is DEPTH-UNIQUE: recursing with a constant name would
      // silently overwrite the previous level's key (withColumn
      // replaces), mis-keying the join on the grandparent.
      val pcol = s"__parent_l$levels"
      val withParent = totals
        .withColumn(pcol, expr(s"$bucketCol div $fanout"))
      val wIn = Window.partitionBy(pcol).orderBy(bucketCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      val inOff = withParent.withColumn("__in_off",
        coalesce(sum(col(totalCol)).over(wIn), lit(0L)))
      // parent totals recurse through the same shape, one level shallower
      val parentTotals = withParent.groupBy(pcol)
        .agg(sum(col(totalCol)).as("__ptot"))
      val parentOffs =
        exclusiveOffsets(parentTotals, pcol, "__ptot", fanout, levels - 1)
          .withColumnRenamed("boff", "__poff")
      // equi-join on the parent key: the offsets side shrinks fanout× per
      // level, so AQE broadcasts the upper levels on its own
      inOff.join(parentOffs, pcol)
        .select(col(bucketCol),
          (col("__in_off") + col("__poff")).as("boff"))
    }
  }
}
