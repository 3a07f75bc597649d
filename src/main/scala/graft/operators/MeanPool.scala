package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** S15 — CLIP4Clip video-level mean-pooling
  * (`/root/reference/prepare_for_clip_webvid.py:70-105`): L2-normalize
  * each frame vector (zero norm → 1 to avoid division by zero), take the
  * per-dimension mean over the video's frames, then L2-normalize the
  * pooled vector.
  *
  * Fully relational — two keyed aggregations (frame elements on
  * (group, pos), pooled norm on group) plus one equi-join of the
  * per-group norms; no driver materialization, so it scales with the
  * frame count. Group sizes are frames-per-video (bounded), so the
  * shuffles carry no pathological skew.
  */
object MeanPool {

  /** Long-form pooled result: one row per (group, pos) with the pooled
    * coordinate `val` rounded like every oracle boundary (round 9 →
    * round 6). Input: (groupCol, vecCol array<float>), one row per
    * frame. */
  def clip4clip(frames: DataFrame, groupCol: String = "video_id",
                vecCol: String = "embedding"): DataFrame = {
    val fnorm = vecNorm(col(vecCol))
    val elems = frames
      .withColumn("_fnorm", when(fnorm === 0.0, 1.0).otherwise(fnorm))
      .select(col(groupCol), col("_fnorm"),
        posexplode(col(vecCol)).as(Seq("_pos", "_x")))
      .select(col(groupCol), (col("_pos") + 1).cast("long").as("pos"),
        (col("_x").cast("double") / col("_fnorm")).as("_xn"))
    val means = elems.groupBy(col(groupCol), col("pos"))
      .agg(avg(col("_xn")).as("_mean"))
    val norms = means.groupBy(col(groupCol))
      .agg(sqrt(sum(col("_mean") * col("_mean"))).as("_vnorm"))
    means.join(norms, Seq(groupCol))
      .select(col(groupCol), col("pos"),
        round(round(col("_mean") / col("_vnorm"), 9), 6).as("val"))
  }

  /** Wide form for pipeline reuse (feeds ANN/search operators):
    * (groupCol, vec array<double>) with the pooled unit vector in
    * coordinate order. */
  def clip4clipVectors(frames: DataFrame, groupCol: String = "video_id",
                       vecCol: String = "embedding"): DataFrame =
    clip4clip(frames, groupCol, vecCol)
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("val")))),
        x => x.getField("val")).as("vec"))
}
