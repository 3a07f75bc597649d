package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Batch event-time analytics over the `events` fixture — the batch
  * faces of the streaming surface (tumbling windows, sessionization,
  * semi-structured props), all DuckDB-checkable. Event-time arithmetic
  * uses microsecond longs (`unix_micros` / `epoch_us`) on both engines so
  * no float truncation can disturb the hash compare.
  */
object EventQueries extends QueryPack {

  /** Session gap: 30 minutes, in microseconds. */
  private val GapUs = 30L * 60 * 1000000

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hourly tumbling windows per event type (the batch twin of the
    // streaming windowedEventStats).
    "e1_window_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(round(avg("value"), 9), 6).as("avg_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("avg_value"))
    }),

    // Sessionization: per user, a new session starts after a >30 min gap;
    // classic lag + running-sum window shape.
    "e2_sessionize" -> ((s, dir) => {
      val us = unix_micros(col("ts"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val flagged = events(s, dir)
        .select(col("user_id"), col("event_id"), us.as("us"))
        .withColumn("new_session",
          when(col("us") - lag(col("us"), 1).over(w) > GapUs, 1)
            .when(lag(col("us"), 1).over(w).isNull, 1)
            .otherwise(0))
        .withColumn("session_idx", sum("new_session").over(
          Window.partitionBy("user_id").orderBy("us", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      flagged.groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min("us").as("start_us"), max("us").as("end_us"))
    }),

    // Semi-structured props: extract the JSON field, bucket, count.
    "e3_props_extract" -> ((s, dir) => {
      events(s, dir)
        .select((get_json_object(col("props"), "$.k").cast("long") / 10)
          .cast("long").as("k_bucket"))
        .groupBy("k_bucket").agg(count(lit(1)).as("cnt"))
    }),

    // EXACT per-type value quantiles at fixed precision — the
    // continuous-domain cousin of text_length_quantiles: quantize value
    // to 3 decimals (an integer milli-value, so the domain is discrete
    // and group-countable), then the same value-counts decomposition —
    // one map-side-combinable groupBy (the only corpus shuffle) + a
    // cumulative scan over the tiny (type × distinct-value) table.
    // Exact at any corpus size for the quantized values; no global
    // sort, no t-digest approximation.
    "e4_value_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = events(s, dir)
        .select(col("event_type"),
          round(col("value") * 1000, 0).cast("long").as("mv"))
        .groupBy("event_type", "mv").agg(count(lit(1)).as("cnt"))
      val withCum = counts
        .withColumn("cum", sum("cnt").over(Window.partitionBy("event_type")
          .orderBy("mv")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum("cnt").over(Window.partitionBy("event_type")))
      def q(p: Double) =
        round(min(when(col("cum") >= ceil(lit(p) * col("n")), col("mv")))
          .cast("double") / 1000, 6)
      withCum.groupBy("event_type").agg(
        q(0.5).as("p50_value"), q(0.9).as("p90_value"),
        q(0.99).as("p99_value"))
    }),

    // Hour-over-hour RETENTION: of the users active in hour h, the
    // share also active in hour h+1 — the classic cohort-ish funnel
    // metric. Distinct (user, hour) first (the dedup shuffle), then a
    // keyed self-join on (user, hour+1) — never a cross join.
    "e5_retention" -> ((s, dir) => {
      // integer division (not a float divide + floor: the double
      // quotient of µs-scale longs can land an ulp under the integer)
      val uh = events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 3600000000").as("hour"))
        .distinct()
      val nxt = uh.select(col("user_id"), (col("hour") - 1).as("hour"),
        lit(1L).as("ret"))
      uh.join(nxt, Seq("user_id", "hour"), "left")
        .groupBy("hour").agg(count(lit(1)).as("n_users"),
          sum(coalesce(col("ret"), lit(0L))).as("n_retained"))
        .select(col("hour"), col("n_users"), col("n_retained"),
          round(round(col("n_retained").cast("double") / col("n_users"), 9),
            6).as("retention"))
    })
  )

  def oracles: Map[String, String] = Map(
    "e4_value_quantiles" ->
      """WITH c AS (
        |  SELECT event_type, CAST(round(value * 1000, 0) AS BIGINT) AS mv,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, mv, cnt,
        |         sum(cnt) OVER (PARTITION BY event_type ORDER BY mv
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM c)
        |SELECT event_type,
        |       round(CAST(min(CASE WHEN cum >= ceil(0.5 * n) THEN mv END)
        |         AS DOUBLE) / 1000, 6) AS p50_value,
        |       round(CAST(min(CASE WHEN cum >= ceil(0.9 * n) THEN mv END)
        |         AS DOUBLE) / 1000, 6) AS p90_value,
        |       round(CAST(min(CASE WHEN cum >= ceil(0.99 * n) THEN mv END)
        |         AS DOUBLE) / 1000, 6) AS p99_value
        |FROM cum GROUP BY event_type""".stripMargin,
    "e5_retention" ->
      """WITH uh AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hour
        |  FROM events),
        |j AS (
        |  SELECT a.hour, a.user_id,
        |         CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END AS ret
        |  FROM uh a LEFT JOIN uh b
        |    ON b.user_id = a.user_id AND b.hour = a.hour + 1)
        |SELECT hour, count(*) AS n_users,
        |       CAST(sum(ret) AS BIGINT) AS n_retained,
        |       round(round(CAST(sum(ret) AS DOUBLE) / count(*), 9), 6)
        |         AS retention
        |FROM j GROUP BY hour""".stripMargin,
    "e1_window_agg" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |       event_type, count(*) AS n_events,
        |       round(round(avg(value), 9), 6) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "e2_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         |flagged AS (
         |  SELECT user_id, event_id, us,
         |         CASE WHEN us - lag(us) OVER w > $GapUs THEN 1
         |              WHEN lag(us) OVER w IS NULL THEN 1
         |              ELSE 0 END AS new_session
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |sess AS (
         |  SELECT user_id, event_id, us,
         |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM flagged)
         |SELECT user_id, session_idx, count(*) AS n_events,
         |       min(us) AS start_us, max(us) AS end_us
         |FROM sess GROUP BY user_id, session_idx""".stripMargin,
    "e3_props_extract" ->
      """SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT) AS k_bucket,
        |count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin
  )
}
