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
    })
  )

  def oracles: Map[String, String] = Map(
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
