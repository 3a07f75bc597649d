package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Replaces the reference's raw fbin/ibin binary loaders
  * (`/root/reference/include/efanna2e/util.h:179-210`,
  * `/root/reference/src/multivector_reranker.cpp:505-549`) with
  * Parquet-backed DataFrames: schema lives in the file footer instead of a
  * `(npts, dim)` uint32 header, and Spark's vectorized parquet reader gives
  * column pruning + predicate pushdown for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Dense vector corpus: (vec_id long, embedding array<float>, label int). */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")

  def documents(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")

  /** The events fixture's `ts` physical type has varied across driver
    * generations — TIMESTAMP(NANOS) (which Spark 4 refuses outright
    * without the nanos-as-long legacy conf) and TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Normalize both
    * to a session-tz TIMESTAMP (sessions run UTC, so the NTZ cast is
    * value-preserving and `unix_micros` matches DuckDB's `epoch_us`):
    * nanos-long → µs via integer division (truncating like DuckDB's
    * internal µs timestamps); NTZ → plain cast. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")

  def orders(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
}
