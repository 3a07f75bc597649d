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

  /** The events fixture stores TIMESTAMP(NANOS) parquet, which Spark 4
    * refuses outright — read nanos as long (legacy conf) and convert to a
    * microsecond timestamp (integer division, truncating like DuckDB's
    * internal µs timestamps). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")

  def orders(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
}
