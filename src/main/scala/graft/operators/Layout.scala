package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB posture (SURVEY §7.1):
  * bucketed co-located joins (no exchange on the join key) and salted
  * joins for skewed keys. These are the knobs a production deployment
  * turns; LayoutSpec asserts the resulting plan shapes.
  */
object Layout {

  /** Write `df` as a bucketed+sorted table so later equi-joins on
    * `bucketCols` are exchange-free on both sides (SortMergeJoin directly
    * over bucketed scans). Buckets must match on both join sides. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for skewed build keys: the skewed (large) side gets
    * a random salt in [0, saltFactor); the small side is replicated once
    * per salt value. The shuffle key becomes (key, salt), splitting each
    * hot key's rows across `saltFactor` reducers. AQE's skew-join handles
    * moderate skew automatically — salting is the explicit fallback for
    * pathological keys. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val spark = large.sparkSession
    import spark.implicits._
    val salted = large.withColumn("_salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = small.crossJoin(
      (0 until saltFactor).toDF("_salt"))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
