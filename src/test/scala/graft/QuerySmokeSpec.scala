package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sfDir = "/root/testdata/sf0.001"
}

/** Every declared query runs end-to-end on sf0.001 and returns rows. */
class QuerySmokeSpec extends AnyFunSuite {
  import TestSpark._

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name returns rows on sf0.001") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("routed SQL queries leave this session's ann.rewrite conf as found") {
    // the routed statements run in a dedicated CHILD session; the
    // driver session's conf must come back exactly as it went in
    val before = spark.conf.getOption("spark.graft.ann.rewrite")
    SparkEntry.queries("g9_sql_multivector")(spark, sfDir).count()
    SparkEntry.queries("g9_sql_saturated")(spark, sfDir).count()
    assert(spark.conf.getOption("spark.graft.ann.rewrite") === before,
      "routed SQL queries leaked spark.graft.ann.rewrite into the " +
        "caller session")
  }

  test("verify type guard trips on decimal/binary, passes the stable set") {
    import org.apache.spark.sql.types._
    val bad = StructType(Seq(
      StructField("a", DecimalType(10, 2)),
      StructField("b", BinaryType),
      // arrays are rejected outright: pandas cannot sort array cells in
      // the driver's compare path (the r8 mm_image_decode red row)
      StructField("y", ArrayType(FloatType)),
      StructField("c", LongType)))
    assert(Verify.unstableColumns(bad).map(_.takeWhile(_ != ':'))
      === Seq("a", "b", "y"))
    val good = StructType(Seq(
      StructField("x", LongType),
      StructField("z", TimestampType), StructField("w", StringType)))
    assert(Verify.unstableColumns(good).isEmpty)
  }
}
