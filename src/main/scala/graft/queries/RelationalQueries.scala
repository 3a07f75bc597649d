package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.operators.TopK

/** Relational operator coverage over the driver's star schema —
  * aggregation (A4-shape), broadcast joins, per-group top-k (W1), dedup
  * (P9), set ops (S16/J6 shapes). These exercise the engine primitives the
  * reference's eval harness needs (TSV aggregates, per-query grouping)
  * on the TPC-H-ish fixtures where DuckDB can hash-check them.
  */
object RelationalQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A4-shape aggregate: grouped sums/avgs/counts with partial agg.
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(round(avg("l_discount"), 9), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    // Broadcast-join chain: orders → customer → nation → region.
    "q_join_star" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    }),
    // W1: top-3 rows per group with deterministic tie-breaks, on the
    // bounded-heap scale path (map-side partial top-k; the shuffle moves
    // O(groups*k) rows, not the table — a rank window would sort every
    // group's rows on one task). The aggregator's (score desc, id asc)
    // order realizes the 3-level tie-break by packing the id as
    // l_orderkey*8 + l_linenumber: TPC-H linenumbers are 1..7, so the
    // packing is injective and preserves (orderkey asc, linenumber asc).
    "w1_topk_per_group" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_extendedprice"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("packed"))
      TopK.perGroupAgg(li, Seq(col("l_returnflag")),
          col("l_extendedprice"), col("packed"), 3)
        .select(col("l_returnflag"), col("rank"),
          expr("id div 8").as("l_orderkey"),
          (col("id") % 8).cast("int").as("l_linenumber"),
          col("score").as("l_extendedprice"))
    }),
    // P9: dedup / distinct projection.
    "p9_dedup" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderstatus")).distinct()
    }),
    // S16-shape: semi/anti split — customers with and without orders.
    "s16_semi_split" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.orders(s, dir)
      val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit(1).as("has_orders"))
      val without = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit(0).as("has_orders"))
      withO.unionByName(without)
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(round(avg(l_discount), 9), 6) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_star" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
        |count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "w1_topk_per_group" ->
      """SELECT l_returnflag, rank, l_orderkey, l_linenumber, l_extendedprice
        |FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rank
        |  FROM lineitem)
        |WHERE rank <= 3""".stripMargin,
    "p9_dedup" ->
      "SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
    // NOT EXISTS (not NOT IN): null-safe anti-join semantics matching
    // Spark's left_anti even if o_custkey ever contained NULLs.
    "s16_semi_split" ->
      """SELECT c_custkey, 1 AS has_orders FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT c_custkey, 0 AS has_orders FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin
  )
}
