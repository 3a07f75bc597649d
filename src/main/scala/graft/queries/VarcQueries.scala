package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.VectorFunctions._
import graft.operators.{SetSim, TopK}

/** Variable-cardinality vector sets (S7 + the A1 batch variant) — the
  * reference's explicit cardinality-mapping path
  * (`LoadVectorCardinalityMappingAndGetBothMappings`,
  * `/root/reference/src/multivector_reranker.cpp:767-809`, consumed by
  * `ComputeSmoothChamferDistanceBatch` `:377-430`): data sets carry their
  * own cardinality; BOTH chamfer denominators still divide by the fixed
  * QUERY-side cardinality (`multi_vector_cardinality`).
  *
  * Fixture derivation (DiVE-COCO-style c∈{1..5},
  * `expr_configs/dive_train.yaml`): walking vec_ids in order, data-set
  * sizes cycle 1,2,3,4,5 — a pure function of `vec_id mod 15` expressed
  * as an identical CASE mapping in Spark and the oracle SQL, which IS the
  * S7 "both mappings" surface (vid→set and set→(members, card)).
  */
object VarcQueries extends QueryPack {
  import VectorQueries.{C, NQ, K}

  /** (posInCycle → (setOffset, subIdx, cardOfThatSet)); cycle = 15 ids → 5 sets. */
  private val cycle: Seq[(Int, Int, Int, Int)] = {
    var pos = 0
    (0 until 5).flatMap { setOff =>
      val card = setOff + 1
      (0 until card).map { sub =>
        val t = (pos, setOff, sub, card); pos += 1; t
      }
    }
  }
  private val CycleLen = 15
  private val SetsPerCycle = 5

  private def caseOf(f: ((Int, Int, Int, Int)) => Int): Column =
    cycle.foldLeft(lit(null).cast("long")) { case (acc, t) =>
      when(col("vec_id") % CycleLen === t._1, lit(f(t).toLong)).otherwise(acc)
    }

  private def caseSqlOf(f: ((Int, Int, Int, Int)) => Int): String =
    "CASE vec_id % 15 " +
      cycle.map(t => s"WHEN ${t._1} THEN ${f(t)}").mkString(" ") + " END"

  /** Membership with variable cardinality: (vector_id, set_id, sub_idx, card).
    * Shared with IndexQueries' g9_varc (ragged QUERY sets for the graph
    * search path). */
  private[graft] def membership(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      ((col("vec_id") / CycleLen).cast("long") * SetsPerCycle +
        caseOf(_._2)).as("set_id"),
      caseOf(_._3).as("sub_idx"),
      caseOf(_._4).as("card"),
      col("embedding"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S7: the cardinality mapping itself (both directions in one table).
    "s7_cardinality_map" -> ((s, dir) => {
      membership(s, dir).select(
        col("vec_id").as("vector_id"), col("set_id"),
        col("sub_idx"), col("card"))
    }),

    // A1 batch variant: smooth-Chamfer rerank where data sets have
    // variable cardinality; denominator stays the query cardinality C.
    "a1_smooth_chamfer_varc" -> ((s, dir) => {
      val q = Tables.embeddings(s, dir).filter(col("vec_id") < NQ * C)
        .select((col("vec_id") / C).cast("long").as("qset_id"),
          (col("vec_id") % C).cast("int").as("q_sub"),
          col("embedding").as("q_vec"))
        .withColumn("q_norm", vecNorm(col("q_vec")))
      val d = membership(s, dir).select(
        col("set_id").as("dset_id"), col("sub_idx").as("d_sub"),
        col("embedding").as("d_vec"))
        .withColumn("d_norm", vecNorm(col("d_vec")))
      val sims = d.crossJoin(broadcast(q))
        .select(col("qset_id"), col("dset_id"), col("q_sub"), col("d_sub"),
          (vecDot(col("q_vec"), col("d_vec")) /
            (col("q_norm") * col("d_norm"))).as("sim"))
      val scored = SetSim.smoothChamferAgg(sims, C)
        .withColumn("score", round(col("score"), 9))
      TopK.perGroupAgg(scored, Seq(col("qset_id")),
          col("score"), col("dset_id"), K, idName = "dset_id")
        .select(col("qset_id"), col("rank"), col("dset_id"),
          round(col("score"), 6).as("score"))
    })
  )

  private def dotSqlAB(a: String, b: String) =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
  private def normSqlOf(e: String) =
    s"sqrt(list_sum(list_transform($e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  private[queries] val membershipSql =
    s"""SELECT vec_id,
       |       CAST(vec_id // $CycleLen AS BIGINT) * $SetsPerCycle + ${caseSqlOf(_._2)} AS set_id,
       |       ${caseSqlOf(_._3)} AS sub_idx,
       |       ${caseSqlOf(_._4)} AS card,
       |       embedding
       |FROM embeddings""".stripMargin

  def oracles: Map[String, String] = Map(
    "s7_cardinality_map" ->
      s"""SELECT vec_id AS vector_id, set_id, sub_idx, card
         |FROM ($membershipSql)""".stripMargin,
    "a1_smooth_chamfer_varc" -> {
      val ts = SetSim.Temperature * SetSim.TxtScale
      val t = SetSim.Temperature
      s"""WITH q AS (
         |  SELECT CAST(vec_id // $C AS BIGINT) AS qset_id, vec_id % $C AS q_sub, embedding
         |  FROM embeddings WHERE vec_id < ${NQ * C}),
         |m AS ($membershipSql),
         |sims AS (
         |  SELECT q.qset_id, m.set_id AS dset_id, q.q_sub, m.sub_idx AS d_sub,
         |         ${dotSqlAB("q.embedding", "m.embedding")} /
         |         (${normSqlOf("q.embedding")} * ${normSqlOf("m.embedding")}) AS sim
         |  FROM q CROSS JOIN m),
         |rl AS (
         |  SELECT qset_id, dset_id, q_sub, mx + ln(sum(exp(x - mx))) AS lse FROM (
         |    SELECT qset_id, dset_id, q_sub, sim * $ts AS x,
         |           max(sim * $ts) OVER (PARTITION BY qset_id, dset_id, q_sub) AS mx
         |    FROM sims) GROUP BY qset_id, dset_id, q_sub, mx),
         |cl AS (
         |  SELECT qset_id, dset_id, d_sub, mx + ln(sum(exp(x - mx))) AS lse FROM (
         |    SELECT qset_id, dset_id, d_sub, sim * $t AS x,
         |           max(sim * $t) OVER (PARTITION BY qset_id, dset_id, d_sub) AS mx
         |    FROM sims) GROUP BY qset_id, dset_id, d_sub, mx),
         |t1 AS (SELECT qset_id, dset_id, sum(lse) AS s1 FROM rl GROUP BY qset_id, dset_id),
         |t2 AS (SELECT qset_id, dset_id, sum(lse) AS s2 FROM cl GROUP BY qset_id, dset_id),
         |scored AS (
         |  SELECT t1.qset_id, t1.dset_id,
         |         round((t1.s1 / (${C.toDouble} * $ts) + t2.s2 / (${C.toDouble} * $t)) / ${SetSim.Denominator}, 9) AS score
         |  FROM t1 JOIN t2 ON t1.qset_id = t2.qset_id AND t1.dset_id = t2.dset_id),
         |ranked AS (
         |  SELECT qset_id, dset_id, score,
         |         row_number() OVER (PARTITION BY qset_id ORDER BY score DESC, dset_id ASC) AS rank
         |  FROM scored)
         |SELECT qset_id, rank, dset_id, round(score, 6) AS score
         |FROM ranked WHERE rank <= $K""".stripMargin
    }
  )
}
