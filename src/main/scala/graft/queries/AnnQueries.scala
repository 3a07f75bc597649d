package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.VectorFunctions._
import graft.multimodal.MediaPipeline
import graft.operators.LshAnn

/** Scalable similarity-search + multimodal surface of the LLM-data
  * pipeline: LSH-bucketed ANN (no cross join), embedding-cosine near-dup
  * pairs, and the binary-payload feature pipeline.
  */
object AnnQueries extends QueryPack {
  import VectorQueries.{C, NQ, K}

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LSH-bucketed approximate kNN (rows-only: approximate by design;
    // LlmPipelineSpec asserts recall ≥0.9 vs the exact j1 oracle).
    "knn_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < NQ * C)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val d = e.select(col("vec_id").as("d_id"), col("embedding").as("d_vec"))
      LshAnn.knn(q, d, K, excludeSelf = true)
        .select(col("q_id"), col("rank"), col("d_id"),
          round(col("score"), 6).as("score"))
    }),

    // IVF-bucketed approximate kNN (rows-only: approximate by design;
    // recall gate in LlmPipelineSpec). Probe join touches ~nProbe/nlist
    // of the corpus instead of all pairs.
    "knn_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < NQ * C)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val d = e.select(col("vec_id").as("d_id"), col("embedding").as("d_vec"))
      graft.operators.IvfAnn.knn(s, q, d, K, excludeSelf = true)
        .select(col("q_id"), col("rank"), col("d_id"),
          round(col("score"), 6).as("score"))
    }),

    // Embedding-cosine near-dup: global top-20 most-similar vector pairs
    // (a < b) — TakeOrderedAndProject, quantized ordering.
    "dedup_embedding_cosine" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"))
        .withColumn("norm", vecNorm(col("embedding")))
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        col("norm").as("na"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
        col("norm").as("nb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(vecDot(col("va"), col("vb")) / (col("na") * col("nb")), 9)
            .as("cos"))
        .orderBy(col("cos").desc, col("id_a").asc, col("id_b").asc)
        .limit(20)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    }),

    // S14: seeded random-vector source (rows-only; partitioning-invariant
    // determinism asserted in SourcesSpec). Norm column demonstrates the
    // normalize-at-generation contract.
    "s14_random_vectors" -> ((s, dir) => {
      graft.sources.RandomVectors.df(s, 200, 16, seed = 42)
        .select(col("vec_id"),
          round(vecNorm(col("embedding")), 6).as("norm"),
          round(element_at(col("embedding"), 1), 6).as("first_elem"))
    }),

    // Multimodal: batched byte-level features over opaque binary payloads
    // (rows-only; decode step stubbed — see MediaPipeline).
    "mm_media_features" -> ((s, dir) => {
      MediaPipeline.features(
        MediaPipeline.fromDocuments(s, dir).filter(col("media_id") < 50))
        .select(col("media_id"), col("mime"), col("n_bytes"),
          col("entropy"), col("byte_hist"), col("frame_embedding"))
    })
  )

  private def dotSqlAB(a: String, b: String) =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
  private def normSqlOf(t: String) =
    s"sqrt(list_sum(list_transform($t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  def oracles: Map[String, String] = Map(
    "dedup_embedding_cosine" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         round(${dotSqlAB("a.embedding", "b.embedding")} /
         |               (${normSqlOf("a")} * ${normSqlOf("b")}), 9) AS cos
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b, round(cos, 6) AS cos FROM pairs
         |ORDER BY cos DESC, id_a ASC, id_b ASC LIMIT 20""".stripMargin
  )
}
