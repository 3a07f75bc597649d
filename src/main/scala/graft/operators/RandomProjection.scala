package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded random-projection dimensionality reduction — the
  * Johnson-Lindenstrauss-style coarse tier of similarity search: project
  * dim-D vectors onto `outDim` fixed directions and run the expensive
  * scan in the reduced space (outDim/D of the arithmetic and the bytes),
  * reranking the short tail exactly at full precision. At 100 TB a
  * 64→16 projection is a 4× cut of the dominant scan cost, composable
  * under every other tier (LSH/IVF/PQ all accept projected inputs).
  *
  * The directions are CORPUS-SEEDED (the shared training-free seed rule:
  * the `outDim` rows with the smallest (md5(id), id) rank — random
  * high-dim vectors are near-orthogonal, which is all JL needs), so the
  * whole operator — seed pick, projection arithmetic, reduced-space
  * ranking, exact rerank — is deterministic double arithmetic
  * reproducible in the DuckDB oracle: projected component j =
  * CAST(round9(dot(v, s_j) / ‖s_j‖) AS FLOAT), cosine over projections
  * in double with the 9-decimal HALF_UP quantization every ranking
  * decision here uses.
  *
  * Spark shape: seeds are tiny (outDim × dim floats) — baked into a
  * native column expression at plan time, so projection is a pure
  * per-row codegen-resident computation (no shuffle, no kernel
  * boundary); the reduced-space scan reuses [[KnnKernel.bruteForce]]
  * (broadcast query block, streamed corpus, bounded per-task heaps);
  * the exact tail is [[PqAnn.rerankExact]] (bounded candidate set
  * broadcast into one full-precision read).
  *
  * Reference anchor: the reference searches full-dimension vectors only
  * (`/root/reference/src/multivector_reranker.cpp:183-230`); projection
  * is the standard published reduction (Johnson & Lindenstrauss 1984;
  * Achlioptas 2003 database-friendly variants) a 100 TB deployment puts
  * under that scan.
  */
object RandomProjection {

  /** Project `(idCol, vecCol)` rows onto the seed directions:
    * output (idCol, pvec[outDim]), pvec(j) = round9(dot(v, s_j)/‖s_j‖)
    * as float. A native column expression
    * ([[graft.functions.expressions.VecProjectExpr]]) — the projection
    * stays inside whole-stage codegen with no Dataset encode/decode
    * boundary, composes under any plan, and runs unchanged on
    * Structured Streaming (StreamingSpec parity). */
  def project(data: DataFrame, idCol: String, vecCol: String,
              seeds: Array[Array[Float]]): DataFrame = {
    require(seeds.nonEmpty, "empty seed set")
    data.select(col(idCol),
      graft.functions.VectorFunctions.vecProject(col(vecCol), seeds)
        .as("pvec"))
  }

  /** Projection-accelerated exact-rerank kNN: coarse cosine top-`nCand`
    * in the reduced space, exact full-dimension cosine rerank, top-k.
    * Deterministic end-to-end (hash-checked in DuckDB as
    * `knn_randproj`); recall vs the full-dim exact scan is gated in
    * LlmPipelineSpec on the clustered fixture. */
  def knn(spark: SparkSession, queries: DataFrame, data: DataFrame, k: Int,
          outDim: Int = 16, nCand: Int = 80,
          excludeSelf: Boolean = false): DataFrame = {
    require(nCand >= k, s"nCand $nCand < k $k")
    val seeds = IvfAnn.seededCentroids(data, outDim)
    val qP = project(queries, "q_id", "q_vec", seeds)
      .select(col("q_id"), col("pvec").as("q_vec"))
    val dP = project(data, "d_id", "d_vec", seeds)
      .select(col("d_id"), col("pvec").as("d_vec"))
    val cands = KnnKernel.bruteForce(spark, qP, dP, nCand, excludeSelf)
      .select(col("q_id"), col("d_id"))
    PqAnn.rerankExact(queries, data, cands, k)
  }
}
