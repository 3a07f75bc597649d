package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index._
import graft.queries.{IndexQueries, VectorQueries}
import graft.sources.Fbin

/** G10 shared-visited search, G12 overlap instrumentation, G6 α-prune,
  * S6 GT-with-dists roundtrip, W3 full ranking. */
class VariantSpec extends AnyFunSuite {
  import TestSpark._

  test("G10 shared-visited search returns candidates covering exact NNs") {
    val hits = IndexQueries.queries("g10_shared_search")(spark, sfDir)
      .select("qset_id", "q_sub", "d_id").collect()
    assert(hits.nonEmpty)
    // every (qset, sub) got some beam contents
    val perSub = hits.groupBy(r => (r.getLong(0), r.getInt(1))).view.mapValues(_.length)
    assert(perSub.size === 20)
    perSub.foreach { case (k, n) => assert(n >= 5, s"$k has only $n hits") }
  }

  test("G12 overlap instrumentation: 0 < unique_frac <= 1, totals consistent") {
    val rows = IndexQueries.queries("g12_visited_overlap")(spark, sfDir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (uniq, total, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(uniq > 0 && uniq <= total)
      assert(frac > 0.0 && frac <= 1.0)
      assert(math.abs(frac - uniq.toDouble / total) < 1e-5)
    }
  }

  test("alpha > 1 prunes more aggressively (G6 knob)") {
    val emb = Tables.embeddings(spark, sfDir)
    val vecs = VectorStore.fromDf(emb, "vec_id", "embedding", Metrics.Cosine)
    val cands = (1 until 100).map { i =>
      (i, Metrics.Cosine.dist(vecs.data, vecs.offset(i), vecs.data, vecs.offset(0), vecs.dim))
    }
    // with fill-pass both reach m; compare the RNG-kept prefix by running
    // with m large enough that the fill pass doesn't mask the rule
    val a1 = GraphBuild.occlusionPrune(cands, 0, 99, vecs, Metrics.Cosine, alpha = 1.0f)
    val a12 = GraphBuild.occlusionPrune(cands, 0, 99, vecs, Metrics.Cosine, alpha = 1.2f)
    assert(a1.length === 99 && a12.length === 99) // fill pass tops both up
    // the kept-by-RNG prefix differs: recompute without fill by m == kept count
    assert(a1.toSeq !== a12.toSeq)
  }

  test("S6 GT-with-dists write/read roundtrip") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(3L, 1L), Seq(0.5f, 0.7f)),
      (1L, Seq(2L, 0L), Seq(0.1f, 0.9f))).toDF("row_id", "ids", "dists")
    val path = "/tmp/graft_test_gtd.bin"
    Fbin.writeGtWithDists(df, path)
    val back = Fbin.readGtWithDists(spark, path, 2).orderBy("row_id").collect()
    assert(back(0).getSeq[Long](1) === Seq(3L, 1L))
    assert(back(0).getSeq[Float](2) === Seq(0.5f, 0.7f))
    assert(back(1).getSeq[Float](2) === Seq(0.1f, 0.9f))
  }

  test("g8 single-vector rerank returns ranked sets per singleton query") {
    val rows = IndexQueries.queries("g8_singlevector_rerank")(spark, sfDir)
      .collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size === 5)
    perQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length))
      assert(rs.length === 10)
    }
  }

  test("randomIds is deterministic and within range") {
    val a = graft.sources.RandomVectors.randomIds(spark, 20, 500, seed = 9)
      .collect().map(_.getLong(0))
    val b = graft.sources.RandomVectors.randomIds(spark, 20, 500, seed = 9)
      .collect().map(_.getLong(0))
    assert(a.toSeq === b.toSeq)
    assert(a.length === 20 && a.distinct.length === 20)
    assert(a.forall(id => id >= 0 && id < 500))
  }

  test("kernel-tier j1_knn_block equals relational j1_knn_cosine exactly") {
    val rel = VectorQueries.queries("j1_knn_cosine")(spark, sfDir)
      .orderBy("q_id", "rank").collect()
    val ker = VectorQueries.queries("j1_knn_block")(spark, sfDir)
      .orderBy("q_id", "rank").collect()
    assert(rel.length === ker.length && rel.nonEmpty)
    rel.zip(ker).foreach { case (a, b) => assert(a === b) }
  }

  test("W3 full ranking covers every set per query with contiguous ranks") {
    val rows = VectorQueries.queries("w3_full_ranking")(spark, sfDir)
      .collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size === 5)
    perQ.foreach { case (_, rs) =>
      assert(rs.length === 125) // 500 vectors / C=4 sets
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to 125))
    }
  }
}
