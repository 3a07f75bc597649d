package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index._
import graft.queries.IndexQueries

/** G3 bipartite construction, S10 persistence of it, G13 two-hop search. */
class BipartiteSpec extends AnyFunSuite {
  import TestSpark._

  test("bipartite adjacency shape: fwd edges from query nodes, one reverse") {
    import spark.implicits._
    // two training queries with known NN lists over a 10-node base
    val knn = Seq((0L, Seq(3L, 5L, 7L)), (1L, Seq(5L, 2L, 9L)))
      .toDF("q_id", "nbrs")
    val adj = GraphBuild.bipartiteAdjacency(knn, nd = 10, mPjbp = 3)
      .as[(Long, Seq[Long])].collect().toMap
    // query node 10 (=0+nd): fwd edges to 5,7 (3 is the reverse target)
    assert(adj(10L).toSet === Set(5L, 7L))
    assert(adj(11L).toSet === Set(2L, 9L))
    // reverse: base 3 -> query node 10; base 5 -> query node 11
    assert(adj(3L) === Seq(10L))
    assert(adj(5L) === Seq(11L))
  }

  test("S10: bipartite graph save/load roundtrip") {
    import spark.implicits._
    val knn = Seq((0L, Seq(3L, 5L, 7L)), (1L, Seq(5L, 2L, 9L)))
      .toDF("q_id", "nbrs")
    val adj = GraphBuild.bipartiteAdjacency(knn, nd = 10, mPjbp = 3)
    val g = CsrGraph.collect(adj, 12, entryPoint = 0)
    val path = "/tmp/graft_test_bipartite"
    CsrGraph.save(spark, g, path, Map("kind" -> "bipartite", "nd" -> "10"))
    val back = CsrGraph.load(spark, path)
    assert(back.n === 12)
    assert((0 until 12).forall(v => back.neighbors(v).toSeq == g.neighbors(v).toSeq))
  }

  test("G13 two-hop bipartite search returns ranked base candidates") {
    val hits = IndexQueries.queries("g13_bipartite_search")(spark, sfDir)
      .collect()
    assert(hits.nonEmpty)
    val perQ = hits.groupBy(_.getLong(0))
    assert(perQ.size === 20)
    perQ.foreach { case (q, rs) =>
      // ranked best-first, all candidates base-side (< 500)
      val sims = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.toSeq === sims.sorted.reverse.toSeq, s"q=$q not sorted")
      rs.foreach(r => assert(r.getLong(2) < 500))
    }
  }
}
