package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compact CSR adjacency for the projection / bipartite graphs — the
  * broadcast-side analog of the reference's
  * `std::vector<std::vector<uint32_t>>` (`include/index_bipartite.h:159-161`)
  * plus the entry point id (`projection_ep_`, `:181`).
  */
final class CsrGraph(val n: Int, val offsets: Array[Int], val nbrs: Array[Int],
                     val entryPoint: Int) extends Serializable {

  @inline def degree(node: Int): Int = offsets(node + 1) - offsets(node)
  @inline def nbrStart(node: Int): Int = offsets(node)
  @inline def nbrEnd(node: Int): Int = offsets(node + 1)

  def neighbors(node: Int): Array[Int] =
    java.util.Arrays.copyOfRange(nbrs, offsets(node), offsets(node + 1))
}

/** Build/persist CSR graphs from/to `(src long, nbrs array<long>)`
  * adjacency DataFrames. Persistence (S10/S11 —
  * `/root/reference/src/index_bipartite.cpp:3095-3108,2099-2119`'s
  * length-prefixed binary files) is a parquet adjacency table plus a tiny
  * JSON sidecar carrying `(n, entry_point, metric, params)` — the Spark
  * equivalent of the fbin header.
  */
object CsrGraph {

  def fromAdjacency(rows: Array[(Long, Seq[Long])], n: Int, entryPoint: Int): CsrGraph = {
    val degs = new Array[Int](n)
    rows.foreach { case (src, ns) => degs(src.toInt) = ns.length }
    val offsets = new Array[Int](n + 1)
    var i = 0
    while (i < n) { offsets(i + 1) = offsets(i) + degs(i); i += 1 }
    val nbrs = new Array[Int](offsets(n))
    rows.foreach { case (src, ns) =>
      var o = offsets(src.toInt)
      ns.foreach { d => nbrs(o) = d.toInt; o += 1 }
    }
    new CsrGraph(n, offsets, nbrs, entryPoint)
  }

  /** Collect an adjacency DataFrame (src, nbrs) into CSR. Nodes absent
    * from the DataFrame get degree 0. */
  def collect(adj: DataFrame, n: Int, entryPoint: Int): CsrGraph = {
    val rows = adj.select(col("src"), col("nbrs")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    fromAdjacency(rows, n, entryPoint)
  }

  def toAdjacencyDf(spark: SparkSession, g: CsrGraph): DataFrame = {
    import spark.implicits._
    // stream rows from a broadcast of the graph — no driver-side Seq of
    // n tuples (n can be 10M+)
    val gB = spark.sparkContext.broadcast(g)
    spark.range(0, g.n).as[Long].mapPartitions { it =>
      val graph = gB.value
      it.map(node => (node, graph.neighbors(node.toInt).map(_.toLong).toSeq))
    }.toDF("src", "nbrs")
  }

  /** Sidecar keys/values are identifier-ish tokens by contract — the
    * naive writer/regex reader pair would silently corrupt on quotes or
    * backslashes, so reject them loudly at write time. */
  private val MetaToken = "[A-Za-z0-9_.,:+\\- ]*".r

  /** S11: persist graph + metadata sidecar. */
  def save(spark: SparkSession, g: CsrGraph, path: String,
           meta: Map[String, String] = Map.empty): Unit = {
    toAdjacencyDf(spark, g).write.mode("overwrite").parquet(s"$path/adjacency")
    val all = meta ++ Map("n" -> g.n.toString, "entry_point" -> g.entryPoint.toString)
    all.foreach { case (k, v) =>
      require(MetaToken.matches(k) && MetaToken.matches(v),
        s"meta entry '$k' -> '$v' contains characters outside [A-Za-z0-9_.,:+- ]")
    }
    val json = all.map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$path/meta.json"), json)
  }

  /** S11: load a persisted graph. */
  def load(spark: SparkSession, path: String): CsrGraph = {
    val metaStr = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$path/meta.json"))
    def field(k: String): String = {
      val m = ("\"" + k + "\": \"([^\"]*)\"").r.findFirstMatchIn(metaStr)
      m.map(_.group(1)).getOrElse(sys.error(s"missing meta field $k in $path"))
    }
    val n = field("n").toInt
    val ep = field("entry_point").toInt
    collect(spark.read.parquet(s"$path/adjacency"), n, ep)
  }

  /** A5 degree statistics (`index_bipartite.cpp:107-141,1145-1181`) as a
    * relational aggregate over an adjacency DataFrame. */
  def degreeStats(adj: DataFrame, cap: Int): DataFrame =
    adj.select(size(col("nbrs")).as("deg"))
      .agg(
        round(avg("deg"), 6).as("avg_degree"),
        max("deg").as("max_degree"),
        min("deg").as("min_degree"),
        sum("deg").as("total_degree"),
        sum(when(col("deg") < cap, 1).otherwise(0)).as("under_cap"),
        sum(when(col("deg") === 0, 1).otherwise(0)).as("zero_degree"))
}
