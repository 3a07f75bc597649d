package graft.index

import scala.collection.mutable.ArrayBuffer

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
    // through the Hadoop filesystem of the TARGET path, not java.nio:
    // index dirs live wherever the deployment puts them (HDFS, ABFS, a
    // CAS object store) and a raw-string nio write would silently land
    // the sidecar on the driver's local disk under a mangled relative
    // path while the adjacency parquet goes remote
    val mp = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val mf = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = mf.create(mp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** S11: load a persisted graph. */
  def load(spark: SparkSession, path: String): CsrGraph = {
    val mp = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val mf = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = mf.open(mp)
    val metaStr =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def field(k: String): String = {
      val m = ("\"" + k + "\": \"([^\"]*)\"").r.findFirstMatchIn(metaStr)
      m.map(_.group(1)).getOrElse(sys.error(s"missing meta field $k in $path"))
    }
    val n = field("n").toInt
    val ep = field("entry_point").toInt
    collect(spark.read.parquet(s"$path/adjacency"), n, ep)
  }

  /** S11 (NSG interop) — import the reference's NSG byte format
    * (`LoadNsgGraph`, `/root/reference/src/index_bipartite.cpp:2075-2097`):
    * little-endian `uint32 width` (max degree, informational),
    * `uint32 entry_point`, then per node `uint32 nbr_count` followed by
    * `nbr_count × uint32` neighbor ids. The reference hardcodes
    * npts=1,000,000; this reader consumes records until EOF so any corpus
    * size round-trips. Driver-side I/O like the other binary parity
    * sources (Fbin) — an interop boundary, not a query path. */
  def loadNsg(path: String): CsrGraph = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 8, s"$path: too short for an NSG header")
    buf.getInt() // width — informational in the reference loader too
    val ep = buf.getInt()
    val offsets = new ArrayBuffer[Int](1024)
    offsets += 0
    val nbrs = new ArrayBuffer[Int](1024)
    while (buf.remaining() >= 4) {
      val deg = buf.getInt()
      require(deg >= 0 && buf.remaining() >= deg.toLong * 4,
        s"$path: truncated adjacency record at node ${offsets.length - 1}")
      var i = 0
      while (i < deg) { nbrs += buf.getInt(); i += 1 }
      offsets += nbrs.length
    }
    require(buf.remaining() == 0, s"$path: ${buf.remaining()} trailing bytes")
    val n = offsets.length - 1
    val g = new CsrGraph(n, offsets.toArray, nbrs.toArray, ep)
    require(ep >= 0 && ep < n, s"$path: entry point $ep out of range for n=$n")
    g.nbrs.foreach(v => require(v >= 0 && v < n,
      s"$path: neighbor id $v out of range for n=$n"))
    g
  }

  /** NSG-format writer — the parity sink twin of [[loadNsg]] (lets built
    * graphs flow back into reference tooling; also the roundtrip test
    * surface). `width` defaults to the true max degree. */
  def saveNsg(g: CsrGraph, path: String, width: Int = -1): Unit = {
    val w = if (width >= 0) width
      else (0 until g.n).foldLeft(0)((m, v) => math.max(m, g.degree(v)))
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path))))
    try {
      def writeIntLE(x: Int): Unit = out.writeInt(Integer.reverseBytes(x))
      writeIntLE(w)
      writeIntLE(g.entryPoint)
      var v = 0
      while (v < g.n) {
        writeIntLE(g.degree(v))
        var i = g.nbrStart(v)
        while (i < g.nbrEnd(v)) { writeIntLE(g.nbrs(i)); i += 1 }
        v += 1
      }
    } finally out.close()
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
