package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** fbin/ibin binary ingest parity (S1-S3, S9, S15) — the reference's
  * dense-matrix file format: a `(npts, dim)` uint32 little-endian header
  * followed by row-major float32 (fbin) or uint32 (ibin) rows
  * (`/root/reference/include/efanna2e/util.h:106-210`,
  * `Loader::LoadEmbeddingVector` `src/multivector_reranker.cpp:505-549`).
  *
  * Read path: the driver reads only the 8-byte header, then row-range
  * partitions are pread in parallel via `mapPartitions` — each task opens
  * the file at its own offset, so a 100 TB-scale corpus on a shared
  * filesystem streams partition-parallel with no driver materialization.
  * Row index == vector id (the format's positional-id contract).
  *
  * Write path (S13/S15 converters, GT writer shape
  * `src/multivector_reranker.cpp:160-181`): driver-streamed in id order —
  * a parity/conversion tool, not a bulk sink (bulk data stays parquet).
  */
object Fbin {

  /** Read the (npts, dim) header. */
  def meta(path: String): (Int, Int) = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      ch.read(buf, 0)
      buf.flip()
      val n = buf.getInt
      val d = buf.getInt
      val expected = 8L + n.toLong * d * 4
      require(ch.size() == expected,
        s"$path: size ${ch.size()} != expected $expected for n=$n d=$d")
      (n, d)
    } finally ch.close()
  }

  /** Parallel fbin scan → (vec_id long, embedding array<float>). */
  def read(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val (n, d) = meta(path)
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, math.min(parts, math.max(1, n)))
      .as[Long]
      .mapPartitions { it =>
        val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
        val rowBytes = d * 4
        val buf = ByteBuffer.allocate(rowBytes).order(ByteOrder.LITTLE_ENDIAN)
        it.map { id =>
          buf.clear()
          var read = 0
          while (read < rowBytes) {
            val r = ch.read(buf, 8L + id * rowBytes + read)
            require(r > 0, s"short read at row $id")
            read += r
          }
          buf.flip()
          val v = new Array[Float](d)
          var i = 0
          while (i < d) { v(i) = buf.getFloat; i += 1 }
          (id, v)
        } // channel closed when task ends (JVM cleans on GC; rows are exhausted here)
      }.toDF("vec_id", "embedding")
  }

  /** Write (vec_id, embedding) rows as fbin, id order, driver-streamed. */
  def write(df: DataFrame, path: String): Unit = {
    val d = df.select(org.apache.spark.sql.functions.size(col("embedding")))
      .first().getInt(0)
    val rows = df.select(col("vec_id"), col("embedding"))
      .orderBy("vec_id")
    val n = rows.count().toInt
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(path)))
    try {
      def writeIntLE(x: Int): Unit = {
        out.write(x & 0xff); out.write((x >> 8) & 0xff)
        out.write((x >> 16) & 0xff); out.write((x >> 24) & 0xff)
      }
      writeIntLE(n); writeIntLE(d)
      rows.toLocalIterator().forEachRemaining { r =>
        val v = r.getSeq[Float](1)
        require(v.length == d, s"ragged row ${r.getLong(0)}")
        v.foreach(f => writeIntLE(java.lang.Float.floatToIntBits(f)))
      }
    } finally out.close()
  }

  /** Parallel ibin scan (uint32 rows — GT / kNN lists, S4/S5/S9) →
    * (row_id long, ids array<long>). */
  def readIbin(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val (n, d) = meta(path)
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, math.min(parts, math.max(1, n)))
      .as[Long]
      .mapPartitions { it =>
        val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
        val rowBytes = d * 4
        val buf = ByteBuffer.allocate(rowBytes).order(ByteOrder.LITTLE_ENDIAN)
        it.map { id =>
          buf.clear()
          var read = 0
          while (read < rowBytes) {
            val r = ch.read(buf, 8L + id * rowBytes + read)
            require(r > 0, s"short read at row $id")
            read += r
          }
          buf.flip()
          val v = new Array[Long](d)
          var i = 0
          while (i < d) { v(i) = buf.getInt.toLong & 0xffffffffL; i += 1 }
          (id, v.toSeq)
        }
      }.toDF("row_id", "ids")
  }

  /** S6 — GT scan with distances (`load_gt_data_with_dist`,
    * `util.h:128-154`): (n,k) header, then ALL n×k uint32 id rows, then
    * ALL n×k float32 distance rows. → (row_id, ids, dists). */
  def readGtWithDists(spark: SparkSession, path: String,
                      numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val (n, k) = meta0(path) // header only; size differs from plain ibin
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val idsBase = 8L
    val distsBase = 8L + n.toLong * k * 4
    spark.range(0, n, 1, math.min(parts, math.max(1, n)))
      .as[Long]
      .mapPartitions { it =>
        val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
        val rowBytes = k * 4
        val buf = ByteBuffer.allocate(rowBytes).order(ByteOrder.LITTLE_ENDIAN)
        def readRow(base: Long, id: Long): ByteBuffer = {
          buf.clear()
          var read = 0
          while (read < rowBytes) {
            val r = ch.read(buf, base + id * rowBytes + read)
            require(r > 0, s"short read at row $id")
            read += r
          }
          buf.flip()
          buf
        }
        it.map { id =>
          val b1 = readRow(idsBase, id)
          val ids = new Array[Long](k)
          var i = 0
          while (i < k) { ids(i) = b1.getInt.toLong & 0xffffffffL; i += 1 }
          val b2 = readRow(distsBase, id)
          val ds = new Array[Float](k)
          i = 0
          while (i < k) { ds(i) = b2.getFloat; i += 1 }
          (id, ids.toSeq, ds.toSeq)
        }
      }.toDF("row_id", "ids", "dists")
  }

  /** S6 writer (ids block then dists block). */
  def writeGtWithDists(df: DataFrame, path: String): Unit = {
    val k = df.select(org.apache.spark.sql.functions.size(col("ids")))
      .first().getInt(0)
    val rows = df.select(col("row_id"), col("ids"), col("dists")).orderBy("row_id")
    val n = rows.count().toInt
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(path)))
    try {
      def writeIntLE(x: Int): Unit = {
        out.write(x & 0xff); out.write((x >> 8) & 0xff)
        out.write((x >> 16) & 0xff); out.write((x >> 24) & 0xff)
      }
      writeIntLE(n); writeIntLE(k)
      val cached = rows.collect()
      cached.foreach { r =>
        val v = r.getSeq[Long](1)
        require(v.length == k, s"ragged ids row ${r.getLong(0)}")
        v.foreach(x => writeIntLE(x.toInt))
      }
      cached.foreach { r =>
        val v = r.getSeq[Float](2)
        require(v.length == k, s"ragged dists row ${r.getLong(0)}")
        v.foreach(f => writeIntLE(java.lang.Float.floatToIntBits(f)))
      }
    } finally out.close()
  }

  /** S15 — minimal .npy ingest (the reference's
    * `export_fbin_from_npy.py` converter, repo root): parses the NPY v1/v2
    * header (magic, little-endian float32/float64, C-order, 2-d shape)
    * and loads rows positionally. Conversion job: `fromNpy` → [[write]]. */
  def readNpy(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    val (dataStart, n, d, elemBytes) =
      try {
        val pre = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
        ch.read(pre, 0)
        pre.flip()
        val magic = new Array[Byte](6)
        pre.get(magic)
        require(magic.sameElements(Array(0x93.toByte, 'N'.toByte, 'U'.toByte,
          'M'.toByte, 'P'.toByte, 'Y'.toByte)), s"$path: not an NPY file")
        val major = pre.get()
        pre.get() // minor
        val headerLen =
          if (major == 1) { pre.getShort & 0xffff }
          else {
            val b4 = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
            ch.read(b4, 8); b4.flip(); b4.getInt
          }
        val headerStart = if (major == 1) 10L else 12L
        val hb = ByteBuffer.allocate(headerLen)
        ch.read(hb, headerStart)
        val header = new String(hb.array(), "ASCII")
        val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header)
          .map(_.group(1)).getOrElse(sys.error(s"no descr in $header"))
        val eb = descr match {
          case "<f4" => 4
          case "<f8" => 8
          case other => sys.error(s"unsupported npy dtype $other")
        }
        require("'fortran_order':\\s*False".r.findFirstIn(header).isDefined,
          "fortran-order npy unsupported")
        val shape = "'shape':\\s*\\((\\d+),\\s*(\\d+)\\)".r.findFirstMatchIn(header)
          .getOrElse(sys.error(s"need 2-d shape in $header"))
        (headerStart + headerLen, shape.group(1).toInt, shape.group(2).toInt, eb)
      } finally ch.close()

    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, math.min(parts, math.max(1, n.toInt)))
      .as[Long]
      .mapPartitions { it =>
        val c = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
        val rowBytes = d * elemBytes
        val buf = ByteBuffer.allocate(rowBytes).order(ByteOrder.LITTLE_ENDIAN)
        it.map { id =>
          buf.clear()
          var read = 0
          while (read < rowBytes) {
            val r = c.read(buf, dataStart + id * rowBytes + read)
            require(r > 0, s"short read at row $id")
            read += r
          }
          buf.flip()
          val v = new Array[Float](d)
          var i = 0
          while (i < d) {
            v(i) = if (elemBytes == 4) buf.getFloat else buf.getDouble.toFloat
            i += 1
          }
          (id, v)
        }
      }.toDF("vec_id", "embedding")
  }

  /** Header-only read (no size validation — S6 files have two blocks). */
  private def meta0(path: String): (Int, Int) = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      ch.read(buf, 0)
      buf.flip()
      (buf.getInt, buf.getInt)
    } finally ch.close()
  }

  /** Write (row_id, ids) as ibin (uint32), id order — the binary GT
    * writer parity (S13). */
  def writeIbin(df: DataFrame, path: String): Unit = {
    val d = df.select(org.apache.spark.sql.functions.size(col("ids")))
      .first().getInt(0)
    val rows = df.select(col("row_id"), col("ids")).orderBy("row_id")
    val n = rows.count().toInt
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(path)))
    try {
      def writeIntLE(x: Int): Unit = {
        out.write(x & 0xff); out.write((x >> 8) & 0xff)
        out.write((x >> 16) & 0xff); out.write((x >> 24) & 0xff)
      }
      writeIntLE(n); writeIntLE(d)
      rows.toLocalIterator().forEachRemaining { r =>
        val v = r.getSeq[Long](1)
        require(v.length == d, s"ragged row ${r.getLong(0)}")
        v.foreach(x => writeIntLE(x.toInt))
      }
    } finally out.close()
  }
}
