package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max}

/** Max-id watermark sidecar for the resident parquet indexes (SemDeDup
  * cell index, MinHash band index): one long in `path/_watermark`
  * (`_`-prefixed, so parquet readers ignore it), maintained by every
  * index write. Incremental ingest validates its monotone-id contract
  * and detects at-least-once REPLAYS against this sidecar — one tiny
  * file read per micro-batch instead of a full-index `max(id)` scan,
  * which at 100 TB is an O(index) file listing + footer pass per batch.
  *
  * Crash window: the sidecar is written AFTER the data it covers, so a
  * crash in between leaves the watermark STALE (low). The only
  * consequence is that a replayed append re-appends rows the watermark
  * didn't cover — exact duplicate rows, which change no downstream
  * answer: the SemDeDup probe is EXISTS-shaped, and the band-index
  * probe counts DISTINCT bands per pair
  * ([[MinHashLsh.incrementalPairs]]), so neither is inflated by a
  * duplicated row. Compaction folds the duplicates away.
  */
object Watermark {

  private val FileName = "_watermark"

  private def fsFor(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read the watermark. `None` = no index at `path` (or an empty one).
    * An index written before the sidecar existed (legacy), or whose
    * sidecar a crash left truncated/corrupt, falls back to one full
    * column-pruned `max(idCol)` scan, then self-heals on the next
    * append or compact. */
  def read(spark: SparkSession, path: String, idCol: String): Option[Long] = {
    val fs = fsFor(spark, path)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) return None
    val wp = new org.apache.hadoop.fs.Path(path, FileName)
    val fromSidecar: Option[Long] =
      if (!fs.exists(wp)) None
      else {
        val in = fs.open(wp)
        try Some(in.readLong())
        catch { case scala.util.control.NonFatal(_) => None }
        finally in.close()
      }
    fromSidecar.orElse {
      val m = spark.read.parquet(path).agg(max(col(idCol))).first()
      if (m.isNullAt(0)) None else Some(m.getLong(0))
    }
  }

  /** The ONE copy of the tmp-write + delete + rename sidecar swap
    * (shared with the inverted index's `_stats`): a crash mid-write
    * can never leave a truncated LIVE sidecar — before the delete the
    * old one serves, inside the delete/rename window there is none
    * (the recoverable "legacy" case for every reader here), after the
    * rename the new one serves. Any future change to the swap window
    * (fsync posture, object-store rename semantics) lands in one
    * place. */
  private[graft] def promoteSidecar(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path, live: org.apache.hadoop.fs.Path)(
      writeBody: org.apache.hadoop.fs.FSDataOutputStream => Unit): Unit = {
    val out = fs.create(tmp, true)
    try writeBody(out) finally out.close()
    if (fs.exists(live)) fs.delete(live, false)
    require(fs.rename(tmp, live), s"cannot promote sidecar at $live")
  }

  /** Overwrite the sidecar with `maxId` via [[promoteSidecar]]. */
  def write(spark: SparkSession, path: String, maxId: Long): Unit =
    promoteSidecar(fsFor(spark, path),
      new org.apache.hadoop.fs.Path(path, FileName + ".tmp"),
      new org.apache.hadoop.fs.Path(path, FileName))(_.writeLong(maxId))

  /** Advance the sidecar to at least `batchMax` (append path). */
  def advance(spark: SparkSession, path: String, idCol: String,
              batchMax: Long): Unit =
    write(spark, path,
      math.max(read(spark, path, idCol).getOrElse(Long.MinValue), batchMax))
}
