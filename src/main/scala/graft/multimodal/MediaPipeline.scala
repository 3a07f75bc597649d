package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: media
  * payloads ride as opaque `binary` columns with typed metadata, and
  * feature extraction runs batched per partition so a real codec could be
  * slotted in without touching the plan.
  *
  * The byte-level features (length, entropy, 16-bin histogram) are REAL
  * computations on the opaque payload. The codec step dispatches by
  * mime ([[MediaPipeline.decode]]): image payloads decode for real
  * through the JDK's `javax.imageio` ([[MediaPipeline.decodeImage]] —
  * PNG/JPEG/GIF/BMP) and audio through `javax.sound.sampled`
  * ([[MediaPipeline.decodeAudio]] — WAV/AIFF/AU 16-bit PCM), both with
  * no external dependency; video and anything the JDK codecs can't
  * parse fall back to [[MediaPipeline.decodeStub]], a clearly-marked
  * deterministic pseudo-embedding from a rolling hash of the bytes
  * (this environment ships no video codecs). The Spark-side contract
  * (schema, partition-parallel batching, per-row feature vector) is
  * identical on every path — an ffmpeg-backed implementation slots
  * into the same dispatch.
  */
object MediaPipeline {

  case class MediaFeatureRow(media_id: Long, mime: String, n_bytes: Long,
                             entropy: Double, byte_hist: Seq[Double],
                             frame_embedding: Seq[Float])

  /** Fixture adapter: documents as opaque media blobs. */
  def fromDocuments(s: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"))

  /** STUB decode — deterministic pseudo-embedding (dim 8) from a rolling
    * hash of the payload. Replace with a real codec + model encoder; the
    * signature (bytes, mime) → float vector is the stable contract. */
  def decodeStub(payload: Array[Byte], mime: String, dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish seed
    var i = 0
    while (i < payload.length) {
      h = h * 31 + (payload(i) & 0xff)
      // murmur-style finalizer so every byte perturbs the sampled high bits
      var m = h
      m ^= m >>> 33; m *= 0xff51afd7ed558ccdL; m ^= m >>> 33
      out(i % dim) += ((m >>> 40) & 0xffff) / 65535.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / math.max(1, payload.length / dim); j += 1 }
    out
  }

  /** Deterministic FRAME SAMPLER over an opaque payload: `nFrames`
    * evenly-spaced `frameBytes`-wide windows (the `ffmpeg -vf fps=N`
    * contract, byte-level). Pure relational — offsets are integer
    * arithmetic on the byte length and the slice is a codegen'd
    * `substring`, so sampling is embarrassingly parallel, never a
    * kernel, and DuckDB-checkable. Payloads shorter than one frame
    * yield the whole payload in every frame (both engines truncate
    * slices identically). */
  def frameSample(media: DataFrame, nFrames: Int = 4,
                  frameBytes: Int = 64): DataFrame = {
    require(nFrames > 0 && frameBytes > 0)
    // offset arithmetic in BIGINT: the frame_idx × payload-length product
    // overflows 32 bits on multi-hundred-MB payloads (real media sizes);
    // the quotient is ≤ the (int-bounded) payload length, so the final
    // narrowing cast is safe
    media.select(col("media_id"), col("mime"), col("payload"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .withColumn("off", expr(
        s"(CAST(frame_idx AS BIGINT) *" +
          s" greatest(CAST(length(payload) AS BIGINT) - $frameBytes, 0))" +
          s" div ${math.max(nFrames - 1, 1)}"))
      .select(col("media_id"), col("mime"),
        col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(payload, CAST(off AS INT) + 1, $frameBytes)")
          .as("frame"))
  }

  /** REAL image decode — `javax.imageio` (JDK built-in; no new
    * dependency): parse the payload, then average luminance over `dim`
    * vertical strips of a bounded (≤64×64) sample grid. Deterministic,
    * resolution-independent, O(1) per image regardless of size. Returns
    * None when ImageIO cannot parse the bytes (caller falls back to the
    * stub), so a corrupt blob degrades instead of failing the task. */
  /** Shared strip geometry: average luminance over `dim` vertical
    * strips of a bounded (≤64×64) sample grid. */
  private def lumStrips(img: java.awt.image.BufferedImage,
                        dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val counts = new Array[Long](dim)
    val w = img.getWidth
    val h = img.getHeight
    val sx = math.max(1, w / 64)
    val sy = math.max(1, h / 64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299L +
          ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L) / 255000.0
        out(x * dim / w) += lum.toFloat
        counts(x * dim / w) += 1
        x += sx
      }
      y += sy
    }
    var j = 0
    while (j < dim) {
      if (counts(j) > 0) out(j) /= counts(j)
      j += 1
    }
    out
  }

  def decodeImage(payload: Array[Byte], dim: Int = 8): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else Some(lumStrips(img, dim))
    } catch { case _: Exception => None }

  /** REAL multi-frame (video-style) decode — the JDK's own animated-GIF
    * reader (`ImageReader.getNumImages`/`read(i)`; no new dependency):
    * per-frame luminance strips with the [[decodeImage]] geometry, up
    * to `maxFrames` frames. GIF is the one multi-frame container
    * `javax.imageio` ships a codec for, so the video PATH — container →
    * frame iteration → per-frame features → temporal pooling — runs
    * against a real codec end-to-end; mp4/webm (no JDK codec) still
    * fall back to the documented stub. None when the bytes aren't a
    * parseable multi-frame container. */
  def decodeVideoFrames(payload: Array[Byte], dim: Int = 8,
                        maxFrames: Int = 16): Option[Seq[Array[Float]]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = math.min(r.getNumImages(true), maxFrames)
            if (n <= 0) None
            else Some((0 until n).map(i => lumStrips(r.read(i), dim)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** REAL audio decode — `javax.sound.sampled` (JDK built-in; WAV/AIFF/
    * AU PCM): parse the payload, average per-sample amplitude (|s| of
    * the 16-bit-widened mono mix) over `dim` time strips. Deterministic,
    * sample-rate independent, one linear pass over the PCM stream (same
    * cost class as the byte-feature pass). None when the bytes aren't a
    * parseable 16-bit audio container (caller falls back to the
    * stub). */
  def decodeAudio(payload: Array[Byte], dim: Int = 8): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        // getFrameSize may be AudioSystem.NOT_SPECIFIED (-1): derive from
        // sample width × channels instead of falling back to 1, which
        // would stride the 16-bit sample read past the filled region
        val bytesPerFrame =
          if (fmt.getFrameSize > 0) fmt.getFrameSize
          else math.max(1, fmt.getSampleSizeInBits / 8) *
            math.max(fmt.getChannels, 1)
        val nFrames = in.getFrameLength
        if (nFrames <= 0 || fmt.getSampleSizeInBits != 16) None
        else {
          val big = fmt.isBigEndian
          val channels = math.max(fmt.getChannels, 1)
          val out = new Array[Float](dim)
          val counts = new Array[Long](dim)
          // one pass over the stream; strip index from the frame index
          val buf = new Array[Byte](bytesPerFrame * 1024)
          var frame = 0L
          var read = in.read(buf)
          // step covers the full 2-byte sample read even if a container
          // reports a (bogus) 1-byte frame size
          val step = math.max(bytesPerFrame, 2)
          while (read > 0) {
            var off = 0
            while (off + step <= read) {
              // mono mix of channel 0 (deterministic, cheap)
              val lo = buf(off + (if (big) 1 else 0)) & 0xff
              val hi = buf(off + (if (big) 0 else 1))
              val s = ((hi << 8) | lo).toShort
              val strip = ((frame * dim) / nFrames).toInt.min(dim - 1)
              out(strip) += math.abs(s / 32768.0f)
              counts(strip) += 1
              frame += 1
              off += step
            }
            read = in.read(buf)
          }
          var j = 0
          while (j < dim) {
            if (counts(j) > 0) out(j) /= counts(j)
            j += 1
          }
          if (frame == 0) None else Some(out)
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Codec dispatch — the slot the stub documented: image payloads go
    * through the real [[decodeImage]], audio through the real
    * [[decodeAudio]], video through [[decodeVideoFrames]] (temporal
    * mean of per-frame strips — real for animated GIF, the one
    * multi-frame container the JDK decodes) when parseable; everything
    * else (mp4/webm — no JDK codec — and unparseable payloads) through
    * [[decodeStub]]. The fixture's text/plain payloads keep the stub's
    * deterministic gates intact. */
  def decode(payload: Array[Byte], mime: String, dim: Int = 8): Array[Float] =
    if (mime.startsWith("image/"))
      decodeImage(payload, dim).getOrElse(decodeStub(payload, mime, dim))
    else if (mime.startsWith("audio/"))
      decodeAudio(payload, dim).getOrElse(decodeStub(payload, mime, dim))
    else if (mime.startsWith("video/"))
      decodeVideoFrames(payload, dim).map { fs =>
        val out = new Array[Float](dim)
        fs.foreach { f =>
          var j = 0
          while (j < dim) { out(j) += f(j) / fs.length; j += 1 }
        }
        out
      }.getOrElse(decodeStub(payload, mime, dim))
    else decodeStub(payload, mime, dim)

  /** Real frame extraction as a DataFrame stage: one (media_id,
    * frame_idx, embedding) row per decoded frame of a multi-frame
    * payload — the batch face of the video path (pooling composes via
    * [[graft.operators.MeanPool.clip4clip]]). Payloads the codec cannot
    * parse emit frame_idx = -1 with the stub embedding, so corrupt
    * blobs degrade visibly instead of vanishing. */
  def videoFrameEmbeddings(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, mime, payload) =>
        decodeVideoFrames(payload, dim) match {
          case Some(frames) =>
            frames.iterator.zipWithIndex.map { case (f, i) =>
              (id, i, f.toSeq)
            }
          case None =>
            Iterator.single((id, -1, decodeStub(payload, mime, dim).toSeq))
        }
      }.toDF("media_id", "frame_idx", "embedding")
  }

  /** Deterministic synthetic PNG (REAL `javax.imageio` encoder) — a
    * tiny grayscale pattern that is a pure function of `seed`. Lets the
    * query surface exercise the genuine encode→container→decode round
    * trip without fixture image files. */
  def syntheticPng(seed: Long, w: Int = 16, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (((seed * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic animated GIF (REAL JDK gif encoder via
    * `writeToSequence`): `frames` uniform-gray frames whose brightness
    * rises 40, 100, 160, … (plus a small seed offset) — the genuine
    * multi-frame encode→container→decode round trip without fixture
    * video files (the [[syntheticPng]] recipe, one dimension up). */
  def syntheticGif(seed: Long, frames: Int = 3, w: Int = 16,
                   h: Int = 8): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until frames).foreach { fi =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = (40 + fi * 60 + (((seed % 20) + 20) % 20)).toInt.min(255)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** STUB resize — deterministic stride resample of the byte stream to
    * `targetBytes` (stands in for the image-resize codec step; the
    * stable contract is (bytes, target) → bytes, batched per partition
    * like [[decodeStub]]). */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    require(targetBytes > 0)
    if (payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < targetBytes) {
        out(i) = payload((i.toLong * payload.length / targetBytes).toInt)
        i += 1
      }
      out
    }
  }

  /** Per-frame decode: [[frameSample]] output → (media_id, frame_idx,
    * embedding), batched per partition. Real codecs parse the UNRESIZED
    * frame: the byte-stride resample destroys container structure, so
    * resizing before decode made the real-codec path unreachable for any
    * payload above `resizeTo` (it silently fell through to the stub).
    * The real decoders already bound their per-frame work via sampling
    * grids, so no pre-resize is needed there; only the stub path keeps
    * the byte-stride resize as its stand-in codec step. */
  def decodeFrames(frames: DataFrame, dim: Int = 8,
                   resizeTo: Int = 32): DataFrame = {
    val s = frames.sparkSession
    import s.implicits._
    frames.select(col("media_id"), col("frame_idx"), col("mime"),
        col("frame"))
      .as[(Long, Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, idx, mime, frame) =>
        val emb =
          (if (mime.startsWith("image/")) decodeImage(frame, dim)
           else if (mime.startsWith("audio/")) decodeAudio(frame, dim)
           else None)
            .getOrElse(decodeStub(resizeStub(frame, resizeTo), mime, dim))
        (id, idx, emb.toSeq)
      }).toDF("media_id", "frame_idx", "embedding")
  }

  /** Batched feature extraction over (media_id, mime, payload).
    *
    * Feature values are emitted at FULL precision; any output rounding is
    * the query's job (the oracle-compare convention is round(round(x,9),6)
    * at the boundary). Histogram bins are integer byte counts divided
    * once by n — a single exact division, bit-reproducible in any engine —
    * rather than a float accumulation. */
  def features(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mime, payload) =>
          val counts = new Array[Long](256)
          payload.foreach(b => counts(b & 0xff) += 1)
          val n = math.max(1L, payload.length.toLong)
          var entropy = 0.0
          var i = 0
          while (i < 256) {
            if (counts(i) > 0) {
              val p = counts(i).toDouble / n
              entropy -= p * math.log(p) / math.log(2)
            }
            i += 1
          }
          val binCounts = new Array[Long](16)
          i = 0
          while (i < 256) { binCounts(i / 16) += counts(i); i += 1 }
          MediaFeatureRow(id, mime, payload.length.toLong, entropy,
            binCounts.map(_.toDouble / n).toSeq,
            decode(payload, mime).toSeq)
        }
      }.toDF()
  }
}
