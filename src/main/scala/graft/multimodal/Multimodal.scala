package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run
  * as *batched* partition-local transforms (the Scala analog of
  * `mapInPandas`: rows are drained in fixed-size batches, the kernel
  * sees a whole batch, results stream back out).
  *
  * Image decode/resize are REAL — `javax.imageio` ships with the JDK, so
  * jpeg/png need no external codecs. Audio decode is REAL too —
  * `javax.sound.sampled` handles WAV PCM without external codecs. VIDEO
  * decode is REAL for MJPEG-in-AVI — [[Avi]] parses the RIFF container
  * and each frame is an ordinary JPEG, so frame sampling and per-video
  * features run genuine decode with zero external codecs. Other video
  * codecs (h264 etc.) fall back to clearly-marked deterministic STUBS;
  * the plumbing around them (schema, batch shape, partition locality,
  * null handling) is identical to the real paths and is what carries
  * over to a cluster with real codecs: a scan-local transform with no
  * shuffle, where batch size bounds peak memory per task (batch ×
  * decoded-frame size), which is the knob that matters at 100 TB.
  */
object Multimodal {

  // ImageIO defaults to a disk-backed stream cache: every per-row
  // decode/encode would create and delete a temp FILE. The kernels only
  // ever touch in-memory byte arrays, so cache in memory instead —
  // set once per JVM (executor), cheap and idempotent.
  javax.imageio.ImageIO.setUseCache(false)

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)
  ))

  val ImageFormats: Set[String] = Set("jpeg", "png")
  val AudioFormats: Set[String] = Set("wav")
  val VideoFormats: Set[String] = Set("avi")

  private val packedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", metaType)
  ))

  /** Deterministic RGB for the synthetic test images: every (id, x, y)
    * maps to a fixed color, so packed payloads are bit-stable across
    * runs and partitionings.
    */
  private def synthRgb(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
    val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
    val b = ((id * 5 + x * 19 + y * 23) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Encode a deterministic `w`×`h` image as `format` bytes. */
  def synthImageBytes(id: Long, w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, synthRgb(id, x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** Deterministic 16-bit PCM sample for the synthetic test audio:
    * every (id, i) maps to a fixed sample in [-32768, 32767], so packed
    * payloads are bit-stable across runs and partitionings.
    */
  private def synthSample(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 7919) % 65536) - 32768).toInt

  /** Encode `n` deterministic samples as a real WAV container
    * (16-bit signed mono PCM, 8 kHz, little-endian) via the JDK's
    * `javax.sound.sampled` — no external codec needed.
    */
  def synthWavBytes(id: Long, n: Int): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = synthSample(id, i)
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real audio decode: WAV bytes → 16-bit PCM samples (one Int per
    * frame-channel, either endianness), or None when the payload is not
    * decodable PCM. One `AudioSystem.getAudioInputStream` per media
    * row, batched by the caller.
    */
  def decodePcmSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED || fmt.getSampleSizeInBits != 16) None
      else {
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) =
            if (fmt.isBigEndian) (raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)
            else (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)
          i += 1
        }
        Some(samples)
      }
    } catch { case _: Exception => None }
  }

  /** Features from REAL samples: 16-bin amplitude histogram normalized
    * to [0,1] — same shape as [[imageFeatures]] so downstream ops (ANN,
    * dedup) compose regardless of modality.
    */
  def audioFeatures(samples: Array[Int]): Array[Float] = {
    val hist = new Array[Float](16)
    if (samples.nonEmpty) {
      var i = 0
      while (i < samples.length) {
        hist((samples(i) + 32768) >>> 12) += 1f
        i += 1
      }
      var b = 0
      while (b < 16) { hist(b) /= samples.length.toFloat; b += 1 }
    }
    hist
  }

  /** Real decode: bytes → (width, height, row-major ARGB pixels), or
    * None when the payload is not a decodable image. One
    * `ImageIO.read` per media row, batched by the caller.
    */
  def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        Some((w, h, img.getRGB(0, 0, w, h, null, 0, w)))
      }
    } catch { case _: Exception => None }
  }

  /** Features from REAL pixels: 16-bin luminance histogram normalized to
    * [0,1] — same shape as the audio stub so downstream ops (ANN, dedup)
    * compose regardless of modality.
    */
  def imageFeatures(pixels: Array[Int]): Array[Float] = {
    val hist = new Array[Float](16)
    if (pixels.nonEmpty) {
      var i = 0
      while (i < pixels.length) {
        val p = pixels(i)
        val lum = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        hist(lum >>> 4) += 1f
        i += 1
      }
      var b = 0
      while (b < 16) { hist(b) /= pixels.length.toFloat; b += 1 }
    }
    hist
  }

  /** Test-harness packer: synthesizes a media table from `documents`.
    * jpeg/png rows carry REAL encoded images (small, deterministic
    * pixels derived from doc_id) and wav rows REAL WAV PCM containers
    * (deterministic samples derived from doc_id) — so both decode paths
    * downstream exercise the genuine JDK codecs. For audio the metadata
    * reuses (width = sample count, height = 1). Batched partition-local
    * kernel, same shape as [[extractFeatures]].
    */
  def packDocuments(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val src = docs.select(col("doc_id").cast("long"), col("text"))
    src.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val format = (id % 3) match {
            case 0 => "jpeg"
            case 1 => "png"
            case _ => "wav"
          }
          if (ImageFormats(format)) {
            val w = (id % 16 + 4).toInt
            val h = (id % 12 + 4).toInt
            Row(id, synthImageBytes(id, w, h, format), Row(format, w, h))
          } else {
            val n = (id % 96 + 32).toInt
            Row(id, synthWavBytes(id, n), Row(format, n, 1))
          }
        }
      }
    }(Encoders.row(packedSchema))
  }

  /** Deterministic MJPEG frame `f` of video `id`: an ordinary synthetic
    * JPEG whose pixel seed mixes the video id and the frame index, so
    * consecutive frames of one video differ but every byte is a pure
    * function of (id, f).
    */
  def synthFrameBytes(id: Long, f: Int, w: Int, h: Int): Array[Byte] =
    synthImageBytes(id * 131 + f * 7 + 1, w, h, "jpeg")

  /** Encode a deterministic `nFrames`-frame MJPEG AVI for video `id` —
    * a REAL container ([[Avi.encode]]) of REAL JPEG frames, so the
    * video decode path downstream exercises genuine RIFF parsing plus
    * the genuine JDK JPEG codec.
    */
  def synthAviBytes(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] =
    Avi.encode((0 until nFrames).map(f => synthFrameBytes(id, f, w, h)), w, h)

  /** Test-harness packer for the VIDEO modality: every document becomes
    * a small MJPEG AVI (2–7 frames, dimensions derived from doc_id).
    * Same batched partition-local shape as [[packDocuments]].
    */
  def packVideos(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val src = docs.select(col("doc_id").cast("long"))
    src.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val nFrames = (id % 6 + 2).toInt
          Row(id, synthAviBytes(id, w, h, nFrames), Row("avi", w, h))
        }
      }
    }(Encoders.row(packedSchema))
  }

  /** Test-harness packer for the MIXED-codec video regime: by doc_id
    * rule, `%7 == 0` becomes a non-RIFF payload (an "exotic codec" the
    * container has no decoder for — deterministic bytes under a fake
    * magic), `%7 == 3` a TRUNCATED AVI (container header present, body
    * gone), everything else the valid MJPEG AVI [[packVideos]] emits.
    * The quarantine outcome of [[videoStats]] over this table is
    * therefore a PURE FUNCTION of doc_id — which is what lets a
    * relational oracle recompute the quarantine counts without any
    * decoder (the m3 carrier query).
    */
  def packVideosMixed(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val src = docs.select(col("doc_id").cast("long"))
    src.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val nFrames = (id % 6 + 2).toInt
          val payload: Array[Byte] = (id % 7) match {
            case 0 =>
              // fake h264-ish elementary stream: NAL-like start code,
              // then deterministic junk — nothing RIFF about it
              val junk = new Array[Byte](64)
              var i = 0
              var s = id * 0x9e3779b97f4a7c15L + 1
              while (i < junk.length) {
                s = s * 6364136223846793005L + 1442695040888963407L
                junk(i) = (s >>> 56).toByte
                i += 1
              }
              Array[Byte](0, 0, 0, 1, 0x67) ++ junk
            case 3 =>
              synthAviBytes(id, w, h, nFrames).take(40) // header, no movi
            case _ => synthAviBytes(id, w, h, nFrames)
          }
          Row(id, payload, Row(if (id % 7 == 0) "h264" else "avi", w, h))
        }
      }
    }(Encoders.row(packedSchema))
  }

  /** Uniformly-spaced sample of `k` indices from `0 until total`
    * (classic stride sampling: index `i*total/k`); all frames when
    * `k >= total`.
    */
  private def sampleIndices(total: Int, k: Int): Array[Int] = {
    val n = math.min(math.max(k, 1), total)
    Array.tabulate(n)(i => i * total / n)
  }

  /** REAL video decode: AVI bytes → (total frame count, mean luminance
    * histogram over up to `maxFrames` uniformly-sampled frames). The
    * mean is a sequential fold in sampled order — deterministic
    * regardless of partitioning, so it can sit on a fixture-oracle
    * compare surface. None when the payload is not a parseable AVI or
    * no sampled frame decodes.
    */
  def videoFrameFeatures(bytes: Array[Byte], maxFrames: Int = 8): Option[(Int, Array[Float])] =
    Avi.decodeFrames(bytes).flatMap { frames =>
      val sampled = sampleIndices(frames.length, maxFrames)
      val sum = new Array[Float](16)
      var decoded = 0
      sampled.foreach { idx =>
        decodePixels(frames(idx)).foreach { case (_, _, px) =>
          val f = imageFeatures(px)
          var b = 0
          while (b < 16) { sum(b) += f(b); b += 1 }
          decoded += 1
        }
      }
      if (decoded == 0) None
      else {
        var b = 0
        while (b < 16) { sum(b) /= decoded.toFloat; b += 1 }
        Some((frames.length, sum))
      }
    }

  /** Per-video decode summary: (media_id, n_frames, features) with
    * REAL container parse + JPEG frame decode ([[videoFrameFeatures]]).
    * Scan-local batched kernel — no shuffle; undecodable payloads →
    * null n_frames/features (quarantine contract).
    */
  def videoStats(df: DataFrame, mediaCol: String, maxFrames: Int = 8, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("features", ArrayType(FloatType), nullable = true)
    ))
    val idIdx = df.schema.fieldIndex("media_id")
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(idIdx)
          val stats =
            if (r.isNullAt(mediaIdx)) None
            else videoFrameFeatures(r.getAs[Array[Byte]](mediaIdx), maxFrames)
          stats match {
            case Some((n, feats)) => Row(id, n, feats)
            case None             => Row(id, null, null)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** ======== STUB (non-AVI video / unknown formats only) ========
    * Deterministic fake decoder for formats whose codecs aren't in this
    * container (h264 video, etc. — AVI/MJPEG decodes for REAL via
    * [[videoFrameFeatures]]): a 16-bin byte histogram normalized to
    * [0,1] — stable, cheap, shaped like [[imageFeatures]]/
    * [[audioFeatures]] so all paths are interchangeable downstream.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) >>> 4) += 1f
        i += 1
      }
      var b = 0
      while (b < 16) { hist(b) /= bytes.length.toFloat; b += 1 }
    }
    hist
  }

  /** Batched feature extraction over the binary column: drains the
    * partition iterator in `batchSize` chunks and runs the
    * format-dispatched decode over each whole batch — REAL
    * `javax.imageio` decode for jpeg/png (features from actual pixels),
    * REAL `javax.sound.sampled` decode for wav (features from actual
    * PCM samples), REAL RIFF-parse + per-frame JPEG decode for
    * MJPEG-AVI video (mean features over sampled frames), stub
    * histogram for everything else. Null or undecodable media → null
    * features (a real pipeline quarantines those rows downstream).
    */
  def extractFeatures(df: DataFrame, mediaCol: String, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("features", ArrayType(FloatType), nullable = true))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    // format dispatch needs the metadata struct; a frame without one
    // (opaque bytes only) degrades to the stub histogram for every row
    val metaIdx = df.schema.fieldNames.indexOf("meta")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch-shaped kernel boundary: codec setup (and any native
        // buffers) amortize across the batch exactly here
        batch.map { r =>
          val format =
            if (metaIdx < 0 || r.isNullAt(metaIdx)) null else r.getStruct(metaIdx).getString(0)
          val out: Any =
            if (r.isNullAt(mediaIdx)) null
            else if (format != null && ImageFormats(format))
              decodePixels(r.getAs[Array[Byte]](mediaIdx)).map(p => imageFeatures(p._3)).orNull
            else if (format != null && AudioFormats(format))
              decodePcmSamples(r.getAs[Array[Byte]](mediaIdx)).map(audioFeatures).orNull
            else {
              // video & unknown: content sniff so the real AVI path
              // triggers with or without a metadata struct
              val bytes = r.getAs[Array[Byte]](mediaIdx)
              if (Avi.isAvi(bytes)) videoFrameFeatures(bytes).map(_._2).orNull
              else decodeStub(bytes)
            }
          Row.fromSeq(r.toSeq :+ out)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Resize: REAL for jpeg/png — decode, nearest-neighbor rescale of the
    * actual pixels, re-encode in the same format (deterministic, unlike
    * Graphics2D's platform-dependent interpolators). Other formats (or
    * undecodable payloads) fall back to the proportional byte-truncate
    * stub so the (bytes, meta) → (bytes, meta) contract holds for every
    * row. Batched like the other kernels.
    */
  def resize(df: DataFrame, targetW: Int, targetH: Int, batchSize: Int = 64): DataFrame = {
    val schema = df.schema
    val mediaIdx = schema.fieldIndex("media")
    val metaIdx = schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val meta = if (r.isNullAt(metaIdx)) null else r.getStruct(metaIdx)
          val format = if (meta == null) null else meta.getString(0)
          val bytes = if (r.isNullAt(mediaIdx)) null else r.getAs[Array[Byte]](mediaIdx)
          val decoded =
            if (format != null && ImageFormats(format)) decodePixels(bytes) else None
          val newBytes: Array[Byte] = decoded match {
            case Some((w, h, px)) =>
              val img = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < targetH) {
                var x = 0
                while (x < targetW) {
                  img.setRGB(x, y, px(math.min(y * h / targetH, h - 1) * w + math.min(x * w / targetW, w - 1)) & 0xffffff)
                  x += 1
                }
                y += 1
              }
              val out = new ByteArrayOutputStream()
              ImageIO.write(img, format, out)
              out.toByteArray
            case None =>
              // ======== STUB (non-image) ======== proportional truncate
              if (bytes == null || meta == null) bytes
              else {
                val srcArea = math.max(meta.getInt(1) * meta.getInt(2), 1)
                val n = math.max((bytes.length.toLong * targetW * targetH / srcArea).toInt, 1)
                bytes.take(math.min(n, bytes.length))
              }
          }
          val vals = r.toSeq.toArray
          vals(mediaIdx) = newBytes
          vals(metaIdx) = Row(format, targetW, targetH)
          Row.fromSeq(vals.toSeq)
        }
      }
    }(Encoders.row(schema))
  }

  /** Frame sampling: emits (frame_idx, frame) rows per media row — the
    * explode shape of video→frames. REAL for AVI payloads: the RIFF
    * container is parsed and up to `n` uniformly-spaced ACTUAL frames
    * (JPEG bytes, decodable downstream by the image kernels) are
    * emitted with their true container frame index. Non-AVI payloads
    * keep the declared stub (n equal byte slices) so the contract holds
    * for every row. Batched scan-local kernel — no shuffle; the explode
    * happens inside the partition.
    */
  def sampleFrames(df: DataFrame, n: Int, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType, nullable = true)
    ))
    val idIdx = df.schema.fieldIndex("media_id")
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(idIdx)
          val bytes = if (r.isNullAt(mediaIdx)) null else r.getAs[Array[Byte]](mediaIdx)
          Avi.decodeFrames(bytes) match {
            case Some(frames) =>
              sampleIndices(frames.length, n).iterator.map(idx => Row(id, idx, frames(idx)))
            case None =>
              // ======== STUB (non-AVI) ======== n equal byte slices
              val len = if (bytes == null) 0 else bytes.length
              val step = math.max(len / n, 1)
              (0 until n).iterator.map { i =>
                if (bytes == null) Row(id, i, null)
                else {
                  val from = math.min(i * step, len)
                  val until = math.min(from + step, len)
                  Row(id, i, java.util.Arrays.copyOfRange(bytes, from, until))
                }
              }
          }
        }
      }
    }(Encoders.row(outSchema))
  }
}
