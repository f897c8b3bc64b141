package graft.multimodal

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
  * The actual media codecs are NOT in this container, so the byte-level
  * decode is a clearly-marked deterministic STUB — everything around it
  * (schema, batch shape, partition locality, null handling) is real and
  * is what carries over to a cluster with real codecs: a scan-local
  * transform with no shuffle, where batch size bounds peak memory per
  * task (batch × decoded-frame size), which is the knob that matters at
  * 100 TB.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)
  ))

  /** Test-harness packer: synthesizes a media table from `documents`
    * (text bytes as the opaque payload, metadata derived
    * deterministically) so the pipeline is exercised end-to-end without
    * real media files.
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("media"),
      struct(
        element_at(array(lit("jpeg"), lit("png"), lit("wav")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col("doc_id"), lit(64)) * 16 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 64).cast("int").as("height")
      ).as("meta")
    )

  /** ======== STUB ========
    * Deterministic fake decoder: a real implementation would decode the
    * codec named by `format` into pixels/samples. Here: a 16-bin byte
    * histogram normalized to [0,1] — stable, cheap, shaped like an
    * embedding so downstream ops (ANN, dedup) compose.
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
    * partition iterator in `batchSize` chunks, runs the (stub) decode
    * over each whole batch, and emits rows + `features array<float>`.
    * Null media → null features.
    */
  def extractFeatures(df: DataFrame, mediaCol: String, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("features", ArrayType(FloatType), nullable = true))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch-shaped kernel boundary: a real decoder amortizes codec
        // setup across the batch exactly here
        batch.map { r =>
          val out: Any =
            if (r.isNullAt(mediaIdx)) null
            else decodeStub(r.getAs[Array[Byte]](mediaIdx))
          Row.fromSeq(r.toSeq :+ out)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** ======== STUB ======== resize: a real kernel rescales pixels; the
    * stub rewrites the metadata and truncates the payload
    * proportionally, preserving the (bytes, meta) → (bytes, meta)
    * contract and batch shape.
    */
  def resize(df: DataFrame, targetW: Int, targetH: Int): DataFrame =
    df.withColumn(
        "media",
        expr(s"substring(media, 1, greatest(cast(octet_length(media) * $targetW * $targetH / greatest(meta.width * meta.height, 1) as int), 1))")
      )
      .withColumn("meta", struct(col("meta.format"), lit(targetW).as("width"), lit(targetH).as("height")))

  /** ======== STUB ======== frame sampling: emits `n` (frame_idx, frame)
    * rows per media row — the explode shape of video→frames. Frames are
    * byte slices here; a real kernel would seek keyframes.
    */
  def sampleFrames(df: DataFrame, n: Int): DataFrame =
    df.select(
      col("media_id"),
      posexplode(
        expr(s"transform(sequence(0, ${n - 1}), i -> substring(media, 1 + i * greatest(octet_length(media) div $n, 1), greatest(octet_length(media) div $n, 1)))")
      ).as(Seq("frame_idx", "frame"))
    )
}
