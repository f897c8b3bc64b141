package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.packDocuments(Tables.documents(spark, sf0001))

  test("packed media schema: opaque binary + typed metadata") {
    val s = media.schema
    assert(s("media").dataType.typeName == "binary")
    val metaFields = s("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType].fields
    assert(metaFields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.metaType.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("batched feature extraction: 16-dim normalized histogram per row") {
    val out = Multimodal.extractFeatures(media, "media", batchSize = 7)
    val feats = out.select($"features").as[Seq[Float]].collect()
    assert(feats.forall(_.length == 16))
    // histogram sums to ~1 for non-empty payloads
    assert(feats.forall(f => math.abs(f.sum - 1f) < 1e-3))
    assert(out.count() == media.count())
  }

  test("decode stub is deterministic and null-safe") {
    val a = Multimodal.decodeStub("hello world".getBytes)
    val b = Multimodal.decodeStub("hello world".getBytes)
    assert(a.toSeq == b.toSeq)
    assert(Multimodal.decodeStub(Array.emptyByteArray).forall(_ == 0f))
  }

  test("real decode: 4x4 PNG fixture roundtrips to known pixels") {
    val bytes = Multimodal.synthImageBytes(42L, 4, 4, "png")
    val Some((w, h, px)) = Multimodal.decodePixels(bytes)
    assert(w == 4 && h == 4 && px.length == 16)
    // PNG is lossless: decoded pixels must be EXACTLY the synthetic RGB
    for (y <- 0 until 4; x <- 0 until 4) {
      val r = ((42L * 31 + x * 7 + y * 13) % 256).toInt
      val g = ((42L * 17 + x * 11 + y * 3) % 256).toInt
      val b = ((42L * 5 + x * 19 + y * 23) % 256).toInt
      assert((px(y * 4 + x) & 0xffffff) == ((r << 16) | (g << 8) | b), s"pixel ($x,$y)")
    }
    // features come from the real pixels: hand-compute the luminance histogram
    val expected = new Array[Float](16)
    px.foreach { p =>
      val lum = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
      expected(lum >>> 4) += 1f / 16f
    }
    assert(Multimodal.imageFeatures(px).toSeq == expected.toSeq)
  }

  test("real audio decode: WAV PCM fixture roundtrips to known samples") {
    val n = 64
    val bytes = Multimodal.synthWavBytes(7L, n)
    // a real RIFF/WAVE container came out of the JDK encoder
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    val Some(samples) = Multimodal.decodePcmSamples(bytes)
    assert(samples.length == n)
    // WAV PCM is lossless: decoded samples must be EXACTLY the synth values
    for (i <- 0 until n)
      assert(samples(i) == (((7L * 31 + i.toLong * 7919) % 65536) - 32768).toInt, s"sample $i")
    // features come from the real samples: hand-compute the amplitude histogram
    val expected = new Array[Float](16)
    samples.foreach(s => expected((s + 32768) >>> 12) += 1f / n)
    assert(Multimodal.audioFeatures(samples).toSeq == expected.toSeq)
    // non-audio payloads refuse to decode
    assert(Multimodal.decodePcmSamples("not audio".getBytes).isEmpty)
  }

  test("packed wav payloads are real WAV whose decoded sample count matches the metadata") {
    val rows = media
      .filter($"meta.format" === "wav")
      .select($"media", $"meta.width")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Some(samples) = Multimodal.decodePcmSamples(r.getAs[Array[Byte]](0))
      assert(samples.length == r.getInt(1))
    }
  }

  test("packed jpeg/png payloads are real images whose decoded dims match the metadata") {
    val rows = media
      .filter($"meta.format".isin("jpeg", "png"))
      .select($"media", $"meta.width", $"meta.height")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Some((w, h, _)) = Multimodal.decodePixels(r.getAs[Array[Byte]](0))
      assert(w == r.getInt(1) && h == r.getInt(2))
    }
    // undecodable / non-image payloads yield null features, images real ones
    assert(Multimodal.decodePixels("not an image".getBytes).isEmpty)
  }

  test("resize rewrites metadata; images are truly rescaled, stubs never grow") {
    val out = Multimodal.resize(media, 8, 8)
    val r = out.select($"meta.width", $"meta.height").distinct().as[(Int, Int)].collect()
    assert(r.toSeq == Seq((8, 8)))
    // image rows: the output payload is a REAL 8x8 image in the same format
    val img = out.filter($"meta.format".isin("jpeg", "png")).select($"media").head()
    val Some((w, h, _)) = Multimodal.decodePixels(img.getAs[Array[Byte]](0))
    assert(w == 8 && h == 8)
    // stub (non-image) rows: proportional truncate never grows the payload
    val grown = out
      .filter($"meta.format" === "wav")
      .join(media.select($"media_id", octet_length($"media").as("orig_len")), "media_id")
      .filter(octet_length($"media") > $"orig_len")
      .count()
    assert(grown == 0)
  }

  test("frame sampling explodes n frames per media row (non-AVI stub path)") {
    val out = Multimodal.sampleFrames(media, 4)
    assert(out.count() == media.count() * 4)
    assert(out.groupBy("media_id").count().filter($"count" =!= 4).count() == 0)
  }

  // ---------------------------------------------------------------- video

  lazy val videos = Multimodal.packVideos(Tables.documents(spark, sf0001))

  test("AVI container roundtrips: encoded frames come back byte-identical, in order") {
    val frames = (0 until 3).map(f => Multimodal.synthFrameBytes(7L, f, 6, 5))
    val avi = graft.multimodal.Avi.encode(frames, 6, 5)
    assert(graft.multimodal.Avi.isAvi(avi))
    val Some(decoded) = graft.multimodal.Avi.decodeFrames(avi)
    assert(decoded.length == 3)
    decoded.zip(frames).foreach { case (d, f) => assert(d.sameElements(f)) }
    // each recovered frame is a genuinely decodable JPEG of the right size
    val Some((w, h, _)) = Multimodal.decodePixels(decoded(1))
    assert(w == 6 && h == 5)
  }

  test("AVI decode is defensive: truncation and corrupt sizes quarantine to None") {
    val avi = Multimodal.synthAviBytes(3L, 6, 5, 4)
    assert(graft.multimodal.Avi.decodeFrames(avi.take(40)).isEmpty)
    assert(graft.multimodal.Avi.decodeFrames(null).isEmpty)
    assert(graft.multimodal.Avi.decodeFrames("not an avi".getBytes).isEmpty)
    val corrupt = avi.clone()
    // blow up an interior chunk size field; parser must stop, not throw
    corrupt(avi.length / 2) = 0xff.toByte
    graft.multimodal.Avi.decodeFrames(corrupt) // must not throw
  }

  test("sampleFrames on AVI emits REAL frames with true container indices") {
    val out = Multimodal.sampleFrames(videos, 8)
    // per-video frame count = min(8, 2 + id%6) = 2 + id%6 (all ≤ 7)
    val counts = out.groupBy("media_id").count()
    val bad = counts
      .filter($"count" =!= (lit(2) + pmod($"media_id", lit(6))))
      .count()
    assert(bad == 0)
    // a sampled frame is byte-identical to the synthesized source frame
    val r = out.filter($"media_id" === 6L && $"frame_idx" === 1).head()
    val expected = Multimodal.synthFrameBytes(6L, 1, (6 % 16 + 4), (6 % 12 + 4))
    assert(r.getAs[Array[Byte]]("frame").sameElements(expected))
  }

  test("sampleFrames caps at n with uniform stride when the video is longer") {
    val id = 5L // 5 % 6 + 2 = 7 frames
    val one = videos.filter($"media_id" === id)
    val out = Multimodal.sampleFrames(one, 3).orderBy("frame_idx")
    val idxs = out.select($"frame_idx").as[Int].collect().toSeq
    assert(idxs == Seq(0, 2, 4)) // i * 7 / 3
  }

  test("videoStats: real per-frame decode, deterministic sequential mean") {
    val stats = Multimodal.videoStats(videos, "media", maxFrames = 8)
    assert(stats.filter($"n_frames".isNull || $"features".isNull).count() == 0)
    val r = stats.filter($"media_id" === 4L).head()
    assert(r.getInt(1) == (4 % 6 + 2))
    // expected: sequential mean of imageFeatures over the real frames
    val w = (4 % 16 + 4); val h = (4 % 12 + 4)
    val sum = new Array[Float](16)
    (0 until 6).foreach { f =>
      val Some((_, _, px)) = Multimodal.decodePixels(Multimodal.synthFrameBytes(4L, f, w, h))
      val feats = Multimodal.imageFeatures(px)
      (0 until 16).foreach(b => sum(b) += feats(b))
    }
    val expected = sum.map(_ / 6f)
    assert(r.getSeq[Float](2).toArray.sameElements(expected))
  }

  test("packVideosMixed: quarantine outcome is exactly the doc_id rule") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val stats = Multimodal
      .videoStats(Multimodal.packVideosMixed(docs), "media", maxFrames = 8)
      .select($"media_id", $"n_frames")
      .as[(Long, Option[Int])]
      .collect()
    assert(stats.length == 50)
    stats.foreach { case (id, nf) =>
      if (id % 7 == 0 || id % 7 == 3)
        assert(nf.isEmpty, s"doc $id should quarantine (${id % 7})")
      else
        assert(nf.contains((id % 6 + 2).toInt), s"doc $id decoded $nf, expected ${id % 6 + 2}")
    }
  }

  test("extractFeatures dispatches AVI to the real video path (sniff, no meta needed)") {
    val noMeta = videos.select($"media_id", $"media")
    val out = Multimodal.extractFeatures(noMeta, "media")
    assert(out.filter($"features".isNull).count() == 0)
    val got = out.filter($"media_id" === 4L).select($"features").as[Seq[Float]].head()
    val expected = Multimodal
      .videoFrameFeatures(Multimodal.synthAviBytes(4L, (4 % 16 + 4), (4 % 12 + 4), 6))
      .get._2
    assert(got.toArray.sameElements(expected))
    // histogram mean still sums to ~1
    assert(math.abs(got.sum - 1f) < 1e-3)
  }
}
