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

  test("resize rewrites metadata and shrinks payload") {
    val out = Multimodal.resize(media, 64, 64)
    val r = out.select($"meta.width", $"meta.height").distinct().as[(Int, Int)].collect()
    assert(r.toSeq == Seq((64, 64)))
    val shrunk = out
      .join(media.select($"media_id", octet_length($"media").as("orig_len")), "media_id")
      .filter(octet_length($"media") > $"orig_len")
      .count()
    assert(shrunk == 0)
  }

  test("frame sampling explodes n frames per media row") {
    val out = Multimodal.sampleFrames(media, 4)
    assert(out.count() == media.count() * 4)
    assert(out.groupBy("media_id").count().filter($"count" =!= 4).count() == 0)
  }
}
