package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.io.{Compaction, Tables}
import graft.similarity.Similarity

/** Compaction of append-grown index artifacts: same rows, same probe
  * results, fewer files, sidecars intact.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("minhash index: compaction after appends preserves probe results and collapses files") {
    val docs = Tables.documents(spark, sf001)
    val path = Files.createTempDirectory("mhcompact").toString + "/index"
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") % 4 === 0), "doc_id", "text", path)
    Dedup.appendToMinhashIndex(spark, path, docs.filter(col("doc_id") % 4 === 1), "doc_id", "text")
    Dedup.appendToMinhashIndex(spark, path, docs.filter(col("doc_id") % 4 === 2), "doc_id", "text")

    val batch = docs.filter(col("doc_id") % 4 === 3)
    def probe() = Dedup
      .incrementalLshPairs(spark, path, batch, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
      .toSeq

    val before = probe()
    val (bandBytes, bandFilesBefore) = Compaction.dataStats(spark, s"$path/bands")
    val (_, sketchFilesBefore) = Compaction.dataStats(spark, s"$path/sketches")
    assert(bandFilesBefore > 8, s"appends should have grown band files past one per partition ($bandFilesBefore)")
    assert(sketchFilesBefore >= 3)

    Compaction.compactMinhashIndex(spark, path)

    val (bandBytesAfter, bandFilesAfter) = Compaction.dataStats(spark, s"$path/bands")
    val (_, sketchFilesAfter) = Compaction.dataStats(spark, s"$path/sketches")
    assert(bandFilesAfter == 8, s"one file per band partition expected, got $bandFilesAfter")
    assert(sketchFilesAfter == 1, s"one sketch file expected (tiny corpus), got $sketchFilesAfter")
    assert(bandFilesAfter < bandFilesBefore && sketchFilesAfter < sketchFilesBefore)
    // bytes are the same order (re-encoded, not dropped)
    assert(bandBytesAfter > 0 && bandBytes > 0)

    // the config sidecar survived and the probe is value-identical
    assert(Dedup.readMinhashConfig(spark, path) == ((3, 16, 8)))
    assert(probe() == before)
    assert(before.nonEmpty)
  }

  test("ivf index: compaction preserves the partition-pruned probe and the centroid sidecar") {
    val emb = Tables.embeddings(spark, sf001)
    val half1 = emb.filter($"vec_id" % 2 === 0)
    val half2 = emb.filter($"vec_id" % 2 === 1)
    val model = Similarity.kmeansCentroids(half1, "vec_id", "embedding", k = 16)
    val path = Files.createTempDirectory("ivfcompact").toString + "/index"
    Similarity.writeIvfIndex(half1, "vec_id", "embedding", path, nCentroids = 16, centroidModel = Some(model))
    Similarity.appendToIvfIndex(spark, path, half2, "vec_id", "embedding")

    val queries = emb.filter($"vec_id" < 3)
    def probe() = Similarity
      .ivfTopKIndexed(spark, path, queries, "vec_id", "embedding", k = 5, nProbe = 2)
      .orderBy("query_id", "nbr_id")
      .collect()
      .toSeq

    val before = probe()
    val modelBefore = Similarity.readIvfCentroids(spark, path).map { case (c, v) => (c, v.toSeq) }.toSeq
    val (_, filesBefore) = Compaction.dataStats(spark, path)

    Compaction.compactIvfIndex(spark, path)

    val (_, filesAfter) = Compaction.dataStats(spark, path)
    assert(filesAfter < filesBefore, s"expected fewer files, $filesBefore -> $filesAfter")
    assert(Similarity.readIvfCentroids(spark, path).map { case (c, v) => (c, v.toSeq) }.toSeq == modelBefore)
    assert(probe() == before)
    assert(before.nonEmpty)
  }
}
