package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

/** Dev tool: regenerate the m2 VIDEO decode-expectation fixture
  * (`fixtures/m2_expected.parquet`, path shared with the oracle via
  * [[QueryParams.M2FixturePath]]). Same technique as [[GenM1Fixture]]:
  * the packed AVIs are pure functions of doc_id, so the REAL decode
  * outputs — container frame counts + mean luminance histograms over
  * actually-decoded JPEG frames — are a fixed table keyed by doc_id,
  * generated once at the largest scale (sf0.1 doc_ids are a superset
  * of the smaller scales) and committed.
  *
  * Regenerate (only if the synthesis, the AVI codec, the feature
  * kernels, or the JDK JPEG codec change):
  * `sbt "runMain graft.GenM2Fixture /root/testdata/sf0.1"`.
  */
object GenM2Fixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outFile = Paths.get(args.lift(1).getOrElse(QueryParams.M2FixturePath))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    val media = graft.multimodal.Multimodal.packVideos(graft.io.Tables.documents(spark, sfDir))
    val tmp = Files.createTempDirectory("m2fixture").toString + "/out"
    graft.multimodal.Multimodal
      .videoStats(media, "media", maxFrames = 8)
      .select(
        $"media_id".as("doc_id"),
        $"n_frames",
        element_at($"features", 1).as("f0"),
        $"features"
      )
      .orderBy("doc_id")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(tmp)
    val part = Files
      .list(Paths.get(tmp))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst()
      .orElseThrow()
    Files.createDirectories(outFile.getParent)
    Files.move(part, outFile, StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $outFile")
    spark.stop()
  }
}
