package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

/** Dev tool: regenerate the m1 decode-expectation fixture
  * (`fixtures/m1_expected.parquet`, path shared with the oracle via
  * [[QueryParams.M1FixturePath]]).
  *
  * The packed media are pure functions of doc_id (Multimodal
  * packDocuments synthesizes deterministic jpeg/png/wav payloads), so
  * the REAL decode outputs — feature histograms from actual pixels/PCM
  * samples — are a fixed table keyed by doc_id. Generated once at the
  * largest scale (sf0.1 doc_ids are a superset of the smaller scales)
  * and committed, the fixture gives the driver's DuckDB compare a
  * deterministic hashable surface for the media pipeline: the m1 query
  * joins its live decode against the fixture and counts matches, and
  * the oracle recomputes the whole aggregate from the fixture alone.
  *
  * Regenerate (only needed if the synthesis, the feature kernels, or
  * the JDK codecs change — jpeg decode is deterministic per JDK):
  * `sbt "runMain graft.GenM1Fixture /root/testdata/sf0.1"`.
  */
object GenM1Fixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outFile = Paths.get(args.lift(1).getOrElse(QueryParams.M1FixturePath))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    val media = graft.multimodal.Multimodal.packDocuments(graft.io.Tables.documents(spark, sfDir))
    val tmp = Files.createTempDirectory("m1fixture").toString + "/out"
    graft.multimodal.Multimodal
      .extractFeatures(media, "media")
      .select(
        $"media_id".as("doc_id"),
        $"meta.format".as("format"),
        $"meta.width".as("width"),
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
