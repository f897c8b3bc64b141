package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Dev tool: regenerate the h1 health-alert expectation fixture
  * (`fixtures/h1_expected.parquet`, path shared with the oracle via
  * [[QueryParams.H1FixturePath]]) — the GenS11Fixture technique one
  * level up: classification AND the health rules are pure deterministic
  * functions of the enriched leg group ([[Queries.h1Legs]] derives the
  * enrichment per-leg from the partkey), so the expected alert set is a
  * fixed table keyed by (underlying, legs_key, level, message).
  * Generated once at sf0.1, whose complete partkey blocks of 10 make
  * every smaller sf's alert set the part-join-filtered subset (the s11
  * scale argument).
  *
  * Regenerate (only if the leg synthesis, enrichment, classifier, or
  * health thresholds change):
  * `sbt "runMain graft.GenH1Fixture /root/testdata/sf0.1"`.
  */
object GenH1Fixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outFile = Paths.get(args.lift(1).getOrElse(QueryParams.H1FixturePath))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val tmp = Files.createTempDirectory("h1fixture").toString + "/out"
    graft.strategies.Health
      .alertsDf(spark, Queries.h1Legs(spark, sfDir))
      .orderBy("underlying", "legs_key", "level", "message")
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
