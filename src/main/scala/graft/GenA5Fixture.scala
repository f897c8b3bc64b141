package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Dev tool: regenerate the a5 max-profit/max-loss expectation fixture
  * (`fixtures/a5_expected.parquet`, path shared with the oracle via
  * [[QueryParams.A5FixturePath]]) — the GenH1Fixture technique applied
  * to the risk formula tree: classification AND the type-dispatched
  * max-profit/max-loss formulas ([[graft.strategies.Strategies.riskDf]],
  * reference `strategies/models.py:274-452`) are pure deterministic
  * functions of the enriched leg group ([[Queries.a5Legs]] derives the
  * entry enrichment per-leg from the partkey), so the expected risk
  * figures form a fixed table keyed by (underlying, legs_key).
  * Generated once at sf0.1, whose complete partkey blocks of 10 make
  * every smaller sf's instance set the part-join-filtered subset (the
  * s11 scale argument).
  *
  * Regenerate (only if the leg synthesis, enrichment, classifier, or
  * risk formulas change):
  * `sbt "runMain graft.GenA5Fixture /root/testdata/sf0.1"`.
  */
object GenA5Fixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outFile = Paths.get(args.lift(1).getOrElse(QueryParams.A5FixturePath))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val tmp = Files.createTempDirectory("a5fixture").toString + "/out"
    graft.strategies.Strategies
      .riskDf(spark, Queries.a5Legs(spark, sfDir))
      .orderBy("underlying", "legs_key")
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
