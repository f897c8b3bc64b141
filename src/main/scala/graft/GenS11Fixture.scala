package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

/** Dev tool: regenerate the s11 classification-expectation fixture
  * (`fixtures/s11_expected.parquet`, path shared with the oracle via
  * [[QueryParams.S11FixturePath]]).
  *
  * The legs table is a pure function of part (Queries.s11Legs, the SAME
  * code the live query runs), and the greedy classifier is a pure
  * deterministic function of each underlying's leg group — proven
  * shuffle-invariant by StrategyClassifierPropSpec — so the expected
  * classification is a fixed table keyed by (underlying, legs_key).
  * Generated once at sf0.1: partkeys are 0-based and contiguous, so
  * every 10-key underlying block is complete at every scale factor and
  * sf0.1's groups are a strict superset of the smaller scales'; the
  * DuckDB oracle scale-filters by joining part (see the s11 oracle in
  * Oracles.sql). Committed, the fixture gives the driver's compare a
  * deterministic hashable surface for the non-SQL-expressible greedy
  * matcher: the s11 query classifies live and counts per-instance
  * matches, the oracle recomputes the aggregate from the fixture alone.
  *
  * The fixture is a regression pin (same-decoder caveat as m1):
  * independence from the classifier is carried by the reference
  * canonical cases + ScalaCheck differential invariants in
  * StrategiesSpec / StrategyClassifierPropSpec.
  *
  * Regenerate (only needed if the legs synthesis or the classifier
  * semantics change): `sbt "runMain graft.GenS11Fixture /root/testdata/sf0.1"`.
  */
object GenS11Fixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outFile = Paths.get(args.lift(1).getOrElse(QueryParams.S11FixturePath))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val tmp = Files.createTempDirectory("s11fixture").toString + "/out"
    graft.strategies.Strategies
      .classify(spark, Queries.s11Legs(spark, sfDir))
      .select(
        col("underlying"),
        // sorted leg set = the instance identity: greedy matching consumes
        // each leg exactly once, so leg sets are disjoint and the key is
        // unique within an underlying
        concat_ws(",", array_sort(col("leg_symbols"))).as("legs_key"),
        col("strategy_type"),
        col("n_legs"),
        col("net_qty")
      )
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
