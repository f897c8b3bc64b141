package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one local SparkSession per suite, configured
  * identically to Verify/Bench (UTC, nanosAsLong) via [[Sessions]].
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"

  /** Every parquet file scan in `df`'s executed plan (AQE-aware,
    * subqueries included) — the shared probe for partition-pruning
    * plan pins.
    */
  protected def fileScans(
      df: org.apache.spark.sql.DataFrame
  ): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other                    => other
    }).collectWithSubqueries { case f: FileSourceScanExec => f }
  }
}
