package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.io.Tables

/** Partition-pruned scans on the date-partitioned layout a 100 TB
  * events table actually ships with: a day filter must reach the scan
  * as a PartitionFilter (directories skipped), not a post-scan filter.
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned events: day filter prunes partitions at the scan") {
    val base = Files.createTempDirectory("graft_part").toString
    Tables
      .events(spark, sf0001)
      .withColumn("event_date", to_date(timestamp_micros(col("ts_us"))))
      .write
      .partitionBy("event_date")
      .mode("overwrite")
      .parquet(base)

    val days = spark.read.parquet(base).select("event_date").distinct().count()
    assert(days > 1, "need multiple partitions for pruning to mean anything")

    val firstDay = spark.read.parquet(base).agg(min("event_date")).collect().head.getDate(0)
    val q = spark.read.parquet(base).filter(col("event_date") === lit(firstDay)).select("event_id")
    val plan = q.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    // the partition predicate must be IN PartitionFilters (scan-level),
    // and the read schema pruned to the projected column
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("event_date"), s"day predicate not pushed to partitions: $pf")
    assert(q.count() > 0)
  }
}
