package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.io.{Sinks, Tables}
import graft.ops.Relational

class SinksSpec extends SparkSpec {

  test("partitioned history write round-trips with partition pruning") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val ev = Tables
      .events(spark, sf0001)
      .withColumn("day", expr("cast(ts_us div 86400000000 as int)"))
      .withColumn("user_bucket", pmod(col("user_id"), lit(8)).cast("int"))
    Sinks.writeHistory(ev, dir, Seq("user_bucket", "day"))
    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count())
    // partition filter prunes to one bucket directory
    val plan = back
      .filter(col("user_bucket") === 3)
      .queryExecution
      .executedPlan
      .toString
    assert(back.filter(col("user_bucket") === 3).count() ==
      ev.filter(col("user_bucket") === 3).count())
    assert(plan.contains("user_bucket"))
  }

  test("latest-value snapshot overwrite is idempotent") {
    val dir = Files.createTempDirectory("graft-latest").toString
    val ev = Tables.events(spark, sf0001)
    val latest = Relational.latestPerKeyAgg(ev, Seq("user_id"), col("ts_us"), Seq("event_id", "value"))
    Sinks.writeLatest(latest, dir)
    Sinks.writeLatest(latest, dir) // overwrite, not append
    assert(spark.read.parquet(dir).count() == latest.count())
  }
}
