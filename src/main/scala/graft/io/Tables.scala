package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (`TESTDATA.md`).
  *
  * All tables are plain parquet; the only special case is `events`, whose
  * `ts` column is INT64 TIMESTAMP(NANOS). With
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[graft.Sessions]])
  * it arrives as BIGINT epoch-nanos; [[events]] derives `ts_us`
  * (epoch-microseconds, BIGINT) via *integer* division — `ts div 1000` —
  * because a double-typed division would lose precision above 2^53 and
  * corrupt the microsecond value.
  *
  * At 100 TB these readers are unchanged: parquet scans with Catalyst
  * filter/column pushdown; partition pruning comes from directory layout,
  * not from code here.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` with `ts_us` (BIGINT epoch-micros) and `ts_t` (TIMESTAMP,
    * micros precision) derived from the raw nano ts. DuckDB reads the same
    * file natively as TIMESTAMP_NS; oracle SQL uses `epoch_us(ts)` so both
    * sides compare at microsecond precision.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
}
