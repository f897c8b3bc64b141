package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated test tables (`TESTDATA.md`).
  *
  * All tables are plain parquet; the only special case is `events`, whose
  * `ts` column has changed physical type across testdata generations:
  * INT64 TIMESTAMP(NANOS) originally, plain TIMESTAMP(MICROS) since the
  * round-6 regeneration. [[events]] schema-dispatches on the observed type:
  *
  *   - `LongType` (nanos read as BIGINT under
  *     `spark.sql.legacy.parquet.nanosAsLong=true`, set by
  *     [[graft.Sessions]]): `ts_us = ts div 1000` — *integer* division,
  *     because a double-typed division would lose precision above 2^53 and
  *     corrupt the microsecond value.
  *   - `TimestampType`/`TimestampNTZType` (micros): `ts_us =
  *     unix_micros(cast(ts as timestamp))` — lossless because the session
  *     timezone is pinned to UTC and the data is naive-UTC.
  *
  * Any other type fails loudly ([[EventsSchemaDrift]]) so a future testdata
  * regeneration breaks ONE canary assertion instead of silently knocking
  * out every events-backed query.
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

  /** Thrown when `events.ts` arrives with a physical type neither branch of
    * the [[events]] dispatch understands — the loud canary for testdata
    * regeneration drift.
    */
  final case class EventsSchemaDrift(observed: DataType)
      extends IllegalStateException(
        s"events.ts has unsupported type $observed — expected BIGINT " +
          "(nanos-as-long) or TIMESTAMP/TIMESTAMP_NTZ (micros). The " +
          "testdata generator likely changed the parquet timestamp " +
          "encoding again; extend Tables.events' dispatch.")

  /** `events` with `ts_us` (BIGINT epoch-micros) and `ts_t` (TIMESTAMP,
    * micros precision) derived from the raw `ts`, whatever its physical
    * encoding (see class doc). DuckDB reads the same file natively as a
    * timestamp; oracle SQL uses `epoch_us(ts)` so both sides compare at
    * microsecond precision.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    val withUs = raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_us", expr("ts div 1000"))
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts_us", unix_micros(col("ts").cast(TimestampType)))
      case other =>
        throw EventsSchemaDrift(other)
    }
    withUs.withColumn("ts_t", timestamp_micros(col("ts_us")))
  }
}
