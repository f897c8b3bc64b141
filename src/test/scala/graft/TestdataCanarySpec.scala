package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.io.Tables

/** Canary against silent testdata regeneration drift.
  *
  * Round 6 lost 20 queries because the driver regenerated
  * `events.parquet` with `ts` as TIMESTAMP(MICROS) while the reader
  * still assumed INT64-nanos — and nothing failed until every consumer
  * hit DATATYPE_MISMATCH at analysis. This spec names the drift FIRST:
  * if `events.ts` arrives as anything [[Tables.events]] can't dispatch
  * on, the assertion message prints the observed type.
  */
class TestdataCanarySpec extends SparkSpec {

  test("events.ts physical type is one Tables.events dispatches on") {
    for (dir <- Seq(sf0001, sf001)) {
      val observed = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      assert(
        observed == LongType || observed == TimestampType || observed == TimestampNTZType,
        s"TESTDATA DRIFT at $dir: events.ts is $observed — expected BIGINT (nanos-as-long) " +
          "or TIMESTAMP/TIMESTAMP_NTZ (micros). Extend Tables.events' schema dispatch.")
    }
  }

  test("Tables.events derives micro-precision ts_us/ts_t on the current testdata") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts_us").dataType == LongType)
    assert(ev.schema("ts_t").dataType == TimestampType)
    val row = ev.selectExpr("min(ts_us)", "max(ts_us)", "count(*)").head()
    val (lo, hi, n) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(n > 0)
    // plausibility window: epoch-micros between 2000-01-01 and 2100-01-01;
    // a nanos value misread as micros would overshoot this by 1000×
    assert(lo > 946684800000000L && hi < 4102444800000000L,
      s"ts_us out of plausible epoch-micros range: [$lo, $hi] — unit drift?")
  }
}
