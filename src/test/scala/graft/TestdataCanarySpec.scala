package graft

import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, StringType, TimestampNTZType, TimestampType}
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

  test("documents physical types: the columns every text operator dispatches on") {
    for (dir <- Seq(sf0001, sf001)) {
      val s = spark.read.parquet(s"$dir/documents.parquet").schema
      for (c <- Seq("doc_id", "text", "lang", "source", "n_chars"))
        assert(s.fieldNames.contains(c), s"TESTDATA DRIFT at $dir: documents lost column $c")
      assert(s("doc_id").dataType == LongType,
        s"TESTDATA DRIFT at $dir: documents.doc_id is ${s("doc_id").dataType} — expected BIGINT")
      assert(s("text").dataType == StringType,
        s"TESTDATA DRIFT at $dir: documents.text is ${s("text").dataType} — expected STRING")
      assert(s("n_chars").dataType == LongType,
        s"TESTDATA DRIFT at $dir: documents.n_chars is ${s("n_chars").dataType} — expected BIGINT")
    }
  }

  test("embeddings physical types AND dimension: the oracle SQL bakes dim=64 as a literal") {
    for (dir <- Seq(sf0001, sf001)) {
      val df = spark.read.parquet(s"$dir/embeddings.parquet")
      val s = df.schema
      assert(s("vec_id").dataType == LongType,
        s"TESTDATA DRIFT at $dir: embeddings.vec_id is ${s("vec_id").dataType} — expected BIGINT")
      val elem = s("embedding").dataType match {
        case ArrayType(t, _) => t
        case other => fail(s"TESTDATA DRIFT at $dir: embeddings.embedding is $other — expected ARRAY")
      }
      // both float and double dispatch through Similarity.toDoubleArr;
      // anything else breaks every cosine operator at analysis
      assert(elem == FloatType || elem == DoubleType,
        s"TESTDATA DRIFT at $dir: embedding element type is $elem — expected FLOAT or DOUBLE")
      // dim=64 is baked into the fitted oracles (generate_series(1, 64))
      // and the 8×8 PQ sub-slicing — a silent dim change would hash-fail
      // everywhere downstream; name it HERE instead
      val dims = df.selectExpr("size(embedding) as d").distinct().collect().map(_.getInt(0)).toSeq
      assert(dims == Seq(64),
        s"TESTDATA DRIFT at $dir: embedding dimensions $dims — oracles/PQ assume exactly 64")
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
