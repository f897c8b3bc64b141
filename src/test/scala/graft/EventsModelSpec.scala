package graft

import org.apache.spark.sql.functions._
import graft.model.Events

class EventsModelSpec extends SparkSpec {
  import spark.implicits._

  test("declared schemas expose the reference field surface") {
    assert(Events.candleSchema.fieldNames.toSet.contains("close"))
    assert(Events.candleSchema.fieldNames.length == 16)
    assert(Events.quoteSchema.fieldNames.toSeq ==
      Seq("eventSymbol", "bidPrice", "askPrice", "bidSize", "askSize"))
    assert(Events.greeksSchema("delta").dataType.typeName == "double")
  }

  test("kebab->snake rename + double normalization at ingest") {
    val raw = Seq(("SPX{=5m}", Double.NaN, 1.23456789012345))
      .toDF("eventSymbol", "bid-price", "ask-price")
    val out = Events.normalizeDoubles(Events.kebabToSnake(raw)).collect().head
    assert(out.isNullAt(1))
    assert(out.getDouble(2) == 1.2345678901)
  }

  test("typed candle ingest round-trips through Dataset[CandleEvent]") {
    val df = Seq(
      ("SPX{=5m}", new java.sql.Timestamp(1700000000000L), Some(0), None: Option[Long], None: Option[Long],
        None: Option[Long], Some(5000.0), Some(5010.0), Some(4990.0), Some(Double.PositiveInfinity),
        None: Option[Double], None: Option[Double], None: Option[Double], None: Option[Double],
        None: Option[Double], None: Option[Double])
    ).toDF(Events.candleSchema.fieldNames: _*)
    val ds = Events.candles(spark, df)
    val c = ds.collect().head
    assert(c.eventSymbol == "SPX{=5m}")
    assert(c.close.isEmpty) // +Inf normalized to null
    assert(c.open.contains(5000.0))
  }
}
