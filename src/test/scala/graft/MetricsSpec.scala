package graft

import org.apache.spark.sql.functions._
import graft.metrics.Metrics

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("position metrics pipeline: joins, greeks gating, OCC fallback, dollar theta") {
    val positions = Seq(
      ("SPY   260320C00510000", ".SPYC510", "SPY", "Equity Option", 2.0, "Long", 100.0),
      ("SPY   260320P00480000", ".SPYP480", "SPY", "Equity Option", 1.0, "Short", 100.0),
      ("SPY", "SPY", "SPY", "Equity", 100.0, "Long", 1.0)
    ).toDF("symbol", "streamer_symbol", "underlying_symbol", "instrument_type", "quantity", "quantity_direction", "multiplier")
    val quotes = Seq(
      (".SPYC510", 5.0, 5.2), (".SPYP480", 3.0, 3.4), ("SPY", 500.0, 500.2)
    ).toDF("streamer_symbol", "bid_price", "ask_price")
    val greeks = Seq(
      (".SPYC510", 0.45, 0.01, -0.05, 0.2),
      (".SPYP480", -0.30, 0.01, -0.04, 0.18),
      ("SPY", 1.0, 0.0, 0.0, 0.0) // must NOT enrich the equity row
    ).toDF("streamer_symbol", "delta", "gamma", "theta", "vega")
    // instruments covers only the call; the put resolves via OCC parse
    val instruments = Seq(
      ("SPY   260320C00510000", "C", BigDecimal(510), java.sql.Date.valueOf("2026-03-20"), 220)
    ).toDF("symbol", "option_type", "strike_price", "expiration_date", "days_to_expiration")
    val credits = Seq(("SPY   260320C00510000", BigDecimal(-1000), BigDecimal(2)))
      .toDF("symbol", "entry_credit", "fees")

    val out = Metrics.positionMetrics(positions, quotes, greeks, instruments, credits)
    val rows = out.collect().map(r => r.getAs[String]("symbol") -> r).toMap

    val call = rows("SPY   260320C00510000")
    assert(call.getAs[Double]("mid_price") == 5.1)
    assert(call.getAs[Double]("delta") == 0.45)
    assert(call.getAs[Double]("dollar_theta") == -0.05 * 2.0 * 100.0)

    val put = rows("SPY   260320P00480000")
    assert(put.getAs[String]("option_type") == "P") // OCC fallback
    assert(put.getAs[java.math.BigDecimal]("strike_price").doubleValue() == 480.0)
    assert(put.getAs[java.sql.Date]("expiration_date").toString == "2026-03-20")
    assert(put.getAs[Double]("dollar_theta") == -0.04 * -1.0 * 100.0)

    val stock = rows("SPY")
    assert(stock.isNullAt(stock.fieldIndex("delta"))) // greeks gated to options
    assert(stock.getAs[Double]("mid_price") == 500.1)

    val sum = Metrics.summary(out).collect().head
    assert(sum.getAs[Long]("n_legs") == 3)
    assert(sum.getAs[Double]("net_delta") == math.rint((0.45 * 2 + -0.30 * -1) * 10000) / 10000)
  }
}
