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

    // delta-1 defaults (reference metrics.py:98-126): the live-greeks join
    // is still gated to options, but the stock row gets the theoretical
    // delta +1.0 (Long) and zero gamma/theta/vega — NOT the quoted 1.0
    // from the greeks table (which must not join), and NOT null.
    val stock = rows("SPY")
    assert(stock.getAs[Double]("delta") == 1.0)
    assert(stock.getAs[Double]("gamma") == 0.0)
    assert(stock.getAs[Double]("theta") == 0.0)
    assert(stock.getAs[Double]("vega") == 0.0)
    assert(stock.getAs[Double]("mid_price") == 500.1)

    // net delta now includes the 100 delta-1 shares (reference scaling:
    // delta × signed qty), matching metrics.py load_positions defaults.
    val sum = Metrics.summary(out).collect().head
    assert(sum.getAs[Long]("n_legs") == 3)
    assert(sum.getAs[Double]("net_delta") == math.rint((0.45 * 2 + -0.30 * -1 + 1.0 * 100) * 10000) / 10000)
  }

  test("delta-1 defaults: short future is -1.0, option without greeks stays null") {
    val positions = Seq(
      ("/ESZ6", "/ESZ6:XCME", "/ES", "Future", 2.0, "Short", 50.0),
      ("SPY   260320C00510000", ".SPYC510", "SPY", "Equity Option", 1.0, "Long", 100.0)
    ).toDF("symbol", "streamer_symbol", "underlying_symbol", "instrument_type", "quantity", "quantity_direction", "multiplier")
    val empty = Seq.empty[(String, Double, Double)].toDF("streamer_symbol", "bid_price", "ask_price")
    val noGreeks = Seq.empty[(String, Double, Double, Double, Double)]
      .toDF("streamer_symbol", "delta", "gamma", "theta", "vega")
    val noInst = Seq.empty[(String, String, BigDecimal, java.sql.Date, Int)]
      .toDF("symbol", "option_type", "strike_price", "expiration_date", "days_to_expiration")
    val noCred = Seq.empty[(String, BigDecimal, BigDecimal)].toDF("symbol", "entry_credit", "fees")

    val rows = Metrics.positionMetrics(positions, empty, noGreeks, noInst, noCred)
      .collect().map(r => r.getAs[String]("symbol") -> r).toMap
    val fut = rows("/ESZ6")
    assert(fut.getAs[Double]("delta") == -1.0)
    assert(fut.getAs[Double]("theta") == 0.0)
    // option awaiting its GreeksEvent: all greeks stay null (reference
    // metrics.py:121-126), no theoretical default applied
    val opt = rows("SPY   260320C00510000")
    assert(opt.isNullAt(opt.fieldIndex("delta")))
    assert(opt.isNullAt(opt.fieldIndex("theta")))
  }

  test("roundGreeksForDisplay: banker's 2dp on delta/theta, dollar_theta untouched (positions.py:762-766)") {
    val df = Seq(("X", 0.4567, -0.0444, 12.3456, 0.125)).toDF("symbol", "delta", "theta", "dollar_theta", "implied_volatility")
    val r = Metrics.roundGreeksForDisplay(df).collect().head
    assert(r.getAs[Double]("delta") == 0.46)
    assert(r.getAs[Double]("theta") == -0.04)
    assert(r.getAs[Double]("dollar_theta") == 12.3456) // computed pre-rounding, kept
    // exact midpoint: banker's rounding like the reference's pandas
    // .round — 0.125 → 0.12, not HALF_UP's 0.13
    assert(r.getAs[Double]("implied_volatility") == 0.12)
  }

  test("dedupePositions: streamer-symbol copy wins, equity fallback, quoteless non-equity dropped") {
    // REST copy (no streamer_symbol) + WS copy (with) of the same symbol
    // must merge to the WS copy (reference positions.py:536-554)
    val positions = Seq(
      (1L, "SPY   260320C00510000", null.asInstanceOf[String], "SPY", "Equity Option", 2.0, "Long", 100.0),
      (2L, "SPY   260320C00510000", ".SPYC510", "SPY", "Equity Option", 2.0, "Long", 100.0),
      (3L, "AAPL", null.asInstanceOf[String], "AAPL", "Equity", 50.0, "Long", 1.0),     // equity fallback
      (4L, "/6EZ6", null.asInstanceOf[String], "/6E", "Future", 1.0, "Short", 12500.0)  // dropped
    ).toDF("row_id", "symbol", "streamer_symbol", "underlying_symbol", "instrument_type", "quantity", "quantity_direction", "multiplier")

    val out = Metrics.dedupePositions(positions, "row_id")
      .collect().map(r => r.getAs[String]("symbol") -> r).toMap
    assert(out.size == 2) // future without streamer symbol is skipped
    assert(out("SPY   260320C00510000").getAs[String]("streamer_symbol") == ".SPYC510")
    assert(out("AAPL").getAs[String]("streamer_symbol") == "AAPL") // metrics.py:104-112 fallback
    assert(!out.contains("/6EZ6"))
  }

  test("enrichWithChains: chain lifecycle columns land on matching positions") {
    val metrics = Seq(
      ("SPY   260320C00510000", "SPY", 2.0),
      ("AAPL", "AAPL", 50.0)
    ).toDF("symbol", "underlying_symbol", "quantity")
    val chainBySymbol = Seq(
      ("SPY   260320C00510000", "CH-9", "Vertical", 2, BigDecimal(-7.68), BigDecimal(7.68))
    ).toDF("symbol", "chain_id", "tt_strategy", "rolls", "realized_pnl", "chain_fees")

    val out = Metrics.enrichWithChains(metrics, chainBySymbol)
      .collect().map(r => r.getAs[String]("symbol") -> r).toMap
    val spy = out("SPY   260320C00510000")
    assert(spy.getAs[String]("chain_id") == "CH-9")
    assert(spy.getAs[String]("tt_strategy") == "Vertical")
    assert(spy.getAs[Int]("rolls") == 2)
    val aapl = out("AAPL")
    assert(aapl.isNullAt(aapl.fieldIndex("chain_id"))) // unmatched stays null
  }
}
