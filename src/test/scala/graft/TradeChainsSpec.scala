package graft

import graft.io.TradeChains

class TradeChainsSpec extends SparkSpec {
  import spark.implicits._

  private val chainJson =
    """{"id":"chain1","description":"Iron Condor","underlying-symbol":"SPY",
      |"computed-data":{"open":true,"total-fees":"12.5","total-fees-effect":"Debit",
      |  "realized-gain":"150.0","realized-gain-effect":"Credit",
      |  "realized-gain-with-fees":"137.5","realized-gain-with-fees-effect":"Credit","roll-count":2,
      |  "open-entries":[{"symbol":"SPY 1","instrument-type":"Equity Option","quantity":"1","quantity-type":"Short","quantity-numeric":"-1"}]},
      |"lite-nodes":[
      |  {"node-type":"order","id":"n1","description":"Opening","occurred-at":"2026-02-10T15:30:00Z",
      |   "total-fees":"5.0","total-fees-effect":"Debit","total-fill-cost":"100.0","total-fill-cost-effect":"Credit","roll":false,
      |   "legs":[{"symbol":"SPY 1","instrument-type":"Equity Option","action":"Sell to Open","fill-quantity":"1","order-quantity":"1"},
      |           {"symbol":"SPY 2","instrument-type":"Equity Option","action":"Buy to Open","fill-quantity":"1","order-quantity":"1"}],
      |   "entries":[],
      |   "market-state-snapshot":{"market-datas":[
      |      {"symbol":"SPY 1","delta":"-0.30","theta":"-0.05","bid":"1.0","ask":"1.2"},
      |      {"symbol":"SPY 2","delta":"0.10","theta":"-0.02","bid":"0.4","ask":"0.5"}],
      |      "total-delta":"-0.20","total-theta":"-0.07"}}
      |]}""".stripMargin.replaceAll("\n", "")

  private lazy val chains = Seq(chainJson).toDF("json")

  test("nodes flatten with effect-signed fees and fill cost") {
    val n = TradeChains.nodes(chains).collect().head
    assert(n.getAs[String]("chain_id") == "chain1")
    assert(n.getAs[java.math.BigDecimal]("total_fees").doubleValue() == -5.0) // Debit
    assert(n.getAs[java.math.BigDecimal]("total_fill_cost").doubleValue() == 100.0) // Credit
  }

  test("legs explode one row per order leg") {
    val l = TradeChains.legs(chains).collect()
    assert(l.length == 2)
    assert(l.map(_.getAs[String]("action")).toSet == Set("Sell to Open", "Buy to Open"))
  }

  test("J7 snapshot correlation: per-leg greeks joined with node net greeks") {
    val s = TradeChains.snapshots(chains).collect()
    assert(s.length == 2)
    s.foreach { r =>
      assert(r.getAs[Double]("net_delta") == -0.20)
      assert(r.getAs[Double]("net_theta") == -0.07)
    }
    val leg1 = s.find(_.getAs[String]("symbol") == "SPY 1").get
    assert(leg1.getAs[Double]("delta") == -0.30)
  }

  test("open entries and campaign rollup (effect-signed, recovery)") {
    val oe = TradeChains.openEntries(chains).collect().head
    assert(oe.getAs[Double]("signed_quantity") == -1.0)
    val roll = TradeChains.campaignRollup(chains).collect().head
    assert(roll.getAs[java.math.BigDecimal]("total_realized").doubleValue() == 150.0)
    assert(roll.getAs[java.math.BigDecimal]("total_fees").doubleValue() == -12.5)
    assert(roll.getAs[Long]("total_rolls") == 2L)
    assert(roll.getAs[Long]("open_chains") == 1L)
    assert(roll.getAs[java.math.BigDecimal]("recovery").doubleValue() == 0.0)
  }

  test("chainBySymbol lookup + metrics enrichment (positions.py:653-672,723-760)") {
    // a closed chain must NOT contribute lookup rows
    val closed = chainJson.replace("\"open\":true", "\"open\":false").replace("chain1", "chain0")
    val lookup = TradeChains.chainBySymbol(Seq(chainJson, closed).toDF("json"))
    val rows = lookup.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("symbol") == "SPY 1") // trimmed open-entry symbol
    assert(r.getAs[String]("chain_id") == "chain1")
    assert(r.getAs[String]("tt_strategy") == "Iron Condor")
    assert(r.getAs[Int]("rolls") == 2)
    assert(r.getAs[java.math.BigDecimal]("realized_pnl").doubleValue() == 137.5)
    assert(r.getAs[java.math.BigDecimal]("chain_fees").doubleValue() == -12.5)

    val metrics = Seq(("SPY 1", "SPY"), ("SPY 2", "SPY")).toDF("symbol", "underlying_symbol")
    val enriched = graft.metrics.Metrics.enrichWithChains(metrics, lookup)
      .collect().map(x => x.getAs[String]("symbol") -> x).toMap
    assert(enriched("SPY 1").getAs[String]("chain_id") == "chain1")
    assert(enriched("SPY 2").isNullAt(enriched("SPY 2").fieldIndex("chain_id")))
  }
}
