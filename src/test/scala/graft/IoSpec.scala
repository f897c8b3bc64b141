package graft

import org.apache.spark.sql.functions._
import graft.functions.{Functions => F}
import graft.io.{OptionChains, WireDecoder}

class IoSpec extends SparkSpec {
  import spark.implicits._

  test("wire decoder chunks compact arrays by field count") {
    // two Quote events in one frame + one Trade frame (reference
    // handlers.py:150-232 FEED_DATA shape)
    val frames = Seq(
      ("Quote", Seq("AAPL", "1.0", "1.1", "2.0", "2.1", "MSFT", "3.0", "3.1", "4.0", "4.1")),
      ("Trade", Seq("AAPL", "99.5", "100"))
    ).toDF("eventType", "values")
    val quotes = WireDecoder
      .decode(frames, "Quote", Seq("eventSymbol", "bidPrice", "askPrice", "bidSize", "askSize"))
      .orderBy("seq")
      .collect()
    assert(quotes.length == 2)
    assert(quotes(0).getAs[String]("eventSymbol") == "AAPL")
    assert(quotes(1).getAs[String]("eventSymbol") == "MSFT")
    assert(quotes(1).getAs[String]("bidPrice") == "3.0")
    // trailing partial chunks drop
    val partial = Seq(("Quote", Seq("AAPL", "1.0", "1.1"))).toDF("eventType", "values")
    assert(WireDecoder.decode(partial, "Quote", Seq("a", "b", "c", "d", "e")).count() == 0)
  }

  test("option chain flattens to one row per contract, missing sides drop") {
    val json =
      """{"underlying":"SPY","root":"SPY","expirations":[
        |{"expiration_date":"2026-03-20","days_to_expiration":30,"settlement_type":"PM","strikes":[
        |  {"strike_price":"500.0","call":"SPY  260320C00500000","put":"SPY  260320P00500000"},
        |  {"strike_price":"505.0","call":"SPY  260320C00505000","put":null}]},
        |{"expiration_date":"2026-04-17","days_to_expiration":58,"settlement_type":"PM","strikes":[
        |  {"strike_price":"500.0","call":"SPY  260417C00500000","put":"SPY  260417P00500000"}]}
        |]}""".stripMargin.replaceAll("\n", "")
    val out = OptionChains.flatten(Seq(json).toDF("json"))
    assert(out.count() == 5) // 2+2 first exp minus missing put (3) + 2 second exp
    val row = out.filter($"option_type" === "P" && $"days_to_expiration" === 30).collect()
    assert(row.length == 1 && row(0).getAs[java.math.BigDecimal]("strike").doubleValue() == 500.0)
  }

  test("scalar functions: interval parse, floor, effect, mid, weekday") {
    val df = Seq(("5m", 1234567L, "Debit", 10.0, 11.0, "2026-08-09")).toDF("iv", "t", "eff", "bid", "ask", "d")
    val r = df
      .select(
        F.intervalToMillis($"iv").as("ms"),
        F.floorToInterval($"t", F.intervalToMillis($"iv")).as("floored"),
        F.applyEffect(lit(100.5), $"eff").as("signed"),
        F.midPrice($"bid", $"ask").as("mid"),
        F.lastWeekday(to_date($"d")).as("wd") // 2026-08-09 is a Sunday
      )
      .collect()
      .head
    assert(r.getAs[Long]("ms") == 300000L)
    assert(r.getAs[Long]("floored") == 1200000L)
    assert(r.getAs[Double]("signed") == -100.5)
    assert(r.getAs[Double]("mid") == 10.5)
    assert(r.getAs[java.sql.Date]("wd").toString == "2026-08-07")
  }

  test("session gate, timezone shift, futures strip, safe cast") {
    val df = Seq(
      // 2026-02-10 15:30 UTC = 10:30 EST -> in session; 14:30 UTC = 09:30 -> out
      ("2026-02-10 15:30:00", "/GCZ6", "12.5"),
      ("2026-02-10 14:30:00", "SPY", "not-a-number")
    ).toDF("ts", "sym", "raw")
    val out = df
      .select(
        F.inEtSession(to_timestamp($"ts")).as("in_session"),
        F.isFutures($"sym").as("fut"),
        F.stripFuturesPrefix($"sym").as("stripped"),
        F.safeFloat($"raw").as("v")
      )
      .collect()
    assert(out(0).getBoolean(0) && !out(1).getBoolean(0))
    assert(out(0).getBoolean(1) && !out(1).getBoolean(1))
    assert(out(0).getString(2) == "GCZ6" && out(1).getString(2) == "SPY")
    assert(out(0).getDouble(3) == 12.5 && out(1).isNullAt(3))
    // F11: epoch shift moves 2026-02-10T15:30Z back 5h (EST)
    val shifted = df
      .limit(1)
      .select(F.utcEpochToEtShiftedEpoch(unix_timestamp(to_timestamp($"ts"))))
      .as[Long]
      .head()
    val orig = java.time.Instant.parse("2026-02-10T15:30:00Z").getEpochSecond
    assert(shifted == orig - 5 * 3600)
  }

  test("F19: uptime and age humanization pin every display branch") {
    // format_uptime (reference subscription/orchestrator.py:49-59):
    // divmod shapes "Xd Yh Zm" / "Yh Zm" / "Zm"
    val ups = Seq(0L, 59L, 60L, 3600L, 3725L, 86400L, 90061L).toDF("s")
    val upOut = ups.select(F.formatUptime($"s")).as[String].collect()
    assert(upOut.sameElements(Array("0m", "0m", "1m", "1h 0m", "1h 2m", "1d 0h 0m", "1d 1h 1m")))

    // age_display (reference subscription/status.py:41-53): null →
    // unknown, then s/m/h/d buckets; shown value half-up on the exact
    // rational (deviates from CPython's half-even ONLY at exact ties —
    // 150 s here: ours "3m ago", CPython "2m ago" — documented in the
    // Scaladoc)
    val ages = Seq[Option[Long]](
      None, Some(0L), Some(45L), Some(59L), Some(60L), Some(90L), Some(150L),
      Some(3599L), Some(3600L), Some(5400L), Some(8100L), Some(86399L),
      Some(86400L), Some(129600L), Some(172800L)
    ).toDF("a")
    val ageOut = ages.select(F.ageDisplay($"a")).as[String].collect()
    assert(ageOut.sameElements(Array(
      "unknown", "0s ago", "45s ago", "59s ago", "1m ago", "2m ago", "3m ago",
      "60m ago", "1.0h ago", "1.5h ago", "2.3h ago", "24.0h ago",
      "1.0d ago", "1.5d ago", "2.0d ago"
    )), s"got: ${ageOut.mkString(", ")}")
  }

  test("normalizeFloat nulls NaN/Inf and keeps 10dp") {
    val df = Seq(1.23456789012345, Double.NaN, Double.PositiveInfinity).toDF("x")
    val out = df.select(F.normalizeFloat($"x").as("n")).collect().map(r => Option(r.get(0)))
    assert(out(0).contains(1.2345678901))
    assert(out(1).isEmpty && out(2).isEmpty)
  }

  test("candle symbol munge round-trips implied-1 intervals") {
    val df = Seq("AAPL{=1d}", "SPX{=5m}").toDF("sym")
    val out = df
      .select(
        F.stripCandleInterval($"sym").as("s"),
        F.candleInterval(F.stripCandleInterval($"sym")).as("iv")
      )
      .collect()
    assert(out(0).getString(0) == "AAPL{=d}" && out(0).getString(1) == "1d")
    assert(out(1).getString(0) == "SPX{=5m}" && out(1).getString(1) == "5m")
  }

  test("ET session gate + epoch shift across DST transitions (SURVEY §7.5.5)") {
    import graft.functions.{Functions => Fn}
    // 2026 US DST: spring forward Mar 8 (EST→EDT), fall back Nov 1.
    // 14:30 UTC is 09:30 ET in EDT (in session from minute 600=10:00? no:
    // gate default [600,900) = [10:00,15:00) ET wall clock)
    val rows = Seq(
      // winter (EST, UTC-5): 15:00 UTC = 10:00 ET → IN session
      ("2026-01-15 15:00:00", true),
      // same UTC wall clock in summer (EDT, UTC-4): 15:00 UTC = 11:00 ET → IN
      ("2026-07-15 15:00:00", true),
      // winter: 19:59 UTC = 14:59 ET → IN; 20:00 UTC = 15:00 ET → OUT
      ("2026-01-15 19:59:00", true),
      ("2026-01-15 20:00:00", false),
      // summer: 19:00 UTC = 15:00 EDT → OUT (was 14:00 and IN under EST rules)
      ("2026-07-15 19:00:00", false),
      // spring-forward day itself, after the jump: Mar 8 2026 15:00 UTC = 11:00 EDT → IN
      ("2026-03-08 15:00:00", true),
      // fall-back day: Nov 1 2026 20:00 UTC = 15:00 EST (already back) → OUT
      ("2026-11-01 20:00:00", false),
      ("2026-11-01 19:59:00", true)
    ).toDF("ts", "expected")
    val out = rows
      .select($"ts", $"expected", Fn.inEtSession(to_timestamp($"ts")).as("got"))
      .collect()
    out.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2), s"gate mismatch at ${r.getString(0)}"))

    // F11 epoch shift: EST offset -5h in winter, -4h in summer
    val shifts = Seq("2026-01-15 15:00:00", "2026-07-15 15:00:00").toDF("ts")
      .select(unix_timestamp(to_timestamp($"ts")).as("utc"))
      .select($"utc", Fn.utcEpochToEtShiftedEpoch($"utc").as("shifted"))
      .collect()
    assert(shifts(0).getLong(1) - shifts(0).getLong(0) == -5 * 3600)
    assert(shifts(1).getLong(1) - shifts(1).getLong(0) == -4 * 3600)
  }

  test("F14 serialize: toInfluxShape flattens nested model to JSON strings + ISO datetimes") {
    import graft.io.TradeChains
    import graft.model.Events
    val chainJson =
      """{"id":"c1","description":"Vertical","underlying-symbol":"SPY",
        |"computed-data":{"open":true,"total-fees":"2.5","total-fees-effect":"Debit",
        |"realized-gain":"10.0","realized-gain-effect":"Credit","roll-count":1,
        |"open-entries":[{"symbol":"SPY 1","instrument-type":"Equity Option","quantity":"1","quantity-type":"Short","quantity-numeric":"-1"}]},
        |"lite-nodes":[]}""".stripMargin.replaceAll("\n", "")
    val parsed = Seq(chainJson).toDF("json")
      .select(from_json($"json", TradeChains.chainSchema).as("c"))
      .select(
        $"c.id".as("chain_id"),
        $"c.`computed-data`".as("computed_data"),
        $"c.`lite-nodes`".as("lite_nodes"),
        to_timestamp(lit("2026-02-10 15:30:00")).as("updated_at"),
        to_timestamp(lit("2026-02-10 15:30:00.123456")).as("observed_at"),
        to_date(lit("2026-03-20")).as("expiry"),
        lit(3.5).as("score")
      )
    val flat = Events.toInfluxShape(parsed, timeField = "updated_at", exclude = Set("lite_nodes"))

    // schema: every remaining column is flat; time kept as timestamp
    assert(flat.columns.toSet == Set("chain_id", "computed_data", "time", "observed_at", "expiry", "score"))
    val r = flat.collect().head
    assert(r.getAs[java.sql.Timestamp]("time") != null) // point timestamp, not a string
    assert(r.getAs[String]("observed_at") == "2026-02-10T15:30:00.123456")
    assert(r.getAs[String]("expiry") == "2026-03-20")
    assert(r.getAs[Double]("score") == 3.5)
    // nested struct became a JSON string that round-trips through the schema
    val back = flat
      .select(from_json($"computed_data", TradeChains.chainSchema("computed-data").dataType).as("cd"))
      .select($"cd.`roll-count`", $"cd.open")
      .collect().head
    assert(back.getInt(0) == 1 && back.getBoolean(1))
    // zero-fraction timestamp omits the fractional part (isoformat parity)
    val zeroFrac = Events.toInfluxShape(parsed.select($"updated_at"), timeField = "")
      .collect().head.getString(0)
    assert(zeroFrac == "2026-02-10T15:30:00")
  }
}
