package graft

import java.time.{LocalDateTime, ZoneOffset}

import graft.signals.HullMacd
import graft.signals.HullMacd.{Candle, State}

/** Golden scenarios from the reference engine's test suite semantics
  * (FIXTURES.md A6; reference `unit_tests/analytics/test_hull_macd_engine.py`):
  * confluence OPEN, single-flip CLOSE, session gates, independent
  * bullish/bearish positions.
  */
class HullMacdSpec extends SparkSpec {

  /** Candle at a given ET wall-clock time (2026-02-10 was an ET-winter
    * date: ET = UTC-5).
    */
  private def candleAtEt(h: Int, m: Int, hullColor: String, macdBull: Boolean): Candle = {
    val utc = LocalDateTime.of(2026, 2, 10, h + 5, m).toInstant(ZoneOffset.UTC)
    Candle(
      timeUs = utc.toEpochMilli * 1000,
      close = 100.0,
      hullColor = hullColor,
      hullValue = 100.0,
      macdValue = if (macdBull) 1.0 else -1.0,
      macdSignal = 0.0,
      macdHistogram = if (macdBull) 1.0 else -1.0
    )
  }

  test("confluence after both indicators flip the same way -> OPEN") {
    var s = State()
    // warm up: both bearish
    s = HullMacd.step(s, candleAtEt(10, 0, "Down", macdBull = false))._1
    // hull flips up -> armed bullish, no open yet
    val (s2, sig2) = HullMacd.step(s, candleAtEt(10, 5, "Up", macdBull = false))
    assert(sig2.isEmpty && s2.hullArmed.contains("BULLISH"))
    // macd flips bullish -> confluence OPEN
    val (s3, sig3) = HullMacd.step(s2, candleAtEt(10, 10, "Up", macdBull = true))
    assert(sig3.map(x => (x.signalType, x.direction, x.trigger)) == List(("OPEN", "BULLISH", "confluence")))
    assert(s3.bullishOpen && s3.hullArmed.isEmpty && s3.macdArmed.isEmpty)
  }

  test("single hull flip closes an open bullish position") {
    var s = State(hullDir = Some("Up"), macdPos = Some("bullish"), bullishOpen = true)
    val (s2, sigs) = HullMacd.step(s, candleAtEt(12, 0, "Down", macdBull = true))
    assert(sigs.map(x => (x.signalType, x.direction, x.trigger)) == List(("CLOSE", "BULLISH", "hull")))
    assert(!s2.bullishOpen)
  }

  test("macd flip alone also closes (trigger=macd)") {
    val s = State(hullDir = Some("Up"), macdPos = Some("bullish"), bullishOpen = true)
    val (s2, sigs) = HullMacd.step(s, candleAtEt(12, 0, "Up", macdBull = false))
    assert(sigs.map(_.trigger) == List("macd"))
    assert(!s2.bullishOpen)
  }

  test("no signals before 10:00 ET, but directions still update") {
    val s = State(hullDir = Some("Up"), macdPos = Some("bullish"), bullishOpen = true)
    val (s2, sigs) = HullMacd.step(s, candleAtEt(9, 55, "Down", macdBull = false))
    assert(sigs.isEmpty)
    assert(s2.hullDir.contains("Down") && s2.macdPos.contains("bearish"))
    assert(s2.bullishOpen) // close NOT fired before the gate
  }

  test("no OPEN at/after 15:00 ET; CLOSE still fires") {
    val open = State(hullDir = Some("Down"), macdPos = Some("bearish"), bullishOpen = true)
    val (s2, sigs) = HullMacd.step(open, candleAtEt(15, 0, "Up", macdBull = true))
    // bullish pos closes? no: close requires Down/bearish flip for bullish.
    // bearish-style flip (Up/bullish) closes a BEARISH position; here the
    // bullish position stays open, and no OPEN can fire after 15:00.
    assert(sigs.isEmpty && s2.bullishOpen)
    val bearish = State(hullDir = Some("Down"), macdPos = Some("bearish"), bearishOpen = true)
    val (s3, sigs3) = HullMacd.step(bearish, candleAtEt(15, 0, "Up", macdBull = false))
    assert(sigs3.map(x => (x.signalType, x.direction)) == List(("CLOSE", "BEARISH")))
    assert(!s3.bearishOpen)
  }

  test("opposing armed directions: newer survives") {
    val s = State(hullDir = Some("Up"), macdPos = Some("bearish"), hullArmed = Some("BULLISH"))
    // macd flips bullish->bearish? already bearish; flip macd to bullish arms BULLISH -> confluence
    val (s2, sigs) = HullMacd.step(s, candleAtEt(11, 0, "Up", macdBull = true))
    assert(sigs.map(_.signalType) == List("OPEN"))
    // now: opposing case — hull armed BULLISH, macd flips to bearish (newer)
    val so = State(hullDir = Some("Up"), macdPos = Some("bullish"), hullArmed = Some("BULLISH"))
    val (s3, sigs3) = HullMacd.step(so, candleAtEt(11, 5, "Up", macdBull = false))
    assert(sigs3.isEmpty && s3.hullArmed.isEmpty && s3.macdArmed.contains("BEARISH"))
  }

  test("independent bullish and bearish positions can both be open") {
    val s = State(
      hullDir = Some("Up"),
      macdPos = Some("bullish"),
      bullishOpen = true,
      bearishOpen = true
    )
    // hull flips Down: closes bullish (hull) AND arms bearish... the
    // bearish position is open already, so no duplicate OPEN
    val (s2, sigs) = HullMacd.step(s, candleAtEt(11, 0, "Down", macdBull = true))
    assert(sigs.map(x => (x.signalType, x.direction)) == List(("CLOSE", "BULLISH")))
    assert(!s2.bullishOpen && s2.bearishOpen)
  }

  test("session gate follows ET across DST (same UTC hour, different gate)") {
    def candleAtUtc(month: Int, day: Int, hUtc: Int): Candle = {
      val utc = LocalDateTime.of(2026, month, day, hUtc, 0).toInstant(ZoneOffset.UTC)
      Candle(utc.toEpochMilli * 1000, 100.0, "Down", 100.0, -1.0, 0.0, -1.0)
    }
    // open bullish position; a Down/bearish flip would CLOSE if gate open
    val st = State(hullDir = Some("Up"), macdPos = Some("bullish"), bullishOpen = true)
    // 2026-01-09 is EST (UTC-5): 14:00 UTC = 09:00 ET -> gated, no signal
    val (_, winter) = HullMacd.step(st, candleAtUtc(1, 9, 14))
    assert(winter.isEmpty)
    // 2026-06-09 is EDT (UTC-4): 14:00 UTC = 10:00 ET -> gate open: the
    // bullish CLOSE fires, and (both indicators having flipped bearish
    // simultaneously) a bearish confluence OPEN follows in the same step
    // - reference behavior: closes run before opens on each candle
    val (_, summer) = HullMacd.step(st, candleAtUtc(6, 9, 14))
    assert(summer.map(s => (s.signalType, s.direction)) == List(("CLOSE", "BULLISH"), ("OPEN", "BEARISH")))
  }

  test("batch driver runs end-to-end on events and emits plausible signals") {
    import org.apache.spark.sql.functions._
    val ev = graft.io.Tables
      .events(spark, sf0001)
      .select(col("user_id").cast("string").as("symbol"), col("ts_us"), col("value"))
    val out = HullMacd.detectSignals(ev, "symbol", "ts_us", "value")
    val rows = out.collect()
    // every CLOSE must follow an OPEN of the same direction per symbol
    val bySym = rows.groupBy(_.getString(0))
    bySym.foreach { case (_, sigs) =>
      val sorted = sigs.sortBy(_.getLong(1))
      var open = Set.empty[String]
      sorted.foreach { r =>
        val (tpe, dir) = (r.getString(2), r.getString(3))
        if (tpe == "OPEN") { assert(!open.contains(dir)); open += dir }
        else { assert(open.contains(dir), s"CLOSE without OPEN: $r"); open -= dir }
      }
    }
    assert(rows.nonEmpty)
  }
}
