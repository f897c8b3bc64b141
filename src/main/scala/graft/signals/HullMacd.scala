package graft.signals

import java.time.{Instant, LocalTime, ZoneId}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.indicators.Indicators
import graft.ops.Relational

/** Hull MA + MACD confluence signal engine (reference
  * `analytics/engines/hull_macd.py:36-260`, SURVEY T5): a position-aware
  * per-symbol state machine — strict two-indicator confluence to OPEN,
  * single indicator flip to CLOSE, independent bullish/bearish
  * positions, ET session gates (no signals before `earliestEntry`;
  * CLOSEs any time after; no OPENs at/after `latestEntry`).
  *
  * The transition function is pure `(State, Candle) → (State, Signals)`
  * — unit-testable exactly like the reference engine — and the batch
  * driver folds it over key-sorted partitions after computing the
  * indicator columns with [[graft.indicators.Indicators]] (prefix-fold
  * EMA and trailing-window WMA make per-row values identical to the
  * reference's recompute-per-candle over its buffer, for series within
  * the reference's 500-candle cap; the cap itself is a memory bound, not
  * a semantic choice — SURVEY §7.5.3).
  */
object HullMacd {

  val ET: ZoneId = ZoneId.of("America/New_York")
  val Bullish = "BULLISH"
  val Bearish = "BEARISH"

  case class State(
      hullDir: Option[String] = None,
      macdPos: Option[String] = None,
      hullArmed: Option[String] = None,
      macdArmed: Option[String] = None,
      bullishOpen: Boolean = false,
      bearishOpen: Boolean = false
  )

  case class Candle(
      timeUs: Long,
      close: Double,
      hullColor: String,
      hullValue: Double,
      macdValue: Double,
      macdSignal: Double,
      macdHistogram: Double
  )

  case class Signal(
      timeUs: Long,
      signalType: String, // OPEN | CLOSE
      direction: String,  // BULLISH | BEARISH
      trigger: String,    // hull | macd | confluence
      hullDirection: String,
      hullValue: Double,
      macdValue: Double,
      macdSignal: Double,
      macdHistogram: Double,
      closePrice: Double
  )

  private def hullToSignalDir(d: String): String = if (d == "Up") Bullish else Bearish
  private def macdToSignalDir(p: String): String = if (p == "bullish") Bullish else Bearish

  /** One state transition (reference `on_candle_event`,
    * `hull_macd.py:93-133` + close/open handlers `:170-260`).
    */
  def step(
      state: State,
      c: Candle,
      earliestEntry: LocalTime = LocalTime.of(10, 0),
      latestEntry: LocalTime = LocalTime.of(15, 0)
  ): (State, List[Signal]) = {
    val hullDir = c.hullColor
    val macdPos = if (c.macdValue > c.macdSignal) "bullish" else "bearish"
    val hullChanged = state.hullDir.exists(_ != hullDir)
    val macdChanged = state.macdPos.exists(_ != macdPos)
    var s = state.copy(hullDir = Some(hullDir), macdPos = Some(macdPos))
    val candleEt = Instant.ofEpochMilli(c.timeUs / 1000).atZone(ET).toLocalTime

    if (candleEt.isBefore(earliestEntry)) return (s, Nil)

    var signals = List.empty[Signal]
    def emit(tpe: String, dir: String, trigger: String): Unit =
      signals :+= Signal(c.timeUs, tpe, dir, trigger, hullDir, c.hullValue, c.macdValue, c.macdSignal, c.macdHistogram, c.close)

    // CLOSEs always fire (must be able to exit)
    if (s.bullishOpen) {
      if (hullChanged && hullDir == "Down") { emit("CLOSE", Bullish, "hull"); s = s.copy(bullishOpen = false) }
      else if (macdChanged && macdPos == "bearish") { emit("CLOSE", Bullish, "macd"); s = s.copy(bullishOpen = false) }
    }
    if (s.bearishOpen) {
      if (hullChanged && hullDir == "Up") { emit("CLOSE", Bearish, "hull"); s = s.copy(bearishOpen = false) }
      else if (macdChanged && macdPos == "bullish") { emit("CLOSE", Bearish, "macd"); s = s.copy(bearishOpen = false) }
    }

    // No new OPENs during power hour
    if (!candleEt.isBefore(latestEntry)) return (s, signals)

    if (hullChanged) s = s.copy(hullArmed = Some(hullToSignalDir(hullDir)))
    if (macdChanged) s = s.copy(macdArmed = Some(macdToSignalDir(macdPos)))

    (s.hullArmed, s.macdArmed) match {
      case (Some(h), Some(m)) if h == m =>
        val alreadyOpen = (h == Bullish && s.bullishOpen) || (h == Bearish && s.bearishOpen)
        if (!alreadyOpen) {
          emit("OPEN", h, "confluence")
          s =
            if (h == Bullish) s.copy(bullishOpen = true, hullArmed = None, macdArmed = None)
            else s.copy(bearishOpen = true, hullArmed = None, macdArmed = None)
        }
      case (Some(_), Some(_)) =>
        // opposing armed directions — discard the older one
        s =
          if (hullChanged && !macdChanged) s.copy(macdArmed = None)
          else if (macdChanged && !hullChanged) s.copy(hullArmed = None)
          else s.copy(hullArmed = None, macdArmed = None)
      case _ => ()
    }
    (s, signals)
  }

  val signalSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("time_us", LongType),
    StructField("signal_type", StringType),
    StructField("direction", StringType),
    StructField("engine", StringType),
    StructField("trigger", StringType),
    StructField("hull_direction", StringType),
    StructField("hull_value", DoubleType),
    StructField("macd_value", DoubleType),
    StructField("macd_signal", DoubleType),
    StructField("macd_histogram", DoubleType),
    StructField("close_price", DoubleType)
  ))

  /** Batch signal detection: `df` needs (symbolCol: string, timeUs: long,
    * closeCol: double). Pipeline: keep-last dedup on (symbol, time) →
    * Hull(20) + MACD(12,26,9) columns (prior close defaults to each
    * symbol's first close, the reference's `prior_close=None` fallback) →
    * per-symbol ordered fold of [[step]]. The first candle of each symbol
    * only warms indicators (reference requires ≥2 candles).
    */
  def detectSignals(
      df: DataFrame,
      symbolCol: String,
      timeUsCol: String,
      closeCol: String,
      hullLength: Int = 20,
      fast: Int = 12,
      slow: Int = 26,
      signalLen: Int = 9,
      assumeDeduped: Boolean = false
  ): DataFrame = {
    // assumeDeduped: the caller guarantees (symbol, time) is already
    // unique (e.g. an upstream keep-last with a REAL tie-break column,
    // or bucket candles that are unique by construction) — the internal
    // keep-last would be a semantic no-op that still pays a full
    // sort + window pass. Mirrors withMacd's prePartitioned flag.
    val deduped =
      if (assumeDeduped) df.filter(col(closeCol).isNotNull)
      else Relational.dedupKeepLast(df.filter(col(closeCol).isNotNull), Seq(symbolCol, timeUsCol), timeUsCol)
    val withHull = Indicators.withHull(deduped, symbolCol, Seq(timeUsCol), closeCol, hullLength, padCol = None)
    // withHull's windows partition by the same key, so the MACD fold can
    // skip its repartition (prePartitioned) — no redundant exchange
    val withMacd = Indicators.withMacd(withHull, symbolCol, Seq(timeUsCol), closeCol, None, fast, slow, signalLen,
      prePartitioned = true)
    val symIdx = withMacd.schema.fieldIndex(symbolCol)
    val timeIdx = withMacd.schema.fieldIndex(timeUsCol)
    val closeIdx = withMacd.schema.fieldIndex(closeCol)
    val hmaIdx = withMacd.schema.fieldIndex("hma")
    val hmaColorIdx = withMacd.schema.fieldIndex("hma_color")
    val mvIdx = withMacd.schema.fieldIndex("macd_value")
    val msIdx = withMacd.schema.fieldIndex("avg")
    val mhIdx = withMacd.schema.fieldIndex("diff")
    // NO repartition here: withMacd's output contract is
    // key-partitioned, (key, time)-sorted rows (its own fold shuffled
    // and sorted; mapPartitions preserved the layout), so re-shuffling
    // would add a redundant Exchange that Catalyst can't eliminate (it
    // cannot see through mapPartitions). The in-partition sort is kept:
    // it is a cheap pass over already-sorted rows AND the row-format
    // boundary between the two object pipelines (fusing the
    // mapPartitions lambdas directly trips Spark's object-serializer
    // pruning with an ObjectType-in-struct projection error).
    val sorted = withMacd.sortWithinPartitions(col(symbolCol), col(timeUsCol))
    sorted.mapPartitions { rows =>
      var curKey: String = null
      var started = false
      var state = State()
      var rowsInKey = 0
      rows.flatMap { r =>
        val k = r.getString(symIdx)
        if (!started || k != curKey) {
          curKey = k; started = true; state = State(); rowsInKey = 0
        }
        rowsInKey += 1
        if (rowsInKey < 2) Nil // reference: need >= 2 candles
        else {
          val c = Candle(
            r.getLong(timeIdx), r.getDouble(closeIdx), r.getString(hmaColorIdx),
            r.getDouble(hmaIdx), r.getDouble(mvIdx), r.getDouble(msIdx), r.getDouble(mhIdx)
          )
          val (ns, sigs) = step(state, c)
          state = ns
          sigs.map(sg =>
            Row(
              k, sg.timeUs, sg.signalType, sg.direction, "hull_macd", sg.trigger,
              sg.hullDirection, sg.hullValue, sg.macdValue, sg.macdSignal, sg.macdHistogram, sg.closePrice
            )
          )
        }
      }
    }(Encoders.row(signalSchema))
  }
}
