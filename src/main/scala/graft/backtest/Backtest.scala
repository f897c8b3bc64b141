package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.signals.HullMacd

/** Backtest harness (SURVEY §3.3, reference `backtest/replay.py` +
  * `backtest/publisher.py`): replay merged candle streams through the
  * signal engine and enrich each emitted signal with its as-of entry
  * price from the pricing-interval stream.
  *
  * In batch the reference's paced Redis replay collapses to a
  * deterministic ordering rule (J8/T9: pricing-interval candles sort
  * before signal-interval candles at identical timestamps) and the
  * binary-search entry lookup (J6) becomes the union+window as-of join.
  */
object Backtest {

  /** DXLink interval normalization (reference
    * `backtest/models.py:20-53`): `1m`/`1h`/`1d` compact to
    * `m`/`h`/`d`; multi-unit intervals pass through.
    */
  def toDxlinkInterval(interval: String): String = interval match {
    case "1m" => "m"
    case "1h" => "h"
    case "1d" => "d"
    case other => other
  }

  /** Warmup days before the scored range (reference
    * `backtest/replay.py:25-39`): MACD(26) is the longest indicator —
    * daily needs 45 calendar days, hourly 5, everything finer 3.
    *
    * Reference-parity note: the lookup is on the EXACT normalized
    * string, so multi-unit coarse intervals ("4h", "2d") fall to the
    * 3-day default — the reference's `WARMUP_DAYS.get(normalized,
    * DEFAULT)` does the same (its config only ever passes m/h/d-style
    * intervals). We preserve that rule rather than second-guess it.
    */
  def warmupDays(interval: String): Int = toDxlinkInterval(interval) match {
    case "d" => 45
    case "h" => 5
    case _   => 3
  }

  /** Epoch-micros start of the warmup window for a scored range
    * beginning at `scoreFromUs` (reference `replay.py:92-104`: fetch
    * candles from `start_date - warmup_days` so the indicators are warm
    * when scoring begins).
    */
  def warmupStartUs(scoreFromUs: Long, signalInterval: String): Long =
    scoreFromUs - warmupDays(signalInterval).toLong * 86_400_000_000L

  /** J8 — multi-timeframe interleave: one stream, pricing first on
    * timestamp ties. Columns must align; adds `interval_rank`
    * (0 = pricing, 1 = signal).
    */
  def mergeReplay(pricing: DataFrame, signalCandles: DataFrame): DataFrame =
    pricing
      .withColumn("interval_rank", lit(0))
      .unionByName(signalCandles.withColumn("interval_rank", lit(1)), allowMissingColumns = true)
      .orderBy(col("time_us"), col("interval_rank"))

  /** End-to-end backtest slice (SURVEY §5.4): signal-interval candles →
    * HullMacd engine → signals enriched with the most recent non-null
    * pricing close at or before the signal time (reference
    * `publisher.py:112-128`).
    *
    * `signalCandles`/`pricing` need (symbol, time_us, close).
    *
    * `scoreFromUs`: when set, candles BEFORE it only warm the
    * indicators (reference `replay.py:27-39` warmup rule — without it,
    * signals near the range start fire from unwarmed windows); only
    * signals at/after it are emitted. The caller supplies candles from
    * [[warmupStartUs]] onward.
    */
  def run(
      signalCandles: DataFrame,
      pricing: DataFrame,
      hullLength: Int = 20,
      fast: Int = 12,
      slow: Int = 26,
      signalLen: Int = 9,
      scoreFromUs: Option[Long] = None,
      assumeDeduped: Boolean = false
  ): DataFrame = {
    val allSignals = HullMacd.detectSignals(signalCandles, "symbol", "time_us", "close",
      hullLength, fast, slow, signalLen, assumeDeduped)
    val signals = scoreFromUs.fold(allSignals)(t => allSignals.filter(col("time_us") >= t))
    enrichSignals(signals, pricing)
  }

  /** The relational half of the backtest on its own (reference
    * `publisher.py:112-128`): attach to each signal row the most recent
    * non-null pricing close at or before the signal time. Exposed
    * separately so this half is DuckDB-oracle-checkable (b1_enrich) —
    * the signal-engine half is a state machine and stays spec-carried.
    * `signals` needs (symbol, time_us, ...); `pricing` needs
    * (symbol, time_us, close).
    */
  def enrichSignals(signals: DataFrame, pricing: DataFrame): DataFrame = {
    val pricingClean = pricing
      .filter(col("close").isNotNull)
      .select(col("symbol"), col("time_us"), col("close").as("entry_price"))
    Relational.asOfJoin(
      signals,
      pricingClean,
      key = "symbol",
      leftTime = "time_us",
      rightTime = "time_us",
      valueCols = Seq("entry_price")
    )
  }
}
