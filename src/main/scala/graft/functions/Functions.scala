package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2.8): float normalization, candle
  * symbol munging, interval parsing, OCC option-symbol parsing, signed
  * money effects, session/date helpers, dedup jitter. All pure column
  * expressions (codegen'd; no UDFs).
  */
object Functions {

  /** Evaluate an expensive expression ONCE per row and hand the result
    * to `f` as a lambda variable, via a 1-element-array transform.
    * Referenced directly, an expensive subtree gets INLINED everywhere
    * `f` uses it — into every element of a nested lambda (e.g. a full
    * re-tokenize per window: O(doc²)) and into every optimizer-derived
    * filter — because Catalyst substitutes aliases through projections
    * and lambdas cannot reference outer attributes. A lambda variable
    * is the one binding the optimizer cannot see through. Load-bearing
    * for [[graft.text.TextOps]]' span/chunk operators and
    * [[graft.similarity.Similarity.quantizeInt8]].
    */
  def bindOnce(e: Column)(f: Column => Column): Column =
    transform(array(e), f).getItem(0)

  /** F1 — float normalize on ingest (reference `events.py:37-53`):
    * NaN/±Inf → null, else round to 10 decimal places.
    */
  def normalizeFloat(x: Column): Column =
    when(isnan(x) || x === Double.PositiveInfinity || x === Double.NegativeInfinity, lit(null))
      .otherwise(round(x, 10))

  /** F2 — candle symbol interval strip `AAPL{=1d}` → `AAPL{=d}`
    * (reference `utils/helpers.py:33-35`). Written without lookbehind so
    * RE2-based engines evaluate the same pattern.
    */
  def stripCandleInterval(sym: Column): Column =
    regexp_replace(sym, """\{=1([a-zA-Z])\}""", "{=$1}")

  /** F3 — candle symbol parse → (ticker, interval), re-prefixing the
    * implied 1 (reference `helpers.py:38-47`).
    */
  def candleTicker(sym: Column): Column = regexp_extract(sym, """^(.*?)\{=""", 1)
  def candleInterval(sym: Column): Column = {
    val raw = regexp_extract(sym, """\{=([^}]+)\}""", 1)
    when(raw.rlike("^[a-zA-Z]"), concat(lit("1"), raw)).otherwise(raw)
  }

  /** F4 — interval string → milliseconds (reference `messages.py:133-180`). */
  def intervalToMillis(interval: Column): Column = {
    val n = when(regexp_extract(interval, "^(\\d+)", 1) === "", lit(1L))
      .otherwise(regexp_extract(interval, "^(\\d+)", 1).cast("long"))
    val unit = regexp_extract(interval, "([a-zA-Z]+)$", 1)
    n * when(unit === "s", 1000L)
      .when(unit === "m", 60L * 1000)
      .when(unit === "h", 3600L * 1000)
      .when(unit === "d", 86400L * 1000)
      .when(unit === "w", 7L * 86400 * 1000)
      .otherwise(lit(null).cast("long"))
  }

  /** F5 — floor a timestamp (millis) to an interval boundary
    * (reference `messages.py:189-203`).
    */
  def floorToInterval(tMillis: Column, intervalMillis: Column): Column =
    (tMillis.cast("long") / intervalMillis).cast("long") * intervalMillis

  /** F6 — OCC option symbol parse (reference `positions.py:599-633`):
    * `SPY   260320C00510000` → (expiry 2026-03-20, C, 510.0). 8-digit
    * equity strikes divide by 1000.
    */
  val OccPattern = """(\d{6})([CP])(.+)$"""
  // all three return null when the symbol is not OCC-shaped (the
  // reference parses only on regex match; ANSI mode would otherwise
  // throw on casting the empty extract)
  def occExpiry(sym: Column): Column = {
    val m = regexp_extract(sym, OccPattern, 1)
    when(m =!= "", to_date(concat(lit("20"), m), "yyyyMMdd"))
  }
  def occType(sym: Column): Column = {
    val m = regexp_extract(sym, OccPattern, 2)
    when(m =!= "", m)
  }
  def occStrike(sym: Column): Column = {
    val raw = regexp_extract(sym, OccPattern, 3)
    when(raw =!= "", when(length(raw) === 8, raw.cast("double") / 1000.0).otherwise(raw.cast("double")))
  }

  /** F7 — apply Credit/Debit effect as a sign (reference
    * `positions.py:32-43`).
    */
  def applyEffect(amount: Column, effect: Column): Column =
    when(effect === "Debit", -amount).otherwise(amount)

  /** F8 — mid price (reference `metrics.py:167-172`). */
  def midPrice(bid: Column, ask: Column, scale: Int = 4): Column =
    round((bid + ask) / 2.0, scale)

  /** F9 — dollar theta = theta × signed qty × multiplier (reference
    * `positions.py:710-721`).
    */
  def dollarTheta(theta: Column, signedQty: Column, multiplier: Column): Column =
    theta * signedQty * multiplier

  /** F12 — last weekday at or before a date (reference
    * `helpers.py:16-30`): Sunday → Friday(−2), Saturday → Friday(−1).
    */
  def lastWeekday(d: Column): Column =
    when(dayofweek(d) === 1, date_sub(d, 2))
      .when(dayofweek(d) === 7, date_sub(d, 1))
      .otherwise(d)

  /** P5 — ET session-window gate as a column predicate (reference
    * `analytics/engines/hull_macd.py:31-33`): true when the UTC
    * timestamp falls in [earliest, latest) Eastern wall-clock minutes.
    * (The signal engine embeds the same rule row-locally; this is the
    * relational-filter form.)
    */
  def inEtSession(tsUtc: Column, earliestMin: Int = 600, latestMin: Int = 900): Column = {
    val et = from_utc_timestamp(tsUtc, "America/New_York")
    val minutes = hour(et) * 60 + minute(et)
    minutes >= earliestMin && minutes < latestMin
  }

  /** F11 — naive-UTC epoch ↔ ET-shifted epoch (reference
    * `charting/server.py:36-60` display-time shifting).
    */
  def utcEpochToEtShiftedEpoch(epochSec: Column): Column =
    unix_timestamp(from_utc_timestamp(timestamp_seconds(epochSec), "America/New_York"))

  /** F17 — futures detection and product-code strip (reference
    * `market/option_chains.py:22-29`).
    */
  def isFutures(sym: Column): Column = sym.startsWith("/")
  def stripFuturesPrefix(sym: Column): Column = ltrim(sym, "/")

  /** F18 — lenient float cast: null on failure instead of ANSI error
    * (reference `orchestrator.py:145-152` safe_float).
    */
  def safeFloat(s: Column): Column = s.try_cast("double")

  /** F19a — uptime humanization (reference
    * `subscription/orchestrator.py:49-59` format_uptime): whole-second
    * divmod into days/hours/minutes with the reference's three display
    * shapes (`3d 4h 5m` / `4h 5m` / `5m`). Pure integer arithmetic on a
    * non-negative duration, so the string is engine-independent by
    * construction (no float formatting anywhere).
    */
  def formatUptime(seconds: Column): Column = {
    val total = seconds.cast("long")
    val days = floor(total / 86400L).cast("long")
    val hours = floor(pmod(total, lit(86400L)) / 3600L).cast("long")
    val minutes = floor(pmod(total, lit(3600L)) / 60L).cast("long")
    val hm = concat(hours.cast("string"), lit("h "), minutes.cast("string"), lit("m"))
    when(days > 0, concat(days.cast("string"), lit("d "), hm))
      .when(hours > 0, hm)
      .otherwise(concat(minutes.cast("string"), lit("m")))
  }

  /** F19b — age humanization (reference `subscription/status.py:41-53`
    * age_display): null → "unknown", then `Ns ago` / `Nm ago` /
    * `N.Nh ago` / `N.Nd ago` buckets. The shown value rounds HALF-UP on
    * the exact rational age/divisor via integer arithmetic — the one
    * observable deviation from the reference, whose CPython f-string
    * formats the binary double with round-half-even (differs only at
    * exact ties, e.g. 150 s → our `3m ago` vs its `2m ago`); integer
    * arithmetic is what makes the string identical across engines.
    */
  def ageDisplay(ageSeconds: Column): Column = {
    val a = ageSeconds.cast("long")
    // half-up integer division: floor((2n + d) / 2d); all magnitudes
    // here are far below 2^53 so the double-typed `/` is exact enough
    // for floor to agree with true integer division
    def up0(den: Long) = floor((a * 2 + den) / (2.0 * den)).cast("long").cast("string")
    def up1(den: Long) = {
      val tenths = floor((a * 20 + den) / (2.0 * den)).cast("long")
      concat(
        floor(tenths / 10L).cast("long").cast("string"),
        lit("."),
        pmod(tenths, lit(10L)).cast("string")
      )
    }
    when(a.isNull, lit("unknown"))
      .when(a < 60, concat(up0(1), lit("s ago")))
      .when(a < 3600, concat(up0(60), lit("m ago")))
      .when(a < 86400, concat(up1(3600), lit("h ago")))
      .otherwise(concat(up1(86400), lit("d ago")))
  }

  /** W9 — snapshot-complete bitmask gate: SNAPSHOT_END(0x08) |
    * SNAPSHOT_SNIP(0x10) (reference `snapshot.py:6-26,82`).
    */
  def snapshotComplete(flags: Column): Column = (flags.bitwiseAND(lit(0x18))) =!= 0

  /** W12 — deterministic dedup-avoidance jitter: 0–999 µs derived from
    * sha256(label) (reference `visualizations/models.py:130-147`).
    */
  def jitterMicros(label: Column): Column =
    conv(substring(sha2(label, 256), 1, 6), 16, 10).cast("long") % 1000
}
