package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Functions

/** Position-metrics join pipeline (SURVEY §3.2, reference
  * `analytics/positions.py:528-768` + `analytics/metrics.py:94-195`):
  * one wide positions table assembled from small dimension tables, then
  * rollups.
  *
  * Spark shape: positions is the driving side; quotes/greeks/
  * instruments/entry-credits are broadcast dimension joins (each is
  * bounded by portfolio width). The reference's 6 sequential Redis
  * HGETALLs + dict merges become one declarative join chain Catalyst
  * can reorder and fuse.
  */
object Metrics {

  /** Instrument types that receive live greeks (reference
    * `metrics.py:37-42` OPTION_TYPES); everything else is delta-1
    * (`metrics.py:21-35` DELTA_1_TYPES — the reference enumerates all
    * non-option types; we express the same set as the complement).
    */
  val OptionTypes: Seq[String] = Seq("Equity Option", "Future Option")

  /** Merge duplicate position rows per symbol, preferring the copy that
    * carries a `streamer_symbol` (reference `positions.py:536-554`: REST
    * hydration omits the streamer symbol, live WS events include it —
    * both land in the store keyed by symbol and must collapse to one
    * row). Then the equity fallback (reference `metrics.py:104-112`):
    * an Equity position without a streamer symbol streams under its own
    * symbol; any OTHER instrument without one cannot be quoted and is
    * dropped, matching the reference's "Skipping position" branch.
    *
    * Spark shape: one `max_by` aggregate keyed on
    * (has streamer_symbol, tieBreak) — a single shuffle with map-side
    * combine; no window sort. `tieBreakCol` makes the merge
    * deterministic where the reference relies on store iteration order.
    */
  def dedupePositions(positions: DataFrame, tieBreakCol: String): DataFrame = {
    val cols = positions.columns.map(col)
    positions
      .groupBy(col("symbol"))
      .agg(
        max_by(
          struct(cols: _*),
          struct(col("streamer_symbol").isNotNull.as("has_ss"), col(tieBreakCol).as("tb"))
        ).as("p")
      )
      .select(col("p.*"))
      .withColumn(
        "streamer_symbol",
        coalesce(col("streamer_symbol"), when(col("instrument_type") === "Equity", col("symbol")))
      )
      .filter(col("streamer_symbol").isNotNull)
  }

  /** Build the wide SecurityMetrics-style table.
    *
    * Inputs (column contracts):
    *   - positions(symbol, streamer_symbol, underlying_symbol,
    *     instrument_type, quantity, quantity_direction, multiplier)
    *   - quotes(streamer_symbol, bid_price, ask_price)
    *   - greeks(streamer_symbol, delta, gamma, theta, vega)  — applied to
    *     option positions only (reference J2)
    *   - instruments(symbol, option_type, strike_price, expiration_date,
    *     days_to_expiration) — OCC-parse fallback fills missing rows
    *     (reference J3/F6)
    *   - entryCredits(symbol, entry_credit, fees) — from the LIFO replay
    */
  def positionMetrics(
      positions: DataFrame,
      quotes: DataFrame,
      greeks: DataFrame,
      instruments: DataFrame,
      entryCredits: DataFrame
  ): DataFrame = {
    val optionTypes = OptionTypes
    val signedQty = when(col("quantity_direction") === "Short", -col("quantity")).otherwise(col("quantity"))

    val withQuotes = positions
      .join(broadcast(quotes), Seq("streamer_symbol"), "left")
      .withColumn("mid_price", Functions.midPrice(col("bid_price"), col("ask_price")))

    // greeks only enrich option positions (reference metrics.py:175-195)
    val g = greeks.withColumnRenamed("streamer_symbol", "g_sym")
    // Delta-1 theoretical defaults (reference metrics.py:98-126): equity/
    // future/crypto/… positions are delta ±1.0 by direction with zero
    // gamma/theta/vega — without these a portfolio holding stock reports
    // net_delta from its options alone.
    val isDelta1 = !col("instrument_type").isin(optionTypes: _*)
    val delta1Default = when(col("quantity_direction") === "Long", lit(1.0))
      .when(col("quantity_direction") === "Short", lit(-1.0))
      .otherwise(lit(0.0))
    val withGreeks = withQuotes
      .join(
        broadcast(g),
        col("streamer_symbol") === col("g_sym") && col("instrument_type").isin(optionTypes: _*),
        "left"
      )
      .drop("g_sym")
      .withColumn("delta", coalesce(col("delta"), when(isDelta1, delta1Default)))
      .withColumn("gamma", coalesce(col("gamma"), when(isDelta1, lit(0.0))))
      .withColumn("theta", coalesce(col("theta"), when(isDelta1, lit(0.0))))
      .withColumn("vega", coalesce(col("vega"), when(isDelta1, lit(0.0))))

    // instrument metadata with OCC-symbol fallback parse (J3 + F6)
    val inst = instruments.select(
      col("symbol").as("i_sym"),
      col("option_type").as("i_option_type"),
      col("strike_price").as("i_strike"),
      col("expiration_date").as("i_expiry"),
      col("days_to_expiration").as("i_dte")
    )
    val withInst = withGreeks
      .join(broadcast(inst), col("symbol") === col("i_sym"), "left")
      .withColumn("option_type", coalesce(col("i_option_type"), Functions.occType(col("symbol"))))
      .withColumn("strike_price", coalesce(col("i_strike"), Functions.occStrike(col("symbol")).cast("decimal(12,3)")))
      .withColumn("expiration_date", coalesce(col("i_expiry"), Functions.occExpiry(col("symbol"))))
      .withColumn("days_to_expiration", coalesce(col("i_dte"), datediff(col("expiration_date"), current_date())))
      .drop("i_sym", "i_option_type", "i_strike", "i_expiry", "i_dte")

    withInst
      .join(broadcast(entryCredits), Seq("symbol"), "left")
      .withColumn("signed_quantity", signedQty)
      .withColumn("dollar_theta", Functions.dollarTheta(col("theta"), signedQty, col("multiplier")))
  }

  /** A3 — net-delta summary per underlying with leg descriptions
    * (reference `analytics/positions.py:68-95`).
    */
  def summary(metrics: DataFrame): DataFrame =
    metrics
      .groupBy(col("underlying_symbol"))
      .agg(
        round(sum(coalesce(col("delta"), lit(0.0)) * col("signed_quantity")), 4).as("net_delta"),
        round(sum(coalesce(col("dollar_theta"), lit(0.0))), 2).as("net_dollar_theta"),
        count(lit(1)).as("n_legs"),
        sort_array(collect_list(concat_ws("", col("symbol"), lit("@"), col("strike_price")))).as("leg_descriptions")
      )

  /** Display rounding (reference `positions.py:762-766`): delta, theta
    * and implied_volatility to 2dp — "least significant bits don't
    * drive decisions". `bround` (HALF_EVEN), because the reference's
    * pandas `.round` is banker's rounding — plain `round` (HALF_UP)
    * would diverge on exact midpoints like 0.125. Applied AFTER
    * dollar_theta is computed (the reference computes dollar theta from
    * the unrounded values, step 10 before the rounding step); kept
    * separate from [[positionMetrics]] so analytical consumers keep
    * full precision.
    */
  def roundGreeksForDisplay(metrics: DataFrame): DataFrame =
    Seq("delta", "theta", "implied_volatility").foldLeft(metrics) { (df, c) =>
      if (df.columns.contains(c)) df.withColumn(c, bround(col(c), 2)) else df
    }

  /** Enrich the metrics table with trade-chain lifecycle columns
    * (reference `positions.py:653-672` builds `chain_by_symbol` from open
    * chains' open-entries; `positions.py:723-760` maps chain_id /
    * tt_strategy / rolls / realized_pnl / chain_fees onto each position
    * row). `chainBySymbol` is `TradeChains.chainBySymbol` — one row per
    * open-entry symbol; broadcast because it is portfolio-bounded.
    */
  def enrichWithChains(metrics: DataFrame, chainBySymbol: DataFrame): DataFrame =
    metrics.join(broadcast(chainBySymbol), Seq("symbol"), "left")
}
