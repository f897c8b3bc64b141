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
    val optionTypes = Seq("Equity Option", "Future Option")
    val signedQty = when(col("quantity_direction") === "Short", -col("quantity")).otherwise(col("quantity"))

    val withQuotes = positions
      .join(broadcast(quotes), Seq("streamer_symbol"), "left")
      .withColumn("mid_price", Functions.midPrice(col("bid_price"), col("ask_price")))

    // greeks only enrich option positions (reference metrics.py:175-195)
    val g = greeks.withColumnRenamed("streamer_symbol", "g_sym")
    val withGreeks = withQuotes
      .join(
        broadcast(g),
        col("streamer_symbol") === col("g_sym") && col("instrument_type").isin(optionTypes: _*),
        "left"
      )
      .drop("g_sym")

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
}
