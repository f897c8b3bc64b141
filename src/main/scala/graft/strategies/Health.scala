package graft.strategies

import graft.strategies.Strategies.ParsedLeg

/** Strategy health monitor (reference `strategies/health.py:28-197` +
  * `config/strategy_health.toml`): per-strategy-type threshold config
  * (DTE warning/critical, per-position delta drift) with a delta-exempt
  * set for delta-1/covered strategies.
  *
  * Pure Scala over classified strategies — at scale this runs inside the
  * same `groupBy(underlying)` pass as classification (group-local, no
  * extra shuffle).
  */
object Health {

  case class Thresholds(
      dteWarning: Int = 14,
      dteCritical: Int = 7,
      maxLossWarning: Double = 0.75,
      maxLossCritical: Double = 0.90,
      deltaDriftWarning: Double = 0.30,
      deltaDriftCritical: Double = 0.50
  )

  case class Alert(strategyType: String, underlying: String, level: String, message: String)

  /** Delta-1 / covered strategies where high absolute delta is inherent
    * (reference `health.py:144-153`).
    */
  val DeltaExempt: Set[String] = Set(
    "LONG_STOCK", "SHORT_STOCK", "LONG_CRYPTO", "SHORT_CRYPTO",
    "LONG_FUTURE", "SHORT_FUTURE", "COVERED_CALL", "PROTECTIVE_PUT"
  )

  /** Threshold lookup with per-strategy-type overrides (the reference's
    * TOML sections become a plain map — configuration is the caller's
    * concern).
    */
  def thresholdsFor(overrides: Map[String, Thresholds], strategyType: String): Thresholds =
    overrides.getOrElse(strategyType.toLowerCase, Thresholds())

  def check(
      strategyType: String,
      underlying: String,
      legs: Seq[ParsedLeg],
      overrides: Map[String, Thresholds] = Map.empty
  ): List[Alert] = {
    val t = thresholdsFor(overrides, strategyType)
    val alerts = List.newBuilder[Alert]

    Strategies.minDte(legs).foreach { dte =>
      if (dte <= t.dteCritical)
        alerts += Alert(strategyType, underlying, "CRITICAL", s"DTE=$dte <= ${t.dteCritical}")
      else if (dte <= t.dteWarning)
        alerts += Alert(strategyType, underlying, "WARNING", s"DTE=$dte <= ${t.dteWarning}")
    }

    if (!DeltaExempt.contains(strategyType)) {
      Strategies.netDelta(legs).foreach { nd =>
        // normalize to per-position (1x) delta, reference health.py:155-163
        val qty = legs
          .find(_.isOption)
          .orElse(legs.headOption)
          .map(_.absQuantity.toInt)
          .getOrElse(1)
        val perPos = if (qty > 0) nd / qty else nd
        if (math.abs(perPos) > t.deltaDriftCritical)
          alerts += Alert(strategyType, underlying, "CRITICAL", f"Net delta=$perPos%.2f exceeds +/-${t.deltaDriftCritical}")
        else if (math.abs(perPos) > t.deltaDriftWarning)
          alerts += Alert(strategyType, underlying, "WARNING", f"Net delta=$perPos%.2f exceeds +/-${t.deltaDriftWarning}")
      }
    }
    alerts.result()
  }
}
