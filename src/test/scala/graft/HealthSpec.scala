package graft

import java.time.LocalDate

import graft.strategies.{Health, Strategies}
import graft.strategies.Strategies.ParsedLeg

class HealthSpec extends SparkSpec {

  private def leg(qty: Double, delta: Double, dte: Int): ParsedLeg =
    ParsedLeg("O", "SPY", "Equity Option", qty, Some("C"), Some(BigDecimal(100)),
      Some(LocalDate.of(2026, 3, 20)), delta = Some(delta), daysToExpiration = Some(dte))

  test("DTE thresholds: critical beats warning") {
    val crit = Health.check("IRON_CONDOR", "SPY", Seq(leg(1, 0.0, 5)))
    assert(crit.exists(a => a.level == "CRITICAL" && a.message.startsWith("DTE=5")))
    val warn = Health.check("IRON_CONDOR", "SPY", Seq(leg(1, 0.0, 10)))
    assert(warn.exists(a => a.level == "WARNING" && a.message.startsWith("DTE=10")))
    assert(Health.check("IRON_CONDOR", "SPY", Seq(leg(1, 0.0, 30))).isEmpty)
  }

  test("delta drift normalizes per position and exempts delta-1 strategies") {
    // 2 contracts, net delta 0.8 -> per-position 0.4 -> warning
    val legs = Seq(leg(2, 0.4, 30))
    val alerts = Health.check("SHORT_STRANGLE", "SPY", legs)
    assert(alerts.exists(a => a.level == "WARNING" && a.message.contains("0.40")))
    // same numbers on an exempt strategy -> nothing
    assert(Health.check("COVERED_CALL", "SPY", legs).isEmpty)
  }

  test("per-type overrides change the gates") {
    val over = Map("iron_condor" -> Health.Thresholds(dteWarning = 30, dteCritical = 21))
    val a = Health.check("IRON_CONDOR", "SPY", Seq(leg(1, 0.0, 25)), over)
    assert(a.exists(_.level == "WARNING"))
  }
}
