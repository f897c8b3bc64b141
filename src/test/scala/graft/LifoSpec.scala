package graft

import graft.accounts.Lifo
import graft.accounts.Lifo.Txn

/** Ports the reference's LIFO scenarios (FIXTURES.md A5;
  * reference `unit_tests/accounts/test_transactions.py` semantics).
  */
class LifoSpec extends SparkSpec {

  private def txn(
      t: Long,
      action: String,
      qty: Int,
      value: BigDecimal,
      effect: String = "Credit",
      price: BigDecimal = BigDecimal(1),
      net: BigDecimal = null
  ) = Txn("SYM", t, action, price, value, effect, Option(net).getOrElse(value), qty)

  test("simple open fully accounts the position") {
    val r = Lifo.replay(Seq(txn(1, "Sell to Open", 5, BigDecimal(500))), 5).get
    assert(r.entryCredit == BigDecimal(500))
    assert(r.fees == BigDecimal(0))
    assert(r.weightedPrice.get == BigDecimal(1))
  }

  test("close buffer nets out the most recent opens (open→close→reopen)") {
    // newest-first: reopen 3 @300c, close 2, open 4 @400c
    // position 5: reopen contributes 3; close consumes 2 of the older
    // open, leaving 2 surviving of which 2 are taken.
    val r = Lifo
      .replay(
        Seq(
          txn(3, "Sell to Open", 3, BigDecimal(300)),
          txn(2, "Buy to Close", 2, BigDecimal(999)),
          txn(1, "Sell to Open", 4, BigDecimal(400))
        ),
        5
      )
      .get
    // 300 (full) + 400 * (2/4) = 500
    assert(r.entryCredit == BigDecimal(500))
  }

  test("partial fill consumes pro-rata value and fees") {
    val r = Lifo
      .replay(
        Seq(txn(1, "Sell to Open", 4, BigDecimal(400), net = BigDecimal(396))),
        1
      )
      .get
    assert(r.entryCredit == BigDecimal(100)) // 400 * 1/4
    assert(r.fees == BigDecimal(1)) // |396-400| * 1/4
  }

  test("Debit effect flips the sign") {
    val r = Lifo.replay(Seq(txn(1, "Buy to Open", 2, BigDecimal(200), "Debit")), 2).get
    assert(r.entryCredit == BigDecimal(-200))
  }

  test("incomplete history returns None") {
    assert(Lifo.replay(Seq(txn(1, "Sell to Open", 2, BigDecimal(200))), 5).isEmpty)
  }

  test("zero position short-circuits to zeros") {
    val r = Lifo.replay(Seq(txn(1, "Sell to Open", 2, BigDecimal(200))), 0).get
    assert(r.entryCredit == BigDecimal(0) && r.weightedPrice.isEmpty)
  }

  test("weighted price = sum(price*take)/sum(take)") {
    val r = Lifo
      .replay(
        Seq(
          txn(2, "Sell to Open", 2, BigDecimal(20), price = BigDecimal(10)),
          txn(1, "Sell to Open", 2, BigDecimal(40), price = BigDecimal(20))
        ),
        4
      )
      .get
    assert(r.weightedPrice.get == BigDecimal(15))
  }

  test("distributed entryCredits matches pure replay") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val txns = Seq(
      ("A", 3L, "Sell to Open", 1.0, 300.0, "Credit", 300.0, 3),
      ("A", 2L, "Buy to Close", 1.0, 999.0, "Credit", 999.0, 2),
      ("A", 1L, "Sell to Open", 1.0, 400.0, "Credit", 400.0, 4),
      ("B", 1L, "Sell to Open", 1.0, 100.0, "Credit", 100.0, 1)
    ).toDF("symbol", "executed_at_us", "action", "price", "value", "value_effect", "net_value", "quantity")
    val pos = Seq(("A", 5), ("B", 5)).toDF("symbol", "current_qty") // B incomplete -> dropped
    val out = Lifo.entryCredits(txns, pos).collect()
    assert(out.length == 1)
    val a = out.head
    assert(a.getString(0) == "A")
    assert(a.getDecimal(1).doubleValue() == 500.0)
  }

  test("entryCreditsUniform equals entryCredits over all-symbols constant positions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // mixed shapes: complete accounting (A), incomplete -> dropped (B),
    // close-heavy with buffered closes (C), null action/effect (D) —
    // the uniform fast path must agree on drops, credits, fees, price
    // and counts, not just the happy path
    val txns = Seq(
      ("A", 3L, "Sell to Open", 1.0, 300.0, "Credit", 310.0, 3),
      ("A", 2L, "Buy to Close", 1.0, 999.0, "Credit", 999.0, 2),
      ("A", 1L, "Sell to Open", 1.0, 400.0, "Credit", 402.0, 4),
      ("B", 1L, "Sell to Open", 1.0, 100.0, "Credit", 100.0, 1),
      ("C", 5L, "Buy to Close", 2.0, 50.0, "Debit", 51.0, 2),
      ("C", 4L, "Sell to Open", 3.0, 90.0, "Credit", 90.0, 4),
      ("C", 3L, "Sell to Open", 3.0, 60.0, "Credit", 61.5, 3),
      ("D", 2L, null, 1.0, 10.0, "Credit", 10.0, 9),
      ("D", 1L, "Buy to Open", 1.0, 20.0, null, 21.0, 5)
    ).toDF("symbol", "executed_at_us", "action", "price", "value", "value_effect", "net_value", "quantity")
    val pos = txns.select("symbol").distinct().withColumn("current_qty", lit(5))
    val general = Lifo.entryCredits(txns, pos).orderBy("symbol").collect().toSeq
    val uniform = Lifo.entryCreditsUniform(txns, 5).orderBy("symbol").collect().toSeq
    assert(uniform == general)
    assert(uniform.nonEmpty) // the equality must not be vacuous
  }

  test("large history streams with early exit: 200k-fill symbol, O(1) state") {
    import spark.implicits._
    // newest fill fully accounts the position; the 200k-row older tail
    // must only be counted — the streamed fold never buffers it
    val n = 200000
    val newest = Seq(("H", (n + 1).toLong, "Sell to Open", 1.0, 500.0, "Credit", 500.0, 5))
    val tail = (1 to n).map(i => ("H", i.toLong, "Sell to Open", 1.0, 100.0, "Credit", 100.0, 1))
    val txns = (newest ++ tail)
      .toDF("symbol", "executed_at_us", "action", "price", "value", "value_effect", "net_value", "quantity")
    val pos = Seq(("H", 5)).toDF("symbol", "current_qty")
    val out = Lifo.entryCredits(txns, pos).collect()
    assert(out.length == 1)
    assert(out.head.getDecimal(1).doubleValue() == 500.0) // newest open only
    assert(out.head.getInt(4) == n + 1) // transaction_count still counts the tail
  }

  test("NULL action/value_effect rows classify as other/Debit, never NPE (row driver == Txn path)") {
    import spark.implicits._
    val txns = Seq(
      ("A", 4L, "Sell to Open", 1.0, 300.0, "Credit", 300.0, 3),
      ("A", 3L, null, 1.0, 999.0, "Credit", 999.0, 9), // null action -> 'other': counted, never netted
      ("A", 2L, "Buy to Open", 1.0, 200.0, null, 200.0, 2), // null effect -> Debit sign
      ("A", 1L, "Sell to Open", 1.0, 400.0, "Credit", 400.0, 4)
    ).toDF("symbol", "executed_at_us", "action", "price", "value", "value_effect", "net_value", "quantity")
    val pos = Seq(("A", 5)).toDF("symbol", "current_qty")
    val out = Lifo.entryCredits(txns, pos).collect()
    assert(out.length == 1)
    // 3 @ Credit 300 + 2 @ Debit 200 = +300 - 200 = 100
    assert(out.head.getDecimal(1).doubleValue() == 100.0)
    assert(out.head.getInt(4) == 4) // the null-action row still counts
  }

  test("fee intermediate survives |net - value| >= 10^12 (the decimal(19,6) difference)") {
    import spark.implicits._
    // two legitimate (18,6)-bounded inputs whose DIFFERENCE needs
    // precision 19: value 9e11, net −9e11 → fee 1.8e12. Re-casting the
    // difference through dec(18,6) overflowed it to NULL (non-ANSI) and
    // NPE'd in getLong on the executor; the wide micros path keeps it
    // exact (1.8e18 micros < Long.MaxValue).
    val txns = Seq(
      ("W", 1L, "Sell to Open", 1.0, 9.0e11, "Credit", -9.0e11, 5)
    ).toDF("symbol", "executed_at_us", "action", "price", "value", "value_effect", "net_value", "quantity")
    val pos = Seq(("W", 5)).toDF("symbol", "current_qty")
    val out = Lifo.entryCredits(txns, pos).collect()
    assert(out.length == 1)
    assert(out.head.getDecimal(2).doubleValue() == 1.8e12) // fees column, exact
  }

  test("replayStream on a pre-sorted iterator equals replay on the same data") {
    val ts = Seq(
      txn(3, "Sell to Open", 3, BigDecimal(300)),
      txn(2, "Buy to Close", 2, BigDecimal(999)),
      txn(1, "Sell to Open", 4, BigDecimal(400))
    )
    val viaSeq = Lifo.replay(ts, 5)
    val viaStream = Lifo.replayStream("SYM", ts.iterator, 5) // already newest-first
    assert(viaSeq == viaStream)
  }
}
