package graft.accounts

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LIFO entry-credit replay (reference `accounts/transactions.py:158-232`,
  * SURVEY A8): walk a symbol's fills newest→oldest, net out closes
  * against opens, consume surviving opens pro-rata until the current
  * position quantity is accounted for; emit the entry credit, fees and
  * weighted per-unit price of the identified fills.
  *
  * This is an order-sensitive fold with cross-row netting — NOT a
  * commutative aggregate — so it runs as a per-symbol fold over
  * key-sorted partitions (same engine shape as
  * [[graft.indicators.Indicators.withFold]]): one shuffle on symbol,
  * streaming within each key, O(1) state. Money stays `BigDecimal`
  * end-to-end (DecimalType(18,6)) — the reference deliberately keeps
  * accounting off floats.
  */
object Lifo {

  val OpenActions: Set[String] = Set("Sell to Open", "Buy to Open")
  val CloseActions: Set[String] = Set("Buy to Close", "Sell to Close")

  /** One fill, newest-first ordered within a symbol. */
  case class Txn(
      symbol: String,
      executedAtUs: Long,
      action: String,
      price: BigDecimal,
      value: BigDecimal,
      valueEffect: String,
      netValue: BigDecimal,
      quantity: Int
  )

  case class LifoResult(
      symbol: String,
      entryCredit: BigDecimal,
      fees: BigDecimal,
      weightedPrice: Option[BigDecimal],
      transactionCount: Int
  )

  /** Pure-Scala replay of one symbol's transactions (any order; sorted
    * internally newest-first like the reference). Returns None when the
    * surviving opens cannot account for `currentQty` (incomplete
    * history), matching the reference's null result.
    */
  def replay(txns: Seq[Txn], currentQty: Int): Option[LifoResult] =
    replayStream(
      txns.headOption.map(_.symbol).getOrElse(""),
      txns.sortBy(t => (-t.executedAtUs, -t.quantity)).iterator,
      currentQty
    )

  /** Money grid: inputs live on a 6-dp lattice (DecimalType(18,6)); the
    * fold converts each amount to exact integer micro-units.
    */
  private def micros(x: BigDecimal): BigInt =
    BigInt(x.bigDecimal.setScale(6, java.math.RoundingMode.HALF_UP).movePointRight(6).toBigIntegerExact)

  /** `round(n/d)` to the nearest integer, ties away from zero — the
    * same rule as `BigDecimal.setScale(HALF_UP)`, on an exact rational.
    */
  private def halfUp(n: BigInt, d: BigInt): BigInt =
    if (n.signum >= 0) (n * 2 + d) / (d * 2) else -(((-n) * 2 + d) / (d * 2))

  /** Streaming replay over a newest-first iterator: O(1) state, and —
    * the scale property — EARLY EXIT once the position is fully
    * accounted (`remaining == 0`): the (often long) older tail of the
    * history is then only counted, never materialized as `Txn` objects.
    * A pathological symbol with millions of fills costs a scan, not
    * heap. The distributed driver feeds this directly from the
    * sort-within-partitions row stream.
    *
    * Arithmetic is EXACT: the pro-rata fractions (`take/qty`) ride
    * gcd-reduced BigInt rationals and the result is rounded ONCE, to
    * the 6-dp money grid (HALF_UP), at the very end. An earlier
    * formulation rounded each fraction to 34 significant digits
    * (`MathContext.DECIMAL128`, mirroring the reference's
    * decimal-context arithmetic); that leaves the sum a hair off any
    * exact rounding boundary it should land on (observed: a fees sum
    * whose true value was exactly ....6875, rounded down instead of
    * up), so results depended on intermediate precision. Exact
    * rationals keep accounting off floats AND make the fold
    * bit-reproducible by any exact implementation.
    */
  def replayStream(symbol: String, sortedNewestFirst: Iterator[Txn], currentQty: Int): Option[LifoResult] = {
    val it = sortedNewestFirst
    var count = 0
    if (currentQty == 0) {
      while (it.hasNext) { it.next(); count += 1 }
      return Some(LifoResult(symbol, BigDecimal(0), BigDecimal(0), None, count))
    }
    var remaining = math.abs(currentQty)
    var closeBuffer = 0
    // entry credit and fees as exact rationals in micro-units
    var enN = BigInt(0); var enD = BigInt(1)
    var feeN = BigInt(0); var feeD = BigInt(1)
    var priceXQty = BigInt(0)
    var totalQty = 0
    while (it.hasNext && remaining != 0) {
      val txn = it.next()
      count += 1
      val qty = txn.quantity
      if (CloseActions.contains(txn.action)) {
        closeBuffer += qty
      } else if (OpenActions.contains(txn.action)) {
        val consumed = math.min(qty, closeBuffer)
        closeBuffer -= consumed
        val surviving = qty - consumed
        val take = math.min(surviving, remaining)
        if (take > 0) {
          val q = BigInt(qty)
          val t = BigInt(take)
          val sign = if (txn.valueEffect == "Credit") 1 else -1
          enN = enN * q + micros(txn.value) * sign * t * enD
          enD = enD * q
          val g1 = enN.gcd(enD); if (g1 > 1) { enN /= g1; enD /= g1 }
          feeN = feeN * q + micros((txn.netValue - txn.value).abs) * t * feeD
          feeD = feeD * q
          val g2 = feeN.gcd(feeD); if (g2 > 1) { feeN /= g2; feeD /= g2 }
          priceXQty += micros(txn.price) * t
          totalQty += take
          remaining -= take
        }
      }
    }
    // early-exited: count the tail for transaction_count without
    // retaining anything
    while (it.hasNext) { it.next(); count += 1 }
    if (remaining != 0) None
    else {
      val wp =
        if (totalQty > 0) Some(BigDecimal(halfUp(priceXQty, BigInt(totalQty)), 6))
        else None
      Some(LifoResult(symbol, BigDecimal(halfUp(enN, enD), 6), BigDecimal(halfUp(feeN, feeD), 6), wp, count))
    }
  }

  val outputSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("entry_credit", DecimalType(18, 6)),
    StructField("fees", DecimalType(18, 6)),
    StructField("weighted_price", DecimalType(18, 6), nullable = true),
    StructField("transaction_count", IntegerType)
  ))

  /** Distributed driver: `txns` needs columns (symbol, executed_at_us,
    * action, price, value, value_effect, net_value, quantity);
    * `positions` maps symbol → current absolute quantity. Symbols whose
    * history cannot account for the position are dropped (reference
    * returns None and skips the symbol).
    *
    * Shape: repartition by symbol, sort within partitions newest-first,
    * stream each symbol's run through [[replay]] — the sort replaces the
    * reference's in-memory `sorted(..., reverse=True)` and the engine
    * spills if a symbol's history is huge.
    */
  def entryCredits(txns: DataFrame, positions: DataFrame): DataFrame = {
    val joined = txns
      .join(positions.select(col("symbol"), col("current_qty")), Seq("symbol"))
      .select(
        col("symbol"),
        col("executed_at_us").cast("long"),
        col("action"),
        col("price").cast("decimal(18,6)"),
        col("value").cast("decimal(18,6)"),
        col("value_effect"),
        col("net_value").cast("decimal(18,6)"),
        col("quantity").cast("int"),
        col("current_qty").cast("int")
      )
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("executed_at_us").desc, col("quantity").desc)
    joined.mapPartitions { rows =>
      // Per-symbol runs stream straight from the sorted row iterator into
      // replayStream — no history Vector: the replay early-exits once the
      // position is accounted and the run's tail is only counted, so a
      // symbol's heap cost is O(1) regardless of its fill count.
      val buf = rows.buffered
      val results = new Iterator[Option[Row]] {
        def hasNext: Boolean = buf.hasNext
        def next(): Option[Row] = {
          val sym = buf.head.getString(0)
          val qty = buf.head.getInt(8)
          val run: Iterator[Txn] = new Iterator[Txn] {
            def hasNext: Boolean = buf.hasNext && buf.head.getString(0) == sym
            def next(): Txn = {
              val r = buf.next()
              Txn(
                r.getString(0), r.getLong(1), r.getString(2),
                BigDecimal(r.getDecimal(3)), BigDecimal(r.getDecimal(4)),
                r.getString(5), BigDecimal(r.getDecimal(6)), r.getInt(7)
              )
            }
          }
          val res = replayStream(sym, run, qty)
          // replayStream exhausts the run on every path (tail counting);
          // the grouping invariant depends on it
          assert(!run.hasNext, s"replayStream left $sym's run unconsumed")
          res.map { r =>
            Row(
              sym,
              r.entryCredit.setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal,
              r.fees.setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal,
              r.weightedPrice.map(_.setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal).orNull,
              r.transactionCount
            )
          }
        }
      }
      results.flatten
    }(Encoders.row(outputSchema))
  }
}
