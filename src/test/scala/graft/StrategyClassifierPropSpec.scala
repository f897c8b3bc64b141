package graft

import java.time.LocalDate

import scala.util.Random

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.strategies.Strategies
import graft.strategies.Strategies.{Match, ParsedLeg}

/** ScalaCheck differential invariants for the greedy strategy
  * classifier (SURVEY §2.11, reference `classifier.py:104-163`) —
  * the example-based StrategiesSpec pins the reference's canonical
  * cases; this spec pins the ALGORITHM's contract over random
  * portfolios:
  *
  *  1. conservation — every input leg is consumed by exactly one match
  *     (by object identity, the same discipline as the classifier's
  *     reference-equality removal);
  *  2. precedence exhaustion — no higher-priority pattern hides in the
  *     legs that lower-priority matchers (or the single-leg fallback)
  *     ended up consuming: re-running matcher i on exactly that residue
  *     pool must find nothing;
  *  3. permutation invariance THROUGH THE PIPELINE'S CANONICALIZATION —
  *     raw greedy first-match is order-sensitive by design (like the
  *     reference, which walks dict order); the distributed classifier
  *     makes the outcome deterministic by sorting on the unique symbol
  *     first (`Strategies.classify` sortWithinPartitions). A pinned
  *     counterexample demonstrates the sort is load-bearing, and the
  *     Spark-level shuffle test drives permuted ROW ARRIVAL ORDERS
  *     through the real shuffle/sort machinery;
  *  4. arity + fallback — multi-leg matches carry their pattern's exact
  *     leg count and name; single-leg matches carry matchSingleLeg's
  *     name for their leg.
  */
class StrategyClassifierPropSpec extends AnyFunSuite with SparkSpec {

  // ----- generators -------------------------------------------------

  private val exp1 = LocalDate.of(2026, 9, 18)
  private val exp2 = LocalDate.of(2026, 10, 16)

  private val genStrike: Gen[Option[BigDecimal]] =
    Gen.frequency(
      9 -> Gen.oneOf(90, 95, 100, 105, 110).map(s => Some(BigDecimal(s))),
      1 -> Gen.const(None)
    )
  private val genExp: Gen[Option[LocalDate]] =
    Gen.frequency(9 -> Gen.oneOf(Some(exp1), Some(exp2)), 1 -> Gen.const(None))
  private val genQty: Gen[Double] =
    for { q <- Gen.oneOf(1, 2, 4); s <- Gen.oneOf(-1, 1) } yield (q * s).toDouble

  private val genOptionLeg: Gen[ParsedLeg] = for {
    ot <- Gen.oneOf("C", "P")
    k <- genStrike
    e <- genExp
    q <- genQty
  } yield ParsedLeg("O", "U", "Equity Option", q, Some(ot), k, e)

  private val genStockLeg: Gen[ParsedLeg] = for {
    q <- genQty
    it <- Gen.oneOf("Equity", "Cryptocurrency")
  } yield ParsedLeg("S", "U", it, q * 100, None, None, None)

  /** 0–8 legs; symbols made unique per position (the pipeline contract:
    * symbol is the canonical per-leg key) and every leg a fresh object
    * (identity matters to the classifier's removal step).
    */
  private val genPortfolio: Gen[List[ParsedLeg]] = for {
    n <- Gen.choose(0, 8)
    legs <- Gen.listOfN(n, Gen.frequency(5 -> genOptionLeg, 1 -> genStockLeg))
  } yield legs.zipWithIndex.map { case (l, i) => l.copy(symbol = s"${l.symbol}$i") }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // name → (matcher priority index, expected leg count); names are
  // unique per matcher, so a match's producing stage is recoverable
  private val multiLegArity: Map[String, (Int, Int)] = Map(
    "IRON_CONDOR" -> (0, 4), "IRON_BUTTERFLY" -> (1, 4), "IRON_BROKEN_FLY" -> (2, 4),
    "COVERED_JADE_LIZARD" -> (3, 4), "BIG_LIZARD" -> (4, 3),
    "CALL_BUTTERFLY" -> (5, 3), "PUT_BUTTERFLY" -> (6, 3), "BROKEN_FLY" -> (7, 3),
    "JADE_LIZARD" -> (8, 3), "COLLAR" -> (9, 3),
    "COVERED_CALL" -> (10, 2), "PROTECTIVE_PUT" -> (11, 2),
    "BULL_CALL_SPREAD" -> (12, 2), "BEAR_CALL_SPREAD" -> (12, 2),
    "BEAR_PUT_SPREAD" -> (12, 2), "BULL_PUT_SPREAD" -> (12, 2),
    "RATIO_SPREAD" -> (13, 2),
    "LONG_STRADDLE" -> (14, 2), "SHORT_STRADDLE" -> (14, 2),
    "LONG_STRANGLE" -> (15, 2), "SHORT_STRANGLE" -> (15, 2),
    "SYNTHETIC_LONG" -> (16, 2), "SYNTHETIC_SHORT" -> (16, 2),
    "CALENDAR_SPREAD" -> (17, 2), "DIAGONAL_SPREAD" -> (18, 2)
  )

  private def isSingle(m: Match): Boolean = !multiLegArity.contains(m.strategyType)

  // ----- 1. conservation --------------------------------------------

  test("every leg is consumed by exactly one match (identity multiset equality)") {
    check(Prop.forAll(genPortfolio) { legs =>
      val out = Strategies.classifyGroup("U", legs)
      val outLegs = out.flatMap(_.legs)
      val ids = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[ParsedLeg, java.lang.Boolean]())
      legs.foreach(ids.add)
      outLegs.size == legs.size && outLegs.forall(ids.remove) && ids.isEmpty
    })
  }

  // ----- 2. precedence exhaustion -----------------------------------

  test("no matcher can still match the legs that lower-priority stages consumed") {
    check(Prop.forAll(genPortfolio) { legs =>
      val out = Strategies.classifyGroup("U", legs)
      val consumedAtStage: Match => Int =
        m => if (isSingle(m)) Int.MaxValue else multiLegArity(m.strategyType)._1
      Strategies.multiLegMatchers.indices.forall { i =>
        // residue pool after stage i, in input order (the classifier's
        // filterNot preserves it)
        val later = java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[ParsedLeg, java.lang.Boolean]())
        out.filter(m => consumedAtStage(m) > i).flatMap(_.legs).foreach(later.add)
        val pool = legs.filter(later.contains)
        Strategies.multiLegMatchers(i)(pool).isEmpty
      }
    })
  }

  // ----- 3. permutation invariance ----------------------------------
  // NOTE deliberately NOT a pure-Scala forAll: with unique symbols,
  // "shuffle then sort by symbol" reconstructs the identical list, so
  // such a property only restates determinism. The meaningful
  // permutation surface is ROW ARRIVAL ORDER through the distributed
  // pipeline (shuffle + sortWithinPartitions) — the Spark-level test
  // below — plus the pinned counterexample showing the sort is what
  // buys the invariance.

  test("raw greedy matching IS order-sensitive — the pipeline's symbol sort is load-bearing") {
    // {short C100, long C105, short C110}: first-seen vertical pair
    // decides BEAR vs BULL call spread — same greedy semantics as the
    // reference; this is WHY Strategies.classify sorts before matching
    def leg(sym: String, q: Double, strike: Int) =
      ParsedLeg(sym, "U", "Equity Option", q, Some("C"), Some(BigDecimal(strike)), Some(exp1))
    val sC100 = leg("a", -1, 100); val lC105 = leg("b", 1, 105); val sC110 = leg("c", -1, 110)
    val t1 = Strategies.classifyGroup("U", List(sC100, lC105, sC110)).map(_.strategyType).toSet
    val t2 = Strategies.classifyGroup("U", List(lC105, sC110, sC100)).map(_.strategyType).toSet
    assert(t1 == Set("BEAR_CALL_SPREAD", "NAKED_CALL"))
    assert(t2 == Set("BULL_CALL_SPREAD", "NAKED_CALL"))
  }

  test("distributed classify is deterministic across input row orders") {
    val rng = new Random(5)
    val rows = (0 until 40).map { i =>
      val isStock = i % 7 == 0
      (
        f"L$i%02d", s"U${i / 8}",
        if (isStock) "Equity" else "Equity Option",
        (if (i % 2 == 0) 1.0 else -1.0) * (1 + i % 3),
        if (isStock) null else (if (i % 3 == 0) "C" else "P"),
        if (isStock) null else new java.math.BigDecimal(90 + 5 * (i % 5)),
        if (isStock) null else java.sql.Date.valueOf(if (i % 4 < 2) exp1 else exp2)
      )
    }
    def run(order: Seq[Int]) = {
      import spark.implicits._
      val df = order
        .map(rows)
        .toDF("symbol", "underlying", "instrument_type", "signed_quantity", "option_type", "strike", "expiration")
        .withColumn("strike", org.apache.spark.sql.functions.col("strike").cast("decimal(18,4)"))
      Strategies
        .classify(spark, df)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getSeq[String](3).toList))
        .sortBy(_.toString)
        .toList
    }
    val base = run(0 until 40)
    (1 to 3).foreach { t =>
      assert(run(rng.shuffle((0 until 40).toList)) == base, s"shuffle $t diverged")
    }
  }

  // ----- 4. arity + single-leg fallback -----------------------------

  test("multi-leg matches carry their pattern's exact arity; singles carry matchSingleLeg's name") {
    check(Prop.forAll(genPortfolio) { legs =>
      val out = Strategies.classifyGroup("U", legs)
      out.forall { m =>
        if (isSingle(m))
          m.legs.size == 1 && m.strategyType == Strategies.matchSingleLeg(m.legs.head)
        else
          m.legs.size == multiLegArity(m.strategyType)._2
      }
    })
  }
}
