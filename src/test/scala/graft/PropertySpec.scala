package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.accounts.Lifo
import graft.accounts.Lifo.Txn
import graft.indicators.Indicators

/** Property-style invariants over deterministic pseudo-random scenarios
  * (SURVEY §5.1: WMA/EMA invariants, LIFO conservation).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("LIFO pro-rata rounding == BigDecimal.divide(6, HALF_UP) on the exact rational") {
    val rng = new Random(7)
    (1 to 300).foreach { trial =>
      val q = 1 + rng.nextInt(50)
      val c = 1 + rng.nextInt(q) // partial take: fraction c/q
      val v = BigDecimal(BigInt(rng.nextInt(100000000)), rng.nextInt(7)) // scale 0..6
      val net = v + BigDecimal(BigInt(rng.nextInt(100000)), 4)
      val r = Lifo
        .replay(Seq(Txn("S", 1L, "Sell to Open", BigDecimal(1), v, "Credit", net, q)), c)
        .get
      def exact(x: BigDecimal): BigDecimal = BigDecimal(
        x.bigDecimal
          .multiply(new java.math.BigDecimal(c))
          .divide(new java.math.BigDecimal(q), 6, java.math.RoundingMode.HALF_UP))
      assert(r.entryCredit == exact(v), s"trial $trial: credit v=$v c=$c q=$q")
      assert(r.fees == exact((net - v).abs), s"trial $trial: fees v=$v net=$net c=$c q=$q")
    }
  }

  test("F19 differential: column humanization == a direct Scala model on random durations") {
    // Scala model of the column expressions' CONTRACT (reference
    // format_uptime divmod shapes; age_display buckets with half-up on
    // the exact rational — the documented CPython-ties deviation)
    def upModel(s: Long): String = {
      val d = s / 86400; val h = s % 86400 / 3600; val m = s % 3600 / 60
      if (d > 0) s"${d}d ${h}h ${m}m" else if (h > 0) s"${h}h ${m}m" else s"${m}m"
    }
    def ageModel(a: Option[Long]): String = a match {
      case None => "unknown"
      case Some(a) =>
        def up0(den: Long) = (2 * a + den) / (2 * den)
        def up1(den: Long) = { val t = (20 * a + den) / (2 * den); s"${t / 10}.${t % 10}" }
        if (a < 60) s"${up0(1)}s ago"
        else if (a < 3600) s"${up0(60)}m ago"
        else if (a < 86400) s"${up1(3600)}h ago"
        else s"${up1(86400)}d ago"
    }
    val rng = new Random(19)
    // log-uniform draw so every branch (s/m/h/d, all three uptime
    // shapes) gets real mass, plus the exact bucket boundaries ±1
    val edges = Seq(0L, 59L, 60L, 3599L, 3600L, 86399L, 86400L)
    val draws = (1 to 2000).map(_ => math.floor(math.pow(10, rng.nextDouble() * 7)).toLong) ++
      edges ++ edges.map(_ + 1) ++ edges.filter(_ > 0).map(_ - 1)
    val ages = draws.map(v => if (rng.nextInt(20) == 0) None else Some(v))
    val got = draws.zip(ages).toDF("up", "age")
      .select(
        graft.functions.Functions.formatUptime($"up").as("u"),
        graft.functions.Functions.ageDisplay($"age").as("a"))
      .as[(String, String)]
      .collect()
    draws.zip(ages).zip(got).foreach { case ((up, age), (gu, ga)) =>
      assert(gu == upModel(up), s"uptime $up: got $gu want ${upModel(up)}")
      assert(ga == ageModel(age), s"age $age: got $ga want ${ageModel(age)}")
    }
  }

  test("parse helpers are ANSI-safe on arbitrary junk: null on non-matching shape, never a throw") {
    // Spark 4 runs ANSI mode by default, where a bare cast of a failed
    // regex extract THROWS — every parse helper guards with try_cast or
    // a match-gate (Functions.scala occ* doc). Pin that contract on
    // random garbage: evaluation completes, and non-matching inputs are
    // null, not errors.
    val rng = new Random(23)
    val junkChars = "ABC019{}=/\\.$^ -%sCP"
    val junk = (1 to 400).map { _ =>
      val len = rng.nextInt(24)
      (1 to len).map(_ => junkChars(rng.nextInt(junkChars.length))).mkString
    } ++ Seq("", "260320C", "123456X99", "{=}", "{=1}", "/", "1w", "99zz", "SPY   260320C00510000")
    val F = graft.functions.Functions
    val out = junk.toDF("s")
      .select(
        $"s",
        F.occExpiry($"s").as("exp"),
        F.occType($"s").as("typ"),
        F.occStrike($"s").as("strike"),
        F.intervalToMillis($"s").as("ms"),
        F.candleTicker(F.stripCandleInterval($"s")).as("ticker"),
        F.safeFloat($"s").as("sf")
      )
      .collect() // the assertion: ANSI evaluation completes on every row
    assert(out.length == junk.length)
    val occShaped = """.*(\d{6})([CP])(.+)$""".r
    out.foreach { r =>
      val s = r.getString(0)
      if (occShaped.findFirstIn(s).isEmpty)
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3), s"non-OCC '$s' parsed to non-null")
      if (!s.matches(""".*\d.*""") && !s.matches(""".*[smhdw]$"""))
        assert(r.isNullAt(4), s"junk interval '$s' produced millis ${r.get(4)}")
    }
    // and the canonical OCC symbol still parses through the same path
    val occ = out.find(_.getString(0).endsWith("C00510000")).get
    assert(!occ.isNullAt(1) && occ.getString(2) == "C" && occ.getDouble(3) == 510.0)
  }

  test("LIFO conservation: consumed quantity exactly accounts the position") {
    val rng = new Random(42)
    (1 to 50).foreach { trial =>
      val nTxns = 1 + rng.nextInt(8)
      val txns = (1 to nTxns).map { i =>
        val qty = 1 + rng.nextInt(5)
        val open = rng.nextBoolean()
        Txn(
          "S", i.toLong,
          if (open) (if (rng.nextBoolean()) "Sell to Open" else "Buy to Open")
          else (if (rng.nextBoolean()) "Buy to Close" else "Sell to Close"),
          BigDecimal(1 + rng.nextInt(100)), BigDecimal(qty * 100), "Credit",
          BigDecimal(qty * 100), qty
        )
      }
      val currentQty = 1 + rng.nextInt(10)
      Lifo.replay(txns, currentQty) match {
        case Some(res) =>
          // weighted price is an average of traded prices -> within range
          res.weightedPrice.foreach { wp =>
            val prices = txns.map(_.price)
            assert(wp >= prices.min && wp <= prices.max, s"trial $trial: $wp outside ${prices.min}..${prices.max}")
          }
          // value conservation: per-unit credit can never exceed the max
          // per-unit value of any open (all values here are qty*100 -> 100/unit)
          assert(res.entryCredit <= BigDecimal(currentQty * 100), s"trial $trial")
        case None => // surviving opens don't cover the position — legal outcome
      }
    }
  }

  test("padded WMA stays within [min, max] of values+pad (convexity)") {
    val rng = new Random(7)
    val vals = Seq.fill(40)(rng.nextDouble() * 200 - 100)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }.toDF("key", "t", "v")
    val w = Window.partitionBy($"key").orderBy($"t")
    val pad = 5.0
    val out = df
      .withColumn("wma", Indicators.paddedWmaCol($"v", lit(pad), 7, w))
      .select("wma")
      .as[Double]
      .collect()
    val lo = math.min(vals.min, pad) - 1e-9
    val hi = math.max(vals.max, pad) + 1e-9
    assert(out.forall(x => x >= lo && x <= hi))
  }

  test("seeded EMA converges to a constant tail regardless of head") {
    val rng = new Random(13)
    val head = Seq.fill(20)(rng.nextDouble() * 100)
    val series = head ++ Seq.fill(300)(42.0)
    val df = series.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }.toDF("key", "t", "v")
    val last = Indicators
      .withEmaSeeded(df, "key", Seq("t"), "v", None, 5, "ema")
      .orderBy($"t".desc)
      .select("ema")
      .as[Double]
      .head()
    assert(math.abs(last - 42.0) < 1e-9)
  }

  test("null close rows pass through fold indicators as nulls (no NPE, state intact)") {
    val df = Seq(
      ("k", 0L, Option.empty[Double]), // null FIRST row — the seed must wait
      ("k", 1L, Some(10.0)),
      ("k", 2L, Option.empty[Double]),
      ("k", 3L, Some(10.0))
    ).toDF("key", "t", "v")
    val out = Indicators
      .withEmaSeeded(df, "key", Seq("t"), "v", None, 5, "ema")
      .orderBy("t")
      .select("ema")
      .collect()
      .map(r => Option(r.get(0)))
    assert(out(0).isEmpty && out(2).isEmpty)
    assert(out(1).contains(10.0) && out(3).contains(10.0))
  }

  test("dedupePositions invariants: one row per symbol, idempotent, streamer copy always wins") {
    val rng = new Random(7)
    val types = Seq("Equity", "Equity Option", "Future")
    val rows = (1 to 300).map { i =>
      val sym = s"S${rng.nextInt(40)}"
      val t = types(rng.nextInt(3))
      val ss = if (rng.nextBoolean()) null else s".X$sym"
      (i.toLong, sym, ss, t, 1.0 + rng.nextInt(5), if (rng.nextBoolean()) "Long" else "Short", 1.0)
    }
    val df = rows.toDF("row_id", "symbol", "streamer_symbol", "instrument_type", "quantity", "quantity_direction", "multiplier")
    val out = graft.metrics.Metrics.dedupePositions(df, "row_id")
    val collected = out.collect()
    // one row per surviving symbol
    assert(collected.map(_.getAs[String]("symbol")).distinct.length == collected.length)
    // idempotent: a second pass changes nothing
    val twice = graft.metrics.Metrics.dedupePositions(out, "row_id").collect()
    assert(twice.map(_.getAs[String]("symbol")).sorted.toSeq == collected.map(_.getAs[String]("symbol")).sorted.toSeq)
    // whenever ANY copy of a symbol carried a streamer_symbol, the winner must too
    val hadSs = rows.filter(_._3 != null).map(_._2).toSet
    collected.filter(r => hadSs(r.getAs[String]("symbol"))).foreach { r =>
      assert(r.getAs[String]("streamer_symbol").startsWith(".X"), s"lost streamer copy for $r")
    }
    // no surviving non-equity row without a streamer symbol
    collected.foreach { r =>
      assert(r.getAs[String]("streamer_symbol") != null)
    }
  }

  test("lshNearDupPairs is sound: every emitted pair is exact-verified above threshold") {
    val rng = new Random(11)
    val vecs = (0 until 120).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = graft.similarity.Similarity
      .lshNearDupPairs(df, "vec_id", "embedding", threshold = 0.3, bits = 2, tables = 6)
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cos") >= 0.3)
    }
    // and soundness vs the exact verifier: LSH pairs ⊆ exact pairs
    val exact = graft.similarity.Similarity
      .cosineNearDupPairs(df, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert((lsh -- exact).isEmpty)
  }

  test("toInfluxShape: every output column is flat (scalar/string), no nested types survive") {
    import org.apache.spark.sql.types._
    val df = Seq((1L, Seq(1, 2), Map("a" -> 1), ("x", 2.0)))
      .toDF("id", "arr", "m", "st")
      .withColumn("ts", current_timestamp())
      .withColumn("d", current_date())
    val out = graft.model.Events.toInfluxShape(df, timeField = "ts")
    out.schema.fields.foreach {
      case StructField(name, _: StructType | _: ArrayType | _: MapType, _, _) =>
        fail(s"nested type survived serialization: $name")
      case StructField("time", TimestampType, _, _) => // the kept point timestamp
      case StructField(_, TimestampType, _, _) =>
        fail("non-time timestamp should have become an ISO string")
      case _ => ()
    }
    assert(out.columns.contains("time"))
  }
}
