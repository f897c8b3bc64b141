package graft

import org.apache.spark.sql.functions._
import graft.backtest.Backtest
import graft.io.Tables
import graft.ops.Relational

/** End-to-end backtest slice (SURVEY §5.4): events → candle series →
  * indicators → signal engine → as-of entry enrichment.
  */
class BacktestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pricing = Tables
    .events(spark, sf0001)
    .select(col("user_id").cast("string").as("symbol"), $"ts_us".as("time_us"), $"value".as("close"))

  // signal interval = last value per 30-minute bucket
  private lazy val signalCandles = Relational
    .latestPerKey(
      pricing.withColumn("bucket_us", expr("(time_us div 1800000000) * 1800000000")),
      Seq("symbol", "bucket_us"),
      "time_us",
      "time_us"
    )
    .select($"symbol", $"bucket_us".as("time_us"), $"close")

  test("mergeReplay orders pricing before signal candles on ties") {
    val merged = Backtest.mergeReplay(pricing, signalCandles).limit(1000).collect()
    val byTime = merged.groupBy(_.getAs[Long]("time_us"))
    byTime.values.foreach { rows =>
      val ranks = rows.map(_.getAs[Int]("interval_rank")).toSeq
      assert(ranks == ranks.sorted)
    }
  }

  test("backtest slice: every signal gets the as-of pricing entry price") {
    val out = Backtest.run(signalCandles, pricing, hullLength = 8, fast = 4, slow = 8, signalLen = 3)
    val rows = out.select("symbol", "time_us", "signal_type", "entry_price").collect()
    assert(rows.nonEmpty)
    // entry price must equal the max-time pricing close <= signal time
    val pricingLocal = pricing
      .as[(String, Long, Double)]
      .collect()
      .groupBy(_._1)
      .map { case (s, vs) => s -> vs.sortBy(_._2) }
    rows.foreach { r =>
      val expected = pricingLocal(r.getString(0)).takeWhile(_._2 <= r.getLong(1)).lastOption.map(_._3)
      assert(Option(r.get(3)) == expected, s"row $r")
    }
  }

  test("warmup-days rule matches the reference table (replay.py:27-39)") {
    assert(Backtest.warmupDays("1d") == 45)
    assert(Backtest.warmupDays("d") == 45)
    assert(Backtest.warmupDays("1h") == 5)
    assert(Backtest.warmupDays("h") == 5)
    assert(Backtest.warmupDays("5m") == 3)
    assert(Backtest.warmupDays("1m") == 3)
    assert(Backtest.warmupStartUs(1_000_000_000_000L, "h") == 1_000_000_000_000L - 5L * 86_400_000_000L)
  }

  test("warmup changes the signals scored just inside the range") {
    // cut mid-series: with warmup, indicators enter the scored range
    // carrying the pre-range recursion state; a cold start recomputes
    // them from an empty window and must diverge
    val times = signalCandles.select("time_us").as[Long].collect().sorted
    val cut = times(times.length / 2)
    def sigSet(df: org.apache.spark.sql.DataFrame) = df
      .select("symbol", "time_us", "signal_type", "direction")
      .as[(String, Long, String, String)].collect().toSet

    val warm = sigSet(Backtest.run(
      signalCandles, pricing, hullLength = 8, fast = 4, slow = 8, signalLen = 3,
      scoreFromUs = Some(cut)))
    val cold = sigSet(Backtest.run(
      signalCandles.filter($"time_us" >= cut), pricing,
      hullLength = 8, fast = 4, slow = 8, signalLen = 3))

    assert(warm.forall(_._2 >= cut)) // nothing scored inside the warmup window
    assert(warm.nonEmpty)
    assert(warm != cold, "cold-start signals should diverge from warmed signals")

    // warm scoring == the full-series run restricted to the scored range
    val full = sigSet(Backtest.run(signalCandles, pricing, hullLength = 8, fast = 4, slow = 8, signalLen = 3))
    assert(warm == full.filter(_._2 >= cut))
  }
}
