package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.indicators.Indicators

class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vs: Seq[Double]) =
    vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }.toDF("key", "t", "v")

  test("paddedWma matches hand-computed reference semantics") {
    // reference momentum.py:10-40: values [10,20], period 3, pad 10:
    // i=0: [10,10,10]·[1,2,3]/6 = 10 ; i=1: [10,10,20]·[1,2,3]/6 = 15
    val w = Window.partitionBy($"key").orderBy($"t")
    val out = series(Seq(10.0, 20.0))
      .withColumn("wma", Indicators.paddedWmaCol($"v", lit(10.0), 3, w))
      .orderBy("t")
      .select("wma")
      .as[Double]
      .collect()
    assert(out.toSeq == Seq(10.0, 15.0))
  }

  test("emaSeeded matches hand-computed recursion") {
    // alpha=1/3, seed=first value=1: [1, 4/3, 17/9]
    val out = Indicators
      .withEmaSeeded(series(Seq(1.0, 2.0, 3.0)), "key", Seq("t"), "v", None, 5, "ema")
      .orderBy("t")
      .select("ema")
      .as[Double]
      .collect()
      .toSeq
    val a = 2.0 / 6.0
    val e0 = a * 1.0 + (1 - a) * 1.0
    val e1 = a * 2.0 + (1 - a) * e0
    val e2 = a * 3.0 + (1 - a) * e1
    assert(out == Seq(e0, e1, e2))
  }

  test("explicit seed column is honored") {
    val df = series(Seq(1.0, 2.0)).withColumn("seed", lit(10.0))
    val out = Indicators
      .withEmaSeeded(df, "key", Seq("t"), "v", Some("seed"), 5, "ema")
      .orderBy("t")
      .select("ema")
      .as[Double]
      .collect()
    val a = 2.0 / 6.0
    assert(out(0) == a * 1.0 + (1 - a) * 10.0)
  }

  test("constant series is a fixed point of wma/hull/ema") {
    for ((c, n) <- Seq((7.5, 3), (-42.0, 12), (0.0, 8), (1e6, 19))) {
      val df = series(Seq.fill(n)(c))
      val hull = Indicators
        .withHull(df, "key", Seq("t"), "v", 8, None)
        .select("hma")
        .as[Double]
        .collect()
      assert(hull.forall(_ == c))
      val ema = Indicators
        .withEmaSeeded(df, "key", Seq("t"), "v", None, 5, "ema")
        .select("ema")
        .as[Double]
        .collect()
      assert(ema.forall(v => math.abs(v - c) < 1e-9))
    }
  }

  test("macd on constant series: value 0, histogram colors settle dark-red") {
    val out = Indicators
      .withMacd(series(Seq.fill(5)(7.0)), "key", Seq("t"), "v", None, 4, 8, 3)
      .orderBy("t")
      .select("macd_value", "avg", "diff", "diff_color")
      .collect()
    out.foreach { r =>
      assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    }
    // first row: diff not > 0 -> bright red; later: diff==prev -> dark red
    assert(out.head.getString(3) == "#FE0000")
    assert(out.tail.forall(_.getString(3) == "#7E0100"))
  }

  test("fold state resets across keys (no leakage between symbols)") {
    val df = Seq(("a", 0L, 100.0), ("b", 1L, 1.0)).toDF("key", "t", "v")
    val out = Indicators
      .withEmaSeeded(df, "key", Seq("t"), "v", None, 5, "ema")
      .orderBy("key")
      .select("ema")
      .as[Double]
      .collect()
    // each key seeds from its own first value -> identity on first row
    assert(out.toSeq == Seq(100.0, 1.0))
  }

  test("hull direction colors: rising series turns Up after warmup") {
    val out = Indicators
      .withHull(series((1 to 20).map(_.toDouble)), "key", Seq("t"), "v", 8, None)
      .orderBy("t")
      .select("hma_color")
      .as[String]
      .collect()
    assert(out.head == "Down") // NaN-comparison semantics on first row
    assert(out.drop(5).forall(_ == "Up"))
  }
}
