package graft.indicators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Technical-indicator kernels (SURVEY §2.5 W1-W4), re-expressed for
  * Spark's execution model.
  *
  * Numeric contract: these reproduce the reference's seeding semantics
  * (reference `analytics/indicators/momentum.py`) with a *defined*
  * floating-point evaluation order — a left-to-right weighted sum for the
  * WMA and a left fold for the EMA — so a DuckDB oracle evaluating the
  * same expression order matches bit-for-bit.
  *
  * Scale notes: the WMA family is pure window expressions
  * (whole-stage-codegen'd, one shuffle per key + in-partition sort).
  * The EMA family is an order-dependent recursion, which no frame-window
  * aggregate expresses; it runs as a single-pass per-key fold over
  * key-sorted partitions (`repartition` + `sortWithinPartitions` +
  * `mapPartitions`) — O(n) per key, streaming, no group materialization,
  * which is the 100 TB-safe shape (contrast with `collect_list`-based
  * formulations that buffer whole series per key).
  */
object Indicators {

  /** Padded weighted MA (reference `momentum.py:10-40`): weights 1..p with
    * the current row weighted p; positions before the series head read
    * `padCol` (ThinkOrSwim-style seeding).
    *
    * Expression shape (defined evaluation order, codegen-friendly):
    * {{{ (p*v + (p-1)*lag(v,1) + ... + 1*lag(v,p-1)) / (p(p+1)/2) }}}
    */
  def paddedWmaCol(value: Column, pad: Column, period: Int, w: WindowSpec): Column = {
    require(period >= 1)
    val terms = (0 until period).map { k =>
      val weight = period - k
      val v = if (k == 0) value else coalesce(lag(value, k).over(w), pad)
      lit(weight.toDouble) * v
    }
    val num = terms.reduceLeft(_ + _)
    num / lit((period * (period + 1) / 2).toDouble)
  }

  /** Hull MA (reference `momentum.py:43-98`):
    * HMA = WMA(2·WMA(v, round(p/2)) − WMA(v, p), round(√p)), all three
    * WMAs padded with the same `padCol` (the reference pads the final
    * smoothing with the *price* pad, not the first diff — preserved).
    * Adds `hma` and `hma_color` ("Up" iff hma > previous hma, first row
    * "Down", matching numpy NaN-comparison semantics).
    */
  def withHull(
      df: DataFrame,
      key: String,
      order: Seq[String],
      valueCol: String,
      length: Int,
      padCol: Option[Column]
  ): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
    val half = math.round(length / 2.0).toInt
    val sqrtLen = math.round(math.sqrt(length.toDouble)).toInt
    val v = col(valueCol)
    // reference default: pad with the first value of the series
    val pad = padCol.getOrElse(first(v).over(w))
    val diff = lit(2.0) * paddedWmaCol(v, pad, half, w) - paddedWmaCol(v, pad, length, w)
    val withDiff = df.withColumn("__hull_diff", diff)
    val hma = paddedWmaCol(col("__hull_diff"), pad, sqrtLen, w)
    withDiff
      .withColumn("hma", hma)
      .withColumn(
        "hma_color",
        when(col("hma") > lag(col("hma"), 1).over(w), "Up").otherwise("Down")
      )
      .drop("__hull_diff")
  }

  /** Seeded EMA (reference `momentum.py:101-113`):
    * out(0) = α·v(0) + (1−α)·seed; out(i) = α·v(i) + (1−α)·out(i−1),
    * α = 2/(length+1). Order-dependent recursion → single-pass fold over
    * key-sorted partitions. `seedCol` must be constant within a key.
    *
    * Null values propagate (null out, state unchanged) — the reference
    * operates on dense numpy arrays and has no null story.
    */
  def withEmaSeeded(
      df: DataFrame,
      key: String,
      order: Seq[String],
      valueCol: String,
      seedCol: Option[String],
      length: Int,
      outCol: String
  ): DataFrame = {
    val alpha = 2.0 / (length + 1.0)
    withFold(df, key, order, valueCol, seedCol, outCol) { (acc, v) =>
      alpha * v + (1 - alpha) * acc
    }
  }

  /** Generic seeded left-fold over per-key time order: the engine's
    * primitive for every order-dependent recursion (EMA here; the same
    * machinery backs streaming-state twins). Partition by key, sort
    * within partitions by (key, order), stream rows updating one double
    * of state per key.
    */
  def withFold(
      df: DataFrame,
      key: String,
      order: Seq[String],
      valueCol: String,
      seedCol: Option[String],
      outCol: String
  )(step: (Double, Double) => Double): DataFrame = {
    val sorted = df
      .repartition(col(key))
      .sortWithinPartitions((key +: order).map(col): _*)
    val outSchema = StructType(sorted.schema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val keyIdx = sorted.schema.fieldIndex(key)
    val valIdx = sorted.schema.fieldIndex(valueCol)
    val seedIdx = seedCol.map(sorted.schema.fieldIndex)
    sorted.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var seeded = false
      var acc: Double = 0.0
      rows.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k
          started = true
          seeded = false
        }
        val out: Any =
          if (r.isNullAt(valIdx)) null // null propagates, state unchanged
          else {
            if (!seeded) {
              // seed: explicit per-key column, else first NON-NULL value
              acc = seedIdx.fold(r.getDouble(valIdx))(r.getDouble)
              seeded = true
            }
            acc = step(acc, r.getDouble(valIdx))
            acc
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(outSchema))
  }

  /** MACD with EMA seeding (reference `momentum.py:116-193`). Adds
    * `macd_value` (fast−slow EMA; renamed from the reference's `Value` to
    * avoid colliding with input columns), `avg` (signal EMA, seed 0.0),
    * `diff` (histogram) and `diff_color` (4-shade rule, strict
    * comparisons). `priorCloseCol` seeds both EMAs and must be constant
    * per key; the reference's `prior_close=None` fallback (first non-null
    * close) is the caller's responsibility.
    *
    * All three EMA recursions + histogram + color run in ONE streaming
    * pass over key-sorted partitions (single shuffle) — the recursions
    * chain row-locally, so no intermediate materialization is needed.
    *
    * OUTPUT CONTRACT: rows come back key-partitioned and
    * (key, order)-sorted — the fold's own repartition + in-partition
    * sort survives the order-preserving `mapPartitions`. Downstream
    * per-key folds (the signal engine) compose on this contract
    * directly instead of re-shuffling; Catalyst cannot prove the
    * invariant through `mapPartitions`, so a caller-side repartition
    * would plan a REDUNDANT exchange + sort.
    */
  def withMacd(
      df: DataFrame,
      key: String,
      order: Seq[String],
      valueCol: String,
      priorCloseCol: Option[String],
      fastLength: Int = 12,
      slowLength: Int = 26,
      macdLength: Int = 9,
      prePartitioned: Boolean = false
  ): DataFrame = {
    val aF = 2.0 / (fastLength + 1.0)
    val aS = 2.0 / (slowLength + 1.0)
    val aM = 2.0 / (macdLength + 1.0)
    val outNames = Seq("macd_value", "avg", "diff", "diff_color")
    require(df.columns.intersect(outNames).isEmpty, s"input must not contain ${outNames.mkString(",")}")
    // prePartitioned: the caller guarantees rows are already
    // key-partitioned (e.g. straight out of a window over the same key);
    // the explicit repartition would plan a redundant Exchange Catalyst
    // can't remove. The in-partition sort stays either way (cheap on
    // sorted input, and the fold's correctness depends on it).
    val base = if (prePartitioned) df else df.repartition(col(key))
    val sorted = base
      .sortWithinPartitions((key +: order).map(col): _*)
    val outSchema = StructType(
      sorted.schema.fields ++ Seq(
        StructField("macd_value", DoubleType, nullable = true),
        StructField("avg", DoubleType, nullable = true),
        StructField("diff", DoubleType, nullable = true),
        StructField("diff_color", org.apache.spark.sql.types.StringType, nullable = true)
      )
    )
    val keyIdx = sorted.schema.fieldIndex(key)
    val valIdx = sorted.schema.fieldIndex(valueCol)
    val seedIdx = priorCloseCol.map(sorted.schema.fieldIndex)
    sorted.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var seeded = false
      var fast, slow, signal = 0.0
      var prevDiff = Double.NaN
      var first = true
      rows.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k
          started = true
          seeded = false
        }
        val base = r.toSeq
        if (r.isNullAt(valIdx)) Row.fromSeq(base ++ Seq(null, null, null, null))
        else {
          if (!seeded) {
            // seed from the explicit column, else the first NON-NULL value
            val seed = seedIdx.fold(r.getDouble(valIdx))(r.getDouble)
            fast = seed; slow = seed; signal = 0.0
            prevDiff = Double.NaN; first = true
            seeded = true
          }
          val v = r.getDouble(valIdx)
          fast = aF * v + (1 - aF) * fast
          slow = aS * v + (1 - aS) * slow
          val value = fast - slow
          signal = aM * value + (1 - aM) * signal
          val diff = value - signal
          // 4-shade histogram color (reference momentum.py:164-183)
          val color =
            if (first) { if (diff > 0) "#04FE00" else "#FE0000" }
            else if (diff > 0) { if (diff > prevDiff) "#04FE00" else "#006401" }
            else { if (diff < prevDiff) "#FE0000" else "#7E0100" }
          prevDiff = diff
          first = false
          Row.fromSeq(base ++ Seq(value, signal, diff, color))
        }
      }
    }(Encoders.row(outSchema))
  }
}
