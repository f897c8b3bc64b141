package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functions

/** Typed event model (SURVEY §1.4, reference
  * `messaging/models/events.py:56-207` + account models): case classes
  * for the Dataset API boundary, DECLARED StructTypes for the hot path
  * (schemas are never inferred — the reference generates its wire field
  * list from the model, `configurations.py:42-46`), and the ingest
  * normalization every inbound float passes through (F1: NaN/±Inf →
  * null, 10dp).
  *
  * Timestamps are UTC instants (`TimestampType` with the session pinned
  * to UTC); money stays Decimal in the accounting models — the
  * reference's float/Decimal split is preserved.
  */
object Events {

  case class TradeEvent(eventSymbol: String, time: Timestamp, price: Option[Double], dayVolume: Option[Double], size: Option[Double])

  case class QuoteEvent(eventSymbol: String, bidPrice: Option[Double], askPrice: Option[Double], bidSize: Option[Double], askSize: Option[Double])

  case class GreeksEvent(
      eventSymbol: String, time: Timestamp, volatility: Option[Double], delta: Option[Double],
      gamma: Option[Double], theta: Option[Double], rho: Option[Double], vega: Option[Double])

  case class ProfileEvent(
      eventSymbol: String, description: Option[String], shortSaleRestriction: Option[String],
      tradingStatus: Option[String], statusReason: Option[String], haltStartTime: Option[Timestamp],
      haltEndTime: Option[Timestamp], highLimitPrice: Option[Double], lowLimitPrice: Option[Double],
      high52WeekPrice: Option[Double], low52WeekPrice: Option[Double])

  case class SummaryEvent(
      eventSymbol: String, openInterest: Option[Double], dayOpenPrice: Option[Double],
      dayHighPrice: Option[Double], dayLowPrice: Option[Double], prevDayClosePrice: Option[Double])

  case class CandleEvent(
      eventSymbol: String, time: Timestamp, eventFlags: Option[Int], index: Option[Long],
      sequence: Option[Long], count: Option[Long], open: Option[Double], high: Option[Double],
      low: Option[Double], close: Option[Double], volume: Option[Double], bidVolume: Option[Double],
      askVolume: Option[Double], openInterest: Option[Double], vwap: Option[Double],
      impVolatility: Option[Double])

  case class TradeSignal(
      eventSymbol: String, startTime: Timestamp, signalType: String, direction: String,
      engine: String, hullDirection: String, hullValue: Double, macdValue: Double,
      macdSignal: Double, macdHistogram: Double, closePrice: Double, trigger: String)

  import org.apache.spark.sql.Encoders

  /** Declared schema for a model type, derived once from the case class
    * (compile-time shape, no runtime inference over data).
    */
  def schemaOf[T: org.apache.spark.sql.Encoder]: StructType =
    implicitly[org.apache.spark.sql.Encoder[T]].schema

  val candleSchema: StructType = schemaOf[CandleEvent](Encoders.product[CandleEvent])
  val quoteSchema: StructType = schemaOf[QuoteEvent](Encoders.product[QuoteEvent])
  val greeksSchema: StructType = schemaOf[GreeksEvent](Encoders.product[GreeksEvent])
  val tradeSchema: StructType = schemaOf[TradeEvent](Encoders.product[TradeEvent])
  val profileSchema: StructType = schemaOf[ProfileEvent](Encoders.product[ProfileEvent])
  val summarySchema: StructType = schemaOf[SummaryEvent](Encoders.product[SummaryEvent])

  /** F10 — kebab-case broker fields → snake_case columns (reference
    * `utils/helpers.py:7-13`).
    */
  def kebabToSnake(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.replace('-', '_')): _*)

  /** F1 — normalize every DoubleType column in place (NaN/±Inf → null,
    * round 10dp) — the reference applies this to all inbound floats
    * (`events.py:10-14,37-53`).
    */
  def normalizeDoubles(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (d, StructField(name, DoubleType, _, _)) =>
        d.withColumn(name, Functions.normalizeFloat(col(name)))
      case (d, _) => d
    }

  /** F14 serialize direction — flatten a typed frame to the
    * Influx-point shape (reference `accounts/models.py:57-127`
    * `InfluxMixin.for_influx`): scalar columns pass through; nested
    * structs/arrays/maps become JSON strings (in a typed frame the
    * complex columns ARE the reference's declared `INFLUX_JSON_FIELDS`
    * plus its unexpected-non-scalar catch-all); timestamps/dates become
    * ISO-8601 strings (fractional seconds omitted when zero, like
    * Python's `isoformat`); `timeField`, when set and timestamp-typed,
    * is KEPT as a timestamp under the column name `time` (the point
    * timestamp); `exclude`d columns are dropped.
    *
    * Pure projection — schema-driven at plan time, codegen'd `to_json`
    * / `date_format` at run time, no shuffle.
    */
  def toInfluxShape(
      df: DataFrame,
      timeField: String = "",
      exclude: Set[String] = Set.empty
  ): DataFrame = {
    def iso(c: Column): Column = {
      val base = date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
      val frac = date_format(c, "SSSSSS")
      when(c.isNull, lit(null).cast("string"))
        .when(frac === "000000", base)
        .otherwise(concat(base, lit("."), frac))
    }
    val cols = df.schema.fields.toSeq.collect {
      case StructField(name, _, _, _) if exclude.contains(name) => Seq.empty[Column]
      case StructField(name, TimestampType, _, _) if name == timeField =>
        Seq(col(name).as("time"))
      case StructField(name, TimestampType, _, _) => Seq(iso(col(name)).as(name))
      case StructField(name, DateType, _, _)      => Seq(date_format(col(name), "yyyy-MM-dd").as(name))
      case StructField(name, _: StructType, _, _) => Seq(to_json(col(name)).as(name))
      case StructField(name, _: ArrayType, _, _)  => Seq(to_json(col(name)).as(name))
      case StructField(name, _: MapType, _, _)    => Seq(to_json(col(name)).as(name))
      case StructField(name, _, _, _)             => Seq(col(name))
    }.flatten
    df.select(cols: _*)
  }

  /** Typed ingest: JSON-lines/parquet → declared schema → normalized →
    * Dataset[CandleEvent].
    */
  def candles(spark: SparkSession, df: DataFrame): Dataset[CandleEvent] = {
    import spark.implicits._
    normalizeDoubles(kebabToSnake(df)).as[CandleEvent]
  }
}
