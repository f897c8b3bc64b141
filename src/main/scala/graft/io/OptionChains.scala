package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested option-chain flattener (SURVEY S8, reference
  * `market/option_chains.py:32-141`): the REST payload nests
  * roots → expirations → strikes → {call, put}; analytics want one row
  * per option contract.
  *
  * Spark shape: `from_json` with a declared schema → two `explode`s →
  * call/put unpivot via `stack` — all Catalyst-native generators, so
  * column pruning still reaches the JSON parser (Spark prunes unread
  * struct fields from `from_json`).
  */
object OptionChains {

  val chainSchema: StructType = StructType(Seq(
    StructField("underlying", StringType),
    StructField("root", StringType),
    StructField("expirations", ArrayType(StructType(Seq(
      StructField("expiration_date", StringType),
      StructField("days_to_expiration", IntegerType),
      StructField("settlement_type", StringType),
      StructField("strikes", ArrayType(StructType(Seq(
        StructField("strike_price", StringType),
        StructField("call", StringType),
        StructField("put", StringType)
      ))))
    ))))
  ))

  /** One row per option: (underlying, root, expiration_date: date, dte,
    * settlement_type, strike: decimal(12,3), option_type C|P, symbol).
    * Strikes missing a side (null call/put symbol) drop that side only.
    */
  def flatten(chains: DataFrame, jsonCol: String = "json"): DataFrame =
    chains
      .select(from_json(col(jsonCol), chainSchema).as("c"))
      .select(col("c.underlying").as("underlying"), col("c.root").as("root"), explode(col("c.expirations")).as("e"))
      .select(
        col("underlying"),
        col("root"),
        to_date(col("e.expiration_date")).as("expiration_date"),
        col("e.days_to_expiration").as("days_to_expiration"),
        col("e.settlement_type").as("settlement_type"),
        explode(col("e.strikes")).as("s")
      )
      .select(
        col("underlying"),
        col("root"),
        col("expiration_date"),
        col("days_to_expiration"),
        col("settlement_type"),
        col("s.strike_price").cast(DecimalType(12, 3)).as("strike"),
        expr("stack(2, 'C', s.call, 'P', s.put) as (option_type, symbol)")
      )
      .filter(col("symbol").isNotNull)
}
