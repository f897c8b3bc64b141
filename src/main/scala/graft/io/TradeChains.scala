package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functions

/** Trade-chain tree flattener (reference `accounts/models.py:995-1147`
  * TradeChain → lite_nodes → legs/entries/market snapshots, and
  * `computed-data.open-entries`): the nested OrderChain JSON becomes
  * four flat relations the analytics join on —
  *
  *   - nodes: one row per lifecycle node (opens/closes/rolls with fees)
  *   - legs: one row per order leg (J5 feed)
  *   - snapshots: per-symbol greeks at execution + node net greeks
  *     (the J7 correlation is the (chain_id, occurred_at) equi-join)
  *   - openEntries: current open position entries (J5/J9 feed)
  *
  * All declared-schema `from_json` + explode — Catalyst prunes unread
  * branches of the JSON parse.
  */
object TradeChains {

  private val entryType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("instrument-type", StringType),
    StructField("quantity", StringType),
    StructField("quantity-type", StringType),
    StructField("quantity-numeric", StringType)
  ))

  private val legType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("instrument-type", StringType),
    StructField("action", StringType),
    StructField("fill-quantity", StringType),
    StructField("order-quantity", StringType)
  ))

  private val marketDataType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("delta", StringType),
    StructField("theta", StringType),
    StructField("bid", StringType),
    StructField("ask", StringType)
  ))

  private val nodeType = StructType(Seq(
    StructField("node-type", StringType),
    StructField("id", StringType),
    StructField("description", StringType),
    StructField("occurred-at", StringType),
    StructField("total-fees", StringType),
    StructField("total-fees-effect", StringType),
    StructField("total-fill-cost", StringType),
    StructField("total-fill-cost-effect", StringType),
    StructField("roll", BooleanType),
    StructField("legs", ArrayType(legType)),
    StructField("entries", ArrayType(entryType)),
    StructField("market-state-snapshot", StructType(Seq(
      StructField("market-datas", ArrayType(marketDataType)),
      StructField("total-delta", StringType),
      StructField("total-theta", StringType)
    )))
  ))

  val chainSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("description", StringType),
    StructField("underlying-symbol", StringType),
    StructField("computed-data", StructType(Seq(
      StructField("open", BooleanType),
      StructField("total-fees", StringType),
      StructField("total-fees-effect", StringType),
      StructField("realized-gain", StringType),
      StructField("realized-gain-effect", StringType),
      StructField("realized-gain-with-fees", StringType),
      StructField("realized-gain-with-fees-effect", StringType),
      StructField("roll-count", IntegerType),
      StructField("open-entries", ArrayType(entryType))
    ))),
    StructField("lite-nodes", ArrayType(nodeType))
  ))

  private def parsed(chains: DataFrame, jsonCol: String) =
    chains.select(from_json(col(jsonCol), chainSchema).as("c"))

  def nodes(chains: DataFrame, jsonCol: String = "json"): DataFrame =
    parsed(chains, jsonCol)
      .select(col("c.id").as("chain_id"), col("c.`underlying-symbol`").as("underlying"), explode(col("c.`lite-nodes`")).as("n"))
      .select(
        col("chain_id"),
        col("underlying"),
        col("n.`node-type`").as("node_type"),
        col("n.id").as("node_id"),
        col("n.description").as("description"),
        to_timestamp(col("n.`occurred-at`")).as("occurred_at"),
        Functions.applyEffect(col("n.`total-fees`").cast("decimal(18,6)"), col("n.`total-fees-effect`")).as("total_fees"),
        Functions.applyEffect(col("n.`total-fill-cost`").cast("decimal(18,6)"), col("n.`total-fill-cost-effect`")).as("total_fill_cost"),
        coalesce(col("n.roll"), lit(false)).as("roll")
      )

  def legs(chains: DataFrame, jsonCol: String = "json"): DataFrame =
    parsed(chains, jsonCol)
      .select(col("c.id").as("chain_id"), explode(col("c.`lite-nodes`")).as("n"))
      .select(col("chain_id"), col("n.id").as("node_id"), to_timestamp(col("n.`occurred-at`")).as("occurred_at"), explode(col("n.legs")).as("l"))
      .select(
        col("chain_id"),
        col("node_id"),
        col("occurred_at"),
        col("l.symbol").as("symbol"),
        col("l.`instrument-type`").as("instrument_type"),
        col("l.action").as("action"),
        col("l.`fill-quantity`").cast("double").as("fill_quantity")
      )

  /** J7 — per-symbol execution greeks alongside the node's NET greeks
    * at the identical (chain, occurred_at) instant (reference
    * `accounts/orchestrator.py:155-234`).
    *
    * The correlation key is node identity (a lite-node row), NOT the
    * instant: two nodes in one chain can share an occurred-at timestamp
    * but differ in net greeks. Because each exploded node row already
    * carries BOTH its market-datas array and its net greeks, the
    * correlation needs no self-join at all — the net columns ride
    * through the market-data explode. The earlier formulation
    * (perLeg ⋈ distinct(net) on (chain_id, node_id)) shuffled and
    * re-parsed the chain JSON once per join branch for the identical
    * row set (r13 plan audit: 2 full + 2 pruned `from_json` per chain
    * row, a BroadcastExchange and a distinct aggregate — all for a
    * join that reunites columns of the SAME source row).
    */
  def snapshots(chains: DataFrame, jsonCol: String = "json"): DataFrame =
    parsed(chains, jsonCol)
      .select(col("c.id").as("chain_id"), explode(col("c.`lite-nodes`")).as("n"))
      .select(
        col("chain_id"),
        col("n.id").as("node_id"),
        to_timestamp(col("n.`occurred-at`")).as("occurred_at"),
        col("n.`market-state-snapshot`.`market-datas`").as("mds"),
        col("n.`market-state-snapshot`.`total-delta`").cast("double").as("net_delta"),
        col("n.`market-state-snapshot`.`total-theta`").cast("double").as("net_theta")
      )
      .filter(col("mds").isNotNull)
      .select(
        col("chain_id"),
        col("node_id"),
        col("occurred_at"),
        explode(col("mds")).as("md"),
        col("net_delta"),
        col("net_theta")
      )
      .select(
        col("chain_id"),
        col("node_id"),
        col("occurred_at"),
        col("md.symbol").as("symbol"),
        col("md.delta").cast("double").as("delta"),
        col("md.theta").cast("double").as("theta"),
        col("net_delta"),
        col("net_theta")
      )

  def openEntries(chains: DataFrame, jsonCol: String = "json"): DataFrame =
    parsed(chains, jsonCol)
      .select(
        col("c.id").as("chain_id"),
        col("c.`underlying-symbol`").as("underlying"),
        col("c.`computed-data`.open").as("open"),
        explode(col("c.`computed-data`.`open-entries`")).as("e")
      )
      .select(
        col("chain_id"),
        col("underlying"),
        col("open"),
        col("e.symbol").as("symbol"),
        col("e.`quantity-numeric`").cast("double").as("signed_quantity")
      )

  /** Chain-lifecycle lookup keyed by open-entry symbol (reference
    * `positions.py:653-672`): open chains only, one row per open-entry
    * symbol carrying chain_id / tt_strategy (chain description) / rolls /
    * realized_pnl (`realized-gain-with-fees`, effect-signed) /
    * chain_fees. Where the reference's dict insert order decides which
    * chain wins a shared symbol, we take max(chain_id) for determinism.
    * Feed of [[graft.metrics.Metrics.enrichWithChains]].
    */
  def chainBySymbol(chains: DataFrame, jsonCol: String = "json"): DataFrame =
    parsed(chains, jsonCol)
      .filter(col("c.`computed-data`.open"))
      .select(
        col("c.id").as("chain_id"),
        col("c.description").as("tt_strategy"),
        col("c.`computed-data`.`roll-count`").as("rolls"),
        Functions.applyEffect(
          col("c.`computed-data`.`realized-gain-with-fees`").cast("decimal(18,6)"),
          col("c.`computed-data`.`realized-gain-with-fees-effect`")
        ).as("realized_pnl"),
        Functions.applyEffect(
          col("c.`computed-data`.`total-fees`").cast("decimal(18,6)"),
          col("c.`computed-data`.`total-fees-effect`")
        ).as("chain_fees"),
        explode(col("c.`computed-data`.`open-entries`")).as("e")
      )
      .select(
        trim(col("e.symbol")).as("symbol"),
        col("chain_id"), col("tt_strategy"), col("rolls"), col("realized_pnl"), col("chain_fees")
      )
      .groupBy("symbol")
      .agg(
        max_by(
          struct(col("chain_id"), col("tt_strategy"), col("rolls"), col("realized_pnl"), col("chain_fees")),
          col("chain_id")
        ).as("c")
      )
      .select(col("symbol"), col("c.*"))

  /** J9/A6 — campaign rollup per underlying from chain computed data:
    * Σ effect-signed realized gain, Σ fees, roll count, open-chain
    * count, recovery = max(0, −net) (reference `positions.py:277-381`).
    */
  def campaignRollup(chains: DataFrame, jsonCol: String = "json"): DataFrame =
    parsed(chains, jsonCol)
      .select(
        col("c.`underlying-symbol`").as("underlying"),
        Functions.applyEffect(col("c.`computed-data`.`realized-gain`").cast("decimal(18,6)"), col("c.`computed-data`.`realized-gain-effect`")).as("realized"),
        Functions.applyEffect(col("c.`computed-data`.`total-fees`").cast("decimal(18,6)"), col("c.`computed-data`.`total-fees-effect`")).as("fees"),
        col("c.`computed-data`.`roll-count`").as("rolls"),
        col("c.`computed-data`.open").cast("int").as("is_open")
      )
      .groupBy("underlying")
      .agg(
        sum("realized").as("total_realized"),
        sum("fees").as("total_fees"),
        sum("rolls").as("total_rolls"),
        sum("is_open").as("open_chains"),
        count(lit(1)).as("n_chains")
      )
      .withColumn("recovery", greatest(lit(BigDecimal(0)), -col("total_realized")))
}
