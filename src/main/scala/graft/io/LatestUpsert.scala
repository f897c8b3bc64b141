package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** S5 at lake scale — the reference's Redis latest-value table
  * (`HSET tastytrade:latest:{EventType} symbol json`,
  * `messaging/processors/redis.py:26-38`; in-memory dedup
  * `messaging/processors/default.py:62-68`) as an incrementally
  * MAINTAINED parquet artifact: one row per key, updated batch-by-batch
  * with bucket-pruned rewrites instead of full-table overwrites.
  *
  * [[Sinks.writeLatest]] is the snapshot form (recompute + overwrite —
  * fine when the WHOLE keyspace is in every batch). This is the
  * incremental form a 100 TB event stream needs: each batch touches a
  * tiny fraction of keys, so rewriting the full latest table per batch
  * is O(keyspace) wasted IO. Layout: rows partitioned by
  * `kb = pmod(xxhash64(key), buckets)` with the bucket count in an
  * in-root `_config` sidecar (the minhash/IVF index discipline — layout
  * parameters live WITH the artifact so writer and prober cannot
  * drift).
  *
  * Per-batch merge, in order:
  *   1. assign each batch row its deterministic key bucket (scan-local);
  *   2. collect the batch's TOUCHED bucket set (bounded by `buckets`,
  *      a driver-side isin literal — the `ivfTopKIndexed` move);
  *   3. read ONLY those bucket directories of the existing table
  *      (planning-time partition pruning, spec-pinned);
  *   4. per-key `max_by(row, (orderCols))` over existing ∪ batch —
  *      latest-wins with a TOTAL deterministic order;
  *   5. `localCheckpoint` (the merge reads the files it is about to
  *      replace — an eagerly materialized result severs that lineage,
  *      the [[graft.streaming.DedupIngest.ingestBatch]] hazard);
  *   6. dynamic-partition OVERWRITE of just the touched directories.
  *
  * Replay semantics: STRONGER than the dedup gates' at-least-once —
  * the merge is idempotent at the row level (max is associative,
  * commutative, idempotent), so a replayed or crash-interrupted batch
  * re-merges to the IDENTICAL bucket content; batch ORDER between
  * disjoint key sets is immaterial, and for the same key the
  * (orderCols) max is order-free by construction. The end state after
  * any interleaving of upserts equals the one-shot latest-per-key over
  * the union of all rows ever upserted — which is exactly what the
  * DuckDB oracle recomputes.
  *
  * 100 TB shape: the existing-table read scans touched buckets only
  * (batch-key-spread-bounded IO, never O(keyspace)); the merge
  * shuffles ONLY those buckets' rows plus the batch (one exchange on
  * the key); the rewrite IO is the same touched subset. `buckets`
  * bounds the bucket directory count the way the dedup indexes' bucket
  * knobs do — size it so a bucket's latest rows fit an executor
  * comfortably (keyspace/buckets rows, one row per key).
  */
object LatestUpsert {

  /** Initialize the artifact from a seed event set (possibly empty):
    * latest-per-key of the seed, bucket-partitioned, plus the
    * `_config` sidecar.
    */
  def init(
      spark: SparkSession,
      root: String,
      seed: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      buckets: Int = 64
  ): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // a zero-row partitioned write leaves NO parquet footers, so the
    // artifact would be unreadable (schema can't be inferred) — to
    // start from nothing, seed with the first batch instead
    require(!seed.isEmpty, "seed must be non-empty; bootstrap with the first batch as the seed")
    import spark.implicits._
    latestPerKey(withBucket(seed, keyCols, buckets), keyCols, orderCols)
      .write
      .mode("overwrite")
      .partitionBy("kb")
      .parquet(s"$root/latest")
    Seq((buckets, keyCols.mkString(","), orderCols.mkString(",")))
      .toDF("buckets", "key_cols", "order_cols")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$root/_config")
  }

  private def readConfig(spark: SparkSession, root: String): (Int, Seq[String], Seq[String]) = {
    val r = spark.read.parquet(s"$root/_config").collect().head
    (r.getInt(0), r.getString(1).split(",").toSeq, r.getString(2).split(",").toSeq)
  }

  private def withBucket(df: DataFrame, keyCols: Seq[String], buckets: Int): DataFrame =
    df.withColumn("kb", pmod(xxhash64(keyCols.map(col): _*), lit(buckets.toLong)).cast("int"))

  /** One row per key: `max_by(full row, (orderCols struct))`. The order
    * struct must be a TOTAL order per key (e.g. (ts, event_id)) or
    * latest-wins is not well-defined — same contract as
    * [[graft.ops.Relational.latestPerKey]], which this mirrors on the
    * bucketed layout.
    */
  private def latestPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keyCols.contains)
    df.groupBy(keyCols.map(col): _*)
      .agg(
        max_by(
          struct(payload.map(col): _*),
          struct(orderCols.map(col): _*)
        ).as("latest")
      )
      .select(keyCols.map(col) ++ payload.map(c => col(s"latest.$c").as(c)): _*)
  }

  /** The merge PLAN for one batch (pre-materialization), with the
    * touched bucket set: package-visible so the pruning spec can lint
    * the exact plan [[upsert]] executes. None when the batch is empty.
    */
  private[graft] def mergedForBatch(
      spark: SparkSession,
      root: String,
      batch: DataFrame
  ): Option[(DataFrame, Seq[Int])] = {
    val (buckets, keyCols, orderCols) = readConfig(spark, root)
    val b = withBucket(batch, keyCols, buckets)
    // bounded driver collect: ≤ `buckets` distinct values by construction
    val touched = b.select("kb").distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) None
    else {
      val existing = spark.read
        .parquet(s"$root/latest")
        .filter(col("kb").isin(touched: _*)) // planning-time partition pruning
      Some((latestPerKey(existing.unionByName(b), keyCols, orderCols), touched))
    }
  }

  /** Merge one batch of events into the artifact. Key/order columns and
    * the bucket count come from the sidecar — the caller cannot drift
    * from the layout.
    */
  def upsert(spark: SparkSession, root: String, batch: DataFrame): Unit =
    mergedForBatch(spark, root, batch).foreach { case (merged, _) =>
      val m = merged.localCheckpoint() // severs lineage from the files overwritten below
      m.write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic") // rewrite touched dirs ONLY
        .partitionBy("kb")
        .parquet(s"$root/latest")
      m.unpersist(blocking = false) // checkpoint blocks are write-scoped
    }

  /** The queryable latest-value table (bucket column dropped — layout is
    * an implementation detail of the artifact, not its schema).
    */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/latest").drop("kb")

  /** Streaming entry: maintain the artifact from a stream via
    * `foreachBatch` — the same merge, so streaming ≡ sequential
    * [[upsert]] calls (and replay-idempotent per the merge semantics).
    */
  def start(source: DataFrame, root: String, checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch.sparkSession, root, batch)
      }
      .start()
}
