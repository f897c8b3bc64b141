package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * `kb = pmod(xxhash64(key), buckets)` with the layout parameters in an
  * in-root `_config` sidecar (the minhash/IVF index discipline — layout
  * parameters live WITH the artifact so writer and prober cannot
  * drift). The sidecar also pins the KEY/ORDER COLUMN TYPES of the
  * seed: `xxhash64` hashes by physical type, so a batch whose key
  * column type drifted (INT user_id vs the seed's BIGINT) would bucket
  * the same key value differently and leave two "latest" rows for one
  * key across buckets. [[upsert]] validates every batch against the
  * pinned schema and fails loudly on name or type drift.
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
  *   6. two-phase swap of just the touched directories (below).
  *
  * Commit protocol (crash-safe, roll-forward): the merged buckets are
  * fully staged under `root/_stage`, then a `root/_commit` marker
  * naming the touched buckets is created atomically (temp + rename),
  * and only then is each touched bucket swapped: current dir renamed
  * aside to `root/_oldgen`, staged dir renamed in. A crash anywhere
  * leaves a recoverable state machine:
  *   - before the marker: the half-written stage is garbage; the next
  *     [[upsert]] discards it (no bucket was touched yet);
  *   - after the marker: the stage is complete by construction, so
  *     recovery ROLLS FORWARD — any bucket still in the stage is
  *     swapped in, idempotently, and the old generation is dropped
  *     only after every bucket landed.
  * [[recover]] runs automatically at the start of every [[upsert]];
  * [[read]] FAILS LOUDLY if a commit marker is present rather than
  * serving a half-swapped table. The protocol assumes HDFS-like
  * directory rename (cheap, atomic per rename) — on an object store,
  * map the swap step to a manifest/table-format commit instead (the
  * [[Compaction]] caveat; rename-as-copy would make the crash window
  * proportional to bucket size). Single-writer by contract (the
  * reference's Redis processor is one consumer loop); a concurrent
  * reader during the swap window of a healthy run can observe a bucket
  * mid-rename — run readers through [[read]] after [[recover]] on a
  * separate session if the stream crashed.
  *
  * Replay semantics (for SUCCESSFULLY COMMITTED batches): the merge is
  * idempotent at the row level (max is associative, commutative,
  * idempotent), so a replayed batch re-merges to the IDENTICAL bucket
  * content; batch ORDER between disjoint key sets is immaterial, and
  * for the same key the (orderCols) max is order-free by construction.
  * The end state after any interleaving of committed upserts equals the
  * one-shot latest-per-key over the union of all rows ever upserted —
  * which is exactly what the DuckDB oracle recomputes. A batch
  * interrupted MID-COMMIT is not lost either — the marker + complete
  * stage make the commit re-playable by [[recover]], which is what
  * upgrades row-level idempotence into crash safety.
  *
  * 100 TB shape: the existing-table read scans touched buckets only
  * (batch-key-spread-bounded IO, never O(keyspace)); the merge
  * shuffles ONLY those buckets' rows plus the batch (one exchange on
  * the key); the rewrite IO is the same touched subset. `buckets`
  * bounds the bucket directory count the way the dedup indexes' bucket
  * knobs do — size it so a bucket's latest rows fit an executor
  * comfortably (keyspace/buckets rows, one row per key). Long-running
  * streams leave one file set per touched bucket per batch — compact
  * with [[Compaction.compactLatestTable]] during maintenance windows.
  */
object LatestUpsert {

  /** Initialize the artifact from a seed event set (possibly empty):
    * latest-per-key of the seed, bucket-partitioned, plus the
    * `_config` sidecar pinning (buckets, key/order column names AND
    * types).
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
    def types(cols: Seq[String]): Seq[String] =
      cols.map(c => seed.schema(c).dataType.catalogString)
    // list columns, not comma-joined strings: a column name containing
    // a comma must round-trip; types pinned per column
    Seq((buckets, keyCols, types(keyCols), orderCols, types(orderCols)))
      .toDF("buckets", "key_cols", "key_types", "order_cols", "order_types")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$root/_config")
  }

  private case class Config(
      buckets: Int,
      keyCols: Seq[String],
      keyTypes: Seq[String],
      orderCols: Seq[String],
      orderTypes: Seq[String]
  )

  private def readConfig(spark: SparkSession, root: String): Config = {
    val r = spark.read.parquet(s"$root/_config").collect().head
    Config(
      r.getInt(0),
      r.getSeq[String](1), r.getSeq[String](2),
      r.getSeq[String](3), r.getSeq[String](4))
  }

  /** Fail loudly if `batch` is missing a pinned key/order column or
    * carries it at a drifted type — type drift would silently corrupt
    * bucket assignment (xxhash64 hashes by physical type), leaving two
    * "latest" rows for one key.
    */
  private def validateBatch(batch: DataFrame, cfg: Config): Unit = {
    (cfg.keyCols ++ cfg.orderCols).zip(cfg.keyTypes ++ cfg.orderTypes).foreach {
      case (c, t) =>
        val f = batch.schema.fields.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(
            s"latest-upsert batch is missing pinned column '$c' (artifact schema: " +
              s"keys=${cfg.keyCols.mkString(",")} order=${cfg.orderCols.mkString(",")})"))
        require(
          f.dataType.catalogString == t,
          s"latest-upsert batch column '$c' has type ${f.dataType.catalogString} but the " +
            s"artifact was seeded with $t — type drift changes xxhash64 bucket assignment " +
            "and would silently duplicate keys across buckets; cast the batch to the seed schema")
    }
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
    val cfg = readConfig(spark, root)
    validateBatch(batch, cfg)
    val b = withBucket(batch, cfg.keyCols, cfg.buckets)
    // bounded driver collect: ≤ `buckets` distinct values by construction
    val touched = b.select("kb").distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) None
    else {
      val existing = spark.read
        .parquet(s"$root/latest")
        .filter(col("kb").isin(touched: _*)) // planning-time partition pruning
      Some((latestPerKey(existing.unionByName(b), cfg.keyCols, cfg.orderCols), touched))
    }
  }

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(root: String) = new Path(s"$root/_commit")
  private def stagePath(root: String) = new Path(s"$root/_stage")
  private def oldgenPath(root: String) = new Path(s"$root/_oldgen")

  /** Atomic marker create: content written to a temp path, renamed into
    * place — a reader never observes a half-written marker.
    */
  private def writeMarker(fs: FileSystem, root: String, touched: Seq[Int]): Unit = {
    val tmp = new Path(s"$root/_commit.tmp")
    val out = fs.create(tmp, true)
    try out.write(touched.mkString(",").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, markerPath(root)), s"latest-upsert: could not publish commit marker at $root")
  }

  private def readMarker(fs: FileSystem, root: String): Seq[Int] = {
    val in = fs.open(markerPath(root))
    val s =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    s.split(",").filter(_.nonEmpty).map(_.toInt).toSeq
  }

  /** Swap each touched bucket: current dir aside to `_oldgen`, staged
    * dir in. Idempotent — a bucket whose staged dir is already gone has
    * already landed (recovery re-run) and is skipped.
    */
  private def commitBuckets(fs: FileSystem, root: String, touched: Seq[Int]): Unit = {
    fs.mkdirs(oldgenPath(root))
    touched.foreach { b =>
      val stg = new Path(stagePath(root), s"kb=$b")
      if (fs.exists(stg)) {
        val cur = new Path(s"$root/latest/kb=$b")
        if (fs.exists(cur)) {
          val old = new Path(oldgenPath(root), s"kb=$b")
          fs.delete(old, true) // an interrupted PREVIOUS attempt's copy
          require(fs.rename(cur, old), s"latest-upsert: could not move aside bucket $b at $root")
        }
        require(fs.rename(stg, cur), s"latest-upsert: could not swap in bucket $b at $root")
      }
    }
    // every bucket landed — drop the old generation, then the stage
    // remnants, then the marker LAST (marker present ⇒ re-runnable)
    fs.delete(oldgenPath(root), true)
    fs.delete(stagePath(root), true)
    fs.delete(markerPath(root), true)
  }

  /** Finish or discard an interrupted commit. Marker present ⇒ the
    * stage was complete when the crash hit ⇒ roll FORWARD (idempotent
    * re-run of the bucket swaps). No marker ⇒ any stage/oldgen remnant
    * is pre-marker garbage ⇒ discard. Safe to call any time the writer
    * holds the artifact exclusively; called automatically by [[upsert]].
    */
  def recover(spark: SparkSession, root: String): Unit = {
    val fs = fsOf(spark, root)
    if (fs.exists(markerPath(root))) commitBuckets(fs, root, readMarker(fs, root))
    else {
      fs.delete(stagePath(root), true)
      fs.delete(oldgenPath(root), true)
    }
  }

  /** Merge one batch of events into the artifact. Key/order columns,
    * their pinned types, and the bucket count come from the sidecar —
    * the caller cannot drift from the layout, and a batch with a
    * drifted schema fails loudly instead of corrupting buckets.
    */
  def upsert(spark: SparkSession, root: String, batch: DataFrame): Unit = {
    recover(spark, root) // finish any interrupted commit FIRST
    mergedForBatch(spark, root, batch).foreach { case (merged, touched) =>
      val fs = fsOf(spark, root)
      val m = merged.localCheckpoint() // severs lineage from the files swapped below
      m.write
        .mode("overwrite")
        .partitionBy("kb")
        .parquet(stagePath(root).toString)
      graft.Checkpoints.release(m) // checkpoint blocks are write-scoped (Dataset.unpersist is a checkpoint no-op)
      writeMarker(fs, root, touched) // stage is complete from here on
      commitBuckets(fs, root, touched)
    }
  }

  /** The queryable latest-value table (bucket column dropped — layout is
    * an implementation detail of the artifact, not its schema). Fails
    * loudly on an interrupted commit instead of serving a half-swapped
    * table: run [[recover]] (writer-exclusive) first.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    require(
      !fsOf(spark, root).exists(markerPath(root)),
      s"latest-value table at $root has an unfinished commit (crash mid-swap) — " +
        "call LatestUpsert.recover(spark, root) before reading")
    spark.read.parquet(s"$root/latest").drop("kb")
  }

  /** Streaming entry: maintain the artifact from a stream via
    * `foreachBatch` — the same merge, so streaming ≡ sequential
    * [[upsert]] calls; an interrupted batch is rolled forward by the
    * automatic [[recover]] when the restarted stream replays it.
    */
  def start(source: DataFrame, root: String, checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch.sparkSession, root, batch)
      }
      .start()
}
