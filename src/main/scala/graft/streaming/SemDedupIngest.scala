package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.similarity.Similarity

/** Continuous SEMANTIC dedup-at-the-door ingest — the embedding-space
  * form of [[DedupIngest]]: each micro-batch of (id, embedding) rows is
  * gated against the materialized IVF index ([[Similarity.writeIvfIndex]]
  * layout: cell-partitioned vectors + `_centroids` sidecar) by exact
  * within-cell cosine — the SemDeDup rule (d10/d12) applied
  * incrementally. The index IS the corpus: survivors append into their
  * cell partitions and are the anchors the next batch gates against.
  *
  * The coarse quantizer is FROZEN at init (the sidecar model), so a
  * batch assigns to the same cells the corpus did and the probe reads
  * ONLY the batch's touched cell directories (planning-time partition
  * pruning, the `ivfTopKIndexed` move). Refit-under-drift is a rebuild
  * decision (`writeIvfIndex`), never an append decision.
  *
  * Per-batch gate, in order:
  *   1. replay guard: drop rows whose id is already indexed — a
  *      re-delivered frame after a crash mid-append, the analog of the
  *      text gate's exact-novelty stage. Partition-pruned: a replayed
  *      row's prior append landed in its deterministic cell under the
  *      frozen model, so the guard reads only the batch's TOUCHED cell
  *      directories' id columns, never the full index;
  *   2. near-dup gate: [[Similarity.incrementalSemPairs]] (batch×corpus
  *      within-cell pairs plus batch-internal) → the shared
  *      [[DedupIngest.clusterDrops]] rule — a corpus anchor in the
  *      cluster drops the whole batch side, else min batch id keeps;
  *   3. append survivors to the index (cell-partitioned dynamic append
  *      under the frozen model).
  */
object SemDedupIngest {

  /** Batch rows whose id is not yet indexed (the replay guard),
    * partition-pruned to the batch's touched cells: under the frozen
    * sidecar quantizer a replayed row's prior append went to its
    * deterministic cell, so its id can only be found THERE — the same
    * `isin`-literal planning-time pruning the probe itself makes
    * ([[Similarity.incrementalSemPairs]]). At a 100 TB index the guard
    * reads ≤ |batch| cell directories' id columns per batch instead of
    * sweeping the full index's id column. The touched-cell collect is
    * bounded model state (≤ |batch| ints, ≤ nCentroids).
    */
  def freshOnly(spark: SparkSession, indexPath: String, batch: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val b = Similarity.assignedBatch(spark, indexPath, batch, idCol, vecCol)
    val touched = b.select("cell").distinct().collect().map(_.getInt(0)).sorted
    guardAgainst(spark, indexPath, batch, idCol, touched)
  }

  /** The anti-join half of the guard over a pre-collected touched-cell
    * set (pruned read of just those cell directories' id columns).
    */
  private def guardAgainst(
      spark: SparkSession,
      indexPath: String,
      rows: DataFrame,
      idCol: String,
      touched: Seq[Int]
  ): DataFrame =
    if (touched.isEmpty) rows // empty batch: nothing to guard
    else
      rows.join(
        spark.read
          .parquet(indexPath)
          .filter(col("cell").isin(touched: _*))
          .select(col("id").as(idCol)),
        Seq(idCol),
        "left_anti"
      )

  /** The gate's accepted rows in INDEX GEOMETRY
    * ([[Similarity.assignedBatch]] columns `id, v, cell, nrm`) — one
    * cell-assignment job per batch, shared by guard, probe, and append
    * (the text gate's `acceptedWithSignatures` move). The assigned
    * batch is `localCheckpoint`ed: it feeds the touched-cell collect,
    * the guard anti-join, the pair probe, and the final anti-join — and
    * the gate reads the same files it later appends to, so a lazily
    * recomputed plan could observe its own output (the
    * [[DedupIngest.ingestBatch]] hazard).
    */
  private def acceptedAssigned(
      spark: SparkSession,
      indexPath: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame = {
    // LAZY pin (r14, the DedupIngest pattern): the touched-cell collect
    // below is a full-partition action and the pin's FIRST, so one
    // scheduler job both materializes the assigned batch and returns the
    // touched cells. `fresh` below stays EAGER — it must be materialized
    // before release(b) drops the blocks its lineage reads.
    val b = Similarity.assignedBatch(spark, indexPath, batch, idCol, vecCol)
      .localCheckpoint(eager = false)
    val touched = b.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val fresh = guardAgainst(spark, indexPath, b, "id", touched).localCheckpoint()
    graft.Checkpoints.release(b)
    // `touched` from the PRE-guard batch is a superset of fresh's cells —
    // incrementalSemPairsPre tolerates that (extra cells find no partner)
    val pairs = Similarity.incrementalSemPairsPre(spark, indexPath, fresh, touched, threshold)
    fresh.join(DedupIngest.clusterDrops(pairs, fresh, "id"), Seq("id"), "left_anti")
  }

  /** The rows of `batch` the gate accepts against the index at
    * `indexPath` (pure — no writes). Deterministic in the batch
    * CONTENT: every keeper rule is a min over ids.
    */
  def accepted(
      spark: SparkSession,
      indexPath: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame =
    batch.join(
      acceptedAssigned(spark, indexPath, batch, idCol, vecCol, threshold)
        .select(col("id").as(idCol)),
      Seq(idCol),
      "left_semi"
    )

  /** Run the gate and fold the survivors into the index. The accepted
    * set is `localCheckpoint`ed first: the gate reads the same files it
    * appends to, and a lazily recomputed plan would observe its own
    * output (the [[DedupIngest.ingestBatch]] hazard). The append reuses
    * the gate's OWN cell assignments ([[Similarity.appendToIvfIndexPre]])
    * — the batch is assigned exactly once end-to-end.
    */
  /** Writer lease on the index root — the same single-writer
    * enforcement as [[DedupIngest]]'s gate and
    * [[graft.io.LatestUpsert]]: a second live writer fails fast with
    * [[graft.io.ConcurrentWriterException]] before touching anything.
    */
  private def withGateLock[T](spark: SparkSession, indexPath: String)(body: => T): T = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/_ingestlock")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.io.WriterLease.withLock(
      fs, p, s"semantic ingest index at $indexPath",
      "run SemDedupIngest.breakLock(spark, indexPath)")(body)
  }

  /** Crashed-holder recovery for a holder that died on ANOTHER host
    * (same-host dead holders are auto-broken — see
    * [[graft.io.WriterLease]]): delete the lease after confirming the
    * recorded holder is dead; the id guard makes the next replay
    * converge without repair.
    */
  def breakLock(spark: SparkSession, indexPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/_ingestlock")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
    ()
  }

  def ingestBatch(
      spark: SparkSession,
      indexPath: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): Unit = withGateLock(spark, indexPath) {
    val acc = acceptedAssigned(spark, indexPath, batch, idCol, vecCol, threshold)
    val keep = acc.localCheckpoint()
    try
      if (!keep.isEmpty) {
        Similarity.appendToIvfIndexPre(keep, indexPath)
      }
    finally
      // the batch's checkpoints are write-scoped — release
      // deterministically instead of waiting on the ContextCleaner (a
      // long-lived stream accumulates per-batch blocks otherwise), and
      // on the thrown-append path too (the DedupIngest symmetry);
      // releasing `acc` (lazy, already consumed into `keep`) frees the
      // gate's interior `fresh` checkpoint through its plan leaves
      Seq(keep, acc).foreach(graft.Checkpoints.release(_))
  }

  /** The streaming entry: gate every micro-batch of `source` (carrying
    * `idCol` + `vecCol`) through [[ingestBatch]]. Exactly-once note:
    * the gate is idempotent under replay — a replayed batch's rows are
    * caught by the id guard after their own append — and the append is
    * ONE atomic-per-file parquet write, so the standard foreachBatch
    * at-least-once caveat shrinks to a crash mid-append leaving partial
    * cell files, which the replay's guard then completes (already-
    * appended ids drop, missing ids re-gate).
    */
  def start(
      source: DataFrame,
      idCol: String,
      vecCol: String,
      indexPath: String,
      checkpoint: String,
      threshold: Double,
      maxFilesPerLeaf: Int = 0
  ): StreamingQuery = {
    recoverIndex(source.sparkSession, indexPath)
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch.sparkSession, indexPath, batch, idCol, vecCol, threshold)
        if (maxFilesPerLeaf > 0) maintainIndex(batch.sparkSession, indexPath, maxFilesPerLeaf)
        ()
      }
      .start()
  }

  /** Threshold-policy self-maintenance for the cell-partitioned index
    * the gate both probes and appends to — the embedding-space twin of
    * [[DedupIngest.maintainIndexes]] (same leaf-scoped recoverable
    * compaction, `_centroids`/`_config` sidecars untouched at the tree
    * root). Each batch appends at most one file per touched cell, so a
    * per-batch call bounds every cell directory at `maxFilesPerLeaf`
    * files. Returns the number of cells compacted.
    */
  def maintainIndex(
      spark: SparkSession,
      indexPath: String,
      maxFilesPerLeaf: Int = 32,
      targetFileBytes: Long = 128L << 20
  ): Int = withGateLock(spark, indexPath) {
    graft.io.Compaction.maintainPartitioned(spark, indexPath, maxFilesPerLeaf, targetFileBytes)
  }

  /** Resolve any cell swap a crashed [[maintainIndex]] left mid-swap —
    * [[start]] runs this before the first batch; out-of-stream probes
    * after a crash must too (a mid-swap tree is missing the swapping
    * cell, and the guard would re-admit that cell's corpus as fresh).
    */
  def recoverIndex(spark: SparkSession, indexPath: String): Unit =
    withGateLock(spark, indexPath) {
      // lease-wrapped for the same reason as DedupIngest.recoverIndexes:
      // the walk deletes in-flight staging helpers
      graft.io.Compaction.recoverPartitioned(spark, indexPath)
    }
}
