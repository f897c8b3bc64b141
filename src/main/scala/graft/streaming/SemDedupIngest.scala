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
  *      text gate's exact-novelty stage (one slim id-column scan);
  *   2. near-dup gate: [[Similarity.incrementalSemPairs]] (batch×corpus
  *      within-cell pairs plus batch-internal) → the shared
  *      [[DedupIngest.clusterDrops]] rule — a corpus anchor in the
  *      cluster drops the whole batch side, else min batch id keeps;
  *   3. append survivors to the index (cell-partitioned dynamic append
  *      under the frozen model).
  */
object SemDedupIngest {

  /** Batch rows whose id is not yet indexed (the replay guard). */
  def freshOnly(spark: SparkSession, indexPath: String, batch: DataFrame, idCol: String): DataFrame =
    batch.join(
      spark.read.parquet(indexPath).select(col("id").as(idCol)),
      Seq(idCol),
      "left_anti"
    )

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
  ): DataFrame = {
    val fresh = freshOnly(spark, indexPath, batch, idCol).localCheckpoint()
    val pairs = Similarity.incrementalSemPairs(spark, indexPath, fresh, idCol, vecCol, threshold)
    fresh.join(DedupIngest.clusterDrops(pairs, fresh, idCol), Seq(idCol), "left_anti")
  }

  /** Run the gate and fold the survivors into the index. The accepted
    * set is `localCheckpoint`ed first: the gate reads the same files it
    * appends to, and a lazily recomputed plan would observe its own
    * output (the [[DedupIngest.ingestBatch]] hazard).
    */
  def ingestBatch(
      spark: SparkSession,
      indexPath: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): Unit = {
    val keep = accepted(spark, indexPath, batch, idCol, vecCol, threshold).localCheckpoint()
    if (!keep.isEmpty) {
      Similarity.appendToIvfIndex(spark, indexPath, keep, idCol, vecCol)
    }
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
      threshold: Double
  ): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch.sparkSession, indexPath, batch, idCol, vecCol, threshold)
      }
      .start()
}
