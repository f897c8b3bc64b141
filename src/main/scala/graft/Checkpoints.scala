package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Deterministic release of `localCheckpoint` storage.
  *
  * `Dataset.unpersist` is a NO-OP on a checkpointed frame: it
  * un-registers CacheManager entries (`.persist`/`.cache`), but a local
  * checkpoint lives as a persisted RDD behind the Dataset's `LogicalRDD`
  * leaf and never enters the CacheManager — so every
  * `checkpointedDf.unpersist()` call this repo (and the round-6 residue
  * saga) relied on released NOTHING; blocks lingered until the
  * ContextCleaner happened to GC the RDD reference. This helper
  * unpersists the checkpoint's actual RDD, found by walking the plan's
  * `LogicalRDD` leaves.
  *
  * Contract: call it only when the frame (and every frame DERIVED from
  * it lazily) has been fully consumed — a local checkpoint's lineage is
  * truncated, so dropped blocks CANNOT be recomputed; a late reader
  * fails loudly with missing blocks rather than silently recomputing.
  * Calling it on a frame derived from several checkpoints releases all
  * of them (each is a separate `LogicalRDD` leaf).
  */
object Checkpoints {
  def release(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD if l.rdd.getStorageLevel != StorageLevel.NONE =>
        l.rdd.unpersist(blocking)
      case _ => ()
    }
}
