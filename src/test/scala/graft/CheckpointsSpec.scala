package graft

import org.apache.spark.storage.StorageLevel

/** The checkpoint-release helper — and a regression pin on the Spark
  * behavior that motivated it: `Dataset.unpersist` does NOT release a
  * local checkpoint (it only un-registers CacheManager entries, which
  * checkpoints never enter). Every pre-round-9 `checkpointedDf
  * .unpersist()` in this repo was a silent no-op; if a Spark upgrade
  * ever makes Dataset.unpersist checkpoint-aware, the first test here
  * fails and the helper can be retired.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def persistedIds = spark.sparkContext.getPersistentRDDs.keySet

  test("Dataset.unpersist is a no-op on a localCheckpoint (the motivating Spark behavior)") {
    val before = persistedIds
    val df = (1 to 100).toDF("x").localCheckpoint()
    val added = persistedIds -- before
    assert(added.nonEmpty, "localCheckpoint should register a persistent RDD")
    df.unpersist(blocking = true)
    assert(
      (persistedIds -- before) == added,
      "Dataset.unpersist released the checkpoint — Spark behavior changed; retire Checkpoints.release")
    Checkpoints.release(df, blocking = true)
    assert((persistedIds -- before).isEmpty, "Checkpoints.release left the checkpoint RDD persisted")
  }

  test("release walks a derived frame's plan and frees every checkpointed leaf") {
    val before = persistedIds
    val a = (1 to 50).toDF("x").localCheckpoint()
    val b = (40 to 90).toDF("x").localCheckpoint()
    val joined = a.join(b, Seq("x")) // two LogicalRDD leaves, both persisted
    assert(joined.count() == 11)
    assert((persistedIds -- before).size == 2)
    Checkpoints.release(joined, blocking = true)
    assert((persistedIds -- before).isEmpty, "derived-frame release missed a checkpointed leaf")
  }

  test("release is storage-level-guarded: safe on plain frames and on already-released ones") {
    val plain = (1 to 10).toDF("x")
    Checkpoints.release(plain) // no LogicalRDD leaves: no-op, no throw
    val cp = (1 to 10).toDF("x").localCheckpoint()
    Checkpoints.release(cp, blocking = true)
    Checkpoints.release(cp, blocking = true) // idempotent
    assert(cp.queryExecution.analyzed.collectLeaves().forall {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getStorageLevel == StorageLevel.NONE
      case _ => true
    })
  }
}
