package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.similarity.Similarity

/** The materialized sign-LSH index: corpus written partitioned by
  * (tbl, bucket), probed with a planning-time partition-pruned read.
  * Pins (1) result-equality with the unindexed lshTopK at the same
  * config — the sidecar (bits, tables, seed, dim) fully reconstructs
  * the plane family, so the layout is an optimization, not a semantics
  * change — and (2) that the probe's scan selects only the probed
  * bucket directories.
  */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  test("indexed probe equals unindexed lshTopK and prunes non-probed bucket partitions") {
    val emb = Tables.embeddings(spark, sf001)
    val path = Files.createTempDirectory("lshindex").toString + "/index"
    Similarity.writeLshIndex(emb, "vec_id", "embedding", path, bits = 4, tables = 3)

    val queries = emb.filter($"vec_id" < 3)
    val indexed = Similarity.lshTopKIndexed(spark, path, queries, "vec_id", "embedding", k = 5)
    val direct = Similarity.lshTopK(emb, "vec_id", "embedding", queries, 5, bits = 4, tables = 3)

    assert(
      indexed.orderBy("query_id", "nbr_id").collect().toSeq ==
        direct.orderBy("query_id", "nbr_id").collect().toSeq
    )

    // 3 queries × 3 tables = ≤ 9 probed (tbl, bucket) dirs of the up to
    // 3 × 2^4 = 48 written
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      (p match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case other                    => other
      }).collectWithSubqueries { case f: FileSourceScanExec => f }
    val indexScans = scans(indexed.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("lshindex"))
    assert(indexScans.nonEmpty, "no parquet scan over the index root found")
    indexScans.foreach { s =>
      assert(
        s.metadata.getOrElse("PartitionFilters", "").contains("bucket"),
        s"index scan has no bucket partition filter: ${s.metadata.getOrElse("PartitionFilters", "")}"
      )
      val selected = s.selectedPartitions.partitionCount
      assert(selected <= 9, s"expected <= 9 probed partitions, scan selected $selected")
    }
  }

  test("appendToLshIndex: probe after append equals unindexed lshTopK over the union at the index's config") {
    val emb = Tables.embeddings(spark, sf001)
    val half1 = emb.filter($"vec_id" % 2 === 0)
    val half2 = emb.filter($"vec_id" % 2 === 1)
    val path = Files.createTempDirectory("lshappend").toString + "/index"
    // explicit (bits, tables) pin: the union-side lshTopK below must run
    // the IDENTICAL config — a derived config would size from half1
    Similarity.writeLshIndex(half1, "vec_id", "embedding", path, bits = 4, tables = 3)
    Similarity.appendToLshIndex(spark, path, half2, "vec_id", "embedding")

    val queries = emb.filter($"vec_id" < 3)
    val indexed = Similarity.lshTopKIndexed(spark, path, queries, "vec_id", "embedding", k = 5)
    val direct = Similarity.lshTopK(emb, "vec_id", "embedding", queries, 5, bits = 4, tables = 3)
    assert(
      indexed.orderBy("query_id", "nbr_id").collect().toSeq ==
        direct.orderBy("query_id", "nbr_id").collect().toSeq
    )
    assert(indexed.filter($"nbr_id" % 2 === 1).count() > 0)
  }
}
