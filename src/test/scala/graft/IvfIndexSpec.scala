package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.similarity.Similarity

/** The materialized IVF index: write the corpus partitioned by cell,
  * probe with a partition-pruned read. Pins the two properties that make
  * the index the 100 TB path: (1) results are IDENTICAL to the
  * unindexed ivfTopK under the same centroid model — the layout is an
  * optimization, not a semantics change; (2) the probe's parquet scan
  * selects ONLY the probed cell directories (planning-time partition
  * pruning via the isin literal), so non-probed cells are never listed,
  * opened, or decoded.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  test("indexed probe equals unindexed ivfTopK and prunes non-probed cell partitions") {
    val emb = Tables.embeddings(spark, sf001)
    val model = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16)
    val path = Files.createTempDirectory("ivfindex").toString + "/index"
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", path, nCentroids = 16, centroidModel = Some(model))

    val queries = emb.filter($"vec_id" < 3)
    val indexed = Similarity.ivfTopKIndexed(spark, path, queries, "vec_id", "embedding", k = 5, nProbe = 2)
    val direct = Similarity
      .ivfTopK(emb, "vec_id", "embedding", queries, 5, nCentroids = 16, nProbe = 2, centroidModel = Some(model))

    // (1) bit-identical results: same model, same probes, same re-rank
    assert(
      indexed.orderBy("query_id", "nbr_id").collect().toSeq ==
        direct.orderBy("query_id", "nbr_id").collect().toSeq
    )

    // (2) the scan over the index root selects only the probed cells'
    // directories: ≤ 3 queries × 2 probes = 6 of the 16 partitions
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      (p match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case other                    => other
      }).collectWithSubqueries { case f: FileSourceScanExec => f }
    val indexScans = scans(indexed.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("ivfindex"))
    assert(indexScans.nonEmpty, "no parquet scan over the index root found")
    indexScans.foreach { s =>
      assert(
        s.metadata.getOrElse("PartitionFilters", "").contains("cell"),
        s"index scan has no cell partition filter: ${s.metadata.getOrElse("PartitionFilters", "")}"
      )
      val selected = s.selectedPartitions.partitionCount
      assert(selected <= 6 && selected < 16, s"expected <= 6 pruned partitions of 16, scan selected $selected")
    }

    // the sidecar model survives the round-trip bit-for-bit
    val back = Similarity.readIvfCentroids(spark, path)
    assert(back.map(_._1).toSeq == (0 until 16))
    assert(back.zip(model.zipWithIndex.map { case (v, i) => i -> v }).forall {
      case ((c1, v1), (c2, v2)) => c1 == c2 && v1.toSeq == v2.toSeq
    })
  }

  test("appendToIvfIndex: probe after append equals unindexed ivfTopK over the union under the frozen model") {
    val emb = Tables.embeddings(spark, sf001)
    val half1 = emb.filter($"vec_id" % 2 === 0)
    val half2 = emb.filter($"vec_id" % 2 === 1)
    // model fitted on the FIRST half only — the append must assign the
    // second half under this frozen sidecar, not refit
    val model = Similarity.kmeansCentroids(half1, "vec_id", "embedding", k = 16)
    val path = Files.createTempDirectory("ivfappend").toString + "/index"
    Similarity.writeIvfIndex(half1, "vec_id", "embedding", path, nCentroids = 16, centroidModel = Some(model))
    Similarity.appendToIvfIndex(spark, path, half2, "vec_id", "embedding")

    val queries = emb.filter($"vec_id" < 3)
    val indexed = Similarity.ivfTopKIndexed(spark, path, queries, "vec_id", "embedding", k = 5, nProbe = 2)
    val direct = Similarity
      .ivfTopK(emb, "vec_id", "embedding", queries, 5, nCentroids = 16, nProbe = 2, centroidModel = Some(model))
    assert(
      indexed.orderBy("query_id", "nbr_id").collect().toSeq ==
        direct.orderBy("query_id", "nbr_id").collect().toSeq
    )
    // appended rows actually participate: some neighbor must be odd-id
    assert(indexed.filter($"nbr_id" % 2 === 1).count() > 0)
  }

  test("IVF-PQ index: full-probe degenerates to flat PQ re-rank; probe stacks partition + column pruning") {
    val emb = Tables.embeddings(spark, sf001)
    val n = emb.count().toInt
    val coarse = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16)
    val pq = Similarity.pqSubCentroids(emb, "vec_id", "embedding")
    val path = Files.createTempDirectory("ivfpq").toString + "/index"
    Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", path,
      nCentroids = 16, centroidModel = Some(coarse), pqModel = Some(pq))

    // sidecar codebook round-trips bit-for-bit
    val back = Similarity.readPqCodebook(spark, path)
    assert(back.flatten.flatten.toSeq == pq.flatten.flatten.toSeq)

    val queries = emb.filter($"vec_id" < 3)
    // (1) the equality pin: probe ALL cells with an uncapped shortlist →
    // exactly the flat two-stage operator under the same model (the
    // index layout is an optimization, not a semantics change)
    val full = Similarity
      .ivfPqTopKIndexed(spark, path, queries, "vec_id", "embedding", k = 5, nProbe = 16, shortlist = n)
      .orderBy("query_id", "nbr_id").collect().toSeq
    val flat = Similarity
      .pqTopKReranked(emb, "vec_id", "embedding", queries, 5, pq, shortlist = n)
      .orderBy("query_id", "nbr_id").collect().toSeq
    assert(full == flat)

    // (2) a REAL probe: partition pruning on the ADC scan, and the ADC
    // stage's scan reads codes without the full vectors (column pruning)
    val probed = Similarity
      .ivfPqTopKIndexed(spark, path, queries, "vec_id", "embedding", k = 5, nProbe = 2, shortlist = 20)
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      (p match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case other                    => other
      }).collectWithSubqueries { case f: FileSourceScanExec => f }
    val idxScans = scans(probed.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("ivfpq"))
    assert(idxScans.nonEmpty)
    idxScans.foreach { s =>
      assert(s.metadata.getOrElse("PartitionFilters", "").contains("cell"))
      assert(s.selectedPartitions.partitionCount <= 6,
        s"expected <= 3 queries x 2 probes partitions, got ${s.selectedPartitions.partitionCount}")
    }
    val adcScans = idxScans.filter(!_.schema.fieldNames.contains("v"))
    assert(adcScans.nonEmpty, "no codes-only scan found — ADC stage is reading full vectors")
    assert(adcScans.exists(_.schema.fieldNames.contains("code")))

    // (3) and it still finds real neighbors
    assert(probed.count() > 0)
    val ids = probed.select("nbr_id").as[Long].collect().toSet
    assert(ids.nonEmpty && ids.forall(i => i >= 0 && i < n))
  }
}
