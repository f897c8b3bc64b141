package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.similarity.Similarity
import graft.streaming.SemDedupIngest

/** The SEMANTIC dedup-at-the-door ingest: embedding batches gated
  * against the materialized IVF index by within-cell cosine (the
  * SemDeDup rule applied incrementally), survivors appended into their
  * cell partitions. Mirrors DedupIngestSpec's structure: gate
  * semantics, the incremental ≡ full-restriction equivalence that makes
  * the index probe trustworthy, streaming ≡ sequential, replay
  * idempotence.
  */
class SemDedupIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // a 2-centroid pinned model on 4-dim vectors: cell 0 along e1, cell 1
  // along e2 — assignments are unambiguous by construction
  private val model = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
  private val T = 0.8

  private def df(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")

  test("gate semantics: corpus anchor wins, batch cluster keeps min id, novel kept") {
    val root = tmp("semingest")
    Similarity.writeIvfIndex(
      df((1L, Seq(1f, 0.05f, 0f, 0f))), "vec_id", "embedding", root,
      nCentroids = 2, centroidModel = Some(model))

    val batch = df(
      (10L, Seq(0.99f, 0.06f, 0f, 0f)),  // near-dup of indexed 1 → drop (corpus anchor)
      (12L, Seq(0.05f, 1f, 0f, 0f)),     // near-dup cluster {12, 13} → 12 keeps (min id)
      (13L, Seq(0.06f, 0.98f, 0f, 0f)),
      (14L, Seq(0f, 0.4f, 0.9f, 0f))     // same cell as 12/13 but cos < T → keep
    )
    val keep = SemDedupIngest
      .accepted(spark, root, batch, "vec_id", "embedding", T)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(keep == Seq(12L, 14L))
  }

  test("incremental pairs == full semDedupPairs restricted to pairs touching the batch") {
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val corpus = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    val fitted = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16)

    val root = tmp("seminc")
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding", root, nCentroids = 16, centroidModel = Some(fitted))
    val inc = Similarity
      .incrementalSemPairs(spark, root, batch, "vec_id", "embedding", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    val full = Similarity
      .semDedupPairs(emb, "vec_id", "embedding", threshold = 0.4, nClusters = 16, centroidModel = Some(fitted))
      .filter(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    assert(inc == full)
    assert(inc.nonEmpty) // the equivalence must not hold vacuously
  }

  test("streaming ingest == sequential ingestBatch on sf0.001 embeddings") {
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val fitted = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16)
    val seed = emb.filter(col("vec_id") % 3 === 1)
    def frame(m: Int) = emb
      .filter(col("vec_id") % 3 === m)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val (b1, b2) = (frame(2), frame(0))

    val rootS = tmp("semstream")
    Similarity.writeIvfIndex(seed, "vec_id", "embedding", rootS, nCentroids = 16, centroidModel = Some(fitted))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val q = SemDedupIngest.start(
      input.toDF.toDF("vec_id", "embedding"), "vec_id", "embedding",
      rootS, s"$rootS-ckpt", threshold = 0.4)
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val rootB = tmp("sembatch")
    Similarity.writeIvfIndex(seed, "vec_id", "embedding", rootB, nCentroids = 16, centroidModel = Some(fitted))
    SemDedupIngest.ingestBatch(spark, rootB, b1.toDF("vec_id", "embedding"), "vec_id", "embedding", 0.4)
    SemDedupIngest.ingestBatch(spark, rootB, b2.toDF("vec_id", "embedding"), "vec_id", "embedding", 0.4)

    val got = spark.read.parquet(rootS).select("id").as[Long].collect().sorted.toSeq
    val want = spark.read.parquet(rootB).select("id").as[Long].collect().sorted.toSeq
    assert(got == want)
    // the gate dropped something and kept something
    assert(got.size > seed.count() && got.size < seed.count() + b1.size + b2.size)
  }

  test("the probe reads only the batch's touched cell directories (partition pruning pinned)") {
    val root = tmp("sempruned")
    // seed vectors in BOTH cells; the batch touches ONLY cell 1
    Similarity.writeIvfIndex(
      df((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f))),
      "vec_id", "embedding", root, nCentroids = 2, centroidModel = Some(model))
    val pairs = Similarity.incrementalSemPairs(
      spark, root, df((10L, Seq(0.1f, 1f, 0f, 0f))), "vec_id", "embedding", T)
    val indexScans = fileScans(pairs)
      .filter(_.metadata.getOrElse("Location", "").contains("sempruned"))
    assert(indexScans.nonEmpty, "no parquet scan over the index root found")
    indexScans.foreach { s =>
      assert(
        s.metadata.getOrElse("PartitionFilters", "").contains("cell"),
        s"index scan has no cell partition filter: ${s.metadata.getOrElse("PartitionFilters", "")}")
      assert(s.selectedPartitions.partitionCount == 1,
        s"expected exactly the 1 touched cell of 2, scan selected ${s.selectedPartitions.partitionCount}")
    }
    // and the pruned probe still finds the cross pair it should
    assert(pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSeq == Seq((2L, 10L)))
  }

  test("the replay guard reads only the batch's touched cell directories (pruning pinned)") {
    val root = tmp("semguard")
    // indexed ids in BOTH cells; the batch touches ONLY cell 1
    Similarity.writeIvfIndex(
      df((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f))),
      "vec_id", "embedding", root, nCentroids = 2, centroidModel = Some(model))
    // a replayed row (id 2, same vector → same deterministic cell) plus
    // a fresh row, both in cell 1
    val batch = df((2L, Seq(0f, 1f, 0f, 0f)), (30L, Seq(0.1f, 0.9f, 0f, 0f)))
    val fresh = SemDedupIngest.freshOnly(spark, root, batch, "vec_id", "embedding")
    val guardScans = fileScans(fresh)
      .filter(_.metadata.getOrElse("Location", "").contains("semguard"))
    assert(guardScans.nonEmpty, "no parquet scan over the index root found in the guard plan")
    guardScans.foreach { s =>
      assert(
        s.metadata.getOrElse("PartitionFilters", "").contains("cell"),
        s"guard scan has no cell partition filter: ${s.metadata.getOrElse("PartitionFilters", "")}")
      assert(s.selectedPartitions.partitionCount == 1,
        s"expected the guard to read the 1 touched cell of 2, got ${s.selectedPartitions.partitionCount}")
    }
    // and the guard still does its job: replayed id dropped, fresh kept
    assert(fresh.select("vec_id").as[Long].collect().toSeq == Seq(30L))
  }

  test("mid-append crash sweep: EVERY partial-append state converges to the sequential end state on restart") {
    // the sem gate's append is ONE cell-partitioned parquet append, so
    // its crash states are exactly "some subset of the accepted rows'
    // files landed" — sweep every subset of b1's accepted set {12, 14},
    // replay the batch (the restarted stream's checkpoint never
    // advanced), run the next batch, and demand bit-equality with the
    // uninterrupted sequential run: the id guard completes the partial
    // append instead of duplicating or losing rows.
    val b1 = df(
      (10L, Seq(0.99f, 0.06f, 0f, 0f)), // near-dup of seed 1 → drop
      (12L, Seq(0.05f, 1f, 0f, 0f)),    // cluster {12,13} → 12 keeps
      (13L, Seq(0.06f, 0.98f, 0f, 0f)),
      (14L, Seq(0f, 0.4f, 0.9f, 0f))    // cos < T vs everything → keep
    )
    val b2 = df(
      (20L, Seq(0.07f, 0.99f, 0f, 0f)), // near-dup of ADMITTED 12 → drop (needs 12 indexed)
      (21L, Seq(0f, 0f, 0f, 1f))        // novel → keep
    )
    def freshRoot(): String = {
      val root = tmp("semcrash")
      Similarity.writeIvfIndex(
        df((1L, Seq(1f, 0.05f, 0f, 0f))), "vec_id", "embedding", root,
        nCentroids = 2, centroidModel = Some(model))
      root
    }
    def state(root: String): Seq[(Long, Int)] =
      spark.read.parquet(root).select(col("id"), col("cell"))
        .as[(Long, Int)].collect().sorted.toSeq

    // uninterrupted reference
    val rootRef = freshRoot()
    SemDedupIngest.ingestBatch(spark, rootRef, b1, "vec_id", "embedding", T)
    SemDedupIngest.ingestBatch(spark, rootRef, b2, "vec_id", "embedding", T)
    val want = state(rootRef)
    assert(want.map(_._1) == Seq(1L, 12L, 14L, 21L)) // the gate did real work

    for (landed <- Seq(Seq.empty[Long], Seq(12L), Seq(14L), Seq(12L, 14L))) {
      val root = freshRoot()
      // fabricate the crash: only `landed`'s rows reached the index
      val partial = b1.filter(col("vec_id").isin(landed.map(java.lang.Long.valueOf): _*))
      if (landed.nonEmpty)
        Similarity.appendToIvfIndex(spark, root, partial, "vec_id", "embedding")
      // restart: replay b1, then proceed to b2
      SemDedupIngest.ingestBatch(spark, root, b1, "vec_id", "embedding", T)
      SemDedupIngest.ingestBatch(spark, root, b2, "vec_id", "embedding", T)
      assert(state(root) == want, s"crash state landed=$landed diverged")
      // future gating identical too
      val probe = df((30L, Seq(0.08f, 0.97f, 0f, 0f)), (31L, Seq(0.5f, 0f, 0f, 0.85f)))
      val gotP = SemDedupIngest.accepted(spark, root, probe, "vec_id", "embedding", T)
        .select("vec_id").as[Long].collect().sorted.toSeq
      val wantP = SemDedupIngest.accepted(spark, rootRef, probe, "vec_id", "embedding", T)
        .select("vec_id").as[Long].collect().sorted.toSeq
      assert(gotP == wantP, s"crash state landed=$landed: future gating diverged")
    }
  }

  test("a second live writer on the index root fails fast having appended nothing; breakLock recovers") {
    val root = tmp("semlease")
    Similarity.writeIvfIndex(
      df((1L, Seq(1f, 0f, 0f, 0f))), "vec_id", "embedding", root,
      nCentroids = 2, centroidModel = Some(model))
    Files.write(
      java.nio.file.Paths.get(s"$root/_ingestlock"),
      "writer=dead-beef pid=0 host=ghost epochMs=0".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    val batch = df((20L, Seq(0f, 1f, 0f, 0f)))
    val before = spark.read.parquet(root).count()
    val e = intercept[graft.io.ConcurrentWriterException] {
      SemDedupIngest.ingestBatch(spark, root, batch, "vec_id", "embedding", T)
    }
    assert(e.getMessage.contains("pid=0") && e.getMessage.contains("breakLock"))
    assert(spark.read.parquet(root).count() == before) // nothing appended
    SemDedupIngest.breakLock(spark, root)
    SemDedupIngest.ingestBatch(spark, root, batch, "vec_id", "embedding", T)
    assert(spark.read.parquet(root).count() == before + 1)
  }

  test("a replayed batch is fully rejected after its own append (id guard)") {
    val root = tmp("semreplay")
    Similarity.writeIvfIndex(
      df((1L, Seq(1f, 0f, 0f, 0f))), "vec_id", "embedding", root,
      nCentroids = 2, centroidModel = Some(model))
    val batch = df((20L, Seq(0f, 1f, 0f, 0f)), (21L, Seq(0f, 0f, 1f, 0f)))
    SemDedupIngest.ingestBatch(spark, root, batch, "vec_id", "embedding", T)
    val afterFirst = spark.read.parquet(root).count()
    assert(afterFirst == 3) // seed + both accepted
    SemDedupIngest.ingestBatch(spark, root, batch, "vec_id", "embedding", T)
    assert(spark.read.parquet(root).count() == afterFirst)
  }
}
