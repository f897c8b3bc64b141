package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.DedupIngest

/** The streaming dedup-at-the-door ingest: every micro-batch gated
  * against the materialized fingerprint + MinHash indexes, survivors
  * appended to the corpus and folded back into the indexes.
  *
  * The streaming path IS the batch path (`foreachBatch` over
  * `ingestBatch`), so the load-bearing assertions are (1) gate
  * semantics — exact dup vs corpus, exact dup within batch, near-dup vs
  * corpus, near-dup cluster within batch, chain collapse — and
  * (2) the streaming run is bit-identical to sequentially applying
  * `ingestBatch` to the same frames.
  */
class DedupIngestSpec extends SparkSpec {
  import spark.implicits._

  // 40 shared tokens per cluster: two docs sharing a stem have n-gram
  // Jaccard near 1, so the MinHash bands collide with certainty in
  // practice and the expectations below are stable (pinned empirically;
  // md5 is fixed). Distinct stems per cluster — docs from different
  // clusters share no shingles at all.
  private def stem(p: String): String = (1 to 40).map(i => s"$p$i").mkString(" ")
  private val stemC = stem("ctok") // the indexed-corpus cluster
  private val stemB = stem("btok") // the within-batch cluster

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("gate semantics: exact/near dups drop, cluster keeps min-id, corpus anchors win") {
    val root = tmp("ingestroot")
    val corpus = Seq((1L, s"$stemC corpusdoc")).toDF("doc_id", "text")
    DedupIngest.initIndexes(corpus, "doc_id", "text", root)

    val batch = Seq(
      (10L, s"$stemC corpusdoc"),      // exact dup of indexed doc 1 → drop
      (11L, s"$stemC corpusdoc extra"), // near-dup of indexed doc 1 → drop (corpus anchor)
      (12L, s"$stemB fresh alpha"),     // near-dup cluster {12, 13} → 12 keeps (min id)
      (13L, s"$stemB fresh alpha beta"),
      (14L, "a wholly unrelated tiny document"), // novel → keep
      (15L, "a wholly unrelated tiny document")  // exact dup WITHIN batch → drop
    ).toDF("doc_id", "text")

    val keep = DedupIngest
      .accepted(spark, root, batch, "doc_id", "text")
      .select("doc_id")
      .as[Long]
      .collect()
      .sorted
      .toSeq
    assert(keep == Seq(12L, 14L))
  }

  test("accepted ids are insensitive to batch row order") {
    val root = tmp("ingestorder")
    DedupIngest.initIndexes(Seq((1L, s"$stemC corpusdoc")).toDF("doc_id", "text"), "doc_id", "text", root)
    val rows = Seq(
      (10L, s"$stemC corpusdoc"),
      (12L, s"$stemB fresh alpha"),
      (13L, s"$stemB fresh alpha beta"),
      (14L, "a wholly unrelated tiny document")
    )
    val fwd = DedupIngest
      .accepted(spark, root, rows.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val rev = DedupIngest
      .accepted(spark, root, rows.reverse.toDF("doc_id", "text").repartition(7), "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(fwd == rev)
    assert(fwd == Seq(12L, 14L))
  }

  test("streaming ingest == sequential ingestBatch on the same frames (sf0.001 documents)") {
    val docs = graft.io.Tables.documents(spark, sf0001).select("doc_id", "text")
    val seed = docs.filter(col("doc_id") % 3 === 1)
    val b1 = docs.filter(col("doc_id") % 3 === 2).collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val b2 = docs.filter(col("doc_id") % 3 === 0).collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    // streaming run
    val rootS = tmp("ingeststream")
    val corpusS = s"$rootS/corpus"
    DedupIngest.initIndexes(seed, "doc_id", "text", s"$rootS/idx")
    seed.write.mode("overwrite").parquet(corpusS)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = DedupIngest.start(
      input.toDF.toDF("doc_id", "text"),
      "doc_id",
      "text",
      s"$rootS/idx",
      corpusS,
      s"$rootS/ckpt"
    )
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // sequential batch run on identical frames
    val rootB = tmp("ingestbatchwise")
    val corpusB = s"$rootB/corpus"
    DedupIngest.initIndexes(seed, "doc_id", "text", s"$rootB/idx")
    seed.write.mode("overwrite").parquet(corpusB)
    DedupIngest.ingestBatch(spark, s"$rootB/idx", corpusB, b1.toDF("doc_id", "text"), "doc_id", "text")
    DedupIngest.ingestBatch(spark, s"$rootB/idx", corpusB, b2.toDF("doc_id", "text"), "doc_id", "text")

    val got = spark.read.parquet(corpusS).select("doc_id").as[Long].collect().sorted.toSeq
    val want = spark.read.parquet(corpusB).select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == want)
    // the gate actually dropped something and kept something
    val nIn = seed.count() + b1.size + b2.size
    assert(got.size > seed.count() && got.size < nIn)
    // accepted rows are novel by construction: no fingerprint collisions
    // inside the final corpus except NULL-text (one NULL row can seed)
    val fpDups = spark.read
      .parquet(corpusS)
      .select(graft.text.TextOps.fingerprint(col("text")).as("f"))
      .filter(col("f").isNotNull)
      .groupBy("f").count().filter(col("count") > 1).count()
    assert(fpDups == 0)
  }

  test("a replayed batch is fully rejected after its own append (gate idempotence)") {
    val root = tmp("ingestreplay")
    val corpusOut = s"$root/corpus"
    DedupIngest.initIndexes(Seq((1L, s"$stemC corpusdoc")).toDF("doc_id", "text"), "doc_id", "text", s"$root/idx")
    val batch = Seq((20L, s"$stemB something new"), (21L, "tiny unrelated")).toDF("doc_id", "text")
    DedupIngest.ingestBatch(spark, s"$root/idx", corpusOut, batch, "doc_id", "text")
    val afterFirst = spark.read.parquet(corpusOut).count()
    assert(afterFirst == 2) // both accepted
    // crash-replay of the SAME batch: every row is now an exact dup
    DedupIngest.ingestBatch(spark, s"$root/idx", corpusOut, batch, "doc_id", "text")
    assert(spark.read.parquet(corpusOut).count() == afterFirst)
  }
}
