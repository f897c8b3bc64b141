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

  // ── mid-batch crash-point sweep (r11 verdict ask #2) ────────────────

  /** Fabricate the journaled commit's state after `crashPoint` steps —
    * the same step sequence [[DedupIngest.ingestBatch]] runs, stopped
    * cold. 1 = rows staged, no `_staged` marker; 2 = `_staged`;
    * 3 = fingerprint append + `_fp_done`; 4 = minhash append +
    * `_mh_done`; 5 = corpus move done, journal dir not yet deleted.
    */
  private def ingestStepsUpTo(
      root: String,
      corpusOut: String,
      batch: org.apache.spark.sql.DataFrame,
      crashPoint: Int
  ): Unit = {
    val (acc, hashedB, bandedB) =
      DedupIngest.acceptedWithSignatures(spark, root, batch, "doc_id", "text")
    val keep = acc.localCheckpoint()
    val token = "crashtok"
    val pendDir = java.nio.file.Paths.get(s"$root/_pending/$token")
    keep.coalesce(1).write.mode("overwrite").parquet(s"$pendDir/rows")
    def touch(n: String): Unit = { Files.write(pendDir.resolve(n), Array.empty[Byte]); () }
    if (crashPoint >= 2) {
      // mirror the real append order (rows → _dest → _staged) so the
      // sweep exercises the recorded-destination roll-forward, not the
      // legacy no-_dest fallback
      Files.write(pendDir.resolve("_dest"), corpusOut.getBytes("UTF-8"))
      touch("_staged")
    }
    if (crashPoint >= 3) {
      Dedup.appendToFingerprintIndex(keep, "text", s"$root/fingerprints", recoverFirst = false)
      touch("_fp_done")
    }
    if (crashPoint >= 4) {
      val keepIds = keep.select(col("doc_id").as("id"))
      Dedup.appendToMinhashIndexPre(
        s"$root/minhash",
        hashedB.join(keepIds, Seq("id"), "left_semi"),
        bandedB.join(keepIds, Seq("id"), "left_semi"))
      touch("_mh_done")
    }
    if (crashPoint >= 5) {
      val rows = java.nio.file.Files.list(pendDir.resolve("rows"))
      try rows.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
        .foreach { p =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(corpusOut))
          java.nio.file.Files.move(
            p, java.nio.file.Paths.get(corpusOut, s"${token}_${p.getFileName}"))
        }
      finally rows.close()
    }
    Seq(keep, acc, hashedB, bandedB).foreach(graft.Checkpoints.release(_))
  }

  test("mid-batch crash sweep: a crash at EVERY journal step converges to the sequential end state on restart") {
    val seed = Seq((1L, s"$stemC corpusdoc")).toDF("doc_id", "text")
    val b1 = Seq(
      (12L, s"$stemB fresh alpha"),       // near-dup cluster {12,13}: 12 keeps
      (13L, s"$stemB fresh alpha beta"),
      (14L, "a wholly unrelated tiny document")
    ).toDF("doc_id", "text")
    val b2 = Seq(
      (20L, s"$stemB fresh alpha gamma"), // near-dup of admitted 12 → drop (needs b1's mh rows)
      (21L, s"$stemC corpusdoc"),         // exact dup of seed → drop
      (22L, "another novel tiny document")
    ).toDF("doc_id", "text")

    // the uninterrupted sequential end state, computed once
    val rootRef = tmp("ingestcrashref")
    DedupIngest.initIndexes(seed, "doc_id", "text", s"$rootRef/idx")
    seed.write.mode("overwrite").parquet(s"$rootRef/corpus")
    DedupIngest.ingestBatch(spark, s"$rootRef/idx", s"$rootRef/corpus", b1, "doc_id", "text")
    DedupIngest.ingestBatch(spark, s"$rootRef/idx", s"$rootRef/corpus", b2, "doc_id", "text")
    val wantCorpus = spark.read.parquet(s"$rootRef/corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(wantCorpus == Seq(1L, 12L, 14L, 22L)) // the gate did real work

    for (crashPoint <- 1 to 5) {
      val root = tmp(s"ingestcrash$crashPoint")
      DedupIngest.initIndexes(seed, "doc_id", "text", s"$root/idx")
      seed.write.mode("overwrite").parquet(s"$root/corpus")
      ingestStepsUpTo(s"$root/idx", s"$root/corpus", b1, crashPoint)
      // restart: the streaming loop replays the uncommitted batch b1
      // (its checkpoint never advanced), then proceeds to b2 —
      // ingestBatch's own recoverIngest heals first
      DedupIngest.ingestBatch(spark, s"$root/idx", s"$root/corpus", b1, "doc_id", "text")
      DedupIngest.ingestBatch(spark, s"$root/idx", s"$root/corpus", b2, "doc_id", "text")
      val got = spark.read.parquet(s"$root/corpus")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == wantCorpus, s"crash point $crashPoint: corpus diverged ($got vs $wantCorpus)")
      // the journal is drained and the indexes gate FUTURE batches
      // identically to the uninterrupted run (near-dups of every
      // admitted row rejected; novelty preserved)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/idx/_pending")) ||
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/idx/_pending")).count() == 0,
        s"crash point $crashPoint left journal entries")
      val probe = Seq(
        (30L, s"$stemB fresh alpha delta"),        // near-dup of 12
        (31L, "another novel tiny document plus"), // near-dup of 22 (shares no shingles though) → novel
        (32L, "a wholly unrelated tiny document")  // exact dup of 14
      ).toDF("doc_id", "text")
      val gotProbe = DedupIngest.accepted(spark, s"$root/idx", probe, "doc_id", "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
      val wantProbe = DedupIngest.accepted(spark, s"$rootRef/idx", probe, "doc_id", "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(gotProbe == wantProbe, s"crash point $crashPoint: future gating diverged")
      // no duplicate corpus rows ever (the gate's core contract)
      assert(got.distinct == got, s"crash point $crashPoint admitted duplicates")
    }
  }

  test("a crash DURING recovery converges too: the re-run's duplicate index rows are set-semantic no-ops") {
    // state: journal staged (+_staged), then recovery itself crashed
    // AFTER the fingerprint append but BEFORE its marker — the next
    // recovery re-appends the same fingerprints (duplicate index ROWS,
    // never duplicate corpus rows); every index consumer is an
    // anti-join/pair-join, so the duplicates must change nothing
    val seed = Seq((1L, s"$stemC corpusdoc")).toDF("doc_id", "text")
    val b1 = Seq(
      (12L, s"$stemB fresh alpha"),
      (13L, s"$stemB fresh alpha beta"),
      (14L, "a wholly unrelated tiny document")
    ).toDF("doc_id", "text")
    val b2 = Seq((21L, s"$stemC corpusdoc"), (22L, "another novel tiny document")).toDF("doc_id", "text")

    val rootRef = tmp("ingestrecref")
    DedupIngest.initIndexes(seed, "doc_id", "text", s"$rootRef/idx")
    seed.write.mode("overwrite").parquet(s"$rootRef/corpus")
    DedupIngest.ingestBatch(spark, s"$rootRef/idx", s"$rootRef/corpus", b1, "doc_id", "text")
    DedupIngest.ingestBatch(spark, s"$rootRef/idx", s"$rootRef/corpus", b2, "doc_id", "text")
    val want = spark.read.parquet(s"$rootRef/corpus").select("doc_id").as[Long].collect().sorted.toSeq

    val root = tmp("ingestrecrash")
    DedupIngest.initIndexes(seed, "doc_id", "text", s"$root/idx")
    seed.write.mode("overwrite").parquet(s"$root/corpus")
    ingestStepsUpTo(s"$root/idx", s"$root/corpus", b1, 2) // staged + _staged only
    // the crashed recovery's half-done work: fp appended, marker absent
    val staged = spark.read.parquet(s"$root/idx/_pending/crashtok/rows")
    Dedup.appendToFingerprintIndex(staged, "text", s"$root/idx/fingerprints", recoverFirst = false)
    // restart: replay b1, proceed to b2 (recovery re-appends fp — dups)
    DedupIngest.ingestBatch(spark, s"$root/idx", s"$root/corpus", b1, "doc_id", "text")
    DedupIngest.ingestBatch(spark, s"$root/idx", s"$root/corpus", b2, "doc_id", "text")
    val got = spark.read.parquet(s"$root/corpus").select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == want, s"crash-during-recovery diverged ($got vs $want)")
    // the duplicate fp rows exist (the state we claim harmless)...
    val fpDups = spark.read.parquet(s"$root/idx/fingerprints")
      .groupBy("fingerprint").count().filter(col("count") > 1).count()
    assert(fpDups > 0, "test is vacuous — no duplicate index rows were created")
    // ...and gate nothing differently
    val probe = Seq((30L, s"$stemB fresh alpha delta"), (31L, "brand new text")).toDF("doc_id", "text")
    val gotP = DedupIngest.accepted(spark, s"$root/idx", probe, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val wantP = DedupIngest.accepted(spark, s"$rootRef/idx", probe, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(gotP == wantP)
  }

  test("a partial commit-point delete (rows/ gone, _staged survives) never wedges the gate") {
    // fs.delete(pend, true) — the commit point — can crash midway having
    // removed rows/ (and possibly the done-markers) while `_staged`
    // survives. Rows gone means every move landed, which means every
    // append landed: the batch is fully committed. Recovery must treat
    // the journal remnant as committed garbage, not force a read of the
    // missing rows dir (which would throw on EVERY subsequent batch —
    // a permanently wedged gate until an operator deletes by hand).
    val seed = Seq((1L, s"$stemC corpusdoc")).toDF("doc_id", "text")
    val b1 = Seq(
      (12L, s"$stemB fresh alpha"),
      (13L, s"$stemB fresh alpha beta"),
      (14L, "a wholly unrelated tiny document")
    ).toDF("doc_id", "text")
    val b2 = Seq((21L, s"$stemC corpusdoc"), (22L, "another novel tiny document")).toDF("doc_id", "text")

    val rootRef = tmp("ingestpartref")
    DedupIngest.initIndexes(seed, "doc_id", "text", s"$rootRef/idx")
    seed.write.mode("overwrite").parquet(s"$rootRef/corpus")
    DedupIngest.ingestBatch(spark, s"$rootRef/idx", s"$rootRef/corpus", b1, "doc_id", "text")
    DedupIngest.ingestBatch(spark, s"$rootRef/idx", s"$rootRef/corpus", b2, "doc_id", "text")
    val want = spark.read.parquet(s"$rootRef/corpus").select("doc_id").as[Long].collect().sorted.toSeq

    // the nastier variant: the partial delete also removed the done
    // markers (delete order is unspecified) — only _staged and an empty
    // shell remain
    val root = tmp("ingestpartial")
    DedupIngest.initIndexes(seed, "doc_id", "text", s"$root/idx")
    seed.write.mode("overwrite").parquet(s"$root/corpus")
    ingestStepsUpTo(s"$root/idx", s"$root/corpus", b1, 5) // fully landed, journal not deleted
    val pend = java.nio.file.Paths.get(s"$root/idx/_pending/crashtok")
    def rmTree(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(q => { java.nio.file.Files.delete(q); () })
        finally s.close()
      }
    rmTree(pend.resolve("rows"))
    java.nio.file.Files.deleteIfExists(pend.resolve("_fp_done"))
    java.nio.file.Files.deleteIfExists(pend.resolve("_mh_done"))
    // restart: replay b1 (fully rejected — already committed), then b2
    DedupIngest.ingestBatch(spark, s"$root/idx", s"$root/corpus", b1, "doc_id", "text")
    DedupIngest.ingestBatch(spark, s"$root/idx", s"$root/corpus", b2, "doc_id", "text")
    val got = spark.read.parquet(s"$root/corpus").select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == want, s"partial commit-point delete diverged ($got vs $want)")
    assert(!java.nio.file.Files.exists(pend), "committed journal remnant not drained")
  }

  test("recovery rolls a staged journal forward to its RECORDED destination, not the caller's") {
    // a restart pointed at a different corpusOut must not land the
    // journaled rows in the new corpus — their fingerprints already
    // gate the destination the crashed batch recorded in _dest
    val seed = Seq((1L, s"$stemC corpusdoc")).toDF("doc_id", "text")
    val b1 = Seq((12L, s"$stemB fresh alpha"), (14L, "a wholly unrelated tiny document"))
      .toDF("doc_id", "text")
    val root = tmp("ingestdest")
    val corpusA = s"$root/corpusA"
    val corpusB = s"$root/corpusB"
    DedupIngest.initIndexes(seed, "doc_id", "text", s"$root/idx")
    seed.write.mode("overwrite").parquet(corpusA)
    ingestStepsUpTo(s"$root/idx", corpusA, b1, 2) // staged + _staged, nothing landed
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/idx/_pending/crashtok/_dest"),
      corpusA.getBytes("UTF-8"))
    // the restart arrives MISCONFIGURED onto corpusB
    DedupIngest.recoverIngest(spark, s"$root/idx", corpusB, "doc_id", "text")
    val inA = spark.read.parquet(corpusA).select("doc_id").as[Long].collect().sorted.toSeq
    assert(inA == Seq(1L, 12L, 14L), s"journal rolled to the wrong corpus (A holds $inA)")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusB)),
      "journaled rows landed in the misconfigured destination")

    // LEGACY journal (pre-_dest, fabricated by deleting the marker):
    // recovery falls back to the caller's corpusOut — the documented
    // behavior for journals staged before the destination was recorded
    val b2 = Seq((22L, "another novel tiny document")).toDF("doc_id", "text")
    ingestStepsUpTo(s"$root/idx", corpusA, b2, 2)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/idx/_pending/crashtok/_dest"))
    DedupIngest.recoverIngest(spark, s"$root/idx", corpusB, "doc_id", "text")
    val inB = spark.read.parquet(corpusB).select("doc_id").as[Long].collect().sorted.toSeq
    assert(inB == Seq(22L), s"legacy journal did not fall back to the caller's corpusOut (B holds $inB)")
  }

  test("a second live writer on the gate root fails fast having staged nothing; breakLock recovers") {
    val root = tmp("ingestlease")
    DedupIngest.initIndexes(
      Seq((1L, s"$stemC corpusdoc")).toDF("doc_id", "text"), "doc_id", "text", s"$root/idx")
    // simulate a crashed (or live) holder
    Files.write(
      java.nio.file.Paths.get(s"$root/idx/_ingestlock"),
      "writer=dead-beef pid=0 host=ghost epochMs=0".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    val batch = Seq((20L, "a novel tiny document")).toDF("doc_id", "text")
    val e = intercept[graft.io.ConcurrentWriterException] {
      DedupIngest.ingestBatch(spark, s"$root/idx", s"$root/corpus", batch, "doc_id", "text")
    }
    assert(e.getMessage.contains("pid=0") && e.getMessage.contains("breakLock"))
    // the loser touched NOTHING: no journal, no corpus
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/idx/_pending")))
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/corpus")))
    DedupIngest.breakLock(spark, s"$root/idx")
    DedupIngest.ingestBatch(spark, s"$root/idx", s"$root/corpus", batch, "doc_id", "text")
    assert(spark.read.parquet(s"$root/corpus").count() == 1)
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
