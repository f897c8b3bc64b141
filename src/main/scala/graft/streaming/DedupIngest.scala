package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup

/** Continuous corpus ingest with dedup at the door: each micro-batch is
  * gated against the materialized dedup indexes
  * ([[graft.dedup.Dedup.writeMinhashIndex]] /
  * [[graft.dedup.Dedup.writeFingerprintIndex]]) before anything lands in
  * the corpus — the streaming form of the d9/d9b incremental operators.
  *
  * Why `foreachBatch` and not `mapGroupsWithState`: the dedup state IS
  * the corpus (every fingerprint and sketch ever accepted). Streaming
  * state stores hold per-key state sized for a state backend; a 100 TB
  * corpus index lives in the lake, and the per-batch joins against it
  * are exactly the batch operators — `foreachBatch` lets the batch and
  * streaming paths share one implementation and one set of oracles,
  * with the checkpoint giving at-least-once batch replay that the
  * gate makes effectively idempotent (a replayed batch re-runs the
  * same deterministic gate against the same indexes and is rejected by
  * its own fingerprints; the append sequence is ordered so a mid-crash
  * can under-admit but never duplicate — see [[ingestBatch]]'s note).
  *
  * Per-batch gate, in order:
  *   1. within-batch EXACT dedup: one keeper (min id) per normalized
  *      fingerprint — two identical texts in one batch must not both
  *      pass the novelty check;
  *   2. exact novelty vs the fingerprint index ([[Dedup.novelOnly]]);
  *   3. near-dup gate vs the MinHash index + within the batch:
  *      connected components over [[Dedup.incrementalLshPairs]]; a
  *      batch doc drops iff its cluster contains an already-indexed doc
  *      (the corpus member is the keeper by seniority) or it is not its
  *      cluster's minimum-id batch doc;
  *   4. append survivors to the corpus sink and BOTH indexes.
  */
object DedupIngest {

  /** Within-batch exact dedup: the minimum-id row per normalized-text
    * fingerprint (null-safe — all NULL texts form one group).
    */
  def exactKeeperPerFingerprint(batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withFp = batch.withColumn("__fp", graft.text.TextOps.fingerprint(col(textCol)))
    val keepers = withFp
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    withFp.join(keepers, Seq(idCol), "left_semi").drop("__fp")
  }

  /** The rows of `batch` the gate accepts against the indexes at
    * `root` (pure — no writes). Deterministic in the batch CONTENT
    * (order-independent: every keeper rule is a min over ids).
    */
  def accepted(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.3
  ): DataFrame =
    acceptedWithSignatures(spark, root, batch, idCol, textCol, threshold)._1

  /** [[accepted]] plus the batch's (sketches, banded rows) under the
    * index config — ONE gate implementation; [[ingestBatch]] reuses the
    * signatures the probe computed for its index append instead of
    * shingling the batch a second time (shingling is the gate's
    * dominant per-row cost; paying it twice doubles ingest CPU).
    */
  def acceptedWithSignatures(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.3
  ): (DataFrame, DataFrame, DataFrame) = {
    // ONE fingerprint evaluation end-to-end: the within-batch exact
    // dedup computes md5(normalize(text)) anyway, so carry it and
    // checkpoint the fingerprinted batch — the novelty probe's
    // touched-bucket collect and anti-join then read materialized rows
    // (novelOnlyPre) instead of re-evaluating the fingerprint subtree
    // in two more jobs over the batch lineage.
    val withFp = batch.withColumn("__fp", graft.text.TextOps.fingerprint(col(textCol)))
    val keepers = withFp
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    // LAZY pin (r14): novelOnlyPre's first action is a full-partition
    // distinct-collect over this frame, so it materializes the pin in
    // the same scheduler job — one job instead of an eager-checkpoint
    // job plus the collect. The release below still happens only after
    // `novel` has eagerly materialized (inside the try), so the
    // truncated lineage is never needed again.
    val exact = withFp.join(keepers, Seq(idCol), "left_semi").localCheckpoint(eager = false)
    // novel feeds THREE consumers (the LSH probe's shingling, the
    // in-batch flag join, the final anti-join) and its lineage carries a
    // window agg + an index anti-join — checkpoint once so the gate
    // computes it once instead of once per consumer
    val novel =
      try Dedup.novelOnlyPre(spark, s"$root/fingerprints", exact, "__fp").drop("__fp").localCheckpoint()
      finally graft.Checkpoints.release(exact) // dead once novel materialized
    // signatures are checkpointed too: they'd otherwise stay lazy and
    // the append would re-run the shingling the probe already paid for
    // (blocks are bounded by the batch; [[ingestBatch]] releases them
    // deterministically after its appends — a bare [[accepted]] caller
    // leaves them to the context cleaner). The STAGED form checkpoints
    // the hashed leg before banding derives from it, so the shingling
    // runs once, not once per leg.
    val (hashedB, b0) = Dedup.batchSignaturesStaged(spark, s"$root/minhash", novel, idCol, textCol)
    val bandedB = b0.localCheckpoint()
    val pairs = Dedup.incrementalLshPairsPre(spark, s"$root/minhash", hashedB, bandedB, threshold)
    (novel.join(clusterDrops(pairs, novel, idCol), Seq(idCol), "left_anti"), hashedB, bandedB)
  }

  /** The cluster-resolution DROP rule both ingest gates share (text
    * gate here, embedding gate in [[SemDedupIngest]]): connected
    * components over the pair graph; a batch doc drops iff its cluster
    * contains an already-indexed doc (ids not in `batchRows` — corpus
    * seniority wins) or it is not its cluster's minimum-id batch doc.
    * Returns the dropped ids as a single `idCol` column.
    */
  private[streaming] def clusterDrops(pairs: DataFrame, batchRows: DataFrame, idCol: String): DataFrame = {
    val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val flagged = comps
      .join(batchRows.select(col(idCol).as("id"), lit(true).as("in_batch")), Seq("id"), "left")
      .withColumn("in_batch", coalesce(col("in_batch"), lit(false)))
    val perCluster = flagged
      .groupBy("component")
      .agg(
        max(when(!col("in_batch"), lit(1)).otherwise(lit(0))).as("has_indexed"),
        min(when(col("in_batch"), col("id"))).as("min_batch_id")
      )
    flagged
      .filter(col("in_batch"))
      .join(perCluster, Seq("component"))
      .filter(col("has_indexed") === 1 || col("id") =!= col("min_batch_id"))
      .select(col("id").as(idCol))
  }

  /** Run the gate and fold the survivors into the corpus sink and both
    * indexes — as ONE journaled multi-artifact commit that a restarted
    * stream rolls FORWARD, so a crash at ANY point inside the append
    * sequence converges to the uninterrupted end state (the r11 sweep
    * pinned this only at batch boundaries; the under-admission window
    * between the index and corpus appends is now closed). The accepted
    * set is `localCheckpoint`ed first — an EAGER materialization that
    * severs lineage from the index scans, because the gate reads
    * exactly the files it is about to append to and a lazily recomputed
    * plan (cache eviction, task retry) would observe its own output.
    *
    * == Journaled commit ==
    *
    * {{{
    * root/_pending/<token>/rows/      # the accepted rows, staged
    * root/_pending/<token>/_dest     # the corpus destination this batch was headed to
    * root/_pending/<token>/_staged    # marker: rows are complete + authoritative
    * root/_pending/<token>/_fp_done   # marker: fingerprint append landed
    * root/_pending/<token>/_mh_done   # marker: minhash append landed
    * }}}
    *
    * Order: stage rows → `_dest` → `_staged` → the two index appends
    * (CONCURRENT legs — each leg touches its own marker, `_fp_done` /
    * `_mh_done`, only after ITS append lands; the legs write disjoint
    * trees and recovery checks the markers independently, so their
    * relative order never mattered) → both legs joined → MOVE the
    * staged files into the corpus (renames, each file lands exactly
    * once) → delete the journal dir (the commit point). `<token>` is a
    * content token (count + xor of id hashes), deterministic under
    * replay.
    *
    * Crash analysis, every window:
    *  - before `_staged`: the journal is garbage ([[recoverIngest]]
    *    deletes it); no artifact was touched; the replayed batch
    *    re-gates to the identical accepted set. Convergent.
    *  - after `_staged`, anywhere before the corpus move completes:
    *    the staged rows are authoritative; recovery re-appends whichever
    *    index lacks its marker from the staged rows and finishes the
    *    file moves. A crash MID-append re-appends that index's batch
    *    rows (duplicate index rows — harmless: every index consumer is
    *    an anti-join/pair-join with set semantics, and maintenance
    *    compaction bounds the residue), never loses them. The replayed
    *    batch then re-gates empty (its fingerprints are indexed) while
    *    its rows ARE in the corpus — exactly the sequential end state.
    *  - after the journal delete: the batch fully landed; the replayed
    *    batch re-gates empty. Convergent.
    *
    * [[recoverIngest]] runs at [[start]] and at the head of every
    * [[ingestBatch]] (one cheap listing when idle), so both the
    * streaming and the sequential-batch caller self-heal.
    */
  /** Writer lease for the gate's root (indexes + journal + staged
    * state): the same single-writer enforcement as
    * [[graft.io.LatestUpsert]] — a second live writer (two streams
    * misconfigured onto one index root) fails fast with
    * [[graft.io.ConcurrentWriterException]] before touching anything.
    * Held per batch, so the crashed-holder recovery window is one
    * batch: confirm the recorded holder is dead, then [[breakLock]].
    */
  private def withGateLock[T](spark: SparkSession, root: String)(body: => T): T = {
    val p = new org.apache.hadoop.fs.Path(s"$root/_ingestlock")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.io.WriterLease.withLock(
      fs, p, s"ingest-gate root at $root",
      "run DedupIngest.breakLock(spark, root)")(body)
  }

  /** Crashed-holder recovery for a holder that died on ANOTHER host
    * (a same-host dead holder is auto-broken by the lease machinery —
    * see [[graft.io.WriterLease]]): delete the gate's writer lease
    * after confirming the recorded holder (pid/host in the error
    * message) is dead. The artifacts need no repair — the journal
    * rolls forward at the next batch.
    */
  def breakLock(spark: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/_ingestlock")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
    ()
  }

  /** Per-batch attribution [[ingestBatch]] returns — the journal's
    * cost, MEASURED, phase by phase: gate (probe + components +
    * checkpoint of the accepted set), staged-rows write, the two index
    * appends, the corpus move. GATEBENCH publishes these at ×1 vs ×100
    * data; the streaming loop ignores them. A fully rejected batch
    * reports its (real) gate and total seconds with zeros elsewhere —
    * no journal was written.
    */
  case class IngestStats(
      acceptedRows: Long,
      gateSec: Double,
      stageSec: Double,
      fpAppendSec: Double,
      mhAppendSec: Double,
      moveSec: Double,
      totalSec: Double
  )

  def ingestBatch(
      spark: SparkSession,
      root: String,
      corpusOut: String,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.3
  ): IngestStats = withGateLock(spark, root) {
    val t0 = System.nanoTime()
    def secSince(t: Long): Double = (System.nanoTime() - t) / 1e9
    recoverIngest(spark, root, corpusOut, idCol, textCol)
    val (acc, hashedB, bandedB) =
      acceptedWithSignatures(spark, root, batch, idCol, textCol, threshold)
    val keep = acc.localCheckpoint()
    // ONE probe job doubles as the emptiness check AND the content
    // token (count + xor of id hashes) — the old separate isEmpty +
    // token-agg pair paid two scheduler round-trips per batch for the
    // same checkpointed rows. The agg is the gate's materialization
    // point, so gateSec is meaningful whether or not anything was
    // accepted.
    val t = keep.agg(
      count(lit(1)).as("n"),
      coalesce(expr(s"bit_xor(xxhash64(cast(`$idCol` as string)))"), lit(0L)).as("x")
    ).head()
    val accepted = t.getLong(0) > 0
    var stats = IngestStats(0L, secSince(t0), 0.0, 0.0, 0.0, 0.0, secSince(t0))
    try {
      if (accepted) {
        val gateSec = secSince(t0)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // content token: deterministic under replay (order-independent
        // xor of id hashes; count guards the degenerate xor collisions).
        // The token is collision-WEAK in isolation — two different
        // batches can collide — but at most ONE journal is ever live:
        // recoverIngest drained `_pending` above, under the lease this
        // whole body holds, so there is never a sibling journal to
        // collide with. The require pins that invariant against a
        // refactor that reorders recovery after staging.
        val pendRoot = new org.apache.hadoop.fs.Path(s"$root/_pending")
        require(
          !fs.exists(pendRoot) || fs.listStatus(pendRoot).isEmpty,
          s"ingest: _pending not empty at staging time — recoverIngest must drain it first " +
            s"(the journal token's safety depends on one live journal at a time)")
        val token = s"b${t.getLong(0)}x${java.lang.Long.toHexString(t.getLong(1))}"
        val pend = new org.apache.hadoop.fs.Path(s"$root/_pending/$token")
        // parallel staged write (NO coalesce — a gigabyte batch must not
        // serialize through one writer); the mover renames every part
        // file, so file count is free
        val tStage = System.nanoTime()
        keep.write.mode("overwrite").parquet(s"$pend/rows")
        // record the commit's DESTINATION with the staged rows: a
        // recovery caller (a restart pointed at a different corpusOut)
        // must roll the journal forward to where THIS batch was headed —
        // its fingerprints already gate the recorded corpus
        writeText(fs, new org.apache.hadoop.fs.Path(pend, "_dest"), corpusOut)
        touch(fs, new org.apache.hadoop.fs.Path(pend, "_staged"))
        val stageSec = secSince(tStage)
        // The two index appends run CONCURRENTLY (optimization guide
        // §2.6 — overlap independent jobs): they write disjoint trees
        // (fingerprints vs minhash), each is dominated by its
        // partitioned-write commit (many small leaf files), and the
        // crash contract never depended on their relative order — each
        // leg's marker lands only after ITS append, and recoverIngest
        // checks the two markers independently (a missing marker
        // re-appends that leg from the staged rows; duplicate index
        // rows are harmless by design). recoverFirst = false: this
        // loop owns recovery (start() before the first batch, every
        // maintenance walk) — see appendToMinhashIndex's doc.
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        val (fpSec, mhSec) =
          try {
            val fpLeg = pool.submit(new java.util.concurrent.Callable[Double] {
              def call(): Double = {
                val tFp = System.nanoTime()
                Dedup.appendToFingerprintIndex(keep, textCol, s"$root/fingerprints", recoverFirst = false)
                touch(fs, new org.apache.hadoop.fs.Path(pend, "_fp_done"))
                secSince(tFp)
              }
            })
            // the PROBE's signatures filtered to the accepted ids —
            // row-local signatures restricted to keep ⊆ novel are exactly
            // appendToMinhashIndex(keep)'s rows, minus the second shingling
            val mhLeg = pool.submit(new java.util.concurrent.Callable[Double] {
              def call(): Double = {
                val tMh = System.nanoTime()
                val keepIds = keep.select(col(idCol).as("id"))
                Dedup.appendToMinhashIndexPre(
                  s"$root/minhash",
                  hashedB.join(keepIds, Seq("id"), "left_semi"),
                  bandedB.join(keepIds, Seq("id"), "left_semi"))
                touch(fs, new org.apache.hadoop.fs.Path(pend, "_mh_done"))
                secSince(tMh)
              }
            })
            // join BOTH legs before any rethrow — the finally below
            // releases the checkpoints these jobs read, so no leg may
            // still be running when it fires
            val joined = Seq(fpLeg, mhLeg).map(l => scala.util.Try(l.get()))
            joined.map(_.recoverWith {
              case e: java.util.concurrent.ExecutionException => scala.util.Failure(e.getCause)
            }.get) match { case Seq(a, b) => (a, b) }
          } finally pool.shutdown()
        val tMove = System.nanoTime()
        moveStagedRows(fs, pend, corpusOut, token)
        fs.delete(pend, true) // ← the commit point
        stats = IngestStats(t.getLong(0), gateSec, stageSec, fpSec, mhSec, secSince(tMove), secSince(t0))
      }
      stats
    } finally {
      // the batch's checkpoints are write-scoped — release
      // deterministically instead of waiting on the ContextCleaner (a
      // long-lived stream accumulates per-batch blocks otherwise), and
      // release on the THROW path too: a failed append would otherwise
      // leak the blocks until the cleaner gets to them, which at gate
      // batch sizes is too slow. Releasing `acc` (lazy, already consumed
      // into `keep`) walks its plan's leaves and frees the gate's
      // INTERIOR checkpoints too — `novel` and the components run's
      // final label set — which have no other release point
      Seq(keep, acc, hashedB, bandedB).foreach(graft.Checkpoints.release(_))
    }
  }

  private def touch(fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path): Unit =
    fs.create(p, true).close()

  private def writeText(fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readText(fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Move every staged parquet file into the corpus, token-prefixed so
    * two batches' part files can never collide. Renames: a file leaves
    * the staging dir exactly when it lands, so an interrupted move
    * resumes file-by-file with no duplicates.
    */
  private def moveStagedRows(
      fs: org.apache.hadoop.fs.FileSystem,
      pend: org.apache.hadoop.fs.Path,
      corpusOut: String,
      token: String
  ): Unit = {
    val rowsDir = new org.apache.hadoop.fs.Path(pend, "rows")
    if (!fs.exists(rowsDir)) return // all moves already landed (partial commit-point delete)
    val outDir = new org.apache.hadoop.fs.Path(corpusOut)
    fs.mkdirs(outDir)
    fs.listStatus(rowsDir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        val dst = new org.apache.hadoop.fs.Path(outDir, s"${token}_${st.getPath.getName}")
        require(fs.rename(st.getPath, dst), s"ingest: could not land staged corpus file ${st.getPath}")
      }
  }

  /** Roll forward (or discard) any journaled batch a crashed
    * [[ingestBatch]] left mid-commit — see its crash analysis. A
    * journal without `_staged` is pre-commit garbage (deleted; the
    * batch replays); a staged journal is authoritative: the missing
    * index appends re-run from the staged rows, the staged files move
    * into the corpus, and the journal deletes. Idempotent; cheap when
    * idle (one listing of `_pending`).
    */
  def recoverIngest(
      spark: SparkSession,
      root: String,
      corpusOut: String,
      idCol: String,
      textCol: String
  ): Unit = withGateLock(spark, root) {
    val pendRoot = new org.apache.hadoop.fs.Path(s"$root/_pending")
    val fs = pendRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(pendRoot)) return
    fs.listStatus(pendRoot).filter(_.isDirectory).foreach { d =>
      val pend = d.getPath
      val rowsDir = new org.apache.hadoop.fs.Path(pend, "rows")
      val hasStagedFiles = fs.exists(rowsDir) &&
        fs.listStatus(rowsDir).exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      if (!fs.exists(new org.apache.hadoop.fs.Path(pend, "_staged"))) {
        fs.delete(pend, true) // incomplete staging: the batch never committed anywhere
      } else if (!hasStagedFiles) {
        // `_staged` present but no staged parquet remains: the moves all
        // landed (a file leaves `rows/` exactly when it lands), which by
        // the append order means both index appends landed too — even if
        // a marker is missing, that can only be a PARTIAL commit-point
        // delete (fs.delete(pend) crashed midway; markers precede moves,
        // so a genuinely-missing marker implies rows still staged). The
        // batch is fully committed; forcing a read of the empty/missing
        // rows dir here would throw on every batch and wedge the gate —
        // just finish the delete.
        fs.delete(pend, true)
      } else {
        val staged = spark.read.parquet(rowsDir.toString)
        // roll forward to the DESTINATION the crashed batch recorded —
        // a restart pointed at a different corpusOut must not land the
        // journaled rows in the new corpus while their fingerprints
        // already gate the recorded one (journals from before `_dest`
        // existed fall back to the caller's corpusOut)
        val destPath = new org.apache.hadoop.fs.Path(pend, "_dest")
        val dest = if (fs.exists(destPath)) readText(fs, destPath) else corpusOut
        if (!fs.exists(new org.apache.hadoop.fs.Path(pend, "_fp_done"))) {
          Dedup.appendToFingerprintIndex(staged, textCol, s"$root/fingerprints", recoverFirst = false)
          touch(fs, new org.apache.hadoop.fs.Path(pend, "_fp_done"))
        }
        if (!fs.exists(new org.apache.hadoop.fs.Path(pend, "_mh_done"))) {
          // the rare roll-forward path re-shingles the staged rows (the
          // probe's signatures died with the crashed process)
          Dedup.appendToMinhashIndex(spark, s"$root/minhash", staged, idCol, textCol)
          touch(fs, new org.apache.hadoop.fs.Path(pend, "_mh_done"))
        }
        moveStagedRows(fs, pend, dest, pend.getName)
        fs.delete(pend, true)
      }
    }
  }

  /** Initialize the index root from a (possibly empty) seed corpus. */
  def initIndexes(
      seed: DataFrame,
      idCol: String,
      textCol: String,
      root: String,
      n: Int = 3,
      k: Int = 16,
      bands: Int = 8
  ): Unit = {
    Dedup.writeMinhashIndex(seed, idCol, textCol, s"$root/minhash", n, k, bands)
    Dedup.writeFingerprintIndex(seed, textCol, s"$root/fingerprints")
  }

  /** Threshold-policy self-maintenance for the gate's PROBE-side
    * artifacts — the three index trees every batch re-reads
    * (fingerprints, minhash bands, minhash sketches): compact any
    * partition leaf whose file count exceeded `maxFilesPerLeaf`
    * (each batch appends at most one file per touched leaf, so the
    * steady-state bound under a per-batch call is `maxFilesPerLeaf`).
    * Cost ∝ the over-threshold leaves, never the index — see
    * [[graft.io.Compaction.maintainPartitioned]]. Returns the number
    * of leaves compacted.
    *
    * The corpus SINK is deliberately not covered: the stream only ever
    * appends to it (nothing probes it per batch), so its small files
    * are a scan-side concern for the nightly table service
    * ([[graft.io.Compaction.compact]]), not for the ingest loop —
    * and a corpus compaction inside the loop would rewrite the whole
    * corpus on a file-count trigger.
    */
  def maintainIndexes(
      spark: SparkSession,
      root: String,
      maxFilesPerLeaf: Int = 32,
      targetFileBytes: Long = 128L << 20
  ): Int = withGateLock(spark, root) {
    graft.io.Compaction.maintainPartitioned(spark, s"$root/fingerprints", maxFilesPerLeaf, targetFileBytes) +
      graft.io.Compaction.maintainPartitioned(spark, s"$root/minhash/bands", maxFilesPerLeaf, targetFileBytes) +
      graft.io.Compaction.maintainPartitioned(spark, s"$root/minhash/sketches", maxFilesPerLeaf, targetFileBytes)
  }

  /** Resolve any leaf swap a crashed [[maintainIndexes]] left mid-swap.
    * [[start]] runs this before its first batch; a caller probing the
    * indexes OUTSIDE a stream after a crash must run it first too — a
    * mid-swap tree is missing the swapping leaf, and a probe against it
    * would silently treat that leaf's corpus as unseen.
    */
  def recoverIndexes(spark: SparkSession, root: String): Unit = withGateLock(spark, root) {
    // lease-wrapped: the recovery walk DELETES in-flight staging
    // helpers — run concurrently with a live writer's maintenance it
    // would destroy that writer's wave (the misconfigured-second-stream
    // start() path)
    graft.io.Compaction.recoverPartitioned(spark, s"$root/fingerprints")
    graft.io.Compaction.recoverPartitioned(spark, s"$root/minhash/bands")
    graft.io.Compaction.recoverPartitioned(spark, s"$root/minhash/sketches")
  }

  /** The streaming entry: gate every micro-batch of `source` through
    * [[ingestBatch]]. `source` must carry `idCol` and `textCol`.
    * `maxFilesPerLeaf` ≥ 1 makes the stream self-tending — per-batch
    * [[maintainIndexes]] so a long-running ingest never degrades into
    * a file-listing-dominated probe; 0 disables (manual table
    * service). Crash recovery for an interrupted maintenance runs
    * unconditionally before the first batch.
    */
  def start(
      source: DataFrame,
      idCol: String,
      textCol: String,
      root: String,
      corpusOut: String,
      checkpoint: String,
      threshold: Double = 0.3,
      maxFilesPerLeaf: Int = 0
  ): StreamingQuery = {
    recoverIndexes(source.sparkSession, root)
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch.sparkSession, root, corpusOut, batch, idCol, textCol, threshold)
        if (maxFilesPerLeaf > 0) maintainIndexes(batch.sparkSession, root, maxFilesPerLeaf)
        ()
      }
      .start()
  }
}
