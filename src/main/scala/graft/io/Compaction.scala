package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, floor, greatest, least, lit, max, min, shiftleft, shiftright}

/** Small-file compaction for append-grown parquet artifacts.
  *
  * Every incremental append ([[graft.dedup.Dedup.appendToMinhashIndex]],
  * [[graft.similarity.Similarity.appendToIvfIndex]] /
  * `appendToLshIndex`, the [[graft.streaming.DedupIngest]] corpus sink)
  * adds a file set per increment; after thousands of micro-batches the
  * artifact is correct but scan-hostile (file-listing dominated, tiny
  * row groups, no effective column-statistics pruning). Compaction
  * rewrites the SAME rows into right-sized files, preserving the
  * partition layout and any `_`-prefixed sidecar dirs (`_config`,
  * `_centroids`).
  *
  * Two regimes, by tree shape:
  *
  *  - '''Partitioned trees''' (every probed index — minhash bands/
  *    sketches, IVF / IVF-PQ cells, LSH buckets): compacted LEAF BY
  *    LEAF through the crash-recoverable hidden-sibling swap
  *    ([[compactPartitioned]] / [[maintainPartitioned]]). No
  *    whole-tree rename, so the root never disappears, sidecars are
  *    never touched, and an interrupted run resolves deterministically
  *    ([[recoverLeaf]]) — the next compaction or the gates' start-up
  *    recovery finishes or unwinds it.
  *  - '''Flat trees''' (the append-only corpus sink, never probed):
  *    whole-tree rewrite + two-rename swap ([[compact]] /
  *    [[compactClustered]]) — a maintenance-window job with a
  *    documented crash window (root absent between the renames), which
  *    is the honest cost of re-laying-out a tree that HAS no leaf
  *    granularity to recover at.
  *
  * Single-writer per artifact by contract in both regimes (a
  * concurrent append could land a file in a leaf between its two
  * renames and be dropped with the old leaf). The streaming gates
  * satisfy it by construction — maintenance runs inside the same
  * serial foreachBatch loop as the appends. At 100 TB this is the
  * nightly table-service job every lake runs; on a transactional
  * table format the swap is a commit instead.
  */
object Compaction {

  /** (total bytes, file count) of the parquet DATA files under `dir` —
    * recursive, `_`/`.`-prefixed paths (sidecars, markers, in-flight
    * temporaries) excluded, mirroring partition discovery's visibility
    * rules.
    */
  def dataStats(spark: SparkSession, dir: String): (Long, Int) = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    var bytes = 0L
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toString.stripPrefix(root.toString)
      val hidden = rel.split('/').exists(s => s.startsWith("_") || s.startsWith("."))
      if (!hidden && f.getPath.getName.endsWith(".parquet")) { bytes += f.getLen; n += 1 }
    }
    (bytes, n)
  }

  /** Rewrite a FLAT parquet tree at `dir` into right-sized files: one
    * shuffle into ceil(bytes / targetFileBytes) tasks → that many
    * output files, then the two-rename swap (see the class doc's flat
    * regime — partitioned trees take [[compactPartitioned]] instead,
    * whose per-leaf swap is crash-recoverable).
    *
    * Sidecar dirs (`_config`, ...) are carried into the rewritten tree
    * before the swap, so a compacted artifact stays self-describing.
    */
  def compact(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L << 20
  ): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (bytes, _) = dataStats(spark, dir)
    val df = spark.read.parquet(dir)
    val tmp = new Path(dir + ".__compacting")
    fs.delete(tmp, true)
    val k = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    df.repartition(k).write.parquet(tmp.toString)
    swapIn(fs, root, tmp)
  }

  /** Compact a PARTITIONED parquet tree leaf by leaf: every leaf
    * holding more than one visible parquet file is rewritten into
    * ceil(bytes / targetFileBytes) files through the recoverable
    * hidden-sibling swap ([[maintainPartitioned]] at threshold 1 —
    * all due leaves in ONE Spark job, then per-leaf renames).
    *
    * Versus the old whole-tree rewrite+swap this form is
    *  - crash-recoverable: the root never disappears; an interrupted
    *    run leaves each leaf either swapped or untouched plus helper
    *    state [[recoverLeaf]] resolves deterministically;
    *  - sidecar-safe: `_config`/`_centroids`/`_codebook` dirs are
    *    never moved, so there is no moment when the tree is missing
    *    its own description;
    *  - incremental: already-compact leaves (one file) cost a listing,
    *    nothing else — re-running after a crash only redoes the
    *    unfinished leaves.
    *
    * Reader visibility: a concurrent reader races ONE leaf's two
    * renames (that leaf alone can appear empty for that instant)
    * instead of the whole root's — still a maintenance-window job by
    * contract, but the blast radius of a badly-timed read shrinks from
    * the artifact to a leaf. Returns the number of leaves rewritten.
    */
  def compactPartitioned(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L << 20
  ): Int = maintainPartitioned(spark, dir, maxFilesPerLeaf = 1, targetFileBytes = targetFileBytes)

  /** Z-ORDER clustered compaction of a flat parquet tree: same rewrite
    * +swap as [[compact]], but rows are laid out along a Z-order
    * (Morton) curve over `clusterBy` instead of hashed arbitrarily.
    *
    * Why this is THE other half of table service at 100 TB: compaction
    * fixes file COUNT, clustering fixes file CONTENT. A hash-scattered
    * layout gives every file the full min..max span of every column, so
    * parquet footer/row-group statistics prune nothing; after
    * clustering, each file covers a narrow slice of EVERY clusterBy
    * column at once, and a selective filter on ANY of them skips most
    * row groups (a single-column sort buys that for one column only —
    * bit interleaving is what makes the spans narrow simultaneously).
    *
    * Mechanics: one agg pass computes each column's (min, max); each
    * row's columns are rank-normalized to `bits`-bit integers and their
    * bits interleaved into one long ([[zvalue]] — pure codegen'd column
    * arithmetic); `repartitionByRange` on the z-value range-partitions
    * the curve into ceil(bytes/target) files and an in-partition sort
    * tightens row groups within each. NULL ranks propagate NULL
    * z-values, which range-partitioning groups together — nulls cluster
    * with nulls, which is exactly what a stats-pruned scan wants.
    */
  def compactClustered(
      spark: SparkSession,
      dir: String,
      clusterBy: Seq[String],
      targetFileBytes: Long = 128L << 20,
      zorderBits: Int = 12
  ): Unit = {
    require(clusterBy.nonEmpty, "compactClustered needs at least one cluster column")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (bytes, _) = dataStats(spark, dir)
    val df = spark.read.parquet(dir)
    val ranges = colRanges(df, clusterBy)
    val tmp = new Path(dir + ".__compacting")
    fs.delete(tmp, true)
    val k = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    df.withColumn("__z", zvalue(clusterBy.map(col), ranges, zorderBits))
      .repartitionByRange(k, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .parquet(tmp.toString)
    swapIn(fs, root, tmp)
  }

  /** (min, max) per column in ONE aggregate pass, as doubles. */
  def colRanges(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      val lo = if (r.isNullAt(2 * i)) 0.0 else r.getDouble(2 * i)
      val hi = if (r.isNullAt(2 * i + 1)) 0.0 else r.getDouble(2 * i + 1)
      (lo, hi)
    }
  }

  /** Z-order (Morton) value: each column rank-normalized into `bits`
    * unsigned bits against its (min, max) range, bit i of column c
    * landing at interleaved position i*k + c. Pure column arithmetic —
    * shift/and/or chains stay inside whole-stage codegen; no UDF. The
    * interleaved width k*bits must fit a signed long's 63 value bits.
    */
  def zvalue(cols: Seq[Column], ranges: Seq[(Double, Double)], bits: Int): Column = {
    val k = cols.size
    require(k > 0 && bits > 0 && k * bits <= 63, s"z-value needs 0 < k*bits <= 63, got k=$k bits=$bits")
    require(ranges.size == k, s"${ranges.size} ranges for $k columns")
    val scale = (1L << bits) - 1
    val ranks = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val span = if (hi > lo) hi - lo else 1.0
      least(
        lit(scale),
        greatest(lit(0L), floor((c.cast("double") - lit(lo)) / lit(span) * lit(scale.toDouble)).cast("long"))
      )
    }
    val terms = for { i <- 0 until bits; c <- 0 until k } yield
      shiftleft(shiftright(ranks(c), i).bitwiseAND(lit(1L)), i * k + c)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Carry `_`-prefixed sidecars into the rewritten tree, then swap it
    * in via two renames (single-writer contract — see class doc).
    */
  private def swapIn(fs: FileSystem, root: Path, tmp: Path): Unit = {
    val dir = root.toString
    // sidecars move over so the rewritten tree is complete BEFORE the swap
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_"))
      .foreach(st => fs.rename(st.getPath, new Path(tmp, st.getPath.getName)))
    val old = new Path(dir + ".__old")
    fs.delete(old, true)
    require(fs.rename(root, old), s"compact: could not move $dir aside")
    require(fs.rename(tmp, root), s"compact: could not swap in rewritten tree for $dir")
    fs.delete(old, true)
  }

  // ---------------------------------------------------------------
  // Leaf-scoped threshold maintenance — the auto-compaction form the
  // streaming ingest gates run INSIDE their foreachBatch loop, and
  // (at threshold 1, via [[compactPartitioned]]) the full-compaction
  // form every partitioned index artifact uses.
  //
  // The flat-tree [[compact]]+[[swapIn]] above is a maintenance-window
  // job: its swap has a crash window (root absent between two renames)
  // and its cost is proportional to the WHOLE artifact — both fine for
  // a nightly table service over a leafless tree, both wrong inside a
  // streaming loop. The leaf-scoped form fixes each independently:
  //
  //  - cost ∝ touched data: each micro-batch append adds at most one
  //    file per touched partition leaf, so the leaf that crossed the
  //    file-count threshold is rewritten ALONE (at 100 TB: a few
  //    hundred MB per trigger, never the index);
  //  - crash-recoverable: the per-leaf swap stages the rewritten leaf
  //    under a dot-hidden sibling name (invisible to partition
  //    discovery), and every reachable crash state is rolled forward or
  //    back deterministically by [[recoverLeaf]] — which the
  //    maintenance walk runs first, and which the gates run once at
  //    stream start so a probe never reads a tree whose leaf is
  //    mid-swap from a previous crash.
  //
  // Single-writer per artifact remains the contract (the gates satisfy
  // it by construction: maintenance runs inside the same foreachBatch
  // serial loop as the appends).
  // ---------------------------------------------------------------

  private def leafTmp(leaf: Path): Path = new Path(leaf.getParent, s"._cmp_${leaf.getName}")
  private def leafOld(leaf: Path): Path = new Path(leaf.getParent, s"._oldcmp_${leaf.getName}")

  /** Resolve any interrupted per-leaf swap at `leaf` to a consistent
    * state. The swap sequence is: write tmp (complete, with _SUCCESS)
    * → rename leaf→old → rename tmp→leaf → delete old; every
    * reachable (leaf, tmp, old) presence combination therefore has one
    * correct resolution:
    *   - live leaf present: the leaf is authoritative (tmp at most
    *     partially written, old impossible before the first rename) —
    *     GC the helpers. This resolution is what makes the WRITER
    *     invariant load-bearing: every writer (the append entry
    *     points, the gates at stream start, every maintenance walk)
    *     resolves helper state BEFORE writing, so a live leaf next to
    *     a complete tmp can only mean a crash before the first rename
    *     — never an append that recreated a mid-swap leaf, which this
    *     branch would mis-read by GC'ing the tmp with the leaf's
    *     pre-crash rows;
    *   - leaf absent, tmp present: tmp was COMPLETE before the first
    *     rename could run — roll FORWARD (tmp becomes the leaf);
    *   - leaf absent, only old present (unreachable by the protocol,
    *     defensive): roll back.
    */
  def recoverLeaf(fs: FileSystem, leaf: Path): Unit = {
    val tmp = leafTmp(leaf)
    val old = leafOld(leaf)
    (fs.exists(leaf), fs.exists(tmp), fs.exists(old)) match {
      case (true, t, o) => // healthy or crash before the swap began
        if (t) fs.delete(tmp, true)
        if (o) fs.delete(old, true)
      case (false, true, o) => // crash between the two renames: tmp is complete
        require(fs.rename(tmp, leaf), s"recoverLeaf: could not roll forward $tmp -> $leaf")
        if (o) fs.delete(old, true)
      case (false, false, true) => // defensive: no replacement — restore the original
        require(fs.rename(old, leaf), s"recoverLeaf: could not roll back $old -> $leaf")
      case (false, false, false) => () // stale helper name, nothing to do
    }
  }

  /** (bytes, file count) of the visible parquet files DIRECTLY in `leaf`. */
  private def leafStats(fs: FileSystem, leaf: Path): (Long, Int) = {
    val files = fs.listStatus(leaf).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
    (files.map(_.getLen).sum, files.length)
  }

  /** Rewrite ONE partition leaf directory into ceil(bytes/target)
    * right-sized files via the recoverable hidden-sibling swap
    * described above. The leaf's partition values live in its dir NAME,
    * so the rewrite touches data columns only and the layout (and every
    * probe's planning-time pruning against it) is preserved exactly.
    */
  def compactLeaf(spark: SparkSession, fs: FileSystem, leaf: Path, targetFileBytes: Long = 128L << 20): Boolean = {
    recoverLeaf(fs, leaf)
    val (bytes, n) = leafStats(fs, leaf)
    if (n <= 1) return false // already compact (or vanished) — no swap happened
    val tmp = leafTmp(leaf)
    val old = leafOld(leaf)
    fs.delete(tmp, true)
    val k = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(leaf.toString).repartition(k).write.parquet(tmp.toString)
    require(fs.rename(leaf, old), s"compactLeaf: could not move $leaf aside")
    require(fs.rename(tmp, leaf), s"compactLeaf: could not swap in rewritten leaf $leaf")
    fs.delete(old, true)
    true
  }

  /** Walk a partitioned parquet tree: recover interrupted leaf swaps,
    * then invoke `onLeaf` for every live partition leaf (a visible
    * `name=value` directory holding parquet files directly). Nested
    * partitioning (e.g. `band=X/key_bucket=Y`) walks to the deepest
    * level. Cost: one listing per directory — the same order of FS
    * round-trips a probe's partition discovery already pays per batch.
    */
  private def walkLeaves(fs: FileSystem, dir: Path, recover: Boolean = true)(onLeaf: Path => Unit): Unit = {
    if (!fs.exists(dir)) return
    // recover FIRST (writer-side walks only): a crashed swap's leaf may
    // be absent and only reappear through its hidden helper names; a
    // crashed BATCHED maintenance's staging tree is pure garbage (no
    // leaf it hadn't swapped yet lost anything) — delete it.
    // `recover = false` is the OBSERVER walk: pure listings, never
    // touches helper state, safe to run concurrently with the single
    // writer's in-flight maintenance.
    if (recover) fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("._cmp_")) recoverLeaf(fs, new Path(dir, n.stripPrefix("._cmp_")))
      else if (n.startsWith("._oldcmp_")) recoverLeaf(fs, new Path(dir, n.stripPrefix("._oldcmp_")))
      else if (n.startsWith("._cmpstage")) fs.delete(st.getPath, true)
    }
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.contains("=") && !n.startsWith("_") && !n.startsWith(".")) {
        val children = fs.listStatus(st.getPath)
        if (children.exists(c => c.isFile && c.getPath.getName.endsWith(".parquet")))
          onLeaf(st.getPath)
        else walkLeaves(fs, st.getPath, recover)(onLeaf)
      }
    }
  }

  /** Recover-only walk: resolve every interrupted leaf swap under
    * `dir`. The gates run this once at stream start so the first
    * probe after a crash never sees a mid-swap tree.
    */
  def recoverPartitioned(spark: SparkSession, dir: String): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    walkLeaves(fs, root)(_ => ())
  }

  /** Threshold-policy maintenance over a partitioned tree: compact
    * every leaf whose visible parquet file count exceeds
    * `maxFilesPerLeaf`. Returns the number of leaves compacted. Cheap
    * when nothing is due (pure listings); when due, cost is
    * proportional to the over-threshold leaves only.
    *
    * Batched: ALL due leaves are rewritten by ONE Spark job (a
    * partition-pruned read of just those leaves → one `partitionBy`
    * write into a dot-hidden staging tree), then each leaf lands
    * through the same recoverable per-leaf swap as [[compactLeaf]].
    * The per-leaf-job form burned a fixed job launch per leaf, which
    * dominated the maintenance wave when uniform appends push every
    * leaf over the threshold in the same batch (measured: a 160-leaf
    * wave cost ~28 s of almost pure job scheduling); one job makes
    * the wave cost what the DATA costs. A crash mid-batch leaves
    * leaves either swapped (compacted) or untouched (still correct,
    * re-due next round) plus a garbage staging tree the recovery walk
    * deletes.
    *
    * The returned count is leaves ACTUALLY rewritten-and-landed (the
    * gates and INGESTBENCH publish it) — a due leaf whose staged dir
    * came out absent (vanished between listing and rewrite) is not
    * counted.
    */
  def maintainPartitioned(
      spark: SparkSession,
      dir: String,
      maxFilesPerLeaf: Int = 32,
      targetFileBytes: Long = 128L << 20
  ): Int = {
    require(maxFilesPerLeaf >= 1, s"maxFilesPerLeaf must be >= 1, got $maxFilesPerLeaf")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val due = scala.collection.mutable.ArrayBuffer.empty[(Path, Long)]
    val allLeaves = scala.collection.mutable.ArrayBuffer.empty[Path]
    walkLeaves(fs, root) { leaf =>
      allLeaves += leaf
      val (bytes, n) = leafStats(fs, leaf)
      if (n > maxFilesPerLeaf) due += ((leaf, bytes))
    }
    val total = allLeaves.size
    if (due.isEmpty) return 0

    // relative partition specs, e.g. Seq(("band","0"), ("key_bucket","3"))
    val rootUri = root.toUri.getPath
    def specOf(leaf: Path): Seq[(String, String)] =
      leaf.toUri.getPath.stripPrefix(rootUri).split('/').filter(_.nonEmpty).toSeq
        .map { seg => val i = seg.indexOf('='); (seg.take(i), seg.drop(i + 1)) }

    // The batched one-job rewrite round-trips partition VALUES through
    // directory names and partition-type inference (read root →
    // partitionBy write). That round-trip is bit-exact only for
    // canonical integers (no leading zeros, no "-0", small enough to
    // infer integral) — a value like "01" would re-infer as 1 and the
    // staged write would MERGE two distinct leaves, landing duplicated
    // rows. The guard must hold for EVERY leaf of the tree, not just
    // the due ones: inference and the pruning filter span the whole
    // root, so one exotic NON-due leaf ("b=01" next to due "b=1", or a
    // "b=2.5" that shifts the inferred type to double) can contaminate
    // a due leaf's rewrite or re-spell the staged dir names. Canonical
    // ints everywhere cover every index layout this engine writes;
    // anything else takes the per-leaf rewrite, which never re-derives
    // a leaf's name. Oversized leaves also go per-leaf: the batched
    // form writes one file per leaf, which is only "right-sized" under
    // targetFileBytes.
    val canonical = allLeaves.forall { leaf =>
      specOf(leaf).forall { case (_, v) => v.length <= 18 && v.matches("0|-?[1-9][0-9]*") }
    }
    val (batched, perLeaf) =
      if (canonical) due.toSeq.partition(_._2 <= targetFileBytes)
      else (Nil, due.toSeq)
    // count only leaves whose swap actually happened (compactLeaf
    // no-ops when the leaf shrank to <=1 file or vanished between
    // listing and rewrite) — both paths honor the documented contract
    val perLeafLanded = perLeaf.count { case (leaf, _) => compactLeaf(spark, fs, leaf, targetFileBytes) }
    if (batched.isEmpty) return perLeafLanded

    val specs = batched.map { case (leaf, _) => specOf(leaf) }
    val partCols = specs.head.map(_._1)
    // one pruned read of the due leaves (no filter when ALL leaves are
    // due — the uniform-append wave); the filter is a disjunction of
    // partition-column conjunctions, evaluated at listing time
    val all = spark.read.parquet(dir)
    val pruned =
      if (batched.size == total) all
      else {
        // cast each literal to the column's INFERRED partition type so
        // the pruning comparison is exact by construction: comparing an
        // int/long partition column against a string literal coerces
        // both sides through double, and distinct 17–18 digit leaf
        // values above 2^53 would collide (over-matching — benign here
        // since only `batched` leaves land, but it stages extra rows
        // and wastes IO). Canonical ints ≤ 18 digits always fit the
        // inferred integral type, so the cast never nulls.
        all.filter(specs.map(s => s.map { case (c, v) =>
          col(c) === lit(v).cast(all.schema(c).dataType)
        }.reduce(_ && _)).reduce(_ || _))
      }
    val stage = new Path(dir, s"._cmpstage_${System.nanoTime()}")
    // hash-repartition on the partition columns: each leaf's rows land
    // in one task, partitionBy splits tasks per leaf → one file per leaf
    pruned.repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*).parquet(stage.toString)

    // land each leaf via the recoverable swap (renames only from here)
    var landed = 0
    batched.zip(specs).foreach { case ((leaf, _), spec) =>
      val staged = new Path(stage, spec.map { case (c, v) => s"$c=$v" }.mkString("/"))
      if (fs.exists(staged)) { // a due leaf can be empty-after-filter only if it vanished
        val tmp = leafTmp(leaf)
        val old = leafOld(leaf)
        fs.delete(tmp, true)
        require(fs.rename(staged, tmp), s"maintain: could not stage $staged as $tmp")
        require(fs.rename(leaf, old), s"maintain: could not move $leaf aside")
        require(fs.rename(tmp, leaf), s"maintain: could not swap in rewritten leaf $leaf")
        fs.delete(old, true)
        landed += 1
      }
    }
    fs.delete(stage, true)
    perLeafLanded + landed
  }

  /** Max parquet-file count over the partition leaves under `dirs` —
    * the observable a threshold policy bounds ([[maintainPartitioned]])
    * and the one its benches/specs assert on. READ-ONLY (the observer
    * walk): pure listings, never recovers or deletes helper state, so
    * a monitoring thread may call it concurrently with the single
    * writer's in-flight maintenance without destroying its staging.
    */
  def maxLeafFiles(spark: SparkSession, dirs: Seq[String]): Int = {
    var m = 0
    dirs.foreach { d =>
      val p = new Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      walkLeaves(fs, p, recover = false)(leaf => m = math.max(m, leafStats(fs, leaf)._2))
    }
    m
  }

  /** Compact both legs of a [[graft.dedup.Dedup.writeMinhashIndex]]
    * artifact (the `_config` sidecar is never touched — per-leaf swaps
    * only move leaf data).
    */
  def compactMinhashIndex(spark: SparkSession, path: String, targetFileBytes: Long = 128L << 20): Unit = {
    compactPartitioned(spark, s"$path/bands", targetFileBytes)
    compactPartitioned(spark, s"$path/sketches", targetFileBytes)
  }

  /** Compact a [[graft.similarity.Similarity.writeIvfIndex]] artifact. */
  def compactIvfIndex(spark: SparkSession, path: String, targetFileBytes: Long = 128L << 20): Unit =
    compactPartitioned(spark, path, targetFileBytes)

  /** Compact a [[graft.similarity.Similarity.writeLshIndex]] artifact. */
  def compactLshIndex(spark: SparkSession, path: String, targetFileBytes: Long = 128L << 20): Unit =
    compactPartitioned(spark, path, targetFileBytes)

  /** Compact a [[graft.similarity.Similarity.writeIvfPqIndex]] artifact
    * (the `_centroids` and `_codebook` sidecars are never touched).
    */
  def compactIvfPqIndex(spark: SparkSession, path: String, targetFileBytes: Long = 128L << 20): Unit =
    compactPartitioned(spark, path, targetFileBytes)

  /** Compact a [[LatestUpsert]] artifact — delegates to
    * [[LatestUpsert.compact]], which rewrites the current generation's
    * buckets into a fresh generation and commits it through the SAME
    * atomic manifest publish as a merge: NO crash window and no
    * reader-visible intermediate state — readers racing the compaction
    * see old or new, never partial. (The index compactions above are
    * crash-recoverable per leaf; only the flat-tree [[compact]] /
    * [[compactClustered]] keep the two-rename maintenance-window
    * contract.)
    */
  def compactLatestTable(spark: SparkSession, root: String, filesPerPartition: Int = 1): Unit =
    LatestUpsert.compact(spark, root, filesPerPartition)
}
