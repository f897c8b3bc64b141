package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, hash, pmod, struct, lit}

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
  * `_centroids`), then atomically swaps the rewritten tree in.
  *
  * Maintenance op, single-writer by contract: run it when no append is
  * in flight (the swap is two renames; a concurrent append could land
  * between them and be dropped with the old tree). At 100 TB this is
  * the nightly table-service job every lake runs; on a transactional
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

  /** Rewrite the parquet tree at `dir` into right-sized files.
    *
    * Flat layout (`partitionCols` empty): one shuffle into
    * ceil(bytes / targetFileBytes) tasks → that many output files.
    *
    * Partitioned layout: rows shuffle on (partitionCols, salt) where
    * salt = hash of the whole row mod `filesPerPartition` — every
    * partition directory collapses to exactly `filesPerPartition`
    * files (deterministic, no round-robin nondeterminism). The caller
    * sizes `filesPerPartition` from its own bytes-per-partition
    * knowledge (an index partition is ~corpus/partitions, which the
    * index owner knows; 1 is right until a partition outgrows a
    * row-group-friendly file).
    *
    * Sidecar dirs (`_config`, `_centroids`, ...) are carried into the
    * rewritten tree before the swap, so a compacted index stays
    * self-describing.
    */
  def compact(
      spark: SparkSession,
      dir: String,
      partitionCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L << 20,
      filesPerPartition: Int = 1
  ): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (bytes, _) = dataStats(spark, dir)
    val df = spark.read.parquet(dir)
    val tmp = new Path(dir + ".__compacting")
    fs.delete(tmp, true)
    if (partitionCols.nonEmpty) {
      val dataCols = df.columns.filterNot(partitionCols.contains)
      val salt = pmod(hash(struct(dataCols.map(col): _*)), lit(filesPerPartition))
      df.repartition((partitionCols.map(col) :+ salt): _*)
        .write
        .partitionBy(partitionCols: _*)
        .parquet(tmp.toString)
    } else {
      val k = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
      df.repartition(k).write.parquet(tmp.toString)
    }
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

  /** Compact both legs of a [[graft.dedup.Dedup.writeMinhashIndex]]
    * artifact (the `_config` sidecar rides the swap untouched).
    */
  def compactMinhashIndex(spark: SparkSession, path: String, targetFileBytes: Long = 128L << 20): Unit = {
    compact(spark, s"$path/bands", Seq("band"), targetFileBytes)
    compact(spark, s"$path/sketches", Nil, targetFileBytes)
  }

  /** Compact a [[graft.similarity.Similarity.writeIvfIndex]] artifact. */
  def compactIvfIndex(spark: SparkSession, path: String, filesPerPartition: Int = 1): Unit =
    compact(spark, path, Seq("cell"), filesPerPartition = filesPerPartition)

  /** Compact a [[graft.similarity.Similarity.writeLshIndex]] artifact. */
  def compactLshIndex(spark: SparkSession, path: String, filesPerPartition: Int = 1): Unit =
    compact(spark, path, Seq("tbl", "bucket"), filesPerPartition = filesPerPartition)
}
