package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.io.Compaction
import graft.similarity.Similarity
import graft.streaming.{DedupIngest, SemDedupIngest}

/** Leaf-scoped threshold compaction — the self-maintenance the ingest
  * gates run inside their foreachBatch loop. Load-bearing claims:
  * (1) maintenance preserves content exactly and only rewrites
  * over-threshold leaves; (2) every reachable crash state of the
  * per-leaf swap recovers to the exact pre-crash rows; (3) a gated
  * stream with maintenance on admits the IDENTICAL corpus as one
  * without, ends under the file-count bound, and its indexes answer
  * probes identically.
  */
class LeafMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString
  private lazy val fs: FileSystem =
    new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One file per leaf per append: leaf b=k holds `appends` files. */
  private def buildTree(dir: String, appends: Int): Unit =
    (1 to appends).foreach { i =>
      Seq.tabulate(12)(j => (j % 3, i * 100L + j))
        .toDF("b", "v")
        .repartition(col("b"))
        .write.mode("append").partitionBy("b").parquet(dir)
    }

  private def rowsOf(dir: String): Seq[(Int, Long)] =
    spark.read.parquet(dir).select("b", "v").as[(Int, Long)].collect().sorted.toSeq

  private def leafFiles(leaf: Path): Int =
    fs.listStatus(leaf).count { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Max parquet-file count over the partition leaves under `dir`. */
  private def maxLeafFiles(dir: String): Int = {
    def walk(d: Path): Seq[Int] =
      fs.listStatus(d).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (!st.isDirectory || n.startsWith("_") || n.startsWith(".") || !n.contains("=")) Nil
        else {
          val hasData = fs.listStatus(st.getPath).exists(c => c.isFile && c.getPath.getName.endsWith(".parquet"))
          if (hasData) Seq(leafFiles(st.getPath)) else walk(st.getPath)
        }
      }
    val counts = walk(new Path(dir))
    if (counts.isEmpty) 0 else counts.max
  }

  private def noHelpers(dir: String): Boolean =
    !fs.listStatus(new Path(dir)).exists { st =>
      val n = st.getPath.getName
      n.startsWith("._cmp_") || n.startsWith("._oldcmp_")
    }

  test("maintainPartitioned compacts only over-threshold leaves and preserves content") {
    val dir = tmp("leafmaint")
    buildTree(dir, 6)
    val before = rowsOf(dir)
    assert(leafFiles(new Path(s"$dir/b=0")) == 6)

    val compacted = Compaction.maintainPartitioned(spark, dir, maxFilesPerLeaf = 4)
    assert(compacted == 3, "all three leaves were over threshold")
    assert(rowsOf(dir) == before, "maintenance changed the data")
    (0 to 2).foreach(b => assert(leafFiles(new Path(s"$dir/b=$b")) == 1))
    assert(Compaction.maintainPartitioned(spark, dir, maxFilesPerLeaf = 4) == 0, "idle maintenance must be a no-op")

    // an under-threshold tree is untouched entirely (file identity, not just content)
    val dir2 = tmp("leafmaintsmall")
    buildTree(dir2, 3)
    val namesBefore = fs.listStatus(new Path(s"$dir2/b=1")).map(_.getPath.getName).sorted.toSeq
    assert(Compaction.maintainPartitioned(spark, dir2, maxFilesPerLeaf = 4) == 0)
    assert(fs.listStatus(new Path(s"$dir2/b=1")).map(_.getPath.getName).sorted.toSeq == namesBefore)
  }

  test("oversized leaves honor targetFileBytes (per-leaf sizing, not one monolith file)") {
    val dir = tmp("leafsize")
    buildTree(dir, 6)
    val before = rowsOf(dir)
    val leafBytes = fs.listStatus(new Path(s"$dir/b=0"))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    // a target below the leaf's size forces the right-sized path:
    // ceil(bytes/target) > 1 output files, never a single monolith
    val target = leafBytes / 2 + 1
    Compaction.maintainPartitioned(spark, dir, maxFilesPerLeaf = 4, targetFileBytes = target)
    assert(rowsOf(dir) == before)
    (0 to 2).foreach { b =>
      val n = leafFiles(new Path(s"$dir/b=$b"))
      assert(n >= 2, s"leaf b=$b collapsed to $n file(s) despite bytes > targetFileBytes")
      assert(n <= 4, s"leaf b=$b still over threshold: $n")
    }
  }

  test("non-canonical partition values take the per-leaf path — no inference round-trip, no row merging") {
    val dir = tmp("leafnoncanon")
    // two DISTINCT leaves whose dir values collide under partition-type
    // inference ("01" and "1" both re-infer as int 1): the batched
    // root-read rewrite would merge them; the value guard must route
    // them per-leaf, where a leaf's name is never re-derived
    (1 to 5).foreach { i =>
      Seq.tabulate(4)(j => i * 10L + j).toDF("v").repartition(1)
        .write.mode("append").parquet(s"$dir/b=01")
      Seq.tabulate(4)(j => i * 1000L + j).toDF("v").repartition(1)
        .write.mode("append").parquet(s"$dir/b=1")
    }
    def leafVals(name: String): Seq[Long] =
      spark.read.parquet(s"$dir/$name").select("v").as[Long].collect().sorted.toSeq
    val before01 = leafVals("b=01")
    val before1 = leafVals("b=1")
    assert(before01 != before1 && before01.nonEmpty)

    val n = Compaction.maintainPartitioned(spark, dir, maxFilesPerLeaf = 2)
    assert(n == 2)
    assert(leafVals("b=01") == before01, "leaf b=01 gained/lost rows through inference round-trip")
    assert(leafVals("b=1") == before1, "leaf b=1 gained/lost rows through inference round-trip")
    assert(leafFiles(new Path(s"$dir/b=01")) == 1 && leafFiles(new Path(s"$dir/b=1")) == 1)

    // the guard must consider the WHOLE tree, not just the due leaves:
    // here only b=1 is due, but the non-due b=01 shares its inferred
    // value — a batched root-read rewrite would fold b=01's rows into
    // b=1's staged dir and duplicate them
    val dir2 = tmp("leafnoncanon2")
    (1 to 5).foreach { i =>
      Seq.tabulate(4)(j => i * 1000L + j).toDF("v").repartition(1)
        .write.mode("append").parquet(s"$dir2/b=1") // 5 files: due at max=2
    }
    Seq.tabulate(4)(j => 7000L + j).toDF("v").repartition(1)
      .write.mode("append").parquet(s"$dir2/b=01") // 1 file: NOT due
    def vals2(name: String): Seq[Long] =
      spark.read.parquet(s"$dir2/$name").select("v").as[Long].collect().sorted.toSeq
    val b1 = vals2("b=1")
    val b01 = vals2("b=01")
    assert(Compaction.maintainPartitioned(spark, dir2, maxFilesPerLeaf = 2) == 1)
    assert(vals2("b=1") == b1, "due leaf absorbed the non-due colliding leaf's rows")
    assert(vals2("b=01") == b01, "non-due leaf changed")
  }

  test("crash-state sweep: every reachable per-leaf swap state recovers to the exact rows") {
    val dir = tmp("leafcrash")
    buildTree(dir, 5)
    val before = rowsOf(dir)
    val leaf = new Path(s"$dir/b=1")
    val tmpP = new Path(s"$dir/._cmp_b=1")
    val oldP = new Path(s"$dir/._oldcmp_b=1")
    val leafVals = before.filter(_._1 == 1).map(_._2)

    // crash DURING the tmp write: live leaf + partial tmp
    fs.mkdirs(tmpP)
    fs.create(new Path(tmpP, "part-garbage.parquet")).close()
    Compaction.recoverPartitioned(spark, dir)
    assert(!fs.exists(tmpP) && rowsOf(dir) == before && noHelpers(dir))

    // crash BETWEEN the two renames: tmp complete, leaf moved aside
    leafVals.toDF("v").repartition(1).write.parquet(tmpP.toString)
    require(fs.rename(leaf, oldP))
    Compaction.recoverPartitioned(spark, dir)
    assert(rowsOf(dir) == before, "roll-forward lost rows")
    assert(!fs.exists(tmpP) && !fs.exists(oldP) && noHelpers(dir))
    assert(leafFiles(leaf) == 1, "roll-forward should land the compacted leaf")

    // crash AFTER the swap, before old-GC: compacted leaf + lingering old
    require(fs.rename(leaf, oldP))
    leafVals.toDF("v").repartition(1).write.parquet(leaf.toString)
    Compaction.recoverPartitioned(spark, dir)
    assert(rowsOf(dir) == before && !fs.exists(oldP) && noHelpers(dir))

    // defensive state: only the set-aside original remains
    require(fs.rename(leaf, oldP))
    Compaction.recoverPartitioned(spark, dir)
    assert(rowsOf(dir) == before && !fs.exists(oldP) && noHelpers(dir))

    // crashed BATCHED maintenance: a leftover staging tree is garbage
    // (unswapped leaves kept their correct multi-file content) and the
    // recovery walk deletes it
    val stage = new Path(s"$dir/._cmpstage_123")
    fs.mkdirs(new Path(stage, "b=0"))
    fs.create(new Path(stage, "b=0/part-junk.parquet")).close()
    Compaction.recoverPartitioned(spark, dir)
    assert(!fs.exists(stage) && rowsOf(dir) == before)

    // a maintenance pass over the recovered tree still converges
    Compaction.maintainPartitioned(spark, dir, maxFilesPerLeaf = 1)
    assert(rowsOf(dir) == before)
  }

  test("text gate with maintenance admits the identical corpus, bounded leaves, identical probes") {
    val docs = graft.io.Tables.documents(spark, sf0001).select("doc_id", "text")
    val seed = docs.filter(col("doc_id") % 6 === 0)
    val frames = (1 to 5).map { b =>
      docs.filter(col("doc_id") % 6 === b).collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def run(maxFilesPerLeaf: Int): String = {
      val root = tmp(s"maintgate$maxFilesPerLeaf")
      DedupIngest.initIndexes(seed, "doc_id", "text", s"$root/idx")
      seed.write.mode("overwrite").parquet(s"$root/corpus")
      val in = MemoryStream[(Long, String)]
      val q = DedupIngest.start(in.toDF.toDF("doc_id", "text"), "doc_id", "text",
        s"$root/idx", s"$root/corpus", s"$root/ckpt", maxFilesPerLeaf = maxFilesPerLeaf)
      try frames.foreach { f => in.addData(f); q.processAllAvailable() }
      finally q.stop()
      root
    }

    val maintained = run(2)
    val plain = run(0)

    def corpusIds(root: String): Seq[Long] =
      spark.read.parquet(s"$root/corpus").select("doc_id").as[Long].collect().sorted.toSeq
    assert(corpusIds(maintained) == corpusIds(plain), "maintenance changed gate admissions")

    val trees = Seq("fingerprints", "minhash/bands", "minhash/sketches")
    val boundM = trees.map(t => maxLeafFiles(s"$maintained/idx/$t")).max
    val boundP = trees.map(t => maxLeafFiles(s"$plain/idx/$t")).max
    assert(boundM <= 2, s"maintained run exceeded the leaf bound: $boundM")
    assert(boundP > 2, s"unmaintained run stayed under the bound ($boundP) — the test lost its teeth")

    // both indexes must answer a fresh probe identically
    val probe = docs.filter(col("doc_id") % 6 === 0).limit(30)
      .union(docs.filter(col("doc_id") % 6 === 3).limit(30))
    def acceptedIds(root: String): Seq[Long] =
      DedupIngest.accepted(spark, s"$root/idx", probe, "doc_id", "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
    assert(acceptedIds(maintained) == acceptedIds(plain), "maintained index answers probes differently")
  }

  test("semantic gate with maintenance: identical index content, bounded cell dirs") {
    val emb = graft.io.Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val seed = emb.filter(col("vec_id") % 6 === 0)
    val model = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8)
    val frames = (1 to 5).map { b =>
      emb.filter(col("vec_id") % 6 === b).collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def run(maxFilesPerLeaf: Int): String = {
      val root = tmp(s"semmaint$maxFilesPerLeaf") + "/idx"
      Similarity.writeIvfIndex(seed, "vec_id", "embedding", root, nCentroids = 8, centroidModel = Some(model))
      val in = MemoryStream[(Long, Seq[Float])]
      val q = SemDedupIngest.start(in.toDF.toDF("vec_id", "embedding"), "vec_id", "embedding",
        root, s"$root-ckpt", threshold = 0.4, maxFilesPerLeaf = maxFilesPerLeaf)
      try frames.foreach { f => in.addData(f); q.processAllAvailable() }
      finally q.stop()
      root
    }

    val maintained = run(2)
    val plain = run(0)

    def ids(root: String): Seq[Long] =
      spark.read.parquet(root).select("id").as[Long].collect().sorted.toSeq
    assert(ids(maintained) == ids(plain), "maintenance changed the admitted vectors")
    assert(maxLeafFiles(maintained) <= 2, s"maintained cells exceeded the bound: ${maxLeafFiles(maintained)}")
    assert(maxLeafFiles(plain) > 2, "unmaintained run stayed under the bound — the test lost its teeth")
  }
}
