package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.io.{LatestUpsert, Tables}
import graft.similarity.Similarity
import graft.streaming.{DedupIngest, SemDedupIngest}

/** Streaming ingest-gate throughput: drives BOTH dedup-at-the-door
  * gates (text MinHash gate `DedupIngest`, semantic IVF gate
  * `SemDedupIngest`) as real `foreachBatch` streams, measuring
  * end-to-end per-batch wall time — gate + index probe + corpus/index
  * append, checkpointed exactly as production would run. One JSON line
  * on stdout, mirrored to INGESTBENCH.json.
  *
  * TWO frame-size regimes, because the per-batch cost model is
  * fixed-cost-dominated at tiny frames (components rounds, probe jobs,
  * parquet commits — a few fixed Spark jobs per batch) and the
  * amortization claim should be MEASURED, not asserted:
  *  - `small`: the sf corpus split into seed + nBatches frames
  *    (~n/(nBatches+1) rows per frame — ~700 docs / ~290 vectors at
  *    sf0.1);
  *  - `large`: the SAME split geometry over the ×10 ScaleBench corpus
  *    (workload-preserving isometric copies — see
  *    [[ScaleBench.synthesize]]), so every frame carries ~10× the rows
  *    through the identical gate. If the per-batch cost is mostly
  *    fixed, steady rows/s rises ~10×; if it were per-row, rows/s
  *    would stay flat.
  *
  * Both headline regimes run in the MAINTAINED configuration
  * (per-batch threshold self-maintenance, `maxFilesPerLeaf = 4`) —
  * the configuration a production stream deploys; `plain_small` is
  * the unmaintained twin kept for the overhead comparison, and
  * `maintained_3x` stretches the maintained run to 3× the batches as
  * the long-stream steady-state evidence.
  *
  * Methodology mirrors StreamBench: row construction outside the timed
  * span; batch 0 absorbs stream/codegen init and is dropped from the
  * steady-state throughput; Double.toString rendering (locale-safe).
  * The corpus is ingested once per gate per regime (appends are the
  * non-idempotent step — a rep loop would re-gate an already-ingested
  * corpus and measure rejection, not ingest).
  */
object IngestBench {

  private def r4(x: Double): Double = math.round(x * 10000) / 10000.0

  private def gateJson(
      times: IndexedSeq[Double],
      sizes: IndexedSeq[Int],
      kept: Long,
      maxLeafFiles: Option[Int] = None
  ): String = {
    // batch 0 absorbs stream/codegen/init — steady-state drops it
    val steady = times.drop(1)
    val steadyRows = sizes.drop(1).map(_.toLong).sum
    val rps = if (steady.sum > 0) (steadyRows / steady.sum).toLong else 0L
    val meanFrame = if (sizes.nonEmpty) sizes.map(_.toLong).sum / sizes.length else 0L
    val leaf = maxLeafFiles.map(m => s""""max_leaf_files":$m,""").getOrElse("")
    s"""{"rows":${sizes.map(_.toLong).sum},"mean_frame_rows":$meanFrame,"accepted":$kept,$leaf""" +
      s""""rows_per_sec_steady":$rps,"batch_sec":${times.map(t => r4(t).toString).mkString("[", ",", "]")}}"""
  }

  /** Max parquet-file count over the partition leaves under `dirs`
    * (the shared walker — one definition of "leaf" for policy, bench,
    * and spec).
    */
  private def maxLeafFiles(spark: SparkSession, dirs: Seq[String]): Int =
    graft.io.Compaction.maxLeafFiles(spark, dirs)

  /** Run all three gates over `sfDir` split seed + nBatches frames;
    * returns the three gate JSON fragments (text, semantic, latest).
    * `maxFilesPerLeaf` > 0 turns on each gate's per-batch
    * self-maintenance (the leaf-scoped threshold compaction), with the
    * end-state max leaf file count published next to the batch times —
    * the steady-state claim ("a long stream's per-batch cost stays
    * flat because probes never degrade into file listings") as a
    * measured artifact instead of an assertion.
    */
  def runRegime(
      spark: SparkSession,
      sfDir: String,
      nBatches: Int,
      maxFilesPerLeaf: Int = 0
  ): (String, String, String) = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mod = nBatches + 1

    // ---- text gate: documents split into seed + nBatches frames ----
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val docSeed = docs.filter($"doc_id" % mod === 0)
    val docFrames: IndexedSeq[Seq[(Long, String)]] = (1 to nBatches).map { b =>
      docs.filter($"doc_id" % mod === b).collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    val textRoot = Files.createTempDirectory("ingestbench_text").toString
    DedupIngest.initIndexes(docSeed, "doc_id", "text", s"$textRoot/idx")
    docSeed.write.mode("overwrite").parquet(s"$textRoot/corpus")
    val textIn = MemoryStream[(Long, String)]
    val textQ = DedupIngest.start(
      textIn.toDF.toDF("doc_id", "text"), "doc_id", "text",
      s"$textRoot/idx", s"$textRoot/corpus", s"$textRoot/ckpt",
      maxFilesPerLeaf = maxFilesPerLeaf)
    val textTimes = docFrames.map { rows =>
      val t0 = System.nanoTime()
      textIn.addData(rows)
      textQ.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    }
    textQ.stop()
    val textKept = spark.read.parquet(s"$textRoot/corpus").count() - docSeed.count()

    // ---- semantic gate: embeddings split the same way ----
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val embSeed = emb.filter($"vec_id" % mod === 0)
    val embFrames: IndexedSeq[Seq[(Long, Seq[Float])]] = (1 to nBatches).map { b =>
      emb.filter($"vec_id" % mod === b).collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    }
    val semRoot = Files.createTempDirectory("ingestbench_sem").toString + "/idx"
    Similarity.writeIvfIndex(embSeed, "vec_id", "embedding", semRoot, nCentroids = 16,
      centroidModel = Some(Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16)))
    val semIn = MemoryStream[(Long, Seq[Float])]
    val semQ = SemDedupIngest.start(
      semIn.toDF.toDF("vec_id", "embedding"), "vec_id", "embedding",
      semRoot, s"$semRoot-ckpt", threshold = 0.4, maxFilesPerLeaf = maxFilesPerLeaf)
    val semTimes = embFrames.map { rows =>
      val t0 = System.nanoTime()
      semIn.addData(rows)
      semQ.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    }
    semQ.stop()
    val semKept = spark.read.parquet(semRoot).count() - embSeed.count()

    // ---- latest-value upsert gate (S5 incremental): events split the
    // same way; each frame merges into the bucket-partitioned latest
    // table with touched-dir-only reads and rewrites. "accepted" here
    // is the FINAL key count (one row per key — the table's contract).
    val ev = Tables
      .events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts_us", $"event_type", $"value")
    val evSeed = ev.filter($"event_id" % mod === 0)
    val evFrames: IndexedSeq[Seq[(Long, Long, Long, String, Double)]] = (1 to nBatches).map { b =>
      ev.filter($"event_id" % mod === b)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
        .toSeq
    }
    val upRoot = Files.createTempDirectory("ingestbench_latest").toString + "/t"
    LatestUpsert.init(spark, upRoot, evSeed,
      keyCols = Seq("user_id"), orderCols = Seq("ts_us", "event_id"), buckets = 64)
    val upIn = MemoryStream[(Long, Long, Long, String, Double)]
    val upQ = LatestUpsert.start(
      upIn.toDF.toDF("user_id", "event_id", "ts_us", "event_type", "value"),
      upRoot, s"$upRoot-ckpt", maxFilesPerBucket = maxFilesPerLeaf)
    val upTimes = evFrames.map { rows =>
      val t0 = System.nanoTime()
      upIn.addData(rows)
      upQ.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    }
    upQ.stop()
    val upKeys = LatestUpsert.read(spark, upRoot).count()

    val maintained = maxFilesPerLeaf > 0
    val textLeaf =
      if (maintained)
        Some(maxLeafFiles(spark,
          Seq(s"$textRoot/idx/fingerprints", s"$textRoot/idx/minhash/bands", s"$textRoot/idx/minhash/sketches")))
      else None
    val semLeaf = if (maintained) Some(maxLeafFiles(spark, Seq(semRoot))) else None
    val upLeaf =
      if (maintained) Some(LatestUpsert.bucketFileCounts(spark, upRoot).values.maxOption.getOrElse(0))
      else None

    (gateJson(textTimes, docFrames.map(_.size), textKept, textLeaf),
      gateJson(semTimes, embFrames.map(_.size), semKept, semLeaf),
      gateJson(upTimes, evFrames.map(_.size), upKeys, upLeaf))
  }

  def main(args: Array[String]): Unit = {
    val loadStart = LoadStamp.json() // machine-state evidence for the ±20% run-variance note
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_INGEST_BATCHES", "6").toInt
    val factor = sys.env.getOrElse("SPARK_GRAFT_INGEST_LARGE_FACTOR", "10").toInt
    val largeDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", s"/tmp/graft_scale$factor")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    // large-frame corpus: ScaleBench's workload-preserving ×factor
    // synthesis, cached behind the same sentinel ScaleBench uses
    val sentinel = java.nio.file.Paths.get(s"$largeDir/_DONE")
    if (!Files.exists(sentinel) || Files.readString(sentinel) != ScaleBench.stamp(factor, sfDir))
      ScaleBench.synthesize(spark, sfDir, largeDir, factor)

    // HEADLINE regimes run MAINTAINED (per-batch threshold
    // self-maintenance on, the production configuration — a long
    // stream without it degrades into file listings, so an
    // unmaintained headline would measure a configuration no one
    // should deploy); the plain regime is retained as the twin so the
    // maintenance overhead at small frames stays visible
    val (textSmall, semSmall, upSmall) = runRegime(spark, sfDir, nBatches, maxFilesPerLeaf = 4)
    val (textLarge, semLarge, upLarge) = runRegime(spark, largeDir, nBatches, maxFilesPerLeaf = 4)
    val (textPlain, semPlain, upPlain) = runRegime(spark, sfDir, nBatches)
    // the steady-state regime: 3× the batches with per-batch
    // self-maintenance on — the flat batch_sec tail plus the bounded
    // max_leaf_files is the "long stream stays healthy" evidence
    val (textMaint, semMaint, upMaint) = runRegime(spark, sfDir, nBatches * 3, maxFilesPerLeaf = 4)

    val json =
      s"""{"metric":"ingest_gate_throughput","batches":$nBatches,"sf":"$sfDir","large_factor":$factor,""" +
        s""""max_files_per_leaf":4,""" +
        s""""small":{"text_gate":$textSmall,"sem_gate":$semSmall,"latest_gate":$upSmall},""" +
        s""""large":{"text_gate":$textLarge,"sem_gate":$semLarge,"latest_gate":$upLarge},""" +
        s""""plain_small":{"max_files_per_leaf":0,"text_gate":$textPlain,"sem_gate":$semPlain,"latest_gate":$upPlain},""" +
        s""""maintained_3x":{"max_files_per_leaf":4,"batches":${nBatches * 3},""" +
        s""""text_gate":$textMaint,"sem_gate":$semMaint,"latest_gate":$upMaint},""" +
        s""""load":{"start":$loadStart,"end":${LoadStamp.json()}},"calib":${HostCalib.json()}}"""
    println(json)
    Files.writeString(java.nio.file.Paths.get("INGESTBENCH.json"), json + "\n")
    spark.stop()
  }
}
