package graft.scratch

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Sessions, io}
import graft.dedup.Dedup
import graft.streaming.DedupIngest

/** Throwaway phase profiler for the text ingest gate's per-batch fixed
  * cost: seed the index like IngestBench's small regime, then time one
  * 714-doc batch PHASE BY PHASE (guard, signatures, probe, components,
  * appends) to attribute the post-bucketing per-batch doubling.
  * Run: `sbt "Test/runMain graft.scratch.IngestPhaseProbe"`.
  */
object IngestPhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    import spark.implicits._
    val docs = io.Tables.documents(spark, "/root/testdata/sf0.1").select($"doc_id", $"text")
    val mod = 7
    val seed = docs.filter($"doc_id" % mod === 0)
    val root = Files.createTempDirectory("phaseprobe").toString
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("seed") {
      DedupIngest.initIndexes(seed, "doc_id", "text", s"$root/idx")
      seed.write.mode("overwrite").parquet(s"$root/corpus")
    }
    for (b <- 1 to 3) {
      val batch = docs.filter($"doc_id" % mod === b).localCheckpoint()
      System.err.println(s"[phase] ---- batch $b (${batch.count()} rows)")
      val exact = t("exact-keeper")(
        graft.streaming.DedupIngest.accepted(spark, s"$root/idx", batch, "doc_id", "text"))
      // re-run phases individually (the line above ran the whole gate)
      val novel = t("novelOnly")(
        Dedup.novelOnly(spark, s"$root/idx/fingerprints", batch, "text").localCheckpoint())
      val (h0, b0) = Dedup.batchSignatures(spark, s"$root/idx/minhash", novel, "doc_id", "text")
      val (hB, bB) = t("signatures")((h0.localCheckpoint(), b0.localCheckpoint()))
      val pairs = t("probe")(
        Dedup.incrementalLshPairsPre(spark, s"$root/idx/minhash", hB, bB, 0.3).localCheckpoint())
      System.err.println(s"[phase] pairs: ${pairs.count()}")
      val keep = t("full-gate") {
        DedupIngest.accepted(spark, s"$root/idx", batch, "doc_id", "text").localCheckpoint()
      }
      t("append-fp")(Dedup.appendToFingerprintIndex(keep, "text", s"$root/idx/fingerprints"))
      val keepIds = keep.select($"doc_id".as("id"))
      t("append-mh")(Dedup.appendToMinhashIndexPre(
        s"$root/idx/minhash",
        hB.join(keepIds, Seq("id"), "left_semi"),
        bB.join(keepIds, Seq("id"), "left_semi")))
      t("append-corpus")(keep.write.mode("append").parquet(s"$root/corpus"))
    }
    spark.stop()
  }
}
