package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps

/** End-to-end training-data sweep over the real documents table — the
  * user journey the operator suite exists for, composed in pipeline
  * order: redact → quality filter → exact dedup → near-dup removal →
  * decontaminate → span-level cleanup → chunk → pack. Each stage's
  * contract is asserted on the stage's actual output, not in isolation.
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("full sweep composes: every stage monotonically filters, chunks pack within budget rule") {
    val docs = graft.io.Tables.documents(spark, sf001)
    val total = docs.count()

    // 1. redact PII (projection — row count unchanged)
    val redacted = docs.withColumn("text", TextOps.redactPii($"text"))
    assert(redacted.count() == total)

    // 2. quality filter
    val quality = TextOps.gopherQuality(redacted, "doc_id", "text")
    val kept = redacted.join(quality.filter($"keep_doc").select("doc_id"), Seq("doc_id"))
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)

    // 3. exact dedup: drop non-keeper group members
    val dupes = Dedup.exactDuplicates(kept, "doc_id", "text")
      .filter($"doc_id" =!= $"keeper_id").select("doc_id")
    val exactDeduped = kept.join(dupes, Seq("doc_id"), "left_anti")
    val nExact = exactDeduped.count()
    assert(nExact <= nKept)

    // 4. near-dup removal via PROPER cluster resolution: connected
    // components over the pair list, keep one doc (the min id) per
    // cluster — pairwise "drop id_b" would over-drop transitive chains
    val clusters = Dedup.connectedComponents(
      Dedup.minhashLshPairs(exactDeduped, "doc_id", "text"), "id_a", "id_b")
    val nearDeduped = Dedup.keepersOnly(exactDeduped, "doc_id", clusters)
    val nNear = nearDeduped.count()
    assert(nNear <= nExact)
    // exactly one survivor per cluster
    val survivors = nearDeduped.join(clusters.select($"id".as("doc_id"), $"component"), Seq("doc_id"))
    assert(survivors.groupBy($"component").count().filter($"count" =!= 1).count() == 0)

    // 5. decontaminate against a synthetic benchmark slice
    val benchmark = docs.filter(pmod($"doc_id", lit(101)) === 0).select("doc_id", "text")
    val clean = Dedup.decontaminate(nearDeduped, benchmark, "doc_id", "text")
    val nClean = clean.count()
    assert(nClean <= nNear && nClean > 0)

    // 6. span-level repetition cleanup: drop docs whose dup-span
    // coverage exceeds the threshold (x12 rule), then strip the
    // remaining repeated spans keeping each span's first occurrence
    // (x13 rule) — document-level dedup upstream leaves exactly this
    // partial/boilerplate repetition behind
    val spanStats = TextOps.dupSpanStats(clean, "doc_id", "text", n = 13, maxDupSpanFrac = 0.5)
    val unflagged = clean.join(spanStats.filter($"keep_doc").select("doc_id"), Seq("doc_id"))
    val nUnflagged = unflagged.count()
    assert(nUnflagged <= nClean && nUnflagged > 0)
    val stripped = TextOps.dedupSpansExact(unflagged, "doc_id", "text", n = 13)
    assert(stripped.filter($"n_removed" > $"n_tokens").count() == 0)
    val despanned = unflagged
      .drop("text")
      .join(stripped.select($"doc_id", $"clean_text".as("text")), Seq("doc_id"))
      .filter(length($"text") > 0) // fully-stripped docs leave the corpus
    val nDespanned = despanned.count()
    assert(nDespanned <= nUnflagged && nDespanned > 0)

    // 7. chunk to 40-token windows, 10 overlap
    val chunks = despanned
      .select($"doc_id", $"source", posexplode(TextOps.chunkTokens($"text", 40, 10)).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", size(split($"chunk_text", " ")).cast("long"))
    val nChunks = chunks.count()
    assert(nChunks >= nDespanned) // every surviving doc yields >= 1 chunk
    assert(chunks.filter($"n_tokens" > 40).count() == 0)

    // 8. pack chunks into 2048-token bins per source shard
    val packed = TextOps.packIntoBins(
      chunks.withColumn("ord", $"doc_id" * 1000 + $"chunk_idx"),
      "source", "ord", "n_tokens", budget = 2048
    )
    // bins are dense per shard starting at 0, and prefix sums respect
    // the budget rule: a bin's pre-assignment prefix < (bin+1)*budget
    val binStats = packed.groupBy("source", "bin_id").agg(sum($"n_tokens").as("bin_tokens")).collect()
    assert(binStats.nonEmpty)
    val binsPerSource = packed.groupBy("source").agg(countDistinct($"bin_id").as("n"), max($"bin_id").as("mx")).collect()
    binsPerSource.foreach(r => assert(r.getAs[Long]("n") == r.getAs[Long]("mx") + 1, s"bins not dense: $r"))

    info(s"sweep: $total docs -> $nKept quality -> $nExact exact-dedup -> $nNear near-dedup -> $nClean clean -> $nDespanned span-cleaned -> $nChunks chunks")
  }
}
