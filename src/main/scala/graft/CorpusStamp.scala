package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Content profile of a testdata dir, stamped into every BENCH /
  * SCALEBENCH artifact (and mirrored in TESTDATA.md per round).
  *
  * Why: cross-round bench ratios silently assume the driver-regenerated
  * testdata is weight-constant, and round 8 showed it isn't — every
  * `documents`-text-bound query drifted 1.2–2.2× on untouched code
  * while events/embeddings-bound queries stayed flat, but no artifact
  * recorded the corpus weight so the data-growth hypothesis was
  * unfalsifiable. With the stamp, a future x17 ratio can be read as
  * (time ratio) / (chars ratio) before anyone blames the engine.
  *
  * Cost: one aggregation per table at bench warmup (tables already
  * hot); token count is the cheap whitespace `split` size — a weight
  * proxy, not the engine's tokenizer.
  */
object CorpusStamp {
  def json(spark: SparkSession, sfDir: String): String = {
    def safe(body: => String): String =
      try body
      catch { case e: Throwable => s"""{"err":"${e.getClass.getSimpleName}"}""" }
    val docs = safe {
      val r = spark.read
        .parquet(s"$sfDir/documents.parquet")
        .agg(
          count(lit(1)).as("n"),
          sum(length(col("text"))).as("chars"),
          sum(size(split(col("text"), "\\s+"))).as("tokens"))
        .head()
      s"""{"n_docs":${r.getLong(0)},"chars":${r.getLong(1)},"ws_tokens":${r.getLong(2)}}"""
    }
    val emb = safe {
      val r = spark.read
        .parquet(s"$sfDir/embeddings.parquet")
        .agg(count(lit(1)).as("n"), max(size(col("embedding"))).as("dim"))
        .head()
      s"""{"n_vecs":${r.getLong(0)},"dim":${r.getInt(1)}}"""
    }
    val ev = safe {
      val n = spark.read.parquet(s"$sfDir/events.parquet").count()
      s"""{"n_events":$n}"""
    }
    s"""{"documents":$docs,"embeddings":$emb,"events":$ev}"""
  }
}
