package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    // load GATE before anything is timed (r11 verdict ask #4): the
    // A/B experiment proved hot-host reps inflate 1.25–1.57× on the
    // sensitive family; rather than attributing after the fact, wait
    // (bounded) for the host to go idle. Proceed-and-stamp on timeout
    // — the stamp keeps attribution possible when the gate gives up.
    val gateWaitSec = LoadStamp.awaitIdle(
      threshold = sys.env.getOrElse("SPARK_GRAFT_LOADGATE", "3.0").toDouble)
    // host-load stamp at both ends of the run (see LoadStamp): an
    // anomalous rep ships with its own machine-state evidence
    val loadStart = LoadStamp.json()
    // host-SPEED stamp (see HostCalib): a fixed CPU workload timed
    // after the gate, so a uniform cross-round suite drift can be read
    // against the measured host ratio instead of inferred from the
    // untouched-query median
    val calibJson = HostCalib.json()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus)
    // Warm the JVM/codegen/IO paths so the first timed query doesn't
    // absorb session startup (~5 s otherwise lands on whichever query
    // sorts first).
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // Also warm the BENCH-scale tables themselves (footer reads, page
    // cache, column decoders): entry() runs at sf0.001, which left the
    // first sfDir scans cold — in r2 that manufactured phantom per-query
    // regressions (a2 logged 7.3 s vs 1.0 s warm) in whichever slots ran
    // early.
    Seq("lineitem", "orders", "part", "customer", "events", "documents", "embeddings")
      .foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] warmup $t failed: $e") }
      }
    // Corpus content stamp (computed at warmup, while tables are hot):
    // the round-8 text-family drift (x17 1.16→2.50 s on untouched code)
    // was unattributable because BENCH carried no record of how HEAVY
    // the regenerated documents corpus was — timings across rounds were
    // compared as if the data were constant. The stamp makes text-query
    // ratios chars-normalizable across regenerations.
    val corpusJson = CorpusStamp.json(spark, sfDir)
    // noop sink forces full materialization of every column (count() would
    // let Catalyst prune projections and under-report work).
    // Median of 3 runs per query: single-run sub-second slots moved >20%
    // across rounds with untouched code (scheduler/GC ordering noise);
    // the median is stable enough to make a >20% delta a real signal.
    // odd reps → true median; even reps → upper median (documented
    // choice; keep reps odd for round-over-round comparisons)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    // isolation harness: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run
    // to the named queries (fresh-JVM single-query runs are how the r6
    // suite-contention hypothesis gets tested); unset = full suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a misspelled/stale name would otherwise silently produce a partial
    // artifact indistinguishable from a full-suite run — fail loudly
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(
        unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(", ")}"
      )
    }
    val timed = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // a failing rep's wall time is NOT a sample — timing the exception
      // path would report a bogus (usually fast) median for an
      // intermittently failing query; the median is over successful reps
      // only, and a query with zero successes goes to the "failed" list
      // (NOT a sentinel value in the timings map — a downstream consumer
      // summing or ranking the map must never ingest a non-timing)
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: $e"); None
        }
      }
      // Inter-query isolation: the iterative queries (d8/d8b/d11 via
      // connectedComponents) leave their FINAL localCheckpoint label
      // blocks in the block manager — the API can't release them before
      // its caller consumes the result — and ~10 index-materializing
      // queries add fitted-model/cache residue. Left in place, the
      // residue accumulates across the alphabetical run and the r6
      // bench showed it as suite-wide contention: untouched queries
      // regressed 2–4× with rep spreads like [15.1, 2.8, 18.8]. Every
      // query materializes its own inputs, so dropping storage between
      // queries changes no result — only removes cross-query pressure.
      // INVARIANT this cleanup relies on: no live cross-query RDD
      // references — each query's result is fully consumed inside its
      // own rep loop before this line runs. The sweep unpersists
      // localCheckpoint'ed RDDs too, which CANNOT be recomputed once
      // their blocks drop; any future cross-query shared lazy state
      // holding a checkpointed DataFrame would fail with missing-block
      // errors here, not silently recompute.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      (name, times)
    }
    // median over a sorted copy; `timed` keeps CHRONOLOGICAL rep order so
    // the reps evidence distinguishes a cold first rep from a mid-run GC
    // spike (a sorted array only preserves the spread, not the shape)
    val results = timed.collect { case (name, ts) if ts.nonEmpty =>
      val s = ts.sorted; name -> s(s.length / 2)
    }
    val medians = results.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // rep times for the heavy queries (median ≥ 0.8 s), 3 dp, in run
    // order: an anomalous median arrives with its own evidence (spread
    // across reps = GC/contention; uniform = real; a slow FIRST rep =
    // cold/plan-compile). Placed AFTER the queries map: the driver
    // archives a bounded TAIL of stdout, and round 5's head-truncation
    // ate the reps built for exactly the j3 anomaly — tail placement
    // keeps them in the artifact, with total_sec still last.
    // rounding via Double.toString, NOT %f: format strings follow the
    // JVM default locale (decimal commas under e.g. de_DE would corrupt
    // the JSON); Double.toString is locale-independent
    val repsJson = timed
      .collect { case (k, ts) if ts.nonEmpty && medians(k) >= 0.8 =>
        s"\"" + k + "\":" + ts.map(t => (math.round(t * 1000) / 1000.0).toString).mkString("[", ",", "]")
      }
      .mkString("{", ",", "}")
    val failed = timed.collect { case (name, ts) if ts.isEmpty => "\"" + name + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // total_sec duplicates the headline value at the LINE'S END: the
    // driver archives a bounded tail of stdout, and round 4's capture
    // truncated the head (metric/value and 4 queries) — the tail copy
    // keeps the suite total readable in the artifact regardless
    // a filtered run stamps its filter into the artifact so a partial
    // BENCH json can never masquerade as a full-suite run downstream
    val onlyJson = only
      .map(names => s""""only":${names.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},""")
      .getOrElse("")
    val loadJson =
      s"""{"start":$loadStart,"end":${LoadStamp.json()},"gate_wait_sec":${math.round(gateWaitSec * 10) / 10.0}}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec",$onlyJson"failed":$failed,"queries":$qs,"reps":$repsJson,"corpus":$corpusJson,"load":$loadJson,"calib":$calibJson,"sf":"$sfDir","total_sec":${math.round(total * 1000) / 1000.0}}"""
    println(line)
    // Compact totals+calib twin, printed LAST (additions-only; r13
    // verdict ask): a bounded stdout tail keeps the END of the output,
    // and the r12 driver artifact lost the WHOLE bench result when the
    // growing per-query line's start was truncated away. This line is a
    // few hundred bytes — totals, calib, query/failure counts — so it
    // survives any plausible tail window even if the full line above no
    // longer does. Distinct metric name so an existing parser keyed on
    // "metric":"total" can never confuse the two lines.
    val compact = s"""{"metric":"total_compact","value":$total,"unit":"sec",$onlyJson"n_queries":${results.size},"failed":$failed,"calib":$calibJson,"sf":"$sfDir","total_sec":${math.round(total * 1000) / 1000.0}}"""
    println(compact)
    // the builder's OWN durable copy of the COMPLETE artifact: the
    // driver archives a bounded tail of stdout and has truncated the
    // medians map mid-object (r10) — cross-round comparison must never
    // depend on that buffer. Full-suite CLEAN runs only: a filtered
    // run would overwrite the headline artifact with a partial one,
    // and a run with failed queries would clobber the last good
    // complete artifact — those land on a `.failed` side path instead.
    if (only.isEmpty) {
      val anyFailed = timed.exists(_._2.isEmpty)
      val base = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/BENCH_full.json")
      val out = java.nio.file.Paths.get(
        if (anyFailed) base.stripSuffix(".json") + ".failed.json" else base)
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(out, line + "\n")
    }
    spark.stop()
  }
}
