package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan lint over EVERY driver query: turns the "would this plan survive
  * a 100× scale-up" audit into a regression-tested property instead of a
  * per-round judgement call. The rules:
  *
  *   1. No `CartesianProductExec` anywhere (an all-pairs shuffle join is
  *      never the plan you want at 100 TB).
  *   2. `BroadcastNestedLoopJoinExec` only where the build side is
  *      declared bounded (allowlist below, each entry with its bound).
  *   3. The scan-predicate queries must push their filters into the
  *      parquet scan (`PushedFilters` non-empty) — a filter evaluated
  *      after a full-table read is wrong at any scale.
  *
  * Plans are inspected at the ANALYZED/physical stage; for most queries
  * `queryExecution.executedPlan` plans without running. Exceptions:
  * queries whose CONSTRUCTION executes bounded work (model fits for
  * n2/n3, the iterative clustering for d8/d8b) run that work here, and
  * only their FINAL plan is linted — the per-round join shapes of the
  * iterative operators are pure equi-joins by construction and carried
  * by their own specs (random-graph property test). AQE wrappers are
  * unwrapped to their initial physical plan.
  */
class PlanLintSpec extends SparkSpec {

  /** BNLJ allowlist — every entry must name its bound.
    *   - d5_embed_neardup: the DECLARED O(n²) exact verifier for the
    *     oracle-tied d6 scale path (SparkEntry scaladoc); its join is
    *     intentionally all-pairs over a bounded verification corpus.
    *   - p7_nearest_key: non-equi nearest-expiration probe against a
    *     broadcast DISTINCT target set (tiny by construction — P7
    *     semantics guarantee few distinct targets).
    *   - n1_ann_brute / n4_ann_quantized / n5_ann_pq: explicit
    *     `broadcast(queries)` with a non-equi self-exclusion predicate —
    *     the ANN query set is bounded by design ("broadcast queries, one
    *     corpus scan"); the corpus side streams (n5's streams CODES,
    *     ~8 B/row — the whole point).
    *   - x10_corpus_freq: a ONE-ROW broadcast cross join attaching the
    *     corpus token total to the per-doc aggregates.
    */
  private val bnljAllowed: Set[String] =
    Set("d5_embed_neardup", "p7_nearest_key", "n1_ann_brute", "n4_ann_quantized", "n5_ann_pq", "x10_corpus_freq")

  /** Queries whose defining behavior is a scan-level predicate: each
    * must show at least one parquet scan with non-empty PushedFilters.
    * b1_backtest carries b1_enrich's null-close drop; the span/text
    * operators must land their `text IS NOT NULL` at the scan.
    */
  private val mustPushFilters: Set[String] =
    Set("p1_filter_pushdown", "j6_asof_join", "b1_enrich", "b1_backtest", "x12_dup_spans", "x13_span_dedup", "x10_corpus_freq")

  /** Unwrap AQE and collect every physical node, descending into
    * subquery plans.
    */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other                    => other
    }
    expanded.collectWithSubqueries { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => nodes(a)
      case n                        => Seq(n)
    }
  }

  private lazy val plans: Map[String, Seq[SparkPlan]] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> nodes(fn(spark, sf0001).queryExecution.executedPlan)
    }

  test("no query plans a CartesianProduct") {
    val offenders = plans.collect {
      case (name, ns) if ns.exists(_.isInstanceOf[CartesianProductExec]) => name
    }
    assert(offenders.isEmpty, s"CartesianProductExec in: ${offenders.mkString(", ")}")
  }

  test("BroadcastNestedLoopJoin only where the build side is declared bounded") {
    val offenders = plans.collect {
      case (name, ns)
          if ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) && !bnljAllowed(name) =>
        name
    }
    assert(offenders.isEmpty, s"unallowlisted BroadcastNestedLoopJoinExec in: ${offenders.mkString(", ")}")
  }

  test("scan-predicate queries push their filters into the parquet scan") {
    mustPushFilters.foreach { name =>
      val scans = plans(name).collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, s"$name: no parquet scan found")
      val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "[]"))
      assert(
        pushed.exists(p => p.nonEmpty && p != "[]"),
        s"$name: every scan shows empty PushedFilters (${pushed.mkString("; ")})"
      )
    }
  }

  /** Queries whose defining behavior is projection pruning at the scan:
    * each must read EXACTLY the named columns — a wider ReadSchema means
    * the scan ships bytes the query never uses, the first thing that
    * hurts at 100 TB. (The round-10 scalar/filter carriers synthesize
    * everything else from these columns, so any regression that drags a
    * extra column into the scan is a pruning bug, not a feature.)
    */
  private val mustPruneColumns: Map[String, Set[String]] = Map(
    "f7_scalar_effects" -> Set("o_orderkey", "o_totalprice"),
    "f19_time_display"  -> Set("event_id", "ts"),
    "p5_session_filter" -> Set("event_id", "ts", "user_id", "event_type")
  )

  test("projection-pruned queries read exactly their needed columns") {
    mustPruneColumns.foreach { case (name, want) =>
      val scans = plans(name).collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, s"$name: no parquet scan found")
      val got = scans.map(_.requiredSchema.fieldNames.toSet)
      assert(
        got.contains(want),
        s"$name: no scan reads exactly ${want.mkString(",")} (scans read: ${got.map(_.mkString(",")).mkString("; ")})")
    }
  }

  test("every query plans without error and reads at least one source") {
    plans.foreach { case (name, ns) =>
      assert(ns.nonEmpty, s"$name produced an empty physical plan")
      // a real source must survive planning: a parquet scan, a cached
      // intermediate (iterative operators fold over persisted rounds),
      // or a materialized local relation (driver-fitted model state) —
      // a query that constant-folds its read away would silently pass
      // the other lints
      val hasSource = ns.exists { n =>
        n.isInstanceOf[FileSourceScanExec] ||
        n.getClass.getSimpleName.startsWith("InMemoryTableScan") ||
        n.getClass.getSimpleName.startsWith("LocalTableScan") ||
        n.getClass.getSimpleName.startsWith("RDDScan")
      }
      assert(hasSource, s"$name: no scan/source node in the physical plan")
    }
  }
}
