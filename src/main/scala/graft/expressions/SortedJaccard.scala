package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd Jaccard similarity over two SORTED, DISTINCT `array<long>`
  * columns: one merge pass counts the intersection (O(n+m), zero
  * allocation), union = n + m − intersection.
  *
  * Replaces the `array_intersect`/`array_union` pair formulation, which
  * builds two hash sets and two result arrays per evaluated pair — the
  * dominant cost when a near-dup join evaluates millions of candidate
  * pairs. Inputs must be sorted ascending with no duplicates
  * (`sort_array(array_distinct(...))` upstream); the value equals
  * set-Jaccard exactly, so DuckDB oracles computing
  * `len(list_intersect)/len(union)` on the un-hashed shingle sets match
  * bit-for-bit (both are exact ratios of the same small integers).
  * Returns null when both sides are empty.
  *
  * Optional third argument (literal double ≥ 0): a similarity
  * threshold enabling MERGE EARLY EXIT. At any merge position the
  * best-case final Jaccard is `(inter + r) / (n + m − inter − r)` with
  * `r = min` of the elements left on each side (every remaining element
  * matches, shrinking the union maximally); once that bound drops below
  * the threshold the pair CANNOT reach it, and the expression returns
  * null instead of finishing the merge. A downstream `jaccard >= t`
  * filter drops nulls, so results are IDENTICAL to the 2-arg form for
  * every surviving pair — only sub-threshold work is skipped (roughly
  * the tail half of each dissimilar pair's merge, the common case in
  * near-dup joins).
  */
case class SortedJaccard(left: Expression, right: Expression, threshold: Double = -1.0)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sorted_jaccard"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullable: Boolean = true

  // null ELEMENT → null result: arrays with containsNull=true pass
  // checkInputDataTypes, and a silent getLong on a null slot would
  // produce a wrong ratio instead of a visible null. The scan is
  // SKIPPED when the child's type proves no element can be null
  // (ShingleHashes declares containsNull=false) — the pre-scan is a
  // full O(n+m) pass per evaluated pair, paid even when the merge
  // early-exits, so on a near-dup join it was costing about as much
  // as the pruned merge itself for zero information.
  private def mayHaveNullElements(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => true
  }
  private lazy val leftNullable  = mayHaveNullElements(left)
  private lazy val rightNullable = mayHaveNullElements(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (n + m == 0) return null
    if (leftNullable) {
      var p = 0
      while (p < n) { if (x.isNullAt(p)) return null; p += 1 }
    }
    if (rightNullable) {
      var p = 0
      while (p < m) { if (y.isNullAt(p)) return null; p += 1 }
    }
    // early-exit bound: jaccard >= t iff (1+t)*maxInter >= t*(n+m);
    // precompute B = t*(n+m)/(1+t) so the per-iteration check is integer
    // adds + one double compare. The 1e-6 safety margin makes the exit
    // CONSERVATIVE: double rounding of B can land a few ulps above the
    // true rational bound, which would wrongly prune a pair whose exact
    // jaccard EQUALS the threshold (e.g. t=0.15, |A∩B|=15, |A∪B|=100 —
    // maxInter=15 vs B=15.000000000000002); the margin (≫ any ulp
    // error, ≪ 1 so it never weakens pruning between integers) ensures
    // exit implies strictly-unreachable.
    val bound = if (threshold >= 0) threshold * (n + m) / (1.0 + threshold) - 1e-6 else -1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      if (threshold >= 0 && inter + math.min(n - i, m - j) < bound) return null
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter).toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val boundVar = ctx.freshName("bound")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |if ($n + $m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${if (leftNullable) s"for (int $i = 0; $i < $n && !${ev.isNull}; $i++) { if ($a.isNullAt($i)) { ${ev.isNull} = true; } }" else ""}
         |  ${if (rightNullable) s"for (int $j = 0; $j < $m && !${ev.isNull}; $j++) { if ($b.isNullAt($j)) { ${ev.isNull} = true; } }" else ""}
         |  if (!${ev.isNull}) {
         |    int $i = 0; int $j = 0; int $inter = 0;
         |    double $boundVar = $threshold >= 0 ? $threshold * ($n + $m) / (1.0 + $threshold) - 1e-6 : -1.0;
         |    while ($i < $n && $j < $m) {
         |      if ($threshold >= 0 && $inter + Math.min($n - $i, $m - $j) < $boundVar) { ${ev.isNull} = true; break; }
         |      long $xv = $a.getLong($i);
         |      long $yv = $b.getLong($j);
         |      if ($xv == $yv) { $inter++; $i++; $j++; }
         |      else if ($xv < $yv) { $i++; } else { $j++; }
         |    }
         |    if (!${ev.isNull}) {
         |      ${ev.value} = (double) $inter / (double) ($n + $m - $inter);
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  val FunctionName = "graft_sorted_jaccard"

  /** Optional 3rd argument: a non-negative numeric CONSTANT threshold
    * for merge early exit. Any foldable numeric expression is accepted
    * and evaluated at resolution time — SQL spells `0.3` as
    * DECIMAL(1,1) and `CAST(0.3 AS DOUBLE)` as a Cast, neither of which
    * the narrow `Literal(_: Double, DoubleType)` pattern matched, so
    * the documented SQL 3-arg form used to fail analysis. Columns and
    * non-numeric arguments are still a clear analysis error (the
    * foldable gate keeps this from being a blind `eval`).
    */
  def thresholdOf(exprs: Seq[Expression]): Double = exprs match {
    case Seq(_, _) => -1.0
    case Seq(_, _, e) if e.foldable && e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
      e.eval() match {
        case null => fail(exprs)
        case v =>
          val t = v match {
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case n: Number                             => n.doubleValue()
            case _                                     => fail(exprs)
          }
          if (t >= 0) t else fail(exprs)
      }
    case _ => fail(exprs)
  }

  private def fail(exprs: Seq[Expression]): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION",
      Map("errorMessage" ->
        s"$FunctionName(a, b[, t]): optional third argument must be a non-negative numeric constant, got ${exprs.drop(2).map(_.sql).mkString(",")}"),
      None)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName,
      exprs => SortedJaccard(exprs(0), exprs(1), thresholdOf(exprs)),
      "built-in"
    )
}
