package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid cell assignment over an `array<double>` vector:
  * argmax over dot products against a k×d centroid matrix carried as
  * expression model state.
  *
  * The declarative formulation — `array_max` over an array of k
  * `(dot, cell)` structs, each dot a separate expression over d literal
  * elements — builds an O(k·d) expression tree; at the auto-derived
  * k for a ×10 corpus (k=157, d=64 → ~10k nodes) that tree falls out
  * of whole-stage codegen and evaluates interpreted, turning a
  * 200M-flop assignment into tens of seconds (measured: 16.8 s for
  * what this expression does in well under a second). Here the matrix
  * is ONE flat `double[]` reference object and the argmax is a fused
  * two-level loop, in both eval and codegen paths.
  *
  * Semantics are bit-identical to the struct-array_max formulation the
  * n3_cells/d10/d12 DuckDB oracles pin: dots fold in index order, and
  * score ties resolve to the LARGER cell id (`>=` under ascending c =
  * lexicographic struct max). Null vector, null element, or dimension
  * mismatch → null, matching [[DotProduct]]'s contract. Caveat (shared
  * with the oracle): NaN inputs are not ordered Spark-style here —
  * the corpus contract is finite doubles.
  */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other                    => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<double>, got $other")
  }

  require(centroids.nonEmpty, "NearestCell needs at least one centroid")
  require(centroids.forall(_.length == centroids.head.length), "centroid rows must share one dimension")

  private val k: Int = centroids.length
  private val dim: Int = centroids.head.length
  // flat row-major k×d copy: one reference object, cache-friendly loop
  private val flat: Array[Double] = {
    val f = new Array[Double](k * dim)
    var c = 0
    while (c < k) { System.arraycopy(centroids(c), 0, f, c * dim, dim); c += 1 }
    f
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val xv = x.toDoubleArray()
    var best = Double.NegativeInfinity
    var bc = -1
    var off = 0
    var c = 0
    while (c < k) {
      var acc = 0.0
      var j = 0
      while (j < n) { acc += xv(j) * flat(off + j); j += 1 }
      if (acc >= best) { best = acc; bc = c }
      off += n
      c += 1
    }
    bc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val off = ctx.freshName("off")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    double[] $xv = $a.toDoubleArray();
         |    double $best = Double.NEGATIVE_INFINITY;
         |    int $bc = -1;
         |    int $off = 0;
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $acc = 0.0;
         |      for (int $j = 0; $j < $n; $j++) { $acc += $xv[$j] * $flatRef[$off + $j]; }
         |      if ($acc >= $best) { $best = $acc; $bc = $c; }
         |      $off += $n;
         |    }
         |    ${ev.value} = $bc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object NearestCell {
  /** Model-state registration ([[Registration.parameterized]]): the
    * function name digests the full matrix content, so distinct models
    * cannot rebind each other under a still-lazy DataFrame.
    */
  def column(vec: Column, centroids: Array[Array[Double]])(implicit spark: SparkSession): Column =
    Registration.parameterized(
      "graft_nearest_cell",
      centroids.map(_.mkString(",")).mkString(";"),
      exprs => NearestCell(exprs.head, centroids),
      vec
    )
}
