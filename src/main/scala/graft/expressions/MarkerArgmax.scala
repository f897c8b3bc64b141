package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Language-ID marker argmax over an `array<string>` token column: for
  * each configured language, count tokens contained in its marker set;
  * return the first language (declared order) with the maximal count.
  *
  * Replaces the per-language interpreted `size(filter(toks,
  * array_contains(...)))` lambda passes of the HOF formulation
  * ([[graft.text.TextOps.langIdHeuristic]]) with ONE pass over the
  * tokens and hash-set membership — value-identical, including the
  * declared-order tie-break (first max wins) and the HOF's treatment of
  * null tokens (`array_contains` yields null → `filter` drops them).
  */
case class MarkerArgmax(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_marker_argmax"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other                    => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $other")
  }

  @transient private lazy val names: Array[UTF8String] =
    langs.map { case (n, _) => UTF8String.fromString(n) }.toArray
  @transient private lazy val sets: Array[Set[UTF8String]] =
    langs.map { case (_, ms) => ms.map(UTF8String.fromString).toSet }.toArray

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val k = sets.length
    val counts = new Array[Int](k)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var l = 0
        while (l < k) {
          if (sets(l).contains(t)) counts(l) += 1
          l += 1
        }
      }
      i += 1
    }
    var bi = 0
    var best = counts(0)
    var l = 1
    while (l < k) {
      if (counts(l) > best) { best = counts(l); bi = l }
      l += 1
    }
    names(bi)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object MarkerArgmax {
  /** No fixed SQL-name registration: the marker table is a Scala-side
    * model parameter ([[Registration.parameterized]] digests it into the
    * temp-function name).
    */
  def column(tokens: org.apache.spark.sql.Column, langs: Seq[(String, Seq[String])])(implicit
      spark: SparkSession
  ): org.apache.spark.sql.Column =
    Registration.parameterized(
      "graft_marker_argmax",
      langs.map { case (n, ms) => n + ":" + ms.mkString(",") }.mkString(";"),
      exprs => MarkerArgmax(exprs.head, langs),
      tokens
    )
}
