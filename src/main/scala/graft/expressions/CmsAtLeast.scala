package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd count-min-sketch threshold probe: true iff the sketch's
  * occurrence estimate for the LONG key is `>= bar`.
  *
  * The scan-local gate of the two-pass heavy-hitter miner
  * ([[graft.text.TextOps.frequentNgramsSketched]]): a count-min sketch
  * can only OVER-estimate, so `estimate >= bar` admits every truly
  * frequent key (zero false negatives) plus an eps·N-bounded inflated
  * tail that the exact second pass removes — the
  * `BloomFilterMightContain` shape (x18) with a counting sketch in
  * place of a membership one.
  *
  * Mechanics mirror Spark's own `BloomFilterMightContain`: the
  * deserialized sketch is attached as a codegen reference object
  * (shipped once per executor inside the serialized plan; rebuilt
  * lazily from bytes per JVM), and the probe is a direct
  * `estimateCount` call inside whole-stage codegen — no UDF, no boxing
  * in the loop beyond the sketch API's own.
  */
case class CmsAtLeast(cmsBytes: Array[Byte], bar: Long, child: Expression)
    extends UnaryExpression
    with Predicate {

  @transient private lazy val cms: CountMinSketch = CountMinSketch.readFrom(cmsBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t        => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint key, got $t")
  }
  override def prettyName: String = "graft_cms_at_least"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(h: Any): Any =
    cms.estimateCount(java.lang.Long.valueOf(h.asInstanceOf[Long])) >= bar

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmsRef = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(
      ctx,
      ev,
      h => s"${ev.value} = $cmsRef.estimateCount(java.lang.Long.valueOf($h)) >= ${bar}L;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
