package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted, distinct 60-bit word-shingle hashes straight from a token
  * array: for each n-token window, hash the space-joined shingle with
  * md5 and keep the first 60 bits (15 hex chars) — EXACTLY the value of
  * the expression pipeline
  * `sort_array(transform(shingles, s -> conv(substring(md5(s),1,15),16,10)))`,
  * but in one pass with reused digest/buffer state instead of five
  * interpreted HOF/array allocations per row.
  *
  * This sits on the dedup scan hot path (every document, every shingle);
  * the HOF formulation dominated the d2/d4 query cost.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other                    => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val count = toks.numElements() - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      // null tokens are skipped like the HOF twin's concat_ws does
      var j = 0
      var firstTok = true
      while (j < n) {
        if (!toks.isNullAt(i + j)) {
          if (!firstTok) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          firstTok = false
        }
        j += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars = high 60 bits of the first 7.5 bytes
      var h = 0L
      var b = 0
      while (b < 7) {
        h = (h << 8) | (digest(b) & 0xffL)
        b += 1
      }
      h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    // dedup in place (sorted)
    var w = 0
    var r = 0
    while (r < count) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object ShingleHashes {
  val FunctionName = "graft_shingle_hashes"

  /** The shingle width is baked into the expression at construction, so
    * it must be a literal INT — pattern-match instead of blind
    * `eval().asInstanceOf` so a column / wrong-typed argument is a clear
    * analysis error, not an NPE/ClassCastException at resolution time.
    * Shared by BOTH registration paths (per-session
    * [[register]] and [[graft.GraftExtensions]]).
    */
  def width(exprs: Seq[Expression]): Int = exprs(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, org.apache.spark.sql.types.IntegerType) => n
    case other =>
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          s"$FunctionName(tokens, n): second argument must be an INT literal, got ${other.sql}"),
        None)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName,
      exprs => ShingleHashes(exprs.head, width(exprs)),
      "built-in"
    )
}
