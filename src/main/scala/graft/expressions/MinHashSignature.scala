package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over pre-hashed shingles: for each of the k xor
  * seeds, the minimum of `h ^ seed` across the input hashes — one fused
  * two-level loop instead of k interpreted `array_min(transform(...))`
  * lambda passes. Value-identical to the HOF formulation and the DuckDB
  * `list_min(list_transform(hs, h -> xor(h, seed)))` oracle.
  */
case class MinHashSignature(child: Expression, seeds: Seq[Long]) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  // can return null on a non-null input (null element poisons)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other                  => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = seeds.size
    val out = Array.fill(k)(Long.MaxValue)
    val seedArr = seeds.toArray
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null // null element poisons, as in the HOF twin
      val h = hs.getLong(i)
      var s = 0
      while (s < k) {
        val v = h ^ seedArr(s)
        if (v < out(s)) out(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object MinHashSignature {
  /** No fixed SQL-name registration: seeds are a Scala-side model
    * parameter; construct via
    * [[graft.dedup.Dedup.minhashSignatureNative]].
    */
  def column(hashed: org.apache.spark.sql.Column, seeds: Seq[Long])(implicit spark: SparkSession): org.apache.spark.sql.Column =
    Registration.parameterized(
      "graft_minhash_sig",
      seeds.mkString(","),
      exprs => MinHashSignature(exprs.head, seeds),
      hashed
    )
}
