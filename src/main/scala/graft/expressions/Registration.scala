package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Shared registration path for expressions parameterized by Scala-side
  * model state (seed lists, marker tables): route through a temp
  * function so library code stays on public API, with the function name
  * encoding the FULL parameter content via md5 — a 32-bit hashCode
  * could collide across configurations and silently rebind the
  * registration under a still-lazy DataFrame.
  */
object Registration {

  def parameterized(
      prefix: String,
      digestSource: String,
      builder: Seq[Expression] => Expression,
      args: Column*
  )(implicit spark: SparkSession): Column = {
    val digest = java.security.MessageDigest
      .getInstance("MD5")
      .digest(digestSource.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    val name = s"${prefix}_$digest"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    call_function(name, args: _*)
  }
}
