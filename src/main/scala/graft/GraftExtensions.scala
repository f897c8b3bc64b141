package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, ShingleHashes, Simhash60, SortedJaccard}

/** Spark-native integration point: inject graft's codegen'd expressions
  * into ANY session via the standard extensions mechanism —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * After injection the functions resolve by name in plain SQL
  * (`SELECT graft_dot(a, b) FROM ...`), including from thrift/connect
  * clients that never touch Scala — the library behaves like a
  * first-class function pack rather than requiring `Sessions.local`'s
  * per-session registry calls (which remain for embedded use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: length-ratio pruning ahead of merge-Jaccard
    // threshold filters (sound, idempotent — see the rule's scaladoc)
    ext.injectOptimizerRule(_ => graft.rules.JaccardLengthPruning)
    ext.injectFunction(
      (FunctionIdentifier(DotProduct.FunctionName),
        info(DotProduct.FunctionName, "defined-order dot product over two array<double>"),
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)))
    )
    ext.injectFunction(
      (FunctionIdentifier(SortedJaccard.FunctionName),
        info(SortedJaccard.FunctionName, "merge-Jaccard over two sorted distinct array<bigint>"),
        (exprs: Seq[Expression]) => SortedJaccard(exprs(0), exprs(1), SortedJaccard.thresholdOf(exprs)))
    )
    ext.injectFunction(
      (FunctionIdentifier(Simhash60.FunctionName),
        info(Simhash60.FunctionName, "60-bit SimHash sketch over array<bigint> token hashes"),
        (exprs: Seq[Expression]) => Simhash60(exprs.head))
    )
    ext.injectFunction(
      (FunctionIdentifier(ShingleHashes.FunctionName),
        info(ShingleHashes.FunctionName, "sorted distinct 60-bit n-token shingle hashes from array<string>"),
        (exprs: Seq[Expression]) => ShingleHashes(exprs.head, ShingleHashes.width(exprs)))
    )
  }
}
