package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make the native functions resolvable in plain
  * SQL on a session that never called the per-session registry helpers.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes graft_* in SQL") {
    // force a FRESH session: with a live shared session, getOrCreate
    // would return it with the extensions config silently ignored (and
    // the temp functions Sessions.local registered would make this test
    // pass without GraftExtensions ever running)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect().head.getDouble(0)
      assert(dot == 11.0)
      val jac = spark.sql("SELECT graft_sorted_jaccard(array(1L, 2L), array(2L, 3L)) AS j").collect().head.getDouble(0)
      assert(jac == 1.0 / 3.0)
      val sim = spark.sql("SELECT graft_simhash60(array(7L)) AS s").collect().head.getLong(0)
      assert(sim == 7L)
      val shh = spark.sql("SELECT size(graft_shingle_hashes(array('a','b','c'), 2)) AS n").collect().head.getInt(0)
      assert(shh == 2)

      // non-literal / wrong-typed width must be a clear analysis error,
      // not an NPE from a blind eval().asInstanceOf at resolution time
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT graft_shingle_hashes(array('a','b'), CAST(2 AS BIGINT))").collect()
      }
      assert(err.getMessage.contains("graft_shingle_hashes"), err.getMessage)

      // optimizer rule: jaccard-threshold filters gain the sound
      // length-ratio guard, and results are unchanged
      import spark.implicits._
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog", 44L),
        (2L, "the quick brown fox jumps over the lazy cat", 44L),
        (3L, "an utterly different text about something else entirely", 55L),
        (4L, "tiny", 4L)
      ).toDF("doc_id", "text", "n_chars")
      val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", "n_chars", n = 3, threshold = 0.3)
      val optimized = pairs.queryExecution.optimizedPlan.toString
      assert(optimized.contains("size("), s"length guard missing from plan:\n$optimized")
      val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L)), s"rule changed results: $got")
    } finally {
      // leave no session behind: the next suite's Sessions.local must
      // build its own (this one lacks nanosAsLong/UTC/etc.)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
