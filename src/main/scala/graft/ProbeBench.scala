package graft

/** Dev tool: time individual queries at sf0.1 (`runMain graft.ProbeBench
  * q1 q2 ...`) or dump formatted physical plans (`runMain
  * graft.ProbeBench --explain q1 ...`) to inspect pushdown, broadcast
  * selection and whole-stage-codegen coverage.
  */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (flags, names) = args.partition(_.startsWith("--"))
    val explain = flags.contains("--explain")
    names.foreach { name =>
      if (explain) {
        println(s"===== $name =====")
        println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } else {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
