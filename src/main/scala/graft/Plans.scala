package graft

/** Dump `.explain("formatted")` for declared queries to files.
  *
  * Usage: runMain graft.Plans <sfDir> <outDir> <suffix> [q1,q2,...]
  *
  * Writes `<outDir>/<query>_<suffix>.txt` for each declared query (or
  * the named subset). Building a query's DataFrame may run its side
  * harness (index seeding, streaming micro-batches) — the dumped plan
  * is the plan of the RETURNED frame, i.e. what the bench times last.
  * Queries whose construction throws are recorded with the error text
  * so a partial dump is visible, not silent.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "plans/r13"
    val suffix = if (args.length > 2) args(2) else "before"
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet) else None
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val out = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
        val text =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"FAILED TO BUILD: $e" }
        java.nio.file.Files.writeString(out, text)
        println(s"[plans] wrote $out")
      }
    spark.stop()
  }
}
