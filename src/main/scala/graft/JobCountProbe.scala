package graft

/** Dev tool: run named declared queries once with a scheduler listener
  * attached, printing the number of Spark JOBS each query submits and
  * their descriptions — the §1 "measure first" view for driver-loop
  * operators (LatestUpsert commits, ingest gates), where per-job
  * scheduler round-trips, not per-row work, set the floor.
  *
  * Usage: runMain graft.JobCountProbe q1 [q2 ...]
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .orElse(j.stageInfos.lastOption.map(_.name)) // stage name = call site short form
          .getOrElse("")
        jobs.add(s"job ${j.jobId} stages=${j.stageInfos.size} tasks=${j.stageInfos.map(_.numTasks).sum} $desc")
        ()
      }
    })
    args.foreach { name =>
      // settle the async listener bus between queries so counts don't bleed
      Thread.sleep(1000); jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      val all = jobs.toArray(Array.empty[String])
      println(s"JOBS $name n=${all.length} sec=${f"$sec%.2f"}")
      all.foreach(l => println(s"  $l"))
    }
    spark.stop()
  }
}
