package graft

/** Host-load stamp for bench artifacts — the other half of the
  * [[CorpusStamp]] attribution story. The round-8/9 "text-family
  * drift" saga ended attributed to a machine-load transient, but only
  * after an isolated re-run: corpus weight was recorded in the
  * artifact, host load was not, so the inference needed fresh
  * evidence. Two stamps (bench start/end) make the next transient
  * diagnosable from the artifact alone: a hot `load1`/`jvms` alongside
  * an anomalous rep IS the attribution.
  */
object LoadStamp {

  /** One JSON object: /proc/loadavg's three averages, the runnable/
    * total thread counts, and the number of live `java` processes on
    * the host (a concurrent sbt/driver JVM is the usual contention
    * source). Never throws — a platform without /proc stamps nulls.
    */
  def json(): String = {
    val (l1, l5, l15, runnable) =
      try {
        val f = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/proc/loadavg")),
          "UTF-8").trim.split("\\s+")
        (f(0), f(1), f(2), "\"" + f(3) + "\"")
      } catch { case _: Throwable => ("null", "null", "null", "null") }
    val jvms =
      try
        ProcessHandle.allProcesses().filter { p =>
          p.info().command().map[Boolean](c => c == "java" || c.endsWith("/java")).orElse(false)
        }.count()
      catch { case _: Throwable => -1L }
    s"""{"load1":$l1,"load5":$l5,"load15":$l15,"runnable":$runnable,"jvms":$jvms}"""
  }
}
