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

  /** The 1-minute load average right now, or None on platforms
    * without /proc. The bench's load GATE polls this.
    */
  def load1(): Option[Double] =
    try {
      val f = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/proc/loadavg")),
        "UTF-8").trim.split("\\s+")
      Some(f(0).toDouble)
    } catch { case _: Throwable => None }

  /** Gate, not just stamp: wait until `load1 < threshold` before the
    * timed section starts, polling every `pollSec`, for at most
    * `maxWaitSec` — then PROCEED anyway (the stamp still records the
    * hot start, so attribution degrades gracefully instead of the
    * bench deadlocking behind a long-lived co-tenant). The A/B pair
    * `bench/LOADSTAMP_AB_{idle,hot}_r11.json` proved load1 > ~3
    * inflates the sensitive query family 1.25–1.57×; gating at the
    * source retires that transient class from round comparisons.
    * Returns seconds waited (for the artifact).
    */
  def awaitIdle(threshold: Double = 3.0, pollSec: Int = 10, maxWaitSec: Int = 300): Double = {
    val t0 = System.nanoTime()
    var waited = 0.0
    var cur = load1()
    while (cur.exists(_ >= threshold) && waited < maxWaitSec) {
      System.err.println(f"[loadgate] load1=${cur.get}%.2f >= $threshold%.1f — waiting ${pollSec}s (${waited.toInt}/${maxWaitSec}s)")
      Thread.sleep(pollSec * 1000L)
      waited = (System.nanoTime() - t0) / 1e9
      cur = load1()
    }
    cur.filter(_ >= threshold).foreach { l =>
      System.err.println(f"[loadgate] proceeding HOT after ${waited.toInt}s: load1=$l%.2f (stamped)")
    }
    (System.nanoTime() - t0) / 1e9
  }
}
