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

  /** The 1- and 5-minute load averages right now, or None on platforms
    * without /proc. The bench's load GATE polls this.
    */
  def loadAvg(): Option[(Double, Double)] =
    try {
      val f = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/proc/loadavg")),
        "UTF-8").trim.split("\\s+")
      Some((f(0).toDouble, f(1).toDouble))
    } catch { case _: Throwable => None }

  /** Gate, not just stamp: wait until BOTH `load1` and `load5` are
    * below `threshold` before the timed section starts, polling every
    * `pollSec`, for at most `maxWaitSec` — then PROCEED anyway (the
    * stamp still records the hot start, so attribution degrades
    * gracefully instead of the bench deadlocking behind a long-lived
    * co-tenant). The A/B pair `bench/LOADSTAMP_AB_{idle,hot}_r11.json`
    * proved load1 > ~3 inflates the sensitive query family 1.25–1.57×;
    * round 12 then passed the load1 gate at 0.79 while load5 sat at
    * 3.06 — a just-been-busy host — and showed the same uniform drift
    * on untouched code, so the gate now covers the 5-minute average
    * too. `maxWaitSec` defaults to 900 because load5 decays on a
    * 5-minute time constant: a 300 s ceiling would usually time out on
    * exactly the hosts the gate exists for. Returns seconds waited
    * (for the artifact).
    */
  def awaitIdle(threshold: Double = 3.0, pollSec: Int = 10, maxWaitSec: Int = 900): Double = {
    val t0 = System.nanoTime()
    def hot(l: (Double, Double)): Boolean = l._1 >= threshold || l._2 >= threshold
    var waited = 0.0
    var cur = loadAvg()
    while (cur.exists(hot) && waited < maxWaitSec) {
      val (l1, l5) = cur.get
      System.err.println(
        f"[loadgate] load1=$l1%.2f load5=$l5%.2f (gate $threshold%.1f) — waiting ${pollSec}s (${waited.toInt}/${maxWaitSec}s)")
      Thread.sleep(pollSec * 1000L)
      waited = (System.nanoTime() - t0) / 1e9
      cur = loadAvg()
    }
    cur.filter(hot).foreach { case (l1, l5) =>
      System.err.println(f"[loadgate] proceeding HOT after ${waited.toInt}s: load1=$l1%.2f load5=$l5%.2f (stamped)")
    }
    (System.nanoTime() - t0) / 1e9
  }
}
