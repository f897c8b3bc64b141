package graft

/** Host-speed calibration stamp for bench artifacts — the missing
  * third leg of the attribution tripod ([[LoadStamp]] = is the host
  * busy NOW; [[CorpusStamp]] = how heavy is the DATA; this = how fast
  * is the HOST). Rounds 11–13 each spent a paragraph attributing a
  * uniform cross-round drift on byte-untouched queries to "the host is
  * slower this round" — an inference from the untouched-query median.
  * A fixed CPU-bound workload timed at bench start turns that
  * inference into a measurement: cross-round query ratios can be read
  * against the calibration ratio, and a suite drift that matches the
  * calibration drift is the host, full stop.
  *
  * The workload is deterministic (fixed iteration counts, no
  * allocation in the hot loop) and measured twice per shape with the
  * first pass discarded (JIT warmup): a single-thread leg (scalar
  * speed — whole-stage codegen loops look like this) and an
  * all-cores leg (throughput under the same parallelism the 32-thread
  * local session uses). ~1 s total; runs AFTER the load gate so it
  * measures the host the queries are about to see.
  */
object HostCalib {

  /** xxhash-style 64-bit mix over a counter — cheap, DCE-proof (the
    * folded result is returned and stamped), allocation-free.
    */
  private def mixLoop(iters: Long, seed: Long): Long = {
    var acc = seed
    var i = 0L
    while (i < iters) {
      var x = acc ^ i
      x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33
      x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33
      acc = x
      i += 1
    }
    acc
  }

  private def timeSec(body: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** One JSON object: single-thread and all-cores wall seconds for the
    * fixed workload, plus the core count. Smaller is faster; the
    * cross-round HOST ratio is `calib_this_round / calib_prior_round`.
    */
  def json(itersSingle: Long = 200_000_000L, itersPerThread: Long = 100_000_000L): String = {
    val cores = Runtime.getRuntime.availableProcessors()
    mixLoop(itersSingle / 10, 11L) // JIT warmup, discarded
    val (singleSec, h1) = timeSec(mixLoop(itersSingle, 42L))
    val threads = (0 until cores).map { k =>
      new Thread(null, () => { mixLoop(itersPerThread, k.toLong); () }, s"calib$k", 1L << 20)
    }
    val t0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val parSec = (System.nanoTime() - t0) / 1e9
    def r4(x: Double): Double = math.round(x * 10000) / 10000.0
    s"""{"single_sec":${r4(singleSec)},"all_cores_sec":${r4(parSec)},"cores":$cores,"h":"${java.lang.Long.toHexString(h1)}"}"""
  }
}
