package graft

import org.scalatest.funsuite.AnyFunSuite

class HostCalibSpec extends AnyFunSuite {
  test("calibration stamp is well-formed JSON with positive timings") {
    val j = HostCalib.json(itersSingle = 20_000_000L, itersPerThread = 10_000_000L)
    // shape: {"single_sec":S,"all_cores_sec":P,"cores":N,"h":"..."}
    val single = """"single_sec":([0-9.]+)""".r.findFirstMatchIn(j).map(_.group(1).toDouble)
    val par = """"all_cores_sec":([0-9.]+)""".r.findFirstMatchIn(j).map(_.group(1).toDouble)
    val cores = """"cores":(\d+)""".r.findFirstMatchIn(j).map(_.group(1).toInt)
    assert(single.exists(_ > 0) && par.exists(_ > 0) && cores.exists(_ >= 1), j)
    // determinism of the workload itself: same fold for same iters/seed
    val h1 = """"h":"([0-9a-f]+)"""".r.findFirstMatchIn(j).map(_.group(1))
    val h2 = """"h":"([0-9a-f]+)"""".r.findFirstMatchIn(
      HostCalib.json(itersSingle = 20_000_000L, itersPerThread = 10_000_000L)).map(_.group(1))
    assert(h1.isDefined && h1 == h2, "calibration workload is not deterministic")
  }
}
