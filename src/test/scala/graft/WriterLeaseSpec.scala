package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.io.{ConcurrentWriterException, WriterLease}

/** The shared single-writer lease primitive on its own — the artifact
  * suites (LatestUpsertSpec, DedupIngestSpec, SemDedupIngestSpec) pin
  * the end-to-end behavior; this pins the PRIMITIVE's contract: the
  * CAS create admits exactly one racer, the lease is reentrant per
  * (thread, path), and every exit path releases.
  */
class WriterLeaseSpec extends SparkSpec {

  private def fsFor(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("casCreate: N racing threads on one path — exactly one winner") {
    val root = Files.createTempDirectory("leasecas").toString
    val fs = fsFor(root)
    for (trial <- 1 to 5) {
      val p = new Path(s"$root/lock$trial")
      val threads = 16
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val done = new java.util.concurrent.CountDownLatch(threads)
      (1 to threads).foreach { i =>
        new Thread(() => {
          start.await()
          if (WriterLease.casCreate(fs, p, s"writer$i".getBytes("UTF-8"))) wins.incrementAndGet()
          done.countDown()
        }).start()
      }
      start.countDown()
      assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(wins.get == 1, s"trial $trial: ${wins.get} winners — the CAS is not exclusive")
    }
  }

  test("withLock is reentrant on the same thread and path, and still held by the outer frame") {
    val root = Files.createTempDirectory("leasereent").toString
    val fs = fsFor(root)
    val p = new Path(s"$root/_lock")
    var innerRan = false
    WriterLease.withLock(fs, p, "thing", "break it") {
      WriterLease.withLock(fs, p, "thing", "break it") { innerRan = true } // must not self-deadlock
      assert(fs.exists(p), "inner exit released the OUTER frame's lease")
    }
    assert(innerRan)
    assert(!fs.exists(p), "outer exit did not release")
  }

  test("a thrown body releases; the next acquisition succeeds; a held lock names the holder") {
    val root = Files.createTempDirectory("leasethrow").toString
    val fs = fsFor(root)
    val p = new Path(s"$root/_lock")
    intercept[RuntimeException] {
      WriterLease.withLock(fs, p, "thing", "break it") { throw new RuntimeException("boom") }
    }
    assert(!fs.exists(p), "thrown body leaked the lease")
    // a foreign holder is reported with its recorded identity
    Files.write(java.nio.file.Paths.get(s"$root/_lock"), "writer=w pid=42 host=h epochMs=1".getBytes("UTF-8"))
    val e = intercept[ConcurrentWriterException] {
      WriterLease.withLock(fs, p, "the frobnicator at /x", "run breakIt()") { () }
    }
    assert(e.getMessage.contains("pid=42") && e.getMessage.contains("run breakIt()")
      && e.getMessage.contains("the frobnicator at /x"))
  }
}
