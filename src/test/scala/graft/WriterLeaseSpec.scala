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

  // ── crashed-holder auto-recovery (round 13) ─────────────────────────

  private def localHost = java.net.InetAddress.getLocalHost.getHostName

  /** A pid that verifiably belongs to no live process on this host. */
  private def deadPid: Long =
    (900000L to 999999L).find(p => !ProcessHandle.of(p).isPresent).get

  private def deadLockContent: String =
    s"writer=deadbeef pid=$deadPid host=$localHost startMs=123456789 epochMs=1"

  test("a verifiably dead same-host holder is auto-broken; the waiter proceeds") {
    val root = Files.createTempDirectory("leasedead").toString
    val fs = fsFor(root)
    val p = new Path(s"$root/_lock")
    Files.write(java.nio.file.Paths.get(s"$root/_lock"), deadLockContent.getBytes("UTF-8"))
    var ran = false
    WriterLease.withLock(fs, p, "thing", "break it") { ran = true }
    assert(ran, "waiter did not proceed past the dead lock")
    assert(!fs.exists(p), "lease not released after the auto-broken acquisition")
    assert(!fs.exists(new Path(s"$root/_lock.breaker")), "breaker side-lock leaked")
  }

  test("N racing waiters on a dead lock: broken at most once, mutual exclusion holds, losers fail fast") {
    val root = Files.createTempDirectory("leasedeadrace").toString
    val fs = fsFor(root)
    for (trial <- 1 to 5) {
      val p = new Path(s"$root/lock$trial")
      Files.write(java.nio.file.Paths.get(s"$root/lock$trial"), deadLockContent.getBytes("UTF-8"))
      val threads = 8
      val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxInBody = new java.util.concurrent.atomic.AtomicInteger(0)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val otherFailures = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val done = new java.util.concurrent.CountDownLatch(threads)
      (1 to threads).foreach { _ =>
        new Thread(() => {
          start.await()
          try {
            WriterLease.withLock(fs, p, "thing", "break it") {
              val n = inBody.incrementAndGet()
              maxInBody.getAndAccumulate(n, math.max)
              Thread.sleep(50) // force overlap so losers really race a held lease
              inBody.decrementAndGet()
            }
            wins.incrementAndGet()
          } catch {
            case _: ConcurrentWriterException => () // fail-fast loser: the designed outcome
            case _: Throwable                 => otherFailures.incrementAndGet()
          }
          done.countDown()
        }).start()
      }
      start.countDown()
      assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(wins.get >= 1, s"trial $trial: no waiter got past the dead lock")
      assert(maxInBody.get == 1, s"trial $trial: ${maxInBody.get} writers in the body — exclusion broken")
      assert(otherFailures.get == 0, s"trial $trial: losers threw something other than ConcurrentWriterException")
      assert(!fs.exists(p) && !fs.exists(new Path(s"$root/lock$trial.breaker")),
        s"trial $trial: lock or breaker leaked")
    }
  }

  test("a LIVE same-host holder is never auto-broken") {
    val root = Files.createTempDirectory("leaselive").toString
    val fs = fsFor(root)
    val p = new Path(s"$root/_lock")
    // this very process: alive, with its true start time recorded
    val startMs = ProcessHandle.current().info().startInstant()
      .map[Long](_.toEpochMilli).orElse(-1L)
    val live =
      s"writer=liveone pid=${ProcessHandle.current().pid()} host=$localHost startMs=$startMs epochMs=1"
    Files.write(java.nio.file.Paths.get(s"$root/_lock"), live.getBytes("UTF-8"))
    intercept[ConcurrentWriterException] {
      WriterLease.withLock(fs, p, "thing", "break it") { () }
    }
    assert(fs.exists(p), "a live holder's lease was broken")
    val after = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$root/_lock")), "UTF-8")
    assert(after == live, "a live holder's lease content was disturbed")
  }

  test("pid reuse is caught: same pid, different start time → treated dead and broken") {
    val root = Files.createTempDirectory("leasereuse").toString
    val fs = fsFor(root)
    val p = new Path(s"$root/_lock")
    // our own (alive) pid, but a start time from a previous incarnation
    val reused =
      s"writer=ghost pid=${ProcessHandle.current().pid()} host=$localHost startMs=123456789 epochMs=1"
    Files.write(java.nio.file.Paths.get(s"$root/_lock"), reused.getBytes("UTF-8"))
    var ran = false
    WriterLease.withLock(fs, p, "thing", "break it") { ran = true }
    assert(ran, "pid-reuse lock was not broken")
  }

  test("a dead-looking CROSS-host holder stays manual (never auto-broken)") {
    val root = Files.createTempDirectory("leasecross").toString
    val fs = fsFor(root)
    val p = new Path(s"$root/_lock")
    val cross = s"writer=w pid=$deadPid host=some-other-host startMs=123456789 epochMs=1"
    Files.write(java.nio.file.Paths.get(s"$root/_lock"), cross.getBytes("UTF-8"))
    val e = intercept[ConcurrentWriterException] {
      WriterLease.withLock(fs, p, "thing", "break it") { () }
    }
    assert(fs.exists(p), "a cross-host lease was auto-broken — one host cannot verify another's pids")
    assert(e.getMessage.contains("some-other-host"))
  }

  test("a crashed BREAKER's side-lock is cleared by the next waiter") {
    val root = Files.createTempDirectory("leasebreaker").toString
    val fs = fsFor(root)
    val p = new Path(s"$root/_lock")
    Files.write(java.nio.file.Paths.get(s"$root/_lock"), deadLockContent.getBytes("UTF-8"))
    // a breaker that died mid-section: its own recorded holder is dead
    Files.write(java.nio.file.Paths.get(s"$root/_lock.breaker"), deadLockContent.getBytes("UTF-8"))
    // first attempt clears the dead breaker but fails fast (the racing-
    // breaker protocol); the retry then breaks the dead lock and wins
    intercept[ConcurrentWriterException] {
      WriterLease.withLock(fs, p, "thing", "break it") { () }
    }
    var ran = false
    WriterLease.withLock(fs, p, "thing", "break it") { ran = true }
    assert(ran)
    assert(!fs.exists(p) && !fs.exists(new Path(s"$root/_lock.breaker")))
  }
}
