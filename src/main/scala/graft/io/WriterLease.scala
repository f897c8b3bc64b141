package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared single-writer lease machinery for the self-maintaining lake
  * artifacts — the generalization of the `LatestUpsert` `_writerlock`
  * (round 12) to every artifact whose writing loop assumes exclusive
  * ownership: the latest-value table AND the ingest gates' index roots
  * (two streams misconfigured onto one root is the same failure class
  * everywhere).
  *
  * The lease is a `<root>/<name>` file taken by atomic
  * create-exclusive BEFORE any state is touched: NIO `CREATE_NEW`
  * (true `O_EXCL`) on the local filesystem — Hadoop's
  * RawLocalFileSystem `create(overwrite=false)` is check-then-act and
  * two racers can both pass the check — and `fs.create(p, false)`
  * (atomic at the namenode) on HDFS-like filesystems. On an object
  * store the CAS needs conditional-PUT semantics; without them, keep
  * the single-writer guarantee at the orchestration layer.
  *
  * A LOSER fails fast with [[ConcurrentWriterException]] naming the
  * holder (writer id, pid, host, process start time, acquisition time
  * — the lock file's content) having staged nothing. A holder that
  * CRASHES leaves the file behind; recovery of the common case is
  * AUTOMATIC (round 13): a waiter that finds the recorded holder on
  * its OWN host with a dead pid — absent, or present with a different
  * process start time (pid reuse guard) — breaks the stale lock and
  * retries, serialized through a breaker side-lock so racing waiters
  * can never delete a LIVE lock (see [[tryBreakDead]]). A cross-host
  * stale lock stays a manual `breakLock` after the operator confirms
  * the recorded holder is dead — one host cannot inspect another's
  * process table. The lease only serializes LIVE writers —
  * crash-safety is each artifact's own commit protocol.
  */
private[graft] object WriterLease {

  /** Reentrancy per (thread, lock path): an outer entry point's inner
    * calls (upsert → maintain → compactBuckets; ingestBatch → its own
    * recovery) must not self-deadlock on the lease they already hold.
    */
  private val held = ThreadLocal.withInitial[scala.collection.mutable.Set[String]](
    () => scala.collection.mutable.Set.empty[String])

  /** Atomic create-exclusive of `p` with `bytes` as content; false
    * when the path already exists (lost the race).
    */
  def casCreate(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean =
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        Option(local.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(local, bytes, java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else
      try {
        // create(overwrite=false) on some filesystems fails when the
        // PARENT is missing, and that failure must not masquerade as a
        // lost race — ensure the parent first, and below catch only the
        // two typed already-exists exceptions (a bare IOException is a
        // real IO failure and propagates)
        Option(p.getParent).foreach(fs.mkdirs(_))
        val out = fs.create(p, false)
        try out.write(bytes)
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException        => false
      }

  private def localHost: String = java.net.InetAddress.getLocalHost.getHostName

  /** This process's start instant (epoch ms), the pid-reuse guard:
    * recorded at acquisition, compared at dead-holder diagnosis. -1
    * when the platform can't report it (diagnosis then refuses to
    * auto-break — conservative).
    */
  private def processStartMs(h: ProcessHandle): Long =
    h.info().startInstant().map[Long](_.toEpochMilli).orElse(-1L)

  private def holderInfo(): String =
    s"writer=${java.util.UUID.randomUUID()} pid=${ProcessHandle.current().pid()} " +
      s"host=$localHost startMs=${processStartMs(ProcessHandle.current())} " +
      s"epochMs=${System.currentTimeMillis()}"

  private def field(content: String, name: String): Option[String] =
    s"$name=(\\S+)".r.findFirstMatchIn(content).map(_.group(1))

  /** True iff the recorded holder is VERIFIABLY dead from this host:
    * recorded on this host, and its pid is gone or belongs to a
    * process with a different start time (pid reuse). Anything
    * unverifiable — other host, unparsable content, missing start
    * times — is treated as alive (never auto-break what you cannot
    * prove dead; `breakLock` stays the manual cross-host path).
    */
  private[graft] def isLocallyDead(content: String): Boolean = {
    val parsed = for {
      pid <- field(content, "pid").flatMap(_.toLongOption)
      host <- field(content, "host")
      startMs <- field(content, "startMs").flatMap(_.toLongOption)
    } yield (pid, host, startMs)
    parsed.exists { case (pid, host, startMs) =>
      host == localHost && {
        val h = ProcessHandle.of(pid)
        if (!h.isPresent) true
        else if (startMs < 0) false // recorded start unknown: cannot rule out liveness
        else {
          val cur = processStartMs(h.get)
          // a different start time means the pid was recycled since the
          // lock was taken; 1 s slack absorbs clock-granularity jitter
          cur >= 0 && math.abs(cur - startMs) > 1000L
        }
      }
    }
  }

  private def readContent(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    } catch { case _: Throwable => None }

  /** Break `lockPath` iff it still holds exactly `deadContent` — the
    * content this waiter just diagnosed as a locally dead holder.
    * Returns true when the caller should retry acquisition (the stale
    * lock is gone — broken here or by a racing waiter), false when a
    * DIFFERENT holder now owns the lock (never touched).
    *
    * Safety: the verify-then-delete runs under a breaker side-lock
    * (`<lock>.breaker`, same CAS), so two waiters cannot interleave
    * "verify dead L1 / delete" with "break L1, acquire L2" and destroy
    * the NEW live lock — the second breaker re-reads the lock INSIDE
    * the critical section and sees L2's content, which no longer
    * matches. A breaker that crashes mid-section leaves the breaker
    * file behind; since its recorded holder is then itself locally
    * dead and the protected section is an idempotent verify-then-
    * delete, the next waiter clears it by the same diagnosis.
    */
  private def tryBreakDead(fs: FileSystem, lockPath: Path, deadContent: String): Boolean = {
    val breaker = new Path(lockPath.getParent, lockPath.getName + ".breaker")
    if (!casCreate(fs, breaker, holderInfo().getBytes(StandardCharsets.UTF_8))) {
      // another waiter is mid-break: clear it only if IT crashed too
      if (readContent(fs, breaker).exists(isLocallyDead)) fs.delete(breaker, false)
      return false // let the racing breaker finish; this waiter fails fast
    }
    try
      readContent(fs, lockPath) match {
        case Some(c) if c == deadContent => fs.delete(lockPath, false); true
        case None                        => true // already broken by a prior breaker
        case _                           => false // a new holder acquired meanwhile — NEVER break it
      }
    finally fs.delete(breaker, false)
  }

  /** Run `body` holding the lease at `lockPath`. Fail-fast: a second
    * live writer throws [[ConcurrentWriterException]] naming the
    * holder BEFORE any state is touched. Released on every exit
    * (success or thrown body). A crash leaves the file held; a stale
    * lock whose holder is verifiably dead ON THIS HOST is broken
    * automatically (once, serialized — see [[tryBreakDead]]) and the
    * acquisition retried; cross-host recovery stays the operator's
    * `breakInstructions`.
    */
  def withLock[T](fs: FileSystem, lockPath: Path, what: String, breakInstructions: String)(body: => T): T = {
    val key = lockPath.toString
    if (held.get.contains(key)) return body // reentrant: outer call holds it
    val info = holderInfo()
    val bytes = info.getBytes(StandardCharsets.UTF_8)
    var acquired = casCreate(fs, lockPath, bytes)
    if (!acquired) {
      val holder = readContent(fs, lockPath)
      if (holder.exists(isLocallyDead) && tryBreakDead(fs, lockPath, holder.get))
        acquired = casCreate(fs, lockPath, bytes) // one retry after the auto-break
    }
    if (!acquired) {
      val holder = readContent(fs, lockPath)
        .getOrElse("<unreadable — racing acquisition or just released>")
      throw new ConcurrentWriterException(
        s"$what already has a live writer [$holder] — single-writer by contract (two streams " +
          s"on one root is a misconfiguration); if the holder crashed on another host, verify it " +
          s"is dead and $breakInstructions (a dead holder on THIS host is broken automatically)")
    }
    held.get += key
    try body
    finally {
      held.get -= key
      fs.delete(lockPath, false)
    }
  }
}
