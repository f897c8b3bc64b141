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
  * holder (writer id, pid, host, acquisition time — the lock file's
  * content) having staged nothing. A holder that CRASHES leaves the
  * file behind; the recovery is the owning artifact's `breakLock`
  * (delete) after confirming the recorded holder is dead. The lease
  * only serializes LIVE writers — crash-safety is each artifact's own
  * commit protocol.
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

  /** Run `body` holding the lease at `lockPath`. Fail-fast: a second
    * live writer throws [[ConcurrentWriterException]] naming the
    * holder BEFORE any state is touched. Released on every exit
    * (success or thrown body); only a process crash leaves it held,
    * and `breakInstructions` tells the operator the recovery call.
    */
  def withLock[T](fs: FileSystem, lockPath: Path, what: String, breakInstructions: String)(body: => T): T = {
    val key = lockPath.toString
    if (held.get.contains(key)) return body // reentrant: outer call holds it
    val info =
      s"writer=${java.util.UUID.randomUUID()} pid=${ProcessHandle.current().pid()} " +
        s"host=${java.net.InetAddress.getLocalHost.getHostName} epochMs=${System.currentTimeMillis()}"
    if (!casCreate(fs, lockPath, info.getBytes(StandardCharsets.UTF_8))) {
      val holder =
        try {
          val in = fs.open(lockPath)
          try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        } catch { case _: Throwable => "<unreadable — racing acquisition or just released>" }
      throw new ConcurrentWriterException(
        s"$what already has a live writer [$holder] — single-writer by contract (two streams " +
          s"on one root is a misconfiguration); if the holder crashed, verify it is dead and $breakInstructions")
    }
    held.get += key
    try body
    finally {
      held.get -= key
      fs.delete(lockPath, false)
    }
  }
}
