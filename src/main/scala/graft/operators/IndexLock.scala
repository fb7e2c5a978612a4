package graft.operators

import org.apache.spark.sql.SparkSession

/** Writer lease for the standing indexes (BM25 and ANN): every
  * MUTATING verb — build/append/delete/compact/maintain/rebalance —
  * runs under `withLock`, so two interleaved writers (append racing
  * maintain, append racing append) can never corrupt an index: the
  * second writer fails loudly naming the holder instead of mutating a
  * tree mid-swap. Probes stay lock-free (readers were always allowed
  * concurrent with one writer — the swap discipline keeps every read
  * consistent).
  *
  * Acquisition is one atomic `create(path, overwrite = false)` of
  * `<indexDir>/.writer-lock` — atomic on HDFS by contract and the
  * standard primitive on Hadoop filesystems; the file body records the
  * verb and acquisition time for the loser's error message.
  *
  * Lease semantics, adjudicated: by DEFAULT a held lock is never
  * broken (`leaseMs = Long.MaxValue`). A TTL that silently breaks a
  * live-but-slow writer's lease lets two writers mutate at once — the
  * exact corruption this lock exists to prevent, and strictly worse
  * than halting. The cost is operational: a writer that DIES (JVM
  * crash, not an exception — exceptions release in `finally`) leaves
  * the lock behind, and the documented re-run-to-recover workflow
  * then needs [[forceUnlock]] first; its message says so. Long-lived
  * unattended loops that prefer self-healing pass an explicit
  * `leaseMs` bounding their longest verb, accepting the documented
  * slow-writer risk. */
object IndexLock {

  private[graft] val LockName = ".writer-lock"

  /** Run `body` holding the index's writer lease; always releases on
    * exit (including exceptions — only process death leaks the lock). */
  def withLock[T](spark: SparkSession, indexDir: String, verb: String,
      leaseMs: Long = Long.MaxValue)(body: => T): T = {
    val token = acquire(spark, indexDir, verb, leaseMs)
    try body finally release(spark, indexDir, token, leaseMs)
  }

  /** Operator recovery after a crashed (process-death) writer or
    * breaker: clears the lock AND any break ticket unconditionally.
    * Never called by the verbs themselves. */
  def forceUnlock(spark: SparkSession, indexDir: String): Unit = {
    val (fs, p) = lockPath(spark, indexDir)
    fs.delete(p, false)
    fs.delete(new org.apache.hadoop.fs.Path(
      p.getParent, s"$LockName.break"), false)
  }

  private def lockPath(spark: SparkSession, indexDir: String) = {
    val (fs0, p) = graft.io.Sinks.fsFor(spark, s"$indexDir/$LockName")
    // lock files live on the RAW filesystem: the checksum wrapper's
    // non-atomic create can leave a stale .crc sidecar behind a LOSING
    // create attempt, after which the WINNER's own lock reads as
    // corrupt (ChecksumException → unreadable) and its release cannot
    // verify ownership — observed as a leaked lease under the thread
    // race. A one-line lease file needs no checksum; HDFS and object
    // stores are not ChecksumFileSystems, so this only affects local.
    val fs = fs0 match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    (fs, p)
  }

  /** Acquire the lease; returns this writer's ownership token.
    *
    * The opt-in expired-lease break is TICKETED: a breaker must first
    * win `.writer-lock.break` by atomic create — so at most ONE
    * breaker exists — then re-read the lock, and only if it still
    * carries the holder it observed as expired delete + re-create it.
    * Why not rename-based? Rename is atomic but UNCONDITIONAL: a
    * waiter holding a stale observation can rename a FRESH lock away,
    * and in the window before the restore another waiter's create
    * succeeds — two holders (observed under a thread-race test, not
    * hypothetical). With the ticket, the lock file can only be removed
    * UNDER the ticket after content verification — by its holder's
    * release (see [[release]]) or by the single breaker — so a fresh
    * lock is never touched and single-holder is by construction, not
    * by luck. A
    * breaker that dies holding the ticket wedges future breaks (never
    * correctness); the wedge self-identifies once the ticket itself
    * ages past the lease and the message names [[forceUnlock]], which
    * clears both files. */
  private def acquire(spark: SparkSession, indexDir: String, verb: String,
      leaseMs: Long): String = {
    val (fs, p) = lockPath(spark, indexDir)
    val token = java.util.UUID.randomUUID().toString
    def tryCreate(path: org.apache.hadoop.fs.Path): Boolean =
      atomicCreate(fs, path,
        s"verb=$verb\nacquired_ms=${System.currentTimeMillis()}\n" +
          s"token=$token\n")
    def fail(holder: Option[(String, Long, String)]): Nothing = {
      val desc = holder
        .map { case (v, ms, _) => s"verb '$v' since epoch-ms $ms" }
        .getOrElse("unreadable holder")
      throw new IllegalStateException(
        s"index $indexDir is being mutated by a concurrent writer " +
          s"($desc) — refusing to interleave '$verb'. If that writer " +
          "DIED (process crash), clear the lease with " +
          "IndexLock.forceUnlock and re-run; the verbs are re-runnable " +
          "from any crash point.")
    }
    if (tryCreate(p)) return token
    val holder = readHolder(fs, p)
    def expiredAt(h: Option[(String, Long, String)]): Boolean =
      leaseMs != Long.MaxValue && h.exists {
        case (_, ms, _) => System.currentTimeMillis() - ms > leaseMs
      }
    if (expiredAt(holder)) {
      val ticket = new org.apache.hadoop.fs.Path(
        p.getParent, s"$LockName.break")
      if (!tryCreate(ticket)) {
        // another break is in progress — or a crashed breaker's wedge,
        // which self-identifies once the ticket ages past the lease
        if (expiredAt(readHolder(fs, ticket))) throw new IllegalStateException(
          s"index $indexDir: a lease breaker died holding the break " +
            s"ticket ($ticket) — clear it with IndexLock.forceUnlock " +
            "after confirming no writer is live.")
        fail(holder)
      }
      try {
        // single ticketed breaker, and releases verify+delete under
        // this same ticket: the lock file cannot change under us, so a
        // content match proves we delete exactly the expired holder
        if (readHolder(fs, p) == holder) {
          fs.delete(p, false)
          if (tryCreate(p)) return token
        }
        fail(holder) // a fresh writer slid in (or won the re-create)
      } finally fs.delete(ticket, false)
    }
    fail(holder)
  }

  /** One atomic create-if-absent of `path` with `body`, the lock and
    * ticket primitive. HDFS/object stores: create(overwrite = false)
    * is atomic by contract. The LOCAL filesystem's is check-then-act —
    * two racing creates can both "succeed" (observed as a double hold
    * under the thread-race spec) — so local creates go through NIO's
    * CREATE_NEW, which is O_EXCL at the OS level. */
  private def atomicCreate(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, bodyStr: String): Boolean = {
    val body = bodyStr.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    fs match {
      case _: org.apache.hadoop.fs.RawLocalFileSystem =>
        try {
          val local = java.nio.file.Paths.get(path.toUri.getPath)
          // Hadoop's create makes parent dirs; CREATE_NEW does not —
          // the first verb on a FRESH index locks before the dir
          // exists, and a parent-miss must not read as "lock held"
          java.nio.file.Files.createDirectories(local.getParent)
          val out = java.nio.file.Files.newOutputStream(local,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          out.write(body); out.close(); true
        } catch { case _: java.io.IOException => false }
      case _ =>
        try {
          val out = fs.create(path, false)
          out.write(body); out.close(); true
        } catch { case _: java.io.IOException => false }
    }
  }

  private def readHolder(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[(String, Long, String)] =
    try {
      val in = fs.open(p)
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](256)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
      val kv = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.map(_.split("=", 2)).collect {
          case Array(k, v) => (k, v)
        }.toMap
      for (v <- kv.get("verb"); ms <- kv.get("acquired_ms"))
        yield (v, ms.toLong, kv.getOrElse("token", ""))
    } catch { case _: Exception => None }

  /** Token-verified release UNDER THE BREAK TICKET: the verify-then-
    * delete must be atomic with respect to lease breaks, or a lease
    * expiring exactly between the read and the delete can be ticket-
    * broken and re-created by a waiter, and this writer then deletes
    * the waiter's FRESH lock — the two-holder scenario the ticket
    * protocol exists to prevent (it is also reachable when callers mix
    * leaseMs values on one index, so a self-forfeit keyed on our OWN
    * leaseMs is not sufficient). Holding the ticket excludes the
    * single breaker, so a token match proves the file is still this
    * writer's and the delete frees waiters even past the lease. If the
    * ticket cannot be won after a brief retry, a breaker is live on
    * our expired lease (or a crashed breaker wedged it — forceUnlock
    * recovers): the lock is no longer ours to clear, so forfeit. An
    * unreadable file is likewise left alone, never best-effort
    * deleted. */
  private def release(spark: SparkSession, indexDir: String,
      token: String, leaseMs: Long): Unit = {
    val (fs, p) = lockPath(spark, indexDir)
    val ticket = new org.apache.hadoop.fs.Path(
      p.getParent, s"$LockName.break")
    // a live breaker holds the ticket for milliseconds (read, delete,
    // create, delete ticket) — retry briefly before forfeiting
    var won = false
    var attempt = 0
    while (!won && attempt < 5) {
      won = atomicCreate(fs, ticket,
        s"verb=release\nacquired_ms=${System.currentTimeMillis()}\n" +
          s"token=$token\n")
      if (!won) { attempt += 1; Thread.sleep(10L * attempt) }
    }
    if (!won) return // breaker live or wedged: not ours to clear
    try {
      readHolder(fs, p) match {
        case Some((_, _, t)) if t == token => fs.delete(p, false)
        case _ => // not ours (broken-and-reacquired), or unreadable
      }
    } finally fs.delete(ticket, false)
  }
}
