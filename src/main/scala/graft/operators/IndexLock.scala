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
    try body finally release(spark, indexDir, token)
  }

  /** Operator recovery after a crashed (process-death) writer: clears
    * the lock unconditionally. Never called by the verbs themselves. */
  def forceUnlock(spark: SparkSession, indexDir: String): Unit = {
    val (fs, p) = lockPath(spark, indexDir)
    fs.delete(p, false)
  }

  private def lockPath(spark: SparkSession, indexDir: String) =
    graft.io.Sinks.fsFor(spark, s"$indexDir/$LockName")

  /** Acquire the lease; returns this writer's ownership token.
    *
    * The opt-in expired-lease break is RENAME-based, not
    * delete-then-create: two waiters that both observe an expired
    * holder and both blind-`delete(p)` race — the slower delete
    * removes the faster waiter's FRESH lock and both end up holding.
    * Renaming the specific observed file is atomic (exactly one
    * waiter's rename succeeds; the loser sees the source gone and
    * takes the error path), and the winner verifies the renamed
    * content is the holder it observed as expired before creating —
    * a content mismatch means a fresh lock was stolen, which is
    * restored and reported loudly. */
  private def acquire(spark: SparkSession, indexDir: String, verb: String,
      leaseMs: Long): String = {
    val (fs, p) = lockPath(spark, indexDir)
    val token = java.util.UUID.randomUUID().toString
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        out.write(
          (s"verb=$verb\nacquired_ms=${System.currentTimeMillis()}\n" +
            s"token=$token\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        true
      } catch { case _: java.io.IOException => false }
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
    if (tryCreate()) return token
    val holder = readHolder(fs, p)
    val expired = leaseMs != Long.MaxValue && holder.exists {
      case (_, ms, _) => System.currentTimeMillis() - ms > leaseMs
    }
    if (expired) {
      val break = new org.apache.hadoop.fs.Path(
        p.getParent, s"$LockName.break-$token")
      val renamed = try fs.rename(p, break)
        catch { case _: java.io.IOException => false }
      if (renamed) {
        if (readHolder(fs, break) == holder) {
          fs.delete(break, false)
          if (tryCreate()) return token
        } else {
          // A fresh lock slid in between observation and rename:
          // put it back and refuse; if the restore itself loses a
          // race, say so loudly rather than leave two holders.
          val restored = try fs.rename(break, p)
            catch { case _: java.io.IOException => false }
          if (!restored) throw new IllegalStateException(
            s"index $indexDir: lease-break race detected and the " +
              s"displaced fresh lock could not be restored (see " +
              s"$break) — resolve with IndexLock.forceUnlock after " +
              "confirming no writer is live.")
        }
      }
    }
    fail(holder)
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

  /** Token-verified release: only the writer whose token is in the
    * file may delete it — a writer whose lease was broken must not
    * delete the breaker's fresh lock on its way out. */
  private def release(spark: SparkSession, indexDir: String,
      token: String): Unit = {
    val (fs, p) = lockPath(spark, indexDir)
    readHolder(fs, p) match {
      case Some((_, _, t)) if t == token => fs.delete(p, false)
      case None => fs.delete(p, false) // unreadable/absent: best effort
      case Some(_) => // broken-and-reacquired lease: not ours to clear
    }
  }
}
