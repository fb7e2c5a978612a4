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
    acquire(spark, indexDir, verb, leaseMs)
    try body finally release(spark, indexDir)
  }

  /** Operator recovery after a crashed (process-death) writer: clears
    * the lock unconditionally. Never called by the verbs themselves. */
  def forceUnlock(spark: SparkSession, indexDir: String): Unit =
    release(spark, indexDir)

  private def lockPath(spark: SparkSession, indexDir: String) =
    graft.io.Sinks.fsFor(spark, s"$indexDir/$LockName")

  private def acquire(spark: SparkSession, indexDir: String, verb: String,
      leaseMs: Long): Unit = {
    val (fs, p) = lockPath(spark, indexDir)
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        out.write(
          s"verb=$verb\nacquired_ms=${System.currentTimeMillis()}\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return
    val holder = readHolder(fs, p)
    val expired = leaseMs != Long.MaxValue && holder.exists { case (_, ms) =>
      System.currentTimeMillis() - ms > leaseMs
    }
    if (expired) {
      fs.delete(p, false)
      if (tryCreate()) return
    }
    val desc = holder.map { case (v, ms) => s"verb '$v' since epoch-ms $ms" }
      .getOrElse("unreadable holder")
    throw new IllegalStateException(
      s"index $indexDir is being mutated by a concurrent writer " +
        s"($desc) — refusing to interleave '$verb'. If that writer " +
        "DIED (process crash), clear the lease with " +
        "IndexLock.forceUnlock and re-run; the verbs are re-runnable " +
        "from any crash point.")
  }

  private def readHolder(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[(String, Long)] =
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
        yield (v, ms.toLong)
    } catch { case _: Exception => None }

  private def release(spark: SparkSession, indexDir: String): Unit = {
    val (fs, p) = lockPath(spark, indexDir)
    fs.delete(p, false)
  }
}
