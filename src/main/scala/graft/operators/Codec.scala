package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}

/** Whole-payload compression codecs — the crawl-reality layer UNDER the
  * archive walk. Real corpora ship `.txt.gz` next to `.tar.xz`,
  * `.warc.zst` next to `.jsonl.lz4`: the container (tar/zip) and the
  * codec (gzip/xz/zstd/lz4) vary independently, so the engine keeps
  * them orthogonal — [[decompress]] peels exactly one codec layer and
  * the archive walk then routes whatever is underneath (a tar walks as
  * tar, a single member becomes one document named from the URL minus
  * the codec suffix).
  *
  * gzip rides `java.util.zip`; xz/zstd/lz4 ride the codec jars Spark
  * itself ships for shuffle/parquet compression (org.tukaani:xz,
  * com.github.luben:zstd-jni, org.lz4:lz4-java) — the same bytes-in/
  * bytes-out contract, no new dependencies.
  *
  * Decompression is BOUNDED: a compressed payload expanding past
  * `maxOut` aborts with an exception rather than filling executor
  * memory (the zip-bomb guard — at 100 TB a hostile 1 KB → 10 GB
  * member must fail loud per-record, not OOM the task). Callers that
  * trust their input pass `maxOut = -1`.
  *
  * Reference behavior: treynr/eggv ingests gzip corpora only
  * (eggv/retrieve.py:72 `gzip.open`); the xz/zstd/lz4 family is the
  * scale path beyond the reference, mirroring what large crawls
  * actually publish. */
object Codec {

  val Gzip = "application/gzip"
  val Xz   = "application/x-xz"
  val Zstd = "application/zstd"
  val Lz4  = "application/x-lz4"
  val Br   = "application/x-brotli"

  /** Every MIME this layer peels (both gzip spellings). Brotli is the
    * one codec with NO magic bytes (RFC 7932 streams start with raw
    * window bits), so [[sniffCodec]] can never claim it — `.br`
    * routing is by suffix/header only, loudly wrong otherwise. */
  val mimes: Set[String] =
    Set(Gzip, "application/x-gzip", Xz, Zstd, Lz4, Br)

  /** The codec MIME of a payload from leading magic bytes, or None. */
  def sniffCodec(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 4) return None
    def u(i: Int) = b(i) & 0xff
    if (u(0) == 0x1f && u(1) == 0x8b) Some(Gzip)
    else if (b.length >= 6 && u(0) == 0xfd && u(1) == '7' && u(2) == 'z' &&
      u(3) == 'X' && u(4) == 'Z' && u(5) == 0x00) Some(Xz)
    else if (u(0) == 0x28 && u(1) == 0xb5 && u(2) == 0x2f && u(3) == 0xfd)
      Some(Zstd)
    else if (u(0) == 0x04 && u(1) == 0x22 && u(2) == 0x4d && u(3) == 0x18)
      Some(Lz4)
    else None
  }

  /** Strip ONE codec suffix from a file name (`a.txt.xz` → `a.txt`).
    * Names without a codec suffix pass through. */
  def stripSuffix(name: String): String =
    name.replaceAll("(?i)\\.(gz|gzip|xz|zst|zstd|lz4|br)$", "")

  /** Peel one codec layer, bounded at `maxOut` decompressed bytes
    * (-1 = unbounded). Unknown MIME or corrupt stream throws — the
    * caller's per-record degrade owns the catch. Concatenated gzip
    * members decode end-to-end (GZIPInputStream's multi-member walk),
    * matching the `.warc.gz` record-level layout. */
  def decompress(b: Array[Byte], mime: String, maxOut: Long = -1L): Array[Byte] = {
    val bis = new ByteArrayInputStream(b)
    val in: InputStream = mime match {
      case Gzip | "application/x-gzip" => new java.util.zip.GZIPInputStream(bis)
      case Xz   => new org.tukaani.xz.XZInputStream(bis)
      case Zstd => new com.github.luben.zstd.ZstdInputStream(bis)
      case Lz4  => new net.jpountz.lz4.LZ4FrameInputStream(bis)
      case Br   => return Brotli.decompress(b, maxOut) // pure-JVM RFC 7932
      case other => throw new IllegalArgumentException(
        s"decompress: unknown codec mime '$other'")
    }
    try readBounded(in, maxOut)
    finally in.close()
  }

  /** Convenience: peel by sniffed magic (for sources with no header). */
  def decompressAuto(b: Array[Byte], maxOut: Long = -1L): Array[Byte] =
    decompress(b, sniffCodec(b).getOrElse(
      throw new IllegalArgumentException("decompressAuto: no codec magic")),
      maxOut)

  /** Compress under a codec MIME — the staging/test twin of
    * [[decompress]] (round-trip oracles serialize with this). */
  def compress(b: Array[Byte], mime: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream(b.length / 2 + 64)
    val out: java.io.OutputStream = mime match {
      case Gzip | "application/x-gzip" => new java.util.zip.GZIPOutputStream(bos)
      case Xz   => new org.tukaani.xz.XZOutputStream(bos, {
        // dictionary capped at the payload size (≥ the 4 KiB floor):
        // a dict larger than the input buys zero ratio but pays its
        // full allocation+init per call — the default 8 MiB preset
        // made per-record staging of small members encoder-bound
        val o = new org.tukaani.xz.LZMA2Options()
        o.setDictSize(math.max(org.tukaani.xz.LZMA2Options.DICT_SIZE_MIN,
          math.min(b.length, o.getDictSize)))
        o
      })
      case Zstd => new com.github.luben.zstd.ZstdOutputStream(bos)
      case Lz4  => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      case Br   => return Brotli.compress(b) // the staging/oracle twin
      case other => throw new IllegalArgumentException(
        s"compress: unknown codec mime '$other'")
    }
    try { out.write(b); out.close() } catch {
      case e: Exception => out.close(); throw e
    }
    bos.toByteArray
  }

  private def readBounded(in: InputStream, maxOut: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8192)
    val buf = new Array[Byte](65536)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      if (maxOut >= 0 && total > maxOut)
        throw new java.io.IOException(
          s"decompress: output exceeds $maxOut bytes (bomb guard)")
      bos.write(buf, 0, n)
      n = in.read(buf)
    }
    bos.toByteArray
  }
}
