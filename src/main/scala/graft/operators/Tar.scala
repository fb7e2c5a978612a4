package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM POSIX tar (ustar) walk — with the ZIP central-directory
  * walk ([[Docx]]), this completes the archive-expansion pair the
  * crawl-dump ingestion path ([[graft.io.Warc.toDocumentsArchive]])
  * routes through. Tar is 512-byte block structure: a header block
  * (name at 0/100, octal size at 124/12, type flag at 156, `ustar`
  * magic at 257, name prefix at 345/155) followed by the entry's data
  * rounded up to block size; two zero blocks end the archive.
  *
  * Only regular files (type '0' or NUL) are surfaced; directories,
  * links, and PAX/GNU extension blocks are skipped structurally (their
  * size field still frames the walk). Checksums are VERIFIED (octal
  * sum at 148/8 over the header with the checksum field spaced out).
  *
  * Fail-loudly contract: a bad magic/checksum, a non-octal size, or a
  * truncated entry throws `IllegalArgumentException` with the media
  * id. */
object Tar {

  /** Regular-file entries as (name, bytes), archive order. */
  def entries(b: Array[Byte], mediaId: Long = -1L): Vector[(String, Array[Byte])] = {
    val out = Vector.newBuilder[(String, Array[Byte])]
    var p = 0
    var done = false
    while (!done) {
      require(p + 512 <= b.length,
        s"media $mediaId: truncated tar header at $p")
      if (b.view.slice(p, p + 512).forall(_ == 0)) done = true // end block
      else {
        val magic = new String(b, p + 257, 5, US_ASCII)
        require(magic == "ustar",
          s"media $mediaId: tar ustar magic missing at $p")
        // checksum: unsigned byte sum with the checksum field as spaces
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else b(p + i) & 0xff)
          i += 1
        }
        require(octal(b, p + 148, 8, mediaId) == sum,
          s"media $mediaId: tar header checksum mismatch at $p")
        val size = octal(b, p + 124, 12, mediaId)
        require(size >= 0 && p + 512 + size <= b.length,
          s"media $mediaId: tar entry data overruns the payload at $p")
        val typeFlag = b(p + 156)
        if (typeFlag == '0' || typeFlag == 0) {
          val name = cstr(b, p, 100, mediaId)
          val prefix = cstr(b, p + 345, 155, mediaId)
          val full = if (prefix.isEmpty) name else prefix + "/" + name
          out += full -> java.util.Arrays.copyOfRange(b, p + 512,
            p + 512 + size.toInt)
        }
        p += 512 + ((size.toInt + 511) & ~511)
      }
    }
    out.result()
  }

  private def cstr(b: Array[Byte], at: Int, max: Int, mediaId: Long): String = {
    var len = 0
    while (len < max && b(at + len) != 0) len += 1
    new String(b, at, len, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def octal(b: Array[Byte], at: Int, len: Int, mediaId: Long): Long = {
    var v = 0L
    var i = 0
    var seen = false
    while (i < len) {
      val c = b(at + i)
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c == ' ' || c == 0) () // field padding
      else throw new IllegalArgumentException(
        s"media $mediaId: non-octal tar field byte ${c & 0xff}")
      i += 1
    }
    require(seen, s"media $mediaId: empty tar octal field")
    v
  }

  // -- generator (staging/spec counterpart) ------------------------------

  /** Serialize (name, bytes) entries as a ustar archive: real headers,
    * correct checksums, the two-zero-block terminator. */
  def writeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      require(name.getBytes(US_ASCII).length <= 100,
        s"writeTar: name '$name' exceeds 100 bytes (prefix unsupported here)")
      val h = new Array[Byte](512)
      val nameB = name.getBytes(US_ASCII)
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      def oct(at: Int, len: Int, v: Long): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes(US_ASCII), 0, h, at, len - 1)
        // NUL terminator stays in the last byte
      }
      oct(100, 8, 420L) // mode 0644
      oct(108, 8, 0L); oct(116, 8, 0L) // uid/gid
      oct(124, 12, data.length.toLong)
      oct(136, 12, 0L) // mtime (determinism)
      h(156) = '0' // regular file
      System.arraycopy("ustar".getBytes(US_ASCII), 0, h, 257, 5)
      h(263) = '0'; h(264) = '0' // version "00"
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = ("0" * (6 - cs.length)) + cs
      System.arraycopy(csPad.getBytes(US_ASCII), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // terminator
    out.toByteArray
  }
}
