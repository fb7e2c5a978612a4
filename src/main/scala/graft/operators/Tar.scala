package graft.operators

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

/** Pure-JVM POSIX tar walk — with the ZIP central-directory walk
  * ([[Docx]]), this completes the archive-expansion pair the
  * crawl-dump ingestion path ([[graft.io.Warc.toDocumentsArchive]])
  * routes through. Tar is 512-byte block structure: a header block
  * (name at 0/100, octal size at 124/12, type flag at 156, `ustar`
  * magic at 257, name prefix at 345/155) followed by the entry's data
  * rounded up to block size; two zero blocks end the archive.
  *
  * PAX and GNU extensions are DECODED, not just skipped — modern GNU
  * and BSD tar emit a PAX `x` record for ANY member whose path
  * exceeds 100 bytes (deep repo trees in source dumps hit this
  * constantly), so a walker that only frames those records silently
  * truncates names:
  *  - `x` (PAX extended header, POSIX.1-2001 §pax): `len key=value\n`
  *    records; `path` overrides the next member's name, `size`
  *    overrides its data length (the >8 GiB escape);
  *  - `g` (PAX global header): defaults for ALL subsequent members,
  *    per-member `x` winning;
  *  - `L` (GNU longname): the data block IS the next member's name;
  *  - `K` (GNU longlink): consumed structurally;
  *  - base-256 size fields (GNU, high bit set in the first byte) are
  *    decoded alongside octal.
  * Only regular files (type '0' or NUL) are surfaced; directories and
  * links are skipped (their size field still frames the walk).
  * Checksums are VERIFIED (octal sum at 148/8 with the checksum field
  * spaced out).
  *
  * Fail-loudly contract: a bad magic/checksum, a non-octal size, a
  * malformed PAX record, or a truncated entry throws
  * `IllegalArgumentException` with the media id. */
object Tar {

  /** Regular-file entries as (name, bytes), archive order. */
  def entries(b: Array[Byte], mediaId: Long = -1L): Vector[(String, Array[Byte])] = {
    val out = Vector.newBuilder[(String, Array[Byte])]
    var p = 0
    var done = false
    val globalPax = scala.collection.mutable.Map.empty[String, String]
    var pendingPax: Map[String, String] = Map.empty
    var pendingLongName: String = null
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
        val size = sizeField(b, p + 124, mediaId)
        require(size >= 0 && size <= Int.MaxValue - 1024 &&
          p + 512 + size <= b.length,
          s"media $mediaId: tar entry data overruns the payload at $p")
        val typeFlag = b(p + 156)
        def data: Array[Byte] = java.util.Arrays.copyOfRange(b, p + 512,
          p + 512 + size.toInt)
        var advance = 512 + ((size.toInt + 511) & ~511)
        typeFlag.toChar match {
          case 'x' => pendingPax = parsePax(data, mediaId)
          case 'g' => globalPax ++= parsePax(data, mediaId)
          case 'L' =>
            // data is the next member's name, NUL-terminated
            var len = size.toInt
            while (len > 0 && b(p + 512 + len - 1) == 0) len -= 1
            pendingLongName = new String(b, p + 512, len, UTF_8)
          case 'K' => () // long LINK name: framed, not surfaced
          case c if c == '0' || c == 0 =>
            val effSize = pendingPax.get("size")
              .orElse(globalPax.get("size")).map { s =>
                val v = s.toLong
                require(v >= 0 && v <= Int.MaxValue - 1024 &&
                  p + 512 + v <= b.length,
                  s"media $mediaId: PAX size $v overruns the payload at $p")
                v
              }.getOrElse(size)
            val name = {
              val base = cstr(b, p, 100, mediaId)
              val prefix = cstr(b, p + 345, 155, mediaId)
              val ustar = if (prefix.isEmpty) base else prefix + "/" + base
              if (pendingLongName != null) pendingLongName
              else pendingPax.get("path")
                .orElse(globalPax.get("path")).getOrElse(ustar)
            }
            out += name -> java.util.Arrays.copyOfRange(b, p + 512,
              p + 512 + effSize.toInt)
            advance = 512 + ((effSize.toInt + 511) & ~511)
            pendingPax = Map.empty
            pendingLongName = null
          case _ => // directory, link, device…: framed, not surfaced
            pendingPax = Map.empty
            pendingLongName = null
        }
        p += advance
      }
    }
    out.result()
  }

  /** PAX extended-header records: `<len> <key>=<value>\n` where `len`
    * is the DECIMAL byte length of the whole record including itself,
    * the space, and the trailing newline; values are UTF-8. */
  private def parsePax(d: Array[Byte], mediaId: Long): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var at = 0
    while (at < d.length && d(at) != 0) {
      var sp = at
      while (sp < d.length && d(sp) != ' ') sp += 1
      require(sp < d.length,
        s"media $mediaId: PAX record missing length delimiter at $at")
      val len = new String(d, at, sp - at, US_ASCII).toIntOption.getOrElse(
        throw new IllegalArgumentException(
          s"media $mediaId: non-decimal PAX record length at $at"))
      require(len > sp - at + 2 && at + len <= d.length &&
        d(at + len - 1) == '\n',
        s"media $mediaId: malformed PAX record framing at $at")
      val body = new String(d, sp + 1, at + len - 1 - (sp + 1), UTF_8)
      val eq = body.indexOf('=')
      require(eq > 0, s"media $mediaId: PAX record without '=' at $at")
      m(body.substring(0, eq)) = body.substring(eq + 1)
      at += len
    }
    m.toMap
  }

  private def cstr(b: Array[Byte], at: Int, max: Int, mediaId: Long): String = {
    var len = 0
    while (len < max && b(at + len) != 0) len += 1
    new String(b, at, len, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Size field: octal, or GNU base-256 (high bit of the first byte)
    * — big-endian binary over the remaining 11 bytes. */
  private def sizeField(b: Array[Byte], at: Int, mediaId: Long): Long =
    if ((b(at) & 0x80) != 0) {
      var v = (b(at) & 0x7f).toLong
      var i = 1
      while (i < 12) {
        require(v < (1L << 55),
          s"media $mediaId: base-256 tar size overflows")
        v = (v << 8) | (b(at + i) & 0xff)
        i += 1
      }
      v
    } else octal(b, at, 12, mediaId)

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
    * correct checksums, the two-zero-block terminator. A name that
    * does not fit the 100-byte field gains a PAX `x` record carrying
    * `path` (what GNU/BSD tar emit in POSIX mode) with a truncated
    * ustar fallback name — so the writer round-trips through both a
    * PAX-aware and a legacy walker. */
  def writeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val nameBytes = name.getBytes(UTF_8)
      if (nameBytes.length > 100) {
        val pax = paxRecord("path", name)
        writeHeader(out, "@PaxHeader", pax.length, 'x')
        writeData(out, pax)
        writeHeader(out, asciiFallback(nameBytes.take(100)), data.length, '0')
      } else writeHeader(out, name, data.length, '0')
      writeData(out, data)
    }
    out.write(new Array[Byte](1024)) // two zero end blocks
    out.toByteArray
  }

  /** GNU-longname staging twin: every entry travels as an `L` record
    * (name in the data block) + a member whose ustar name field holds
    * only the truncated tail — the pre-PAX long-name layout still
    * found in older dumps. */
  def writeTarGnuLongNames(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val nb = name.getBytes(UTF_8)
      val nameZ = java.util.Arrays.copyOf(nb, nb.length + 1) // NUL-terminated
      writeHeader(out, "././@LongLink", nameZ.length, 'L')
      writeData(out, nameZ)
      writeHeader(out, asciiFallback(nb.takeRight(100)), data.length, '0')
      writeData(out, data)
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** legacy-walker-safe truncated name: printable ASCII only (a cut
    * UTF-8 sequence must not expand past the 100-byte field) */
  private def asciiFallback(nb: Array[Byte]): String =
    new String(nb.map(c => if (c >= 0x20 && c < 0x7f) c else '_'.toByte),
      US_ASCII)

  private def paxRecord(key: String, value: String): Array[Byte] = {
    val kv = s" $key=$value\n".getBytes(UTF_8)
    // record length includes its own decimal digits
    var len = kv.length + 1
    while ((len.toString.length + kv.length) != len) {
      len = len.toString.length + kv.length
    }
    (len.toString.getBytes(US_ASCII) ++ kv)
  }

  private def writeData(out: java.io.ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    out.write(data)
    val pad = (512 - (data.length % 512)) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  private def writeHeader(out: java.io.ByteArrayOutputStream, name: String,
      size: Int, typeFlag: Char): Unit = {
    val h = new Array[Byte](512)
    val nb = name.getBytes(UTF_8)
    require(nb.length <= 100, s"writeTar: header name '$name' exceeds 100 bytes")
    System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(at: Int, len: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      System.arraycopy(padded.getBytes(US_ASCII), 0, h, at, len - 1)
      h(at + len - 1) = 0
    }
    oct(100, 8, 420) // mode 0644
    oct(108, 8, 0); oct(116, 8, 0) // uid, gid
    oct(124, 12, size)
    oct(136, 12, 0) // mtime
    h(156) = typeFlag.toByte
    System.arraycopy("ustar ".getBytes(US_ASCII), 0, h, 257, 6)
    h(263) = '0'; h(264) = '0' // version "00"
    // checksum over the header with the checksum field as spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(c => sum += c & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    val csPadded = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csPadded.getBytes(US_ASCII), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    out.write(h)
  }
}
