package graft.operators

import java.nio.charset.StandardCharsets.ISO_8859_1

/** PDF standard security handler (ISO 32000 §7.6) — the
  * EMPTY-USER-PASSWORD class of encrypted crawl PDFs. A measurable
  * slice of crawl PDFs set owner restrictions only: the user password
  * is empty, the key derivation is fully public formula (no
  * non-derivable tables — MD5/SHA-2 + RC4/AES, all specified), and the
  * text is exactly what a curation pipeline wants. [[decryptStandard]]
  * verifies the empty user password and rewrites the document as its
  * PLAINTEXT equivalent (strings re-emitted as hex, stream bytes
  * replaced, a fresh xref) so the extractor's scan path runs
  * unchanged; a document whose user password is NOT empty keeps the
  * loud [[Pdf]] failure — a silently empty text would poison dedup.
  *
  * Coverage: revisions 2 (RC4-40), 3 (RC4-128), 4 (/V4 crypt filters,
  * /AESV2 AES-128-CBC, /EncryptMetadata honored) and 6 (/V5 /AESV3
  * AES-256, the SHA-2 hardened hash of ISO 32000-2) — classic-trailer
  * documents with direct stream /Length, which is what the empty-
  * user-password class overwhelmingly is; xref-stream encrypted docs
  * and indirect /Length under encryption stay loud failures (scope,
  * not silence). RC4 is implemented directly (40/128-bit keys are not
  * a JCE guarantee); AES rides `javax.crypto`.
  *
  * [[encryptStandard]] is the staging counterpart (the
  * writeCbrStream rule): it takes any classic-trailer PDF our writers
  * emit and produces the encrypted form with a real /Encrypt
  * dictionary, deterministic salts/IVs keyed by `seed`, correct /O,
  * /U (and /OE /UE /Perms for R6) — so the decryptor is exercised by
  * documents a conforming reader also opens. */
object PdfCrypt {

  /** The §7.6.3.3 padding constant (public spec, Algorithm 2 step a). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def padPwd(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ Pad).take(32)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(d.update)
    d.digest()
  }

  private def leInt(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** RC4 — the §7.6.2 symmetric cipher, implemented directly (JCE does
    * not guarantee 40-bit RC4). Encryption and decryption coincide. */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + (s(x) & 0xff)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s(((s(x) & 0xff) + (s(y) & 0xff)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def aes(encrypt: Boolean, mode: String, key: Array[Byte],
      iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance(s"AES/$mode")
    val k = new javax.crypto.spec.SecretKeySpec(key, "AES")
    val dir = if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE
    if (mode.startsWith("ECB")) c.init(dir, k)
    else c.init(dir, k, new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  // ---- key derivation, revisions 2-4 (Algorithm 2) ----------------------

  private def fileKeyR234(r: Int, keyLen: Int, o: Array[Byte], p: Int,
      id0: Array[Byte], encryptMetadata: Boolean,
      userPwd: Array[Byte]): Array[Byte] = {
    val metaTail =
      if (r >= 4 && !encryptMetadata)
        Array(0xff, 0xff, 0xff, 0xff).map(_.toByte)
      else Array.empty[Byte]
    var h = md5(padPwd(userPwd), o, leInt(p), id0, metaTail)
    if (r >= 3) (0 until 50).foreach(_ => h = md5(h.take(keyLen)))
    h.take(keyLen)
  }

  /** /U for the empty-vs-given user password (Algorithms 4/5). R2: a
    * full 32-byte RC4 of the pad; R3/R4: 16 significant bytes (MD5 of
    * pad+ID through 20 keyed RC4 passes) + 16 padding bytes. */
  private def computeU(r: Int, fileKey: Array[Byte],
      id0: Array[Byte]): Array[Byte] =
    if (r == 2) rc4(fileKey, Pad)
    else {
      var x = md5(Pad, id0)
      var i = 0
      while (i <= 19) {
        val k = fileKey.map(b => (b ^ i).toByte)
        x = rc4(k, x)
        i += 1
      }
      x ++ new Array[Byte](16)
    }

  /** /O from the owner password (Algorithm 3) — the write side. */
  private def computeO(r: Int, keyLen: Int, ownerPwd: Array[Byte],
      userPwd: Array[Byte]): Array[Byte] = {
    var h = md5(padPwd(ownerPwd))
    if (r >= 3) (0 until 50).foreach(_ => h = md5(h))
    val key = h.take(keyLen)
    var o = rc4(key, padPwd(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        o = rc4(key.map(b => (b ^ i).toByte), o)
        i += 1
      }
    }
    o
  }

  /** Per-object key (Algorithm 1): MD5 of file key + object number
    * (3 LE bytes) + generation (2 LE bytes), plus the `sAlT` constant
    * for AES, truncated to min(keyLen+5, 16). V5 uses the file key
    * directly — no per-object derivation. */
  private def objectKey(fileKey: Array[Byte], num: Int, gen: Int,
      isAes: Boolean): Array[Byte] = {
    val salt =
      if (isAes) Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte)
      else Array.empty[Byte]
    md5(fileKey,
      Array(num.toByte, (num >> 8).toByte, (num >> 16).toByte),
      Array(gen.toByte, (gen >> 8).toByte), salt)
      .take(math.min(fileKey.length + 5, 16))
  }

  // ---- the R6 hardened hash (ISO 32000-2 Algorithm 2.B) ------------------

  private[graft] def hash2B(pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha(256, pwd, salt, udata)
    var round = 0
    var done = false
    var lastE: Array[Byte] = Array.empty
    while (!done) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      (0 until 64).foreach(i =>
        System.arraycopy(block, 0, k1, i * block.length, block.length))
      val e = aes(encrypt = true, "CBC/NoPadding",
        java.util.Arrays.copyOfRange(k, 0, 16),
        java.util.Arrays.copyOfRange(k, 16, 32), k1)
      val mod = (0 until 16).map(i => e(i) & 0xff).sum % 3
      k = sha(if (mod == 0) 256 else if (mod == 1) 384 else 512, e)
      lastE = e
      round += 1
      done = round >= 64 && (lastE(lastE.length - 1) & 0xff) <= round - 32
    }
    k.take(32)
  }

  // ---- the /Encrypt dictionary (parse side) ------------------------------

  private final case class EncryptDict(
      v: Int, r: Int, keyLen: Int, o: Array[Byte], u: Array[Byte],
      oe: Array[Byte], ue: Array[Byte], perms: Array[Byte],
      p: Int, encryptMetadata: Boolean)

  private def stringValue(body: String, key: String,
      mediaId: Long): Option[Array[Byte]] = {
    val bb = body.getBytes(ISO_8859_1)
    // the lookahead keeps /U from matching the /UE prefix (and /O, /OE)
    ("/" + key + "(?![A-Za-z])\\s*").r.findFirstMatchIn(body).map { m =>
      val i = m.end
      bb(i) match {
        case '(' => Pdf.parseLiteralString(bb, i, mediaId)._1
        case '<' => Pdf.parseHexString(bb, i, mediaId)._1
        case _ => throw new IllegalArgumentException(
          s"media $mediaId: /Encrypt $key is not a string")
      }
    }
  }

  private def parseEncryptDict(body: String,
      mediaId: Long): EncryptDict = {
    require("/Filter\\s*/Standard\\b".r.findFirstIn(body).isDefined,
      s"media $mediaId: encrypted PDF with a non-Standard security " +
        "handler (cannot extract text without the key)")
    def int(k: String, dflt: Option[Int] = None): Int =
      ("/" + k + "(?![A-Za-z])\\s+(-?\\d+)").r.findFirstMatchIn(body)
        .map(_.group(1).toInt).orElse(dflt)
        .getOrElse(throw new IllegalArgumentException(
          s"media $mediaId: /Encrypt without /$k"))
    val v = int("V", Some(0))
    val r = int("R")
    require(Seq(2, 3, 4, 6).contains(r) && Seq(1, 2, 4, 5).contains(v),
      s"media $mediaId: encrypted PDF with unsupported /V $v /R $r")
    if (v == 4 || v == 5) {
      // the one crypt-filter shape the empty-password class uses:
      // StdCF applied to both strings and streams
      val cfm = if (v == 4) "AESV2" else "AESV3"
      require(body.contains("/" + cfm),
        s"media $mediaId: /V $v encryption without /$cfm (RC4 crypt " +
          "filters inside /V 4 are not in this decryptor's scope)")
      require(!body.contains("/Identity"),
        s"media $mediaId: per-class /Identity crypt filters are not " +
          "in this decryptor's scope")
    }
    val keyLen = v match {
      case 1 => 5
      case 5 => 32
      case _ => int("Length", Some(40)) / 8
    }
    val o = stringValue(body, "O", mediaId).getOrElse(
      throw new IllegalArgumentException(
        s"media $mediaId: /Encrypt without /O"))
    val u = stringValue(body, "U", mediaId).getOrElse(
      throw new IllegalArgumentException(
        s"media $mediaId: /Encrypt without /U"))
    EncryptDict(v, r, keyLen, o, u,
      stringValue(body, "OE", mediaId).getOrElse(Array.empty),
      stringValue(body, "UE", mediaId).getOrElse(Array.empty),
      stringValue(body, "Perms", mediaId).getOrElse(Array.empty),
      int("P"),
      !("/EncryptMetadata\\s+false".r.findFirstIn(body).isDefined))
  }

  /** The trailer's first /ID string (required by the R≤4 key formula). */
  private def firstId(doc: String, mediaId: Long): Array[Byte] =
    "/ID\\s*\\[\\s*<([0-9A-Fa-f\\s]*)>".r.findFirstMatchIn(doc)
      .map(m => m.group(1).replaceAll("\\s", "").grouped(2)
        .map(h => Integer.parseInt(h, 16).toByte).toArray)
      .getOrElse(Array.empty[Byte])

  // ---- whole-document transform ------------------------------------------

  /** One parsed top-level object: header span, body layout. */
  private final case class ObjSpan(num: Int, gen: Int,
      bodyFrom: Int, bodyUntil: Int,
      // for stream objects: dict text, data range (None = no stream)
      stream: Option[(String, Int, Int)])

  /** Walk the top-level objects of a classic-trailer PDF in file
    * order. String-aware (a `(` literal with escapes or a `<` hex
    * string can contain anything) and stream-jumping (stream bytes
    * are located by the DIRECT /Length — an encrypted stream's bytes
    * are ciphertext and may contain any keyword). */
  private def objects(bytes: Array[Byte], mediaId: Long): Vector[ObjSpan] = {
    val out = Vector.newBuilder[ObjSpan]
    val doc = new String(bytes, ISO_8859_1)
    val header = "(\\d+)\\s+(\\d+)\\s+obj\\b".r
    var from = 0
    var m = header.findFirstMatchIn(doc.substring(from))
    while (m.isDefined) {
      val mm = m.get
      val num = mm.group(1).toInt
      val gen = mm.group(2).toInt
      val bodyFrom = from + mm.end
      var i = bodyFrom
      var stream: Option[(String, Int, Int)] = None
      var endAt = -1
      while (endAt < 0) {
        require(i < bytes.length,
          s"media $mediaId: object $num $gen without endobj")
        bytes(i) match {
          case '(' => i = Pdf.parseLiteralString(bytes, i, mediaId)._2
          case '<' if i + 1 < bytes.length && bytes(i + 1) == '<' =>
            i += 2 // dict open: NOT a hex string
          case '<' => i = Pdf.parseHexString(bytes, i, mediaId)._2
          case '%' => // comment runs to EOL
            while (i < bytes.length && bytes(i) != '\n' && bytes(i) != '\r')
              i += 1
          case 's' if regionMatches(bytes, i, "stream") &&
              Pdf.isTokenBoundary(bytes, i - 1) &&
              !Pdf.precededBy(bytes, i, "end") =>
            val dict = new String(bytes, bodyFrom, i - bodyFrom, ISO_8859_1)
            val len = "/Length\\s+(\\d+)\\b(?!\\s+\\d+\\s+R)".r
              .findFirstMatchIn(dict).map(_.group(1).toInt)
              .getOrElse(throw new IllegalArgumentException(
                s"media $mediaId: stream object $num without a direct " +
                  "/Length (indirect lengths are out of the crypt " +
                  "transform's scope)"))
            val dataStart = Pdf.afterStreamKeyword(bytes, i)
            require(dataStart > 0 && dataStart + len <= bytes.length,
              s"media $mediaId: stream object $num overruns")
            stream = Some((dict, dataStart, dataStart + len))
            i = dataStart + len
          case 'e' if regionMatches(bytes, i, "endobj") &&
              Pdf.isTokenBoundary(bytes, i - 1) =>
            endAt = i
          case _ => i += 1
        }
      }
      out += ObjSpan(num, gen, bodyFrom, endAt, stream)
      from = endAt + 6
      m = header.findFirstMatchIn(doc.substring(from))
    }
    out.result()
  }

  private def regionMatches(b: Array[Byte], at: Int, s: String): Boolean =
    at + s.length <= b.length &&
      (0 until s.length).forall(j => b(at + j) == s.charAt(j))

  private def hexEmit(data: Array[Byte]): String =
    data.map(x => f"${x & 0xff}%02X").mkString("<", "", ">")

  /** Re-emit the document with every string and stream transformed:
    * strings as hex, stream /Length rewritten, a FRESH xref + trailer
    * (offsets move, and the extractor-independent invariant is that a
    * conforming reader still opens the output). `transform(num, gen,
    * isStream, dict, data)` returns the replacement bytes; `skip`
    * leaves an object verbatim (the /Encrypt dictionary itself — its
    * /O and /U strings are never encrypted). */
  private def transformDocument(bytes: Array[Byte], mediaId: Long,
      skip: Int => Boolean,
      transform: (Int, Int, Boolean, String, Array[Byte]) => Array[Byte],
      trailerEdit: String => String): Array[Byte] = {
    val doc = new String(bytes, ISO_8859_1)
    val objs = objects(bytes, mediaId)
    require(objs.nonEmpty, s"media $mediaId: PDF without objects")
    val trailerDict = "(?s)trailer\\s*<<(.*?)>>".r
      .findAllMatchIn(doc).toSeq.lastOption
      .map(_.group(1)).getOrElse(throw new IllegalArgumentException(
        s"media $mediaId: encrypted PDF without a classic trailer " +
          "(xref-stream encryption is out of scope)"))
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    // header: everything before the first object (the %PDF line)
    val firstHeaderAt = doc.indexOf(s"${objs.head.num} ${objs.head.gen} obj")
    out.write(bytes, 0, firstHeaderAt)
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    objs.foreach { o =>
      offsets(o.num) = out.size()
      w(s"${o.num} ${o.gen} obj\n")
      if (skip(o.num)) {
        out.write(bytes, o.bodyFrom, o.bodyUntil - o.bodyFrom)
        w("endobj\n")
      } else o.stream match {
        case Some((dict, dFrom, dUntil)) =>
          val data = transform(o.num, o.gen, true, dict,
            java.util.Arrays.copyOfRange(bytes, dFrom, dUntil))
          val newDict = dict.replaceAll("/Length\\s+\\d+\\b",
            s"/Length ${data.length}").trim
          w(newDict)
          w("\nstream\n")
          out.write(data, 0, data.length)
          w("\nendstream\nendobj\n")
        case None =>
          // transform every string in the body, emit as hex
          var i = o.bodyFrom
          while (i < o.bodyUntil) {
            bytes(i) match {
              case '(' =>
                val (s, next) = Pdf.parseLiteralString(bytes, i, mediaId)
                w(hexEmit(transform(o.num, o.gen, false, "", s)))
                i = next
              case '<' if i + 1 < o.bodyUntil && bytes(i + 1) == '<' =>
                out.write('<'); out.write('<'); i += 2 // dict open
              case '<' =>
                val (s, next) = Pdf.parseHexString(bytes, i, mediaId)
                w(hexEmit(transform(o.num, o.gen, false, "", s)))
                i = next
              case c => out.write(c); i += 1
            }
          }
          w("\nendobj\n")
      }
    }
    val maxNum = objs.map(_.num).max
    val xrefAt = out.size()
    w(s"xref\n0 ${maxNum + 1}\n")
    w("0000000000 65535 f \n")
    (1 to maxNum).foreach { k =>
      offsets.get(k) match {
        case Some(off) => w(f"$off%010d 00000 n \n")
        case None => w("0000000000 65535 f \n")
      }
    }
    val newTrailer = trailerEdit(trailerDict)
      .replaceAll("/Size\\s+\\d+", s"/Size ${maxNum + 1}")
    w(s"trailer\n<<$newTrailer>>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  // ---- the public faces ---------------------------------------------------

  /** True when a classic trailer references /Encrypt. */
  private[operators] def isEncrypted(bytes: Array[Byte]): Boolean = {
    val doc = new String(bytes, ISO_8859_1)
    "(?s)trailer\\s*<<(.*?)>>".r.findAllMatchIn(doc)
      .exists(m => m.group(1).contains("/Encrypt"))
  }

  /** Decrypt a standard-handler document whose USER password is empty
    * into its plaintext equivalent; a non-encrypted document passes
    * through untouched. Wrong (non-empty) user passwords, non-Standard
    * handlers, and out-of-scope shapes throw `IllegalArgumentException`
    * naming the media id — the loud [[Pdf]] contract. */
  def decryptStandard(bytes: Array[Byte], mediaId: Long = -1L): Array[Byte] = {
    if (!isEncrypted(bytes)) return bytes
    val doc = new String(bytes, ISO_8859_1)
    val encRef = "/Encrypt\\s+(\\d+)\\s+(\\d+)\\s+R".r
      .findAllMatchIn(doc).toSeq.lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"media $mediaId: encrypted PDF whose /Encrypt is not an indirect reference"))
    val encNum = encRef.group(1).toInt
    val body = Pdf.objBody(doc, encNum).getOrElse(
      throw new IllegalArgumentException(
        s"media $mediaId: encrypted PDF with a dangling /Encrypt reference to object $encNum"))
    val ed = parseEncryptDict(body, mediaId)
    val empty = Array.empty[Byte]

    val fileKey: Array[Byte] =
      if (ed.v == 5) {
        // R6: validate the empty user password, unwrap the key from /UE
        require(ed.u.length >= 48 && ed.ue.length == 32,
          s"media $mediaId: malformed /U//UE for /V 5")
        val valSalt = java.util.Arrays.copyOfRange(ed.u, 32, 40)
        val keySalt = java.util.Arrays.copyOfRange(ed.u, 40, 48)
        val check = hash2B(empty, valSalt, empty)
        require(java.util.Arrays.equals(check,
          java.util.Arrays.copyOfRange(ed.u, 0, 32)),
          s"media $mediaId: encrypted PDF with a non-empty user " +
            "password (cannot extract text without the key)")
        val ik = hash2B(empty, keySalt, empty)
        aes(encrypt = false, "CBC/NoPadding", ik, new Array[Byte](16), ed.ue)
      } else {
        val id0 = firstId(doc, mediaId)
        val key = fileKeyR234(ed.r, ed.keyLen, ed.o, ed.p, id0,
          ed.encryptMetadata, empty)
        val u = computeU(ed.r, key, id0)
        val ok =
          if (ed.r == 2) java.util.Arrays.equals(u, ed.u)
          else ed.u.length >= 16 && (0 until 16).forall(i => u(i) == ed.u(i))
        require(ok, s"media $mediaId: encrypted PDF with a non-empty " +
          "user password (cannot extract text without the key)")
        key
      }
    // R6 hardening: the /Perms blob must unwrap under the file key
    if (ed.v == 5 && ed.perms.length == 16) {
      val p = aes(encrypt = false, "ECB/NoPadding", fileKey,
        Array.empty, ed.perms)
      require(p(9) == 'a' && p(10) == 'd' && p(11) == 'b',
        s"media $mediaId: /Perms does not unwrap — corrupt encryption")
    }

    val aesMode = ed.v >= 4
    def decrypt(num: Int, gen: Int, isStream: Boolean, dict: String,
        data: Array[Byte]): Array[Byte] = {
      if (isStream && (dict.contains("/XRef") || (ed.v >= 4 &&
          !ed.encryptMetadata && dict.contains("/Metadata"))))
        return data // never (or opted-out) encrypted stream types
      val key = if (ed.v == 5) fileKey
        else objectKey(fileKey, num, gen, aesMode)
      if (aesMode) {
        require(data.length >= 16 && data.length % 16 == 0,
          s"media $mediaId: AES payload of ${data.length} bytes in " +
            s"object $num")
        if (data.length == 16) Array.empty // IV alone: empty plaintext
        else aes(encrypt = false, "CBC/PKCS5Padding", key,
          java.util.Arrays.copyOfRange(data, 0, 16),
          java.util.Arrays.copyOfRange(data, 16, data.length))
      } else rc4(key, data)
    }
    transformDocument(bytes, mediaId, skip = _ == encNum,
      transform = decrypt,
      trailerEdit = _.replaceAll("/Encrypt\\s+\\d+\\s+\\d+\\s+R", ""))
  }

  /** Encrypt a classic-trailer PDF under the standard handler with an
    * EMPTY user password — the staging counterpart. `revision` picks
    * 2 (RC4-40), 3 (RC4-128), 4 (/V4 AESV2-128) or 6 (/V5 AESV3-256);
    * `ownerPwd` gates the restrictions; salts/IVs/ID derive from
    * `seed` (deterministic staging, the repo-wide rule). */
  def encryptStandard(plain: Array[Byte], revision: Int,
      seed: Long = 7L, ownerPwd: String = "owner",
      mediaId: Long = -1L): Array[Byte] = {
    require(Seq(2, 3, 4, 6).contains(revision), s"revision $revision")
    val owner = ownerPwd.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val empty = Array.empty[Byte]
    val p = -44 // print + assemble denied modify: a typical owner-only mask
    def det(tag: String, n: Int): Array[Byte] = {
      // deterministic bytes: chained MD5 of (tag, seed)
      val out = new Array[Byte](n)
      var h = md5(s"$tag:$seed".getBytes(ISO_8859_1))
      var i = 0
      while (i < n) {
        if (i > 0 && i % 16 == 0) h = md5(h)
        out(i) = h(i % 16)
        i += 1
      }
      out
    }
    val id0 = det("id", 16)

    val (encDict, fileKey, v) = revision match {
      case r @ (2 | 3) =>
        val keyLen = if (r == 2) 5 else 16
        val o = computeO(r, keyLen, owner, empty)
        val key = fileKeyR234(r, keyLen, o, p, id0, true, empty)
        val u = computeU(r, key, id0)
        val d = s"<< /Filter /Standard /V ${r - 1} /R $r " +
          s"/Length ${keyLen * 8} /O ${hexEmit(o)} /U ${hexEmit(u)} " +
          s"/P $p >>"
        (d, key, r - 1)
      case 4 =>
        val o = computeO(4, 16, owner, empty)
        val key = fileKeyR234(4, 16, o, p, id0, true, empty)
        val u = computeU(4, key, id0)
        val d = "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
          "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
          "/StmF /StdCF /StrF /StdCF " +
          s"/O ${hexEmit(o)} /U ${hexEmit(u)} /P $p >>"
        (d, key, 4)
      case _ =>
        val key = det("filekey", 32)
        val uv = det("uvsalt", 8); val uk = det("uksalt", 8)
        val ov = det("ovsalt", 8); val ok = det("oksalt", 8)
        val u48 = hash2B(empty, uv, empty) ++ uv ++ uk
        val ue = aes(encrypt = true, "CBC/NoPadding",
          hash2B(empty, uk, empty), new Array[Byte](16), key)
        val o48 = hash2B(owner, ov, u48) ++ ov ++ ok
        val oe = aes(encrypt = true, "CBC/NoPadding",
          hash2B(owner, ok, u48), new Array[Byte](16), key)
        val permsPlain = leInt(p) ++
          Array(0xff, 0xff, 0xff, 0xff).map(_.toByte) ++
          "Tadb".getBytes(ISO_8859_1) ++ det("perms", 4)
        val perms = aes(encrypt = true, "ECB/NoPadding", key,
          Array.empty, permsPlain)
        val d = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
          "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
          "/StmF /StdCF /StrF /StdCF " +
          s"/O ${hexEmit(o48)} /U ${hexEmit(u48)} " +
          s"/OE ${hexEmit(oe)} /UE ${hexEmit(ue)} " +
          s"/Perms ${hexEmit(perms)} /P $p >>"
        (d, key, 5)
    }

    val aesMode = v >= 4
    def encrypt(num: Int, gen: Int, isStream: Boolean, dict: String,
        data: Array[Byte]): Array[Byte] = {
      if (isStream && dict.contains("/XRef")) return data
      val key = if (v == 5) fileKey else objectKey(fileKey, num, gen, aesMode)
      if (aesMode) {
        val iv = det(s"iv:$num:$gen:$isStream", 16)
        iv ++ aes(encrypt = true, "CBC/PKCS5Padding", key, iv, data)
      } else rc4(key, data)
    }
    // the /Encrypt dictionary rides as a new highest-numbered object
    val doc = new String(plain, ISO_8859_1)
    val maxNum = "(\\d+)\\s+\\d+\\s+obj\\b".r.findAllMatchIn(doc)
      .map(_.group(1).toInt).max
    val encNum = maxNum + 1
    val withDict = {
      // append before the xref TABLE (line-anchored — "startxref"
      // also contains the letters) so the object walker sees it
      val xrefAt = "(?m)^xref\\b".r.findAllMatchIn(doc).toSeq.lastOption
        .map(_.start).getOrElse(-1)
      require(xrefAt > 0, s"media $mediaId: PDF without a classic xref")
      val pre = plain.take(xrefAt)
      val post = plain.drop(xrefAt)
      pre ++ s"$encNum 0 obj\n$encDict\nendobj\n".getBytes(ISO_8859_1) ++ post
    }
    val idHex = hexEmit(id0)
    transformDocument(withDict, mediaId, skip = _ == encNum,
      transform = encrypt,
      trailerEdit = t => t.replaceAll("/ID\\s*\\[[^\\]]*\\]", "") +
        s" /Encrypt $encNum 0 R /ID [$idHex $idHex] ")
  }
}
