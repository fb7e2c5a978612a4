package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM EPUB (OCF/OPF) spine extraction — the BOOK carrier, some
  * of the highest-quality long-form text a training corpus can hold.
  * An EPUB is a ZIP package (the [[Docx]] central-directory walk)
  * with public wayfinding: `META-INF/container.xml` names the OPF
  * package document (`rootfile full-path`), whose `manifest` maps ids
  * to hrefs and whose `spine` lists the reading ORDER as `itemref`
  * elements — chapter files are (X)HTML.
  *
  * [[spineHtml]] resolves the spine and returns the chapters' raw
  * markup concatenated IN READING ORDER; the HTML→text strip stays in
  * the engine's codegen'd `TextFunctions.htmlToText` column (the same
  * strip crawl HTML takes), so EPUB ingestion pays one JVM walk per
  * book and keeps the heavy text work in whole-stage codegen —
  * [[graft.io.Warc.toDocumentsEpub]] is that bridge.
  *
  * Fail-loudly contract: a package without `container.xml`, an OPF
  * the container names but the ZIP lacks, a spine idref missing from
  * the manifest, or a chapter entry missing from the package throws
  * `IllegalArgumentException` with the media id. */
object Epub {

  /** All `<name ...>` tags of a bounded XML scan, as raw attribute
    * strings (no general parser — the OOXML rule). */
  private def tags(xml: String, name: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i >= 0 && i < xml.length) {
      i = xml.indexOf("<" + name, i)
      if (i >= 0) {
        val close = xml.indexOf('>', i)
        require(close > i, s"unterminated <$name> tag at $i")
        val tag = xml.substring(i + 1, close)
        // require a word boundary: <item must not match <itemref
        if (tag.length == name.length ||
            !Character.isLetterOrDigit(tag.charAt(name.length)))
          out += tag
        i = close + 1
      }
    }
    out.result()
  }

  private def attr(tag: String, name: String): Option[String] = {
    val key = name + "=\""
    val at = tag.indexOf(key)
    if (at < 0 || (at > 0 && Character.isLetterOrDigit(tag.charAt(at - 1)))) None
    else {
      val end = tag.indexOf('"', at + key.length)
      if (end < 0) None else Some(tag.substring(at + key.length, end))
    }
  }

  /** Percent-decode an href (no `+`-as-space — that is form encoding,
    * not path encoding). */
  private def decodeHref(s: String): String =
    if (!s.contains('%')) s
    else {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length) {
          out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
          i += 3
        } else { out.write(c.toInt); i += 1 }
      }
      new String(out.toByteArray, UTF_8)
    }

  /** Resolve `href` against the OPF's directory, normalizing `../`. */
  private def resolve(opfPath: String, href: String): String = {
    val dir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case k => opfPath.substring(0, k + 1)
    }
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    (dir + decodeHref(href)).split("/", -1).foreach {
      case "" | "." => ()
      case ".." => if (parts.nonEmpty) parts.remove(parts.length - 1)
      case p => parts += p
    }
    parts.mkString("/")
  }

  /** The spine chapters' raw (X)HTML, concatenated in reading order.
    * Non-XHTML spine items (rare SVG pages) are skipped — absence,
    * not error; a spine with NO markup chapters fails loudly. */
  def spineHtml(bytes: Array[Byte], mediaId: Long = -1L): String = {
    val entries = Docx.zipEntryOffsets(bytes, mediaId)
    def entry(name: String): Array[Byte] =
      entries.find(_._1 == name)
        .map { case (n, cd) => Docx.zipEntryAt(bytes, cd, n, mediaId) }
        .getOrElse(throw new IllegalArgumentException(
          s"media $mediaId: EPUB package without '$name'"))
    val container = new String(entry("META-INF/container.xml"), UTF_8)
    val opfPath = tags(container, "rootfile")
      .flatMap(attr(_, "full-path")).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"media $mediaId: container.xml without a rootfile full-path"))
    val opf = new String(entry(opfPath), UTF_8)
    val manifest: Map[String, (String, String)] = tags(opf, "item")
      .flatMap { t =>
        for (id <- attr(t, "id"); href <- attr(t, "href"))
          yield id -> (href, attr(t, "media-type").getOrElse(""))
      }.toMap
    val spine = tags(opf, "itemref").flatMap(attr(_, "idref"))
    require(spine.nonEmpty, s"media $mediaId: OPF without a spine")
    val chapters = spine.flatMap { idref =>
      val (href, mt) = manifest.getOrElse(idref,
        throw new IllegalArgumentException(
          s"media $mediaId: spine idref '$idref' missing from the manifest"))
      val markup = mt.contains("xhtml") || mt.contains("html") ||
        href.endsWith(".xhtml") || href.endsWith(".html") || href.endsWith(".htm")
      if (markup) Some(new String(entry(resolve(opfPath, href)), UTF_8))
      else None
    }
    require(chapters.nonEmpty,
      s"media $mediaId: EPUB spine holds no (X)HTML chapters")
    // concatenated raw markup, no injected separator: the HTML strip's
    // own block-close breaks (</p>, </div>, …) delimit chapters, so
    // the stripped text is identical to a single page holding the
    // same markup
    chapters.mkString
  }

  // -- generator (staging/spec counterpart) ------------------------------

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Serialize a minimal VALID EPUB: stored `mimetype` first (the OCF
    * magic rule), container.xml → OPF in a subdirectory (so href
    * resolution is on the oracle path), one XHTML chapter per element
    * of `chapters`, spine in order. */
  def writeEpub(chapters: Seq[String], title: String = "planted"): Array[Byte] = {
    require(chapters.nonEmpty, "writeEpub needs at least one chapter")
    val n = chapters.length
    val container =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<container version=\"1.0\" xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\">" +
        "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" media-type=\"application/oebps-package+xml\"/></rootfiles>" +
        "</container>"
    val opf =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<package xmlns=\"http://www.idpf.org/2007/opf\" version=\"3.0\" unique-identifier=\"uid\">" +
        "<metadata xmlns:dc=\"http://purl.org/dc/elements/1.1/\">" +
        s"<dc:identifier id=\"uid\">urn:graft:$title</dc:identifier>" +
        s"<dc:title>${xmlEscape(title)}</dc:title><dc:language>en</dc:language>" +
        "</metadata><manifest>" +
        (1 to n).map(i =>
          s"""<item id="ch$i" href="text/ch$i.xhtml" media-type="application/xhtml+xml"/>""").mkString +
        "</manifest><spine>" +
        (1 to n).map(i => s"""<itemref idref="ch$i"/>""").mkString +
        "</spine></package>"
    val chapterFiles = chapters.zipWithIndex.map { case (text, i) =>
      s"OEBPS/text/ch${i + 1}.xhtml" ->
        ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
          "<html xmlns=\"http://www.w3.org/1999/xhtml\"><head><title/></head><body>" +
          "<p>" + xmlEscape(text) + "</p></body></html>").getBytes(UTF_8)
    }
    Docx.writeZip(
      Seq(
        "mimetype" -> "application/epub+zip".getBytes(UTF_8),
        "META-INF/container.xml" -> container.getBytes(UTF_8),
        "OEBPS/content.opf" -> opf.getBytes(UTF_8)) ++ chapterFiles,
      stored = Set("mimetype"))
  }
}
