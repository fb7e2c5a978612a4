package graft

/** Test-scope AVI (RIFF) writer: wraps JPEG frame payloads in a
  * spec-correct MJPEG AVI container — `hdrl` (avih + strl/strh/strf),
  * `movi` with word-aligned `00dc` chunks. Drives the [[graft.operators.Avi]]
  * container walk against real framing, including the padding rules. */
object TestAvi {

  def apply(width: Int, height: Int, frames: Seq[Array[Byte]],
      usPerFrame: Int = 33333): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(id.getBytes("US-ASCII"))
      writeU32(out, body.length)
      out.write(body)
      if ((body.length & 1) == 1) out.write(0) // word alignment pad
      out.toByteArray
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = new java.io.ByteArrayOutputStream()
      inner.write(listType.getBytes("US-ASCII"))
      bodies.foreach(inner.write)
      chunk("LIST", inner.toByteArray)
    }

    val avih = {
      val o = new java.io.ByteArrayOutputStream()
      writeU32(o, usPerFrame); writeU32(o, 0); writeU32(o, 0); writeU32(o, 0x10)
      writeU32(o, frames.length); writeU32(o, 0); writeU32(o, 1); writeU32(o, 0)
      writeU32(o, width); writeU32(o, height)
      (0 until 4).foreach(_ => writeU32(o, 0))
      o.toByteArray
    }
    val strh = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("vids".getBytes("US-ASCII")); o.write("MJPG".getBytes("US-ASCII"))
      writeU32(o, 0); writeU32(o, 0); writeU32(o, 0)
      writeU32(o, 1); writeU32(o, 1000000 / math.max(1, usPerFrame)) // scale, rate
      writeU32(o, 0); writeU32(o, frames.length)
      writeU32(o, 0); writeU32(o, 0xffffffff); writeU32(o, 0)
      writeU32(o, 0); writeU32(o, 0) // rcFrame
      o.toByteArray
    }
    val strf = {
      val o = new java.io.ByteArrayOutputStream()
      writeU32(o, 40); writeU32(o, width); writeU32(o, height)
      writeU32(o, (24 << 16) | 1) // planes = 1, bitcount = 24
      o.write("MJPG".getBytes("US-ASCII"))
      writeU32(o, width * height * 3)
      (0 until 4).foreach(_ => writeU32(o, 0))
      o.toByteArray
    }
    val hdrl = list("hdrl", Seq(chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", frames.map(f => chunk("00dc", f)))

    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    writeU32(out, 4 + hdrl.length + movi.length)
    out.write("AVI ".getBytes("US-ASCII"))
    out.write(hdrl); out.write(movi)
    out.toByteArray
  }

  private def writeU32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }
}
