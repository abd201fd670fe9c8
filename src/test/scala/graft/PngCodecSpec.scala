package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.PngCodec

/** Conformance + property tests for the dependency-free PNG codec.
  * The strongest pin is cross-implementation: every stream the encoder
  * emits must decode identically under the JDK's own ImageIO PNG
  * reader (an independent, spec-conformant implementation), and the
  * in-house decoder must agree with both.
  */
class PngCodecSpec extends AnyFunSuite {

  private def plane(id: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate[Byte](w * h * 3)(j => ((id * 7 + j.toLong * 13) % 256).toByte)

  private val dims = Seq((1, 1), (1, 7), (9, 1), (4, 3), (16, 11), (33, 29))

  test("encode → decode is byte-exact for every filter type and dimension") {
    for ((w, h) <- dims; ft <- 0 to 4) {
      val px = plane(w.toLong * 31 + h + ft, w, h)
      val (dw, dh, got, crcOk) = PngCodec.decode(PngCodec.encode(w, h, px, ft))
      assert((dw, dh) == (w, h), s"dims under filter $ft")
      assert(crcOk, s"CRC under filter $ft")
      assert(java.util.Arrays.equals(got, px),
        s"plane mismatch: filter $ft, ${w}x$h")
    }
  }

  test("encoded streams decode identically under the JDK's ImageIO PNG reader") {
    for ((w, h) <- dims; ft <- 0 to 4) {
      val px = plane(w.toLong * 17 + h - ft, w, h)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(PngCodec.encode(w, h, px, ft)))
      assert(img != null, s"ImageIO rejected the stream (filter $ft)")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        assert(((rgb >> 16) & 0xff) == (px(o) & 0xff), s"R@($x,$y) filter $ft")
        assert(((rgb >> 8) & 0xff) == (px(o + 1) & 0xff), s"G@($x,$y) filter $ft")
        assert((rgb & 0xff) == (px(o + 2) & 0xff), s"B@($x,$y) filter $ft")
      }
    }
  }

  test("ancillary tEXt chunk is CRC-checked and skipped") {
    val px = plane(99, 8, 5)
    val bytes = PngCodec.encode(8, 5, px, 2, text = Some("seeded comment"))
    val (w, h, got, crcOk) = PngCodec.decode(bytes)
    assert((w, h) == (8, 5) && crcOk)
    assert(java.util.Arrays.equals(got, px))
  }

  test("multi-IDAT streams concatenate (the chunking a real encoder emits)") {
    // split the single IDAT payload into two consecutive IDAT chunks
    val one = PngCodec.encode(12, 9, plane(7, 12, 9), 4)
    def int32(b: Array[Byte], p: Int): Int =
      ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
        ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    var pos = 8
    var idatAt = -1
    while (idatAt < 0) {
      if (new String(one, pos + 4, 4, "US-ASCII") == "IDAT") idatAt = pos
      else pos += 12 + int32(one, pos)
    }
    val len = int32(one, idatAt)
    assert(len >= 2, "fixture IDAT too small to split")
    val payload = java.util.Arrays.copyOfRange(one, idatAt + 8, idatAt + 8 + len)
    def mkChunk(data: Array[Byte]): Array[Byte] = {
      val t = "IDAT".getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      val lenB = Array(((data.length >>> 24) & 0xff).toByte,
        ((data.length >>> 16) & 0xff).toByte,
        ((data.length >>> 8) & 0xff).toByte, (data.length & 0xff).toByte)
      val crcB = {
        val v = crc.getValue.toInt
        Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
          ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      }
      lenB ++ t ++ data ++ crcB
    }
    val (p1, p2) = payload.splitAt(payload.length / 2)
    val rebuilt = java.util.Arrays.copyOfRange(one, 0, idatAt) ++
      mkChunk(p1) ++ mkChunk(p2) ++
      java.util.Arrays.copyOfRange(one, idatAt + 12 + len, one.length)
    val (w, h, got, crcOk) = PngCodec.decode(rebuilt)
    assert((w, h) == (12, 9) && crcOk)
    assert(java.util.Arrays.equals(got, plane(7, 12, 9)))
  }

  test("a flipped stored-CRC byte flags crcOk=false with the plane intact") {
    val px = plane(5, 10, 6)
    val bytes = PngCodec.encode(10, 6, px, 1)
    // the IEND chunk's CRC occupies the final 4 bytes — flip one
    val corrupt = bytes.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x01).toByte
    val (_, _, got, crcOk) = PngCodec.decode(corrupt)
    assert(!crcOk, "corrupted CRC not flagged")
    assert(java.util.Arrays.equals(got, px), "payload should be unaffected")
  }

  test("a truncated IDAT fails loudly instead of hanging (r13 ADVICE)") {
    // rebuild the stream with the IDAT deflate payload cut short: the
    // inflater exhausts input with finished()==false, which previously
    // spun the decode loop forever (inflate() returning 0 forever)
    val one = PngCodec.encode(16, 11, plane(3, 16, 11), 2)
    def int32(b: Array[Byte], p: Int): Int =
      ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
        ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    var pos = 8
    var idatAt = -1
    while (idatAt < 0) {
      if (new String(one, pos + 4, 4, "US-ASCII") == "IDAT") idatAt = pos
      else pos += 12 + int32(one, pos)
    }
    val len = int32(one, idatAt)
    val cut = len / 2
    val short = java.util.Arrays.copyOfRange(one, idatAt + 8, idatAt + 8 + cut)
    val t = "IDAT".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(short)
    def be32(v: Int): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val rebuilt = java.util.Arrays.copyOfRange(one, 0, idatAt) ++
      be32(cut) ++ t ++ short ++ be32(crc.getValue.toInt) ++
      java.util.Arrays.copyOfRange(one, idatAt + 12 + len, one.length)
    val ex = intercept[IllegalArgumentException](PngCodec.decode(rebuilt))
    assert(ex.getMessage.contains("inflated"), s"wrong failure: ${ex.getMessage}")
  }

  test("PNG and PPM decode the same synthesized plane to identical bytes") {
    // the two containers carry the same arithmetic plane — the codec
    // layer must be invisible to the profile the query keys aggregate
    val (w, h) = (11, 6)
    val px = plane(42, w, h)
    val (_, _, fromPng, _) = PngCodec.decode(PngCodec.encode(w, h, px, 3))
    val (pw, ph, fromPpm) = graft.multimodal.PpmCodec.decodeP6(
      graft.multimodal.PpmCodec.encodeP6(w, h, px, comment = true))
    assert((pw, ph) == (w, h))
    assert(java.util.Arrays.equals(fromPng, fromPpm))
  }
}
