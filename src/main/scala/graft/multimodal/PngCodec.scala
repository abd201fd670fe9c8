package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Dependency-free PNG codec for 8-bit truecolor (RGB) images — the
  * COMPRESSED member of the multimodal codec family (WAV and PPM are
  * containers around raw samples; PNG adds a real entropy-coded
  * bitstream: zlib DEFLATE via the JDK's Inflater/Deflater, per-row
  * predictive filters, CRC-checked chunking). Closing the r12 gap
  * note that "compressed codecs remain stubs": lossless compression
  * needs no external library — JPEG/H.264 stay out of reach only
  * because they are LOSSY (their DCT pipelines need conformance
  * vectors no arithmetic oracle can replay).
  *
  * Encoder: PNG signature, IHDR (bit depth 8, color type 2), optional
  * tEXt chunk, one IDAT holding the zlib stream of filtered scanlines
  * (caller-chosen filter 0–4 applied to every row), IEND. Decoder:
  * walks chunks (skipping ancillary ones), verifies each CRC,
  * concatenates multi-IDAT streams, inflates, and reconstructs all
  * five filter types (None/Sub/Up/Average/Paeth) per the PNG spec's
  * reconstruction functions. Encode→decode is byte-exact for every
  * filter choice (property-pinned in PngCodecSpec), which is what lets
  * the query keys oracle the DECODED plane arithmetically in DuckDB.
  */
object PngCodec {

  private val Signature = Array[Byte](137.toByte, 'P', 'N', 'G', 13, 10, 26, 10)
  private val Bpp = 3 // 8-bit RGB

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** filter one row (spec §9): raw row bytes → filter-type-prefixed
    * filtered bytes. `prior` is the RAW previous row (zeros for row 0).
    */
  private def filterRow(ft: Int, row: Array[Byte], prior: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](row.length + 1)
    out(0) = ft.toByte
    var x = 0
    while (x < row.length) {
      val raw = row(x) & 0xff
      val left = if (x >= Bpp) row(x - Bpp) & 0xff else 0
      val up = prior(x) & 0xff
      val ul = if (x >= Bpp) prior(x - Bpp) & 0xff else 0
      val f = ft match {
        case 0 => raw
        case 1 => raw - left
        case 2 => raw - up
        case 3 => raw - (left + up) / 2
        case 4 => raw - paeth(left, up, ul)
        case _ => throw new IllegalArgumentException(s"filter $ft")
      }
      out(x + 1) = (f & 0xff).toByte
      x += 1
    }
    out
  }

  /** Encode an RGB plane (w*h*3 bytes, row-major) as a PNG. `filter`
    * 0–4 is applied to every scanline; `text` adds an ancillary tEXt
    * chunk before IDAT (a chunk walker must skip or the stream
    * misparses — the PPM comment-line device, chunk-structured).
    */
  def encode(width: Int, height: Int, pixels: Array[Byte], filter: Int = 0,
             text: Option[String] = None): Array[Byte] = {
    require(pixels.length == width * height * Bpp,
      s"plane ${pixels.length} != $width x $height x $Bpp")
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, color 2 (RGB), deflate, adaptive, no interlace
    val stride = width * Bpp
    val raw = new java.io.ByteArrayOutputStream()
    var prior = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      val row = java.util.Arrays.copyOfRange(pixels, y * stride, (y + 1) * stride)
      raw.write(filterRow(filter, row, prior))
      prior = row
      y += 1
    }
    val filtered = raw.toByteArray
    val defl = new Deflater()
    defl.setInput(filtered); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    text.foreach { s =>
      out.write(chunk("tEXt", "comment".getBytes("US-ASCII") ++
        Array[Byte](0) ++ s.getBytes("US-ASCII")))
    }
    out.write(chunk("IDAT", zbuf.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Decode an 8-bit RGB PNG: (width, height, plane, crcOk). Walks the
    * chunk stream, verifies every CRC (a flipped bit anywhere in IHDR/
    * IDAT flags crcOk=false), concatenates multi-IDAT payloads,
    * inflates, reconstructs each scanline per its filter byte.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte], Boolean) = {
    require(bytes.length > 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, 8), Signature), "not a PNG")
    var pos = 8
    var w = -1; var h = -1; var crcOk = true
    val idat = new java.io.ByteArrayOutputStream()
    def int32(p: Int): Int =
      ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    var done = false
    while (!done && pos + 12 <= bytes.length) {
      val len = int32(pos)
      val tag = new String(bytes, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12 + len <= bytes.length, s"truncated chunk $tag")
      val crc = new CRC32
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != int32(pos + 8 + len)) crcOk = false
      tag match {
        case "IHDR" =>
          w = int32(pos + 8); h = int32(pos + 12)
          require(bytes(pos + 16) == 8 && bytes(pos + 17) == 2,
            "only 8-bit truecolor supported")
          require(bytes(pos + 20) == 0, "interlaced PNG not supported")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary (tEXt etc.) — CRC-checked, content skipped
      }
      pos += 12 + len
    }
    require(w > 0 && h > 0, "missing IHDR")
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    val stride = w * Bpp
    val filtered = new Array[Byte]((stride + 1) * h)
    var off = 0
    var stalled = false
    while (!infl.finished() && off < filtered.length && !stalled) {
      val n = infl.inflate(filtered, off, filtered.length - off)
      // A truncated/corrupt IDAT exhausts input before the expected output
      // length: inflate returns 0 with finished()==false forever. Bail so the
      // require below reports the truncation instead of hanging.
      if (n == 0 && (infl.needsInput() || infl.needsDictionary())) stalled = true
      else off += n
    }
    infl.end()
    require(off == filtered.length, s"inflated $off of ${filtered.length} bytes")
    // reconstruction (spec §9): invert the per-row filter
    val plane = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = filtered(y * (stride + 1)) & 0xff
      val rowOff = y * (stride + 1) + 1
      var x = 0
      while (x < stride) {
        val f = filtered(rowOff + x) & 0xff
        val left = if (x >= Bpp) plane(y * stride + x - Bpp) & 0xff else 0
        val up = if (y > 0) plane((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= Bpp) plane((y - 1) * stride + x - Bpp) & 0xff else 0
        val r = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"filter $other")
        }
        plane(y * stride + x) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, plane, crcOk)
  }
}
