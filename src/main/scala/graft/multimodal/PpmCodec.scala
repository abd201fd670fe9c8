package graft.multimodal

/** Real, dependency-free PPM (P6, binary RGB) codec — the image twin of
  * [[WavCodec]]: PPM is a genuine image interchange format (netpbm)
  * whose binary form needs nothing beyond byte arithmetic, so the image
  * decode path carries a REAL header scanner + pixel reader. The parser
  * reads any conformant P6 file: it tokenizes the header (arbitrary
  * whitespace, `#` comments anywhere between tokens — the
  * multimodal_image_meta key emits a comment on a deterministic slice so
  * a hardcoded-offset "parser" fails the oracle), honors maxval, and
  * digests the raw RGB plane. With WAV + PPM real, the [[BinaryFeatures]]
  * stub only stands in for compressed codecs (JPEG, H.264) that
  * genuinely need external libraries.
  */
object PpmCodec {

  /** header fields + exact per-channel integer digests. */
  case class PpmMeta(width: Int, height: Int, maxval: Int,
      sumR: Long, sumG: Long, sumB: Long)

  /** encode an RGB byte plane (r,g,b interleaved, values 0..maxval) as
    * binary PPM; `comment` adds a header comment line. */
  def encodeP6(width: Int, height: Int, pixels: Array[Byte],
      comment: Boolean = false): Array[Byte] = {
    require(pixels.length == width * height * 3, "pixel plane size mismatch")
    val header = new StringBuilder("P6\n")
    if (comment) header.append("# graft synthetic clip\n")
    header.append(width).append(' ').append(height).append("\n255\n")
    val hb = header.toString.getBytes("US-ASCII")
    val out = new Array[Byte](hb.length + pixels.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(pixels, 0, out, hb.length, pixels.length)
    out
  }

  /** nearest-neighbor 2× downsample as a REAL byte-level transform:
    * decode the P6 plane, keep every even-coordinate pixel
    * (out(x,y) = in(2x,2y), so out dims are ceil(in/2)), re-encode as
    * P6. This is the decode→transform→encode shape a thumbnailing /
    * vision-preprocessing stage runs per row; any offset or stride bug
    * changes the re-parsed digests and fails the oracle. */
  def downsample2(bytes: Array[Byte]): Array[Byte] = {
    val (w, h, pixels) = decodeP6(bytes)
    val w2 = (w + 1) / 2
    val h2 = (h + 1) / 2
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = (2 * y * w + 2 * x) * 3
        val dst = (y * w2 + x) * 3
        out(dst) = pixels(src)
        out(dst + 1) = pixels(src + 1)
        out(dst + 2) = pixels(src + 2)
        x += 1
      }
      y += 1
    }
    encodeP6(w2, h2, out)
  }

  /** full decode: header fields + the raw interleaved RGB plane (the
    * transform-path entry; [[parse]] stays the digest-only reader).
    * The plane is located by re-scanning the header — NOT by counting
    * back from the end — so payloads with trailing bytes decode the
    * same plane [[parse]] digests. */
  def decodeP6(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, _, off) = header(bytes)
    val n = w * h * 3
    val plane = new Array[Byte](n)
    System.arraycopy(bytes, off, plane, 0, n)
    (w, h, plane)
  }

  /** tokenizing P6 header scan shared by [[parse]] and [[decodeP6]]:
    * (width, height, maxval, plane offset). */
  private def header(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a binary PPM (P6) payload")
    var off = 2
    // header token scanner: skip whitespace and # comments, read an int
    def nextInt(): Int = {
      while (off < bytes.length &&
          (bytes(off) == ' ' || bytes(off) == '\t' ||
            bytes(off) == '\n' || bytes(off) == '\r' || bytes(off) == '#')) {
        if (bytes(off) == '#')
          while (off < bytes.length && bytes(off) != '\n') off += 1
        else off += 1
      }
      val start = off
      while (off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9') off += 1
      require(off > start, s"expected header integer at byte $start")
      new String(bytes, start, off - start, "US-ASCII").toInt
    }
    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    require(width > 0 && height > 0, "degenerate dimensions")
    require(maxval > 0 && maxval < 256, s"only 1-byte-per-sample PPM (maxval=$maxval)")
    off += 1 // exactly ONE whitespace byte separates maxval from the plane
    require(off + width * height * 3 <= bytes.length,
      "pixel plane overruns payload")
    (width, height, maxval, off)
  }

  /** 56-bit difference hash (dHash) of a P6 payload — the perceptual
    * fingerprint behind re-encode/recolor-robust image dedup: sample a
    * 7×9 grid of the RED channel nearest-neighbor (y_r = r·(h−1)/6,
    * x_c = c·(w−1)/8, integer division), one bit per horizontal
    * gradient (g(r,c+1) > g(r,c)), packed little-endian at r·8+c.
    * 56 bits keeps the pack inside a positive signed 64-bit value on
    * every engine (bit 63 would wrap Spark's long and overflow
    * DuckDB's checked BIGINT shift). Reading one channel is what makes
    * the hash invariant under chroma edits that break byte-level
    * hashing — the property multimodal_phash's seeded twins exercise.
    */
  def dHash56(bytes: Array[Byte]): Long = {
    val (w, h, plane) = decodeP6(bytes)
    var hash = 0L
    var r = 0
    while (r < 7) {
      val y = r * (h - 1) / 6
      var prev = plane((y * w + 0) * 3) & 0xff // x_0 = 0 for any w
      var c = 0
      while (c < 8) {
        val x2 = (c + 1) * (w - 1) / 8
        val cur = plane((y * w + x2) * 3) & 0xff
        if (cur > prev) hash |= 1L << (r * 8 + c)
        prev = cur
        c += 1
      }
      r += 1
    }
    hash
  }

  /** parse any binary P6: tokenizing header scanner (whitespace +
    * comments), then the raw plane. Throws IllegalArgumentException on
    * malformed input — corrupt payloads surface, never decode to
    * garbage. */
  def parse(bytes: Array[Byte]): PpmMeta = {
    val (width, height, maxval, off) = header(bytes)
    val n = width * height * 3
    var sr = 0L; var sg = 0L; var sb = 0L
    var j = 0
    while (j < n) {
      val v = (bytes(off + j) & 0xff).toLong
      (j % 3: @annotation.switch) match {
        case 0 => sr += v
        case 1 => sg += v
        case 2 => sb += v
      }
      j += 1
    }
    PpmMeta(width, height, maxval, sr, sg, sb)
  }
}
