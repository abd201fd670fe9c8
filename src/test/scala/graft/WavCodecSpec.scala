package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.WavCodec

/** The WAV codec is the REAL (non-stubbed) multimodal decode path —
  * pin it independently of the Spark plumbing: byte-exact round trips,
  * genuine chunk walking (unknown chunks, odd-size pad), and loud
  * failure on malformed payloads.
  */
class WavCodecSpec extends AnyFunSuite {

  private def clip(n: Int): Array[Short] =
    Array.tabulate[Short](n)(i => ((i * 7919) % 65536 - 32768).toShort)

  test("encode→parse round-trips metadata and the exact sample digest") {
    val samples = clip(250)
    val m = WavCodec.parse(WavCodec.encodePcm16(16000, 2, samples))
    assert(m.sampleRate == 16000 && m.channels == 2 && m.bitsPerSample == 16)
    assert(m.nFrames == 125) // 250 interleaved samples / 2 channels
    assert(m.sumAbs == samples.map(s => math.abs(s.toLong)).sum)
    assert(m.durationUs == 125L * 1000000L / 16000L)
  }

  test("parser walks past an unknown LIST chunk (odd payload, pad byte)") {
    val samples = clip(33)
    val plain = WavCodec.parse(WavCodec.encodePcm16(8000, 1, samples))
    val listed = WavCodec.parse(
      WavCodec.encodePcm16(8000, 1, samples, extraChunk = true))
    assert(listed == plain, "LIST chunk must not perturb the decode")
  }

  test("sign extension: full-scale negative samples digest exactly") {
    val samples = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue)
    val m = WavCodec.parse(WavCodec.encodePcm16(12000, 1, samples))
    assert(m.sumAbs == 32768L + 1 + 0 + 1 + 32767)
    assert(m.nFrames == 5)
  }

  test("malformed payloads fail loudly, never decode to garbage") {
    val ok = WavCodec.encodePcm16(8000, 1, clip(8))
    // not RIFF at all
    intercept[IllegalArgumentException](WavCodec.parse("junk".getBytes))
    // truncated mid-data: the data chunk overruns the payload
    intercept[IllegalArgumentException](WavCodec.parse(ok.dropRight(3)))
    // data before fmt: blockAlign unknown
    val noFmt = ok.clone()
    noFmt(12) = 'j' // corrupt the fmt tag → chunk now unknown, skipped
    intercept[IllegalArgumentException](WavCodec.parse(noFmt))
  }

  // ---- PPM (P6) — the image twin ------------------------------------

  import graft.multimodal.PpmCodec

  private def plane(w: Int, h: Int): Array[Byte] =
    Array.tabulate[Byte](w * h * 3)(j => ((j * 89) % 256).toByte)

  test("PPM encode→parse round-trips dimensions and per-channel sums") {
    val px = plane(5, 4)
    val m = PpmCodec.parse(PpmCodec.encodeP6(5, 4, px))
    assert(m.width == 5 && m.height == 4 && m.maxval == 255)
    def ch(c: Int) = px.indices.filter(_ % 3 == c).map(j => (px(j) & 0xff).toLong).sum
    assert((m.sumR, m.sumG, m.sumB) == (ch(0), ch(1), ch(2)))
  }

  test("PPM header scanner walks comments between any tokens") {
    val px = plane(3, 2)
    val plain = PpmCodec.parse(PpmCodec.encodeP6(3, 2, px))
    val commented = PpmCodec.parse(PpmCodec.encodeP6(3, 2, px, comment = true))
    assert(commented == plain, "header comment must not perturb the decode")
    // comment in an unusual spot (between width and height) still parses
    val weird = ("P6\n3 # cols\n 2\n255\n").getBytes("US-ASCII") ++ px
    assert(PpmCodec.parse(weird) == plain)
  }

  test("WAV round-trips 200 random clips exactly (seeded property)") {
    val rnd = new scala.util.Random(20260813)
    (1 to 200).foreach { i =>
      val rate = 1 + rnd.nextInt(96000)
      val channels = 1 + rnd.nextInt(8)
      val frames = rnd.nextInt(80) // 0 frames is a legal (empty) clip
      val samples = Array.fill[Short](frames * channels)(
        (rnd.nextInt(65536) - 32768).toShort)
      val m = WavCodec.parse(
        WavCodec.encodePcm16(rate, channels, samples, extraChunk = i % 3 == 0))
      assert(m.sampleRate == rate && m.channels == channels, s"case $i header")
      assert(m.nFrames == frames, s"case $i frames")
      assert(m.sumAbs == samples.map(s => math.abs(s.toLong)).sum, s"case $i digest")
    }
  }

  test("PPM round-trips 200 random planes exactly (seeded property)") {
    val rnd = new scala.util.Random(20260813)
    (1 to 200).foreach { i =>
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(24)
      val px = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val m = PpmCodec.parse(PpmCodec.encodeP6(w, h, px, comment = i % 3 == 0))
      assert(m.width == w && m.height == h, s"case $i header")
      def ch(c: Int) = px.indices.filter(_ % 3 == c).map(j => (px(j) & 0xff).toLong).sum
      assert((m.sumR, m.sumG, m.sumB) == (ch(0), ch(1), ch(2)), s"case $i digest")
    }
  }

  test("PPM downsample2 picks exactly the even-coordinate pixels (seeded property)") {
    val rnd = new scala.util.Random(20260814)
    (1 to 100).foreach { i =>
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(24)
      val px = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val small = PpmCodec.downsample2(PpmCodec.encodeP6(w, h, px, comment = i % 3 == 0))
      val (w2, h2, out) = PpmCodec.decodeP6(small)
      assert(w2 == (w + 1) / 2 && h2 == (h + 1) / 2, s"case $i dims")
      for (y <- 0 until h2; x <- 0 until w2; c <- 0 until 3)
        assert(out((y * w2 + x) * 3 + c) == px((2 * y * w + 2 * x) * 3 + c),
          s"case $i pixel ($x,$y,$c)")
    }
  }

  test("PPM dHash56 is chroma-invariant, red-sensitive, and 56-bit-bounded (seeded property)") {
    // the multimodal_phash contract: any green/blue edit leaves the
    // hash fixed (the hash reads only the red channel's gradient
    // grid), a red-plane inversion changes it whenever the image has
    // any horizontal red gradient at all, and the pack never sets bits
    // ≥ 56 (sign-safety on both engines).
    val rnd = new scala.util.Random(20260814)
    (1 to 100).foreach { i =>
      val w = 2 + rnd.nextInt(23)
      val h = 1 + rnd.nextInt(24)
      val px = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val base = PpmCodec.dHash56(PpmCodec.encodeP6(w, h, px))
      assert((base >>> 56) == 0L, s"case $i: bits above 55 set")
      val chroma = px.zipWithIndex.map { case (b, j) =>
        if (j % 3 != 0) ((b & 0xff) ^ rnd.nextInt(256)).toByte else b
      }
      assert(PpmCodec.dHash56(PpmCodec.encodeP6(w, h, chroma)) == base,
        s"case $i: chroma edit moved the hash")
      val redInv = px.zipWithIndex.map { case (b, j) =>
        if (j % 3 == 0) (255 - (b & 0xff)).toByte else b
      }
      val inv = PpmCodec.dHash56(PpmCodec.encodeP6(w, h, redInv))
      if (base != 0L) // a flat red plane hashes to 0 both ways
        assert(inv != base, s"case $i: red inversion left the hash fixed")
    }
  }

  test("PPM decodeP6 locates the plane by header scan, not payload tail") {
    val px = plane(3, 2)
    val withTrailing = PpmCodec.encodeP6(3, 2, px) ++ Array[Byte](9, 9, 9)
    val (w, h, out) = PpmCodec.decodeP6(withTrailing)
    assert(w == 3 && h == 2 && out.sameElements(px),
      "trailing bytes must not shift the decoded plane")
  }

  test("PPM malformed payloads fail loudly") {
    val ok = PpmCodec.encodeP6(3, 2, plane(3, 2))
    intercept[IllegalArgumentException](PpmCodec.parse("P5\n1 1\n255\n".getBytes))
    intercept[IllegalArgumentException](PpmCodec.parse(ok.dropRight(2))) // short plane
    // 2-byte-per-sample maxval is out of scope and must be rejected
    intercept[IllegalArgumentException](
      PpmCodec.parse("P6\n1 1\n65535\n".getBytes ++ new Array[Byte](6)))
  }
}
