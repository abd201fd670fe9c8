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
}
