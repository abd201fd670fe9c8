package graft.multimodal

/** Real, dependency-free WAV (RIFF/PCM) codec — the de-stubbed half of
  * the multimodal story: [[BinaryFeatures.decodeStub]] stands in for
  * codecs this container doesn't ship (JPEG, H.264), but PCM WAV needs
  * nothing beyond byte arithmetic, so the audio path carries a REAL
  * encoder and a REAL chunk-walking parser. The parser reads any
  * standard 16-bit PCM WAV: it walks the RIFF chunk list (skipping
  * unknown chunks and honoring the odd-size pad byte) rather than
  * assuming the 44-byte canonical layout — the multimodal_audio_meta
  * key feeds it payloads with an extra LIST chunk on a deterministic
  * slice precisely so a hardcoded-offset "parser" would fail the
  * oracle.
  */
object WavCodec {

  /** metadata + exact integer content digest of one PCM16 clip.
    * sumAbs = Σ |sample| over ALL channels — integer-exact, so the
    * DuckDB oracle reproduces it from the synthesis arithmetic. */
  case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long, sumAbs: Long) {
    /** truncating integer division — engine-identical (SQL `//`). */
    def durationUs: Long = nFrames * 1000000L / sampleRate
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** encode interleaved PCM16 samples as a standards-conformant WAV.
    * `extraChunk` inserts a LIST chunk (odd-size payload, so the spec's
    * pad byte is exercised) between fmt and data. */
  def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Short],
      extraChunk: Boolean = false): Array[Byte] = {
    val dataSize = samples.length * 2
    val listPayload = if (extraChunk) "INFOgraft".getBytes("US-ASCII")
      else Array.empty[Byte]
    val listPad = listPayload.length % 2 // RIFF: odd chunks get a pad byte
    val listBytes = if (extraChunk) 8 + listPayload.length + listPad else 0
    val riffSize = 4 + (8 + 16) + listBytes + (8 + dataSize)
    val out = new Array[Byte](8 + riffSize)
    var o = 0
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, riffSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    o = 12
    out(o) = 'f'; out(o + 1) = 'm'; out(o + 2) = 't'; out(o + 3) = ' '
    putLe32(out, o + 4, 16)
    putLe16(out, o + 8, 1) // PCM
    putLe16(out, o + 10, channels)
    putLe32(out, o + 12, sampleRate)
    putLe32(out, o + 16, sampleRate * channels * 2) // byte rate
    putLe16(out, o + 20, channels * 2) // block align
    putLe16(out, o + 22, 16) // bits per sample
    o += 24
    if (extraChunk) {
      out(o) = 'L'; out(o + 1) = 'I'; out(o + 2) = 'S'; out(o + 3) = 'T'
      putLe32(out, o + 4, listPayload.length)
      System.arraycopy(listPayload, 0, out, o + 8, listPayload.length)
      o += 8 + listPayload.length + listPad // pad byte stays zero
    }
    out(o) = 'd'; out(o + 1) = 'a'; out(o + 2) = 't'; out(o + 3) = 'a'
    putLe32(out, o + 4, dataSize)
    o += 8
    var i = 0
    while (i < samples.length) { putLe16(out, o + 2 * i, samples(i)); i += 1 }
    out
  }

  /** parse any 16-bit PCM WAV: RIFF signature check, then a chunk walk
    * (fmt before data, unknown chunks skipped, odd sizes padded). Throws
    * IllegalArgumentException on malformed input — a corrupt payload
    * must surface, not decode to garbage. */
  def parse(bytes: Array[Byte]): WavMeta = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a RIFF/WAVE payload")
    var off = 12
    var rate = 0; var channels = 0; var bits = 0; var blockAlign = 0
    var nFrames = -1L; var sumAbs = 0L
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk $id overruns payload")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val fmtCode = le16(bytes, off + 8)
          require(fmtCode == 1, s"not PCM (format $fmtCode)")
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          blockAlign = le16(bytes, off + 20)
          bits = le16(bytes, off + 22)
          require(bits == 16, s"only PCM16 supported (bits=$bits)")
          require(rate > 0 && channels > 0 && blockAlign == channels * 2,
            "inconsistent fmt fields")
        case "data" =>
          require(rate > 0, "data chunk before fmt")
          nFrames = size.toLong / blockAlign
          var i = off + 8
          val end = off + 8 + (size / 2) * 2
          while (i < end) {
            val v = (le16(bytes, i) << 16) >> 16 // sign-extend int16
            sumAbs += math.abs(v.toLong)
            i += 2
          }
        case _ => () // unknown chunk (LIST, fact, ...) — skip
      }
      off += 8 + size + (size % 2) // odd-size chunks carry a pad byte
    }
    require(nFrames >= 0, "no data chunk")
    WavMeta(rate, channels, bits, nFrames, sumAbs)
  }
}
