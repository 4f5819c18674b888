package graft.multimodal

/** Pure-JVM RIFF/WAVE PCM codec — the one REAL decoder behind
  * [[MediaOps.decode]] (the container ships no image/video codec
  * libraries, so those modalities keep the deterministic fake; audio
  * gets an honest byte-level parse). Reference analog: the media-decode
  * stage of the ML extraction pipeline
  * (pdf_extraction/pdf_marker_extraction.py:235-282 — binary payload in,
  * typed metadata out).
  *
  * Parsing walks the RIFF chunk list (not fixed offsets): `fmt ` and
  * `data` may be separated by LIST/fact/cue chunks in real files, and a
  * malformed length must fail cleanly to None, never throw — a 100 TB
  * binary scan treats undecodable payloads as data, not exceptions.
  */
object WavCodec {

  /** Parsed header facts + derived duration. */
  final case class WavMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nSamples: Long) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else nSamples * 1000L / sampleRate
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
    ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Parse a RIFF/WAVE byte payload; None for anything that is not a
    * well-formed PCM WAV (wrong magic, truncated chunk, zero-size
    * frame). */
  def parse(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var p = 12
    var channels = 0; var sampleRate = 0; var bits = 0
    var dataLen = -1L
    var done = false
    while (!done && p + 8 <= bytes.length && (dataLen < 0 || sampleRate == 0)) {
      val id = tag(bytes, p)
      val size = le32(bytes, p + 4).toLong & 0xffffffffL
      if (id == "fmt " && p + 8 + 16 <= bytes.length) {
        channels = le16(bytes, p + 10)
        sampleRate = le32(bytes, p + 12)
        bits = le16(bytes, p + 22)
      } else if (id == "data") {
        dataLen = math.min(size, (bytes.length - p - 8).toLong)
      }
      // a declared size past the remaining buffer means truncation (or an
      // attack on the Int offset: size near 2^31 would wrap `p` negative
      // and re-enter the loop) — stop the walk HERE, keeping only chunks
      // parsed so far. Deliberately strict: chunks after the overrun are
      // unreachable anyway when the size is honest truncation, and when
      // it is garbage the "next chunk" offset it implies is meaningless —
      // so a WAV whose truncated/corrupt chunk precedes 'fmt ' parses to
      // None even if fmt bytes follow (no sound way to find them)
      if (size > (bytes.length - p - 8).toLong) done = true
      // chunks are word-aligned: odd sizes carry a pad byte
      else p += 8 + size.toInt + (size.toInt & 1)
    }
    val frameBytes = channels * (bits / 8)
    if (sampleRate <= 0 || frameBytes <= 0 || dataLen < 0) None
    else Some(WavMeta(sampleRate, channels, bits, dataLen / frameBytes))
  }

  /** Peak |amplitude| and milli-RMS of the 16-bit PCM samples — the
    * stats a quality gate runs on decoded audio (silence / clipping
    * detection). One pass, no allocation. */
  def pcm16Stats(bytes: Array[Byte]): Option[(Int, Long)] =
    parse(bytes).filter(_.bitsPerSample == 16).map { m =>
      // data chunk offset: re-walk (parse validated structure already)
      var p = 12
      var off = -1; var len = 0L
      var done = false
      while (!done && off < 0 && p + 8 <= bytes.length) {
        val size = le32(bytes, p + 4).toLong & 0xffffffffL
        if (tag(bytes, p) == "data") {
          off = p + 8; len = math.min(size, (bytes.length - p - 8).toLong)
        }
        // same truncation guard as parse: never advance past the buffer
        if (size > (bytes.length - p - 8).toLong) done = true
        else p += 8 + size.toInt + (size.toInt & 1)
      }
      var peak = 0; var sumSq = 0.0; var i = off
      val end = off + len.toInt
      while (i + 1 < end) {
        val s = (bytes(i) & 0xff) | (bytes(i + 1) << 8) // sign-extends
        val a = math.abs(s)
        if (a > peak) peak = a
        sumSq += s.toDouble * s.toDouble
        i += 2
      }
      val n = math.max(1L, len / 2)
      (peak, math.round(math.sqrt(sumSq / n) * 1000.0 / 32768.0))
    }

  /** Deterministic PCM16 mono WAV: a seed-keyed triangle-ish waveform
    * (xorshift per sample). Every byte is a pure function of
    * (seed, sampleRate, nSamples) — the synthesis side of the decode
    * round-trip that test oracles replay arithmetically. */
  def synthesize(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    def putTag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def put16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    putTag(0, "RIFF"); put32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16); put16(20, 1 /* PCM */)
    put16(22, 1 /* mono */); put32(24, sampleRate)
    put32(28, sampleRate * 2); put16(32, 2); put16(34, 16)
    putTag(36, "data"); put32(40, dataLen)
    var h = seed ^ 0x9e3779b97f4a7c15L
    var i = 0
    while (i < nSamples) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      put16(44 + i * 2, (h & 0xffffL).toInt.toShort.toInt)
      i += 1
    }
    out
  }
}
