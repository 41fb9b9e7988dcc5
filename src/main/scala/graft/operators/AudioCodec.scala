package graft.operators

/** REAL header-level AUDIO decode (r6 — the audio twin of
  * [[ImageCodec]]): parses the RIFF/WAVE byte layout for (channels,
  * sample rate, bit depth, sample count, duration). Like the image
  * header sniffers this needs no codec library — WAV is a published
  * container format (RIFF spec / MS WAVEFORMAT):
  *
  *  - bytes 0–3 "RIFF", 4–7 little-endian u32 riff-chunk size,
  *    8–11 "WAVE";
  *  - then a chunk walk: 4-byte id + u32LE size + payload (padded to
  *    even length). The "fmt " chunk carries audioFormat u16LE
  *    (1 = PCM), numChannels u16LE, sampleRate u32LE, byteRate u32LE,
  *    blockAlign u16LE, bitsPerSample u16LE; the "data" chunk's size
  *    is the payload byte count → n_samples = size / blockAlign,
  *    duration_ms = n_samples · 1000 / sampleRate (integer floor —
  *    exact in the DuckDB oracle too).
  *
  * Unknown/truncated/corrupt headers → None (the route-to-DLT arm).
  * Row-local: runs inside the [[Multimodal]] mapPartitions batch
  * contract. */
object AudioCodec {

  final case class AudioMeta(format: String, channels: Long,
      sample_rate: Long, bits: Long, n_samples: Long, duration_ms: Long)

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(j => b(i + j) == s.charAt(j))

  def parseWav(b: Array[Byte]): Option[AudioMeta] =
    parseWavFull(b).map(_._1)

  /** Decoded PCM sample values, channel-interleaved, center-adjusted
    * signed: 8-bit WAV is unsigned around 128 (v = byte − 128);
    * 16-bit is signed little-endian. This is the SAMPLE-level decode
    * — the audio twin of [[ImageCodec.parsePnmRaster]]'s pixel level:
    * PCM in a parsed RIFF container needs no codec library, so the
    * kernel is real, not a stub. */
  def parseWavSamples(b: Array[Byte]): Option[(AudioMeta, Array[Int])] =
    parseWavFull(b).map { case (m, off) =>
      val n = (m.n_samples * m.channels).toInt
      val out = new Array[Int](n)
      var j = 0
      if (m.bits == 8) {
        while (j < n) { out(j) = (b(off + j) & 0xff) - 128; j += 1 }
      } else {
        while (j < n) {
          val v = u16le(b, off + 2 * j)
          out(j) = if (v >= 0x8000) v - 0x10000 else v
          j += 1
        }
      }
      (m, out)
    }

  /** G.711 μ-law expansion (ITU-T G.711, Table 2a — r7 continuation:
    * the first COMPRESSED audio family, mirroring the image side's
    * PNG/GIF/JPEG story): the encoded byte is the ones' complement
    * of sign|exponent|mantissa; decode is the closed-form integer
    *   u = ~b & 0xFF; t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
    *   sample = sign(u) ? 0x84 − t : t − 0x84
    * No state, no table — each byte expands independently, which is
    * what lets the DuckDB oracle restate it verbatim per sample. */
  def ulawExpand(b: Int): Int = {
    val u = (~b) & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Sample-level decode of a μ-law WAV (RIFF fmt tag 7, 8-bit):
    * the same chunk walk as [[parseWavSamples]], then per-byte G.711
    * expansion to 14-bit signed linear. PCM containers (tag 1) and
    * corrupt layouts → None (the DLT arm). */
  def parseWavUlawSamples(b: Array[Byte]): Option[(AudioMeta, Array[Int])] =
    parseWavFullFmt(b, wantFormat = 7).map { case (m, off) =>
      val n = (m.n_samples * m.channels).toInt
      val out = new Array[Int](n)
      var j = 0
      while (j < n) { out(j) = ulawExpand(b(off + j) & 0xff); j += 1 }
      (m, out)
    }

  private def parseWavFull(b: Array[Byte]): Option[(AudioMeta, Int)] =
    parseWavFullFmt(b, wantFormat = 1)

  private def parseWavFullFmt(b: Array[Byte],
      wantFormat: Int): Option[(AudioMeta, Int)] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    // the walk cursor is a LONG: a crafted u32 chunk size near 2³²
    // in Int arithmetic would either wrap the advance negative
    // (stalling the walk — an executor-side infinite loop on corrupt
    // input) or overflow the bounds check back into range (an
    // ArrayIndexOutOfBounds escaping the DLT arm). In Long the
    // cursor is strictly increasing and every index below b.length
    // fits an Int, so the walk always terminates and never throws.
    var i = 12L
    var channels = -1L; var rate = -1L; var bits = -1L; var blockAlign = -1L
    var dataSize = -1L; var dataOff = -1
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val p = i.toInt
      val size = u32le(b, p + 4)
      if (tag(b, p, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return None
        val audioFormat = u16le(b, p + 8)
        if (audioFormat != wantFormat) return None // PCM or μ-law only
        channels = u16le(b, p + 10).toLong
        rate = u32le(b, p + 12)
        blockAlign = u16le(b, p + 20).toLong
        bits = u16le(b, p + 22).toLong
      } else if (tag(b, p, "data")) {
        // the data payload may be truncated in a corrupt file — the
        // declared size must actually be present
        if (i + 8 + size > b.length) return None
        dataSize = size
        dataOff = p + 8
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + size + (size & 1L)
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || blockAlign <= 0 ||
      dataSize < 0) return None
    if (blockAlign != channels * (bits / 8)) return None
    if (bits != 8 && bits != 16) return None
    Some((AudioMeta(if (wantFormat == 7) "wav_ulaw" else "wav",
      channels, rate, bits, dataSize / blockAlign,
      dataSize / blockAlign * 1000L / rate), dataOff))
  }

  /** Deterministic μ-law WAV fixture: a complete RIFF/WAVE container
    * with fmt tag 7, 8-bit blocks, whose encoded bytes come from the
    * caller's formula — decode must walk the real chunk layout AND
    * expand every byte for the oracle's sample math to agree. */
  def ulawWavBytes(sampleRate: Int, channels: Int, nSamples: Int,
      byteAt: Int => Int): Array[Byte] = {
    val blockAlign = channels
    val dataSize = nSamples * blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def str(s: String): Unit = s.foreach(c => out.write(c))
    str("RIFF"); le32(36L + dataSize); str("WAVE")
    str("fmt "); le32(16L)
    le16(7) // G.711 μ-law
    le16(channels)
    le32(sampleRate.toLong)
    le32(sampleRate.toLong * blockAlign)
    le16(blockAlign)
    le16(8)
    str("data"); le32(dataSize.toLong)
    var i = 0
    while (i < dataSize) { out.write(byteAt(i) & 0xff); i += 1 }
    if ((dataSize & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** PCM-16 mono WAV from an explicit per-sample function — the
    * group-fixture builder (near-dup audio needs member-correlated
    * SAMPLES, which [[wavBytes]]' byte-progression formula can't
    * express). The container layout is identical to [[wavBytes]]';
    * samples are written little-endian signed 16-bit. */
  def pcm16WavBytes(sampleRate: Int, nSamples: Int,
      sampleAt: Int => Int): Array[Byte] = {
    val dataSize = nSamples * 2
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def str(s: String): Unit = s.foreach(c => out.write(c))
    str("RIFF"); le32(36L + dataSize); str("WAVE")
    str("fmt "); le32(16L)
    le16(1) // PCM
    le16(1) // mono
    le32(sampleRate.toLong)
    le32(sampleRate.toLong * 2)
    le16(2)
    le16(16)
    str("data"); le32(dataSize.toLong)
    var i = 0
    while (i < nSamples) { le16(sampleAt(i) & 0xffff); i += 1 }
    out.toByteArray
  }

  /** Deterministic PCM WAV fixture: a real, complete RIFF/WAVE file
    * whose sample bytes are (i·31 + seed) mod 256 — parsers must walk
    * the actual chunk layout to recover the header fields the oracle
    * pins from doc_id literals. */
  def wavBytes(sampleRate: Int, channels: Int, bits: Int, nSamples: Int,
      seed: Long = 0L): Array[Byte] = {
    val blockAlign = channels * (bits / 8)
    val dataSize = nSamples * blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def str(s: String): Unit = s.foreach(c => out.write(c))
    str("RIFF"); le32(36L + dataSize); str("WAVE")
    str("fmt "); le32(16L)
    le16(1) // PCM
    le16(channels)
    le32(sampleRate.toLong)
    le32(sampleRate.toLong * blockAlign) // byte rate
    le16(blockAlign)
    le16(bits)
    str("data"); le32(dataSize.toLong)
    var i = 0
    while (i < dataSize) { out.write(((i * 31 + seed) % 256).toInt); i += 1 }
    if ((dataSize & 1) == 1) out.write(0) // pad
    out.toByteArray
  }
}
