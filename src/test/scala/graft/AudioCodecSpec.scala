package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AudioCodec
import graft.operators.AudioCodec.AudioMeta

/** RIFF/WAVE header decode: chunk walk, field extraction, DLT arm.
  * Fixtures are hand-written byte layouts per the published RIFF
  * spec, plus the generator round-trip the mm_audio_meta oracle
  * leans on. */
class AudioCodecSpec extends AnyFunSuite {

  test("generator round-trip across the fixture parameter space") {
    for (id <- 0L to 30L) {
      val rate = 8000 + (id % 5).toInt * 4000
      val ch = 1 + (id % 2).toInt
      val bits = if (id % 3 == 0) 8 else 16
      val n = 100 + (id % 400).toInt
      val m = AudioCodec.parseWav(AudioCodec.wavBytes(rate, ch, bits, n, id))
      assert(m.contains(AudioMeta("wav", ch.toLong, rate.toLong, bits.toLong,
        n.toLong, n.toLong * 1000L / rate)), s"id $id: $m")
    }
  }

  test("chunk walk skips unknown chunks (LIST before fmt) and pads odd sizes") {
    // hand-assemble: RIFF/WAVE, then a 3-byte junk chunk (odd -> pad),
    // then fmt + data
    val base = AudioCodec.wavBytes(16000, 1, 16, 10)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 12) // RIFF....WAVE
    "LIST".foreach(c => out.write(c))
    out.write(3); out.write(0); out.write(0); out.write(0) // size 3 LE
    out.write(Array[Byte](1, 2, 3), 0, 3); out.write(0)    // payload + pad
    out.write(base, 12, base.length - 12) // fmt + data as-is
    val m = AudioCodec.parseWav(out.toByteArray)
    assert(m.contains(AudioMeta("wav", 1L, 16000L, 16L, 10L, 0L)))
  }

  test("sample decode: 8-bit centers on 128, 16-bit signed LE round-trips") {
    // 8-bit: data byte k = (k*31 + seed) % 256, v = byte - 128
    val b8 = AudioCodec.wavBytes(8000, 1, 8, 5, seed = 3L)
    val (m8, v8) = AudioCodec.parseWavSamples(b8).get
    assert(m8.bits == 8L && v8.toSeq ==
      (0 until 5).map(k => ((k * 31 + 3) % 256) - 128))
    // 16-bit stereo: sample j = bytes (2j, 2j+1) LE, signed
    val b16 = AudioCodec.wavBytes(16000, 2, 16, 3, seed = 7L)
    val (m16, v16) = AudioCodec.parseWavSamples(b16).get
    def byteAt(k: Int) = (k * 31 + 7) % 256
    val expect = (0 until 6).map { j =>
      val u = byteAt(2 * j) + 256 * byteAt(2 * j + 1)
      if (u >= 32768) u - 65536 else u
    }
    assert(m16.n_samples == 3L && v16.toSeq == expect)
  }

  test("ulaw expansion: G.711 landmark values, sign anti-symmetry, " +
    "monotone decode within a segment (r7)") {
    // 0xFF encodes +0, 0x7F encodes -0 (ones'-complement convention)
    assert(AudioCodec.ulawExpand(0xff) == 0)
    assert(AudioCodec.ulawExpand(0x7f) == 0)
    // largest magnitude: byte 0x00 -> u=0xFF? no: u = ~0x00 = 0xFF ->
    // sign set, exponent 7, mantissa 15 -> t = (15*8+132)<<7 = 32256,
    // sample = 132 - 32256 = -32124 (the G.711 max magnitude)
    assert(AudioCodec.ulawExpand(0x00) == -32124)
    assert(AudioCodec.ulawExpand(0x80) == 32124)
    // flipping the sign bit of the ENCODED byte negates the sample
    for (b <- 0 until 128)
      assert(AudioCodec.ulawExpand(b) == -AudioCodec.ulawExpand(b | 0x80))
    // within one exponent segment, smaller encoded byte = larger
    // magnitude (complement coding) — strictly monotone
    val seg = (0x80 until 0x90).map(AudioCodec.ulawExpand)
    assert(seg == seg.sorted.reverse && seg.distinct.size == seg.size)
  }

  test("ulaw WAV: container round-trip, PCM/ulaw tags don't cross, " +
    "truncation rejects (r7)") {
    val f = AudioCodec.ulawWavBytes(8000, 1, 25, i => (i * 7 + 3) % 256)
    val (m, s) = AudioCodec.parseWavUlawSamples(f).get
    assert(m.format == "wav_ulaw" && m.sample_rate == 8000 &&
      m.n_samples == 25 && m.bits == 8)
    assert(s.toSeq == (0 until 25).map(i =>
      AudioCodec.ulawExpand((i * 7 + 3) % 256)))
    // a PCM container must NOT decode through the ulaw arm & vice versa
    assert(AudioCodec.parseWavUlawSamples(
      AudioCodec.wavBytes(8000, 1, 8, 25)).isEmpty)
    assert(AudioCodec.parseWavSamples(f).isEmpty)
    // truncated data payload fails closed
    assert(AudioCodec.parseWavUlawSamples(
      java.util.Arrays.copyOf(f, f.length - 5)).isEmpty)
  }

  test("corrupt / truncated / alien payloads reject, never throw") {
    assert(AudioCodec.parseWav(Array.emptyByteArray).isEmpty)
    assert(AudioCodec.parseWav("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(AudioCodec.parseWav("not audio".getBytes("US-ASCII")).isEmpty)
    val ok = AudioCodec.wavBytes(8000, 2, 16, 50)
    // truncated mid-data: declared data size not present
    assert(AudioCodec.parseWav(java.util.Arrays.copyOf(ok, 40)).isEmpty)
    assert(AudioCodec.parseWav(java.util.Arrays.copyOf(ok, ok.length - 1)).isEmpty)
    // non-PCM audioFormat rejected
    val nonPcm = ok.clone(); nonPcm(20) = 3 // IEEE float tag
    assert(AudioCodec.parseWav(nonPcm).isEmpty)
    // inconsistent blockAlign rejected
    val badAlign = ok.clone(); badAlign(32) = 7
    assert(AudioCodec.parseWav(badAlign).isEmpty)
    // crafted u32 chunk size near 2^32 (would wrap .toInt negative
    // and stall the chunk walk if advanced in Int) must terminate
    val huge = new java.io.ByteArrayOutputStream()
    huge.write(ok, 0, 12)
    "JUNK".foreach(c => huge.write(c))
    huge.write(0xf8); huge.write(0xff); huge.write(0xff); huge.write(0xff)
    assert(AudioCodec.parseWav(huge.toByteArray).isEmpty)
    // fuzz: no byte sequence throws — the SAMPLE decoders included
    // (r9: parseWav alone left the 16-bit-PCM and mu-law expansion
    // paths unfuzzed)
    val rnd = new java.util.Random(7)
    (1 to 2000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(96)); rnd.nextBytes(b)
      AudioCodec.parseWav(b)
      AudioCodec.parseWavSamples(b)
      AudioCodec.parseWavUlawSamples(b)
      val riff = ("RIFF" + new String(b, "ISO-8859-1"))
        .getBytes("ISO-8859-1")
      AudioCodec.parseWav(riff)
      AudioCodec.parseWavSamples(riff)
      AudioCodec.parseWavUlawSamples(riff)
      // single-byte mutants of a valid PCM file
      val mut = ok.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      AudioCodec.parseWavSamples(mut)
      AudioCodec.parseWavUlawSamples(mut)
    }
  }
}
