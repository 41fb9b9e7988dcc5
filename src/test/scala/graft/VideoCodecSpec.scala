package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VideoCodec
import graft.operators.VideoCodec.VideoMeta

/** AVI header decode: nested RIFF/LIST walk, avih field extraction,
  * DLT arm. Fixtures follow the published AVI RIFF layout; the
  * generator round-trip is what the mm_video_meta oracle leans on. */
class VideoCodecSpec extends AnyFunSuite {

  test("generator round-trip across the fixture parameter space") {
    for (id <- 0L to 30L) {
      val w = 160 + (id % 8).toInt * 80
      val h = 120 + (id % 6).toInt * 60
      val frames = 10 + (id % 240).toInt
      val usf = 33333 + (id % 4).toInt * 8333
      val streams = 1 + (id % 2).toInt
      val m = VideoCodec.parseAvi(
        VideoCodec.aviBytes(w, h, frames, usf, streams, id))
      assert(m.contains(VideoMeta("avi", w.toLong, h.toLong, frames.toLong,
        usf.toLong, streams.toLong, frames.toLong * usf / 1000L)),
        s"id $id: $m")
    }
  }

  test("walk skips leading unknown chunks to reach the hdrl LIST") {
    val base = VideoCodec.aviBytes(320, 240, 24, 41666)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 12) // RIFF....AVI(space)
    "JUNK".foreach(c => out.write(c))
    out.write(5); out.write(0); out.write(0); out.write(0) // size 5 LE (odd)
    out.write(Array[Byte](9, 8, 7, 6, 5), 0, 5); out.write(0) // payload + pad
    out.write(base, 12, base.length - 12)
    val m = VideoCodec.parseAvi(out.toByteArray)
    assert(m.exists(v => v.width == 320 && v.total_frames == 24))
  }

  test("frame sampling walks the real movi chunks and matches the byte formula") {
    val id = 7L
    val frames = 10 + (id % 240).toInt
    val b = VideoCodec.aviBytes(160 + (id % 8).toInt * 80,
      120 + (id % 6).toInt * 60, frames, 33333, 1, id)
    val got = VideoCodec.sampleFrames(b, 25).get
    val want = (0 until frames).filter(_ % 25 == 0).map { f =>
      (f.toLong, 8L, (0 until 8).map(i => (f * 17L + i * 31L + id) % 256).sum)
    }
    assert(got == want.toVector)
    // stride 1 samples every frame; frame count matches the header
    assert(VideoCodec.sampleFrames(b, 1).get.size == frames)
    // non-00dc chunks inside movi are skipped without consuming a
    // frame index: splice an "01wb" audio chunk before the first
    // frame and patch the riff + movi sizes
    val withAudio = {
      // fixture layout: RIFF(12) + LIST:hdrl(8+68) → LIST:movi at 88,
      // its payload ("movi" + frames) at 96; first frame chunk at 100
      val audio = "01wb".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
      val arr = new Array[Byte](b.length + audio.length)
      System.arraycopy(b, 0, arr, 0, 100)
      System.arraycopy(audio, 0, arr, 100, audio.length)
      System.arraycopy(b, 100, arr, 100 + audio.length, b.length - 100)
      def patch(off: Int): Unit = {
        val old = (arr(off) & 0xffL) | ((arr(off + 1) & 0xffL) << 8) |
          ((arr(off + 2) & 0xffL) << 16) | ((arr(off + 3) & 0xffL) << 24)
        val v = old + audio.length
        arr(off) = (v & 0xff).toByte; arr(off + 1) = ((v >> 8) & 0xff).toByte
        arr(off + 2) = ((v >> 16) & 0xff).toByte
        arr(off + 3) = ((v >> 24) & 0xff).toByte
      }
      patch(4); patch(92) // riff size, movi list size
      arr
    }
    assert(VideoCodec.sampleFrames(withAudio, 25).get == got)
  }

  test("frame sampling rejects corrupt containers whole, never partially") {
    val ok = VideoCodec.aviBytes(320, 240, 60, 33333, 1, 3L)
    assert(VideoCodec.sampleFrames(ok, 25).isDefined)
    // truncate inside the movi list: a frame chunk overruns → None,
    // not the frames seen so far
    assert(VideoCodec.sampleFrames(
      java.util.Arrays.copyOf(ok, ok.length - 3), 25).isEmpty)
    assert(VideoCodec.sampleFrames(
      java.util.Arrays.copyOf(ok, 30), 25).isEmpty)
    val rnd = new java.util.Random(13)
    (1 to 1000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(96)); rnd.nextBytes(b)
      VideoCodec.sampleFrames(b, 25)
    }
  }

  test("corrupt / truncated / alien payloads reject, never throw") {
    assert(VideoCodec.parseAvi(Array.emptyByteArray).isEmpty)
    assert(VideoCodec.parseAvi("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val ok = VideoCodec.aviBytes(320, 240, 24, 41666)
    // truncated inside the header list
    assert(VideoCodec.parseAvi(java.util.Arrays.copyOf(ok, 30)).isEmpty)
    // zero frame period rejected
    val badUsf = ok.clone()
    badUsf(32) = 0; badUsf(33) = 0; badUsf(34) = 0; badUsf(35) = 0
    assert(VideoCodec.parseAvi(badUsf).isEmpty)
    // crafted huge u32 chunk size must terminate, not loop or throw
    val huge = new java.io.ByteArrayOutputStream()
    huge.write(ok, 0, 12)
    "JUNK".foreach(c => huge.write(c))
    huge.write(0xf8); huge.write(0xff); huge.write(0xff); huge.write(0xff)
    assert(VideoCodec.parseAvi(huge.toByteArray).isEmpty)
    // fuzz: no byte sequence throws
    val rnd = new java.util.Random(11)
    (1 to 2000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(96)); rnd.nextBytes(b)
      VideoCodec.parseAvi(b)
      VideoCodec.parseAvi(("RIFF" + new String(b, "ISO-8859-1"))
        .getBytes("ISO-8859-1"))
    }
  }
}
