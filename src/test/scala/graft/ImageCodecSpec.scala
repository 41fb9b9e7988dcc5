package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageCodec
import graft.operators.ImageCodec.ImageMeta

/** ImageCodec header parsing against HAND-WRITTEN byte layouts (not
  * the fixture generators — a shared bug cannot self-confirm here)
  * plus corrupt/truncated rejection and the generator round-trip. */
class ImageCodecSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("PNG: hand-written signature + IHDR parses; color types map to channels") {
    // 3×2 truecolor PNG header, written out byte by byte from the spec
    val png = bytes(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R', // IHDR length + tag
      0, 0, 0, 3, // width 3
      0, 0, 0, 2, // height 2
      8, 2, // bit depth, color type 2 (truecolor)
      0, 0, 0, // compression, filter, interlace
      0, 0, 0, 0) // CRC (unchecked)
    assert(ImageCodec.parseHeader(png).contains(ImageMeta("png", 3, 2, 3)))
    // color-type → channels table
    for ((ct, ch) <- Seq(0 -> 1L, 2 -> 3L, 3 -> 1L, 4 -> 2L, 6 -> 4L))
      assert(ImageCodec.parseHeader(ImageCodec.pngBytes(7, 5, ct))
        .contains(ImageMeta("png", 7, 5, ch)), s"color type $ct")
    // invalid color type rejected
    assert(ImageCodec.parseHeader(ImageCodec.pngBytes(7, 5, 9)).isEmpty)
  }

  test("JPEG: marker walk skips segments and fill bytes to reach SOFn") {
    // SOI, a COM segment, legal FF fill padding, then SOF2
    // (progressive): 257×514, 3 components
    val jpg = bytes(
      0xff, 0xd8, // SOI
      0xff, 0xfe, 0x00, 0x04, 'h', 'i', // COM segment, len 4
      0xff, 0xff, 0xff, 0xc2, // fill bytes + SOF2 marker
      0x00, 0x0b, // len 11
      8, // precision
      0x02, 0x02, // height 514
      0x01, 0x01, // width 257
      3, // components
      1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0)
    assert(ImageCodec.parseHeader(jpg).contains(ImageMeta("jpeg", 257, 514, 3)))
    // SOS before any SOF → unparseable (no frame header found)
    val noSof = bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02)
    assert(ImageCodec.parseHeader(noSof).isEmpty)
  }

  test("PNM: ASCII header with comments; P5 is 1-channel, P6 is 3") {
    val ppm = "P6\n# a comment\n 640\t480 # trailing\n255\n".getBytes("US-ASCII")
    assert(ImageCodec.parseHeader(ppm).contains(ImageMeta("ppm", 640, 480, 3)))
    val pgm = "P5 12 34 255 ".getBytes("US-ASCII")
    assert(ImageCodec.parseHeader(pgm).contains(ImageMeta("pgm", 12, 34, 1)))
    // P7 (PAM) not supported; zero dimensions rejected
    assert(ImageCodec.parseHeader("P7 1 1 255".getBytes("US-ASCII")).isEmpty)
    assert(ImageCodec.parseHeader("P6 0 5 255".getBytes("US-ASCII")).isEmpty)
  }

  test("fuzz: no byte sequence makes the parser throw") {
    val rnd = new java.util.Random(42)
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(64)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      ImageCodec.parseHeader(b) // must return, never throw
      // adversarial prefixes: valid magic, random tail
      val png = (ImageCodec.pngBytes(4, 4, 2).take(8 + rnd.nextInt(18))
        ++ b).toArray
      ImageCodec.parseHeader(png)
      val jpg = (Array[Byte](0xff.toByte, 0xd8.toByte) ++ b).toArray
      ImageCodec.parseHeader(jpg)
      ImageCodec.parseHeader(("P6 " + new String(b.map(x =>
        (Math.abs(x % 64) + 32).toChar))).getBytes("US-ASCII"))
    }
  }

  test("corrupt / truncated / alien payloads are rejected, not mis-parsed") {
    assert(ImageCodec.parseHeader(Array.emptyByteArray).isEmpty)
    assert(ImageCodec.parseHeader("not an image at all".getBytes).isEmpty)
    // PNG signature but truncated before the IHDR dims
    assert(ImageCodec.parseHeader(
      ImageCodec.pngBytes(9, 9, 2).take(17)).isEmpty)
    // JPEG SOI but a segment length running past the buffer
    assert(ImageCodec.parseHeader(bytes(0xff, 0xd8, 0xff, 0xe0, 0x7f, 0xff))
      .isEmpty)
    // generator round-trips across the fixture format mix
    for (id <- 0L to 11L) {
      val w = 16 + (id % 101).toInt
      val h = 8 + ((id / 3) % 97).toInt
      val payload = (id % 3) match {
        case 0 => ImageCodec.pngBytes(w, h, if (id % 2 == 0) 6 else 2)
        case 1 => ImageCodec.jpegBytes(w, h, if (id % 2 == 0) 3 else 1)
        case _ => ImageCodec.pnmBytes(w, h, grayscale = id % 2 == 0)
      }
      val m = ImageCodec.parseHeader(payload)
      assert(m.exists(x => x.width == w && x.height == h), s"doc $id: $m")
    }
  }
}
