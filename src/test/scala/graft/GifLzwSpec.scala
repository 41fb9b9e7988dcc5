package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageCodec

/** Pixel-level GIF decode (r7): the variable-width LZW path checked
  * against HAND-PACKED code streams (independent of the fixture
  * encoder), encoder/decoder round trips across every palette width,
  * the KwKwK case, and the corrupt arms. */
class GifLzwSpec extends AnyFunSuite {

  /** Pack codes LSB-first at the widths the GIF decoder will use:
    * width starts at min+1 and bumps after the decoder's table add
    * brings nextFree to 2^width — replicated here independently so a
    * desync in the production decoder fails the test. */
  private def pack(minCode: Int, codes: Seq[Int]): Array[Byte] = {
    val clear = 1 << minCode
    var width = minCode + 1
    var nextFree = clear + 2
    var prevSeen = false
    var acc = 0L
    var nBits = 0
    val out = new java.io.ByteArrayOutputStream()
    codes.foreach { c =>
      acc |= c.toLong << nBits
      nBits += width
      while (nBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nBits -= 8 }
      if (c == clear) { width = minCode + 1; nextFree = clear + 2; prevSeen = false }
      else if (c != clear + 1) {
        if (prevSeen) {
          nextFree += 1
          if (nextFree == (1 << width) && width < 12) width += 1
        }
        prevSeen = true
      }
    }
    if (nBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  test("hand-packed stream decodes: literals, a table hit, and KwKwK") {
    val min = 2
    val clear = 4; val eoi = 5
    // clear, 0, 1 (adds entry 6 = "01"... actually adds (0,1)=6),
    // 6 ("0,1"), eoi  -> pixels 0,1,0,1
    val d1 = ImageCodec.lzwDecode(pack(min, Seq(clear, 0, 1, 6, eoi)), min, 4)
    assert(d1.get.toSeq == Seq[Byte](0, 1, 0, 1))
    // KwKwK: clear, 0, 6 where 6 is the entry being defined ("00")
    // -> pixels 0,0,0
    val d2 = ImageCodec.lzwDecode(pack(min, Seq(clear, 0, 6, eoi)), min, 3)
    assert(d2.get.toSeq == Seq[Byte](0, 0, 0))
    // code beyond nextFree is protocol error
    assert(ImageCodec.lzwDecode(pack(min, Seq(clear, 0, 7, eoi)), min, 3).isEmpty)
    // first code after clear must be a root
    assert(ImageCodec.lzwDecode(pack(min, Seq(clear, 6, eoi)), min, 2).isEmpty)
    // wrong pixel count (stream yields 4, caller expects 5)
    assert(ImageCodec.lzwDecode(pack(min, Seq(clear, 0, 1, 6, eoi)), min, 5).isEmpty)
  }

  test("encoder/decoder round-trip across palette widths and patterns") {
    val rnd = new java.util.Random(11)
    for (minCode <- 2 to 8) {
      val nSym = 1 << minCode
      for ((label, data) <- Seq(
        "runs" -> Array.tabulate(600)(i => ((i / 17) % nSym).toByte),
        "constant" -> Array.fill(400)(1.toByte), // KwKwK-heavy
        "periodic" -> Array.tabulate(800)(i => ((i * 7) % nSym).toByte),
        "random" -> Array.fill(500)((rnd.nextInt(nSym)).toByte))) {
        val enc = ImageCodec.lzwEncode(data, minCode)
        val dec = ImageCodec.lzwDecode(enc, minCode, data.length)
        assert(dec.isDefined, s"min=$minCode $label failed to decode")
        assert(dec.get.toSeq == data.toSeq, s"min=$minCode $label mismatch")
        // compression is real on repetitive data: fewer code bits than
        // raw 8-bit bytes (width <= 12 over grown table entries)
        if (label != "random")
          assert(enc.length < data.length, s"min=$minCode $label no compression")
      }
    }
  }

  test("full GIF raster round-trip at fixture dims; palette applied") {
    for (id <- 0L to 25L if id % 13 != 0) {
      val w = 6 + (id % 10).toInt
      val h = 4 + (id % 8).toInt
      val exp = (id % 8).toInt
      val size = 1 << (exp + 1)
      val gif = ImageCodec.gifRasterBytes(w, h, exp, version89 = id % 2 == 1,
        palette = (j, ch) => ((id * 13 + j * 41L + ch * 17) % 256).toInt,
        index = i => ((id * 3 + i.toLong * 7) % 256).toInt)
      val img = ImageCodec.parseGifRaster(gif).getOrElse(fail(s"doc $id"))
      assert(img.width == w && img.height == h)
      val expect = (0 until w * h * 3).map { s =>
        val idx = (((id * 3 + (s / 3).toLong * 7) % 256) % size).toInt
        ((id * 13 + idx * 41L + (s % 3) * 17) % 256).toInt
      }
      assert(img.raster.map(_ & 0xff).toSeq == expect, s"doc $id")
      // header-level parse still agrees on the same payload
      assert(ImageCodec.parseGif(gif).exists(m =>
        m.width == w && m.height == h && m.palette == size))
    }
  }

  test("extensions are skipped; truncation and interlace fail closed") {
    val base = ImageCodec.gifRasterBytes(8, 6, 3, version89 = true,
      palette = (j, ch) => (j * 5 + ch) % 256, index = _ % 256)
    // splice a graphic-control extension between LSD+GCT and the
    // image descriptor (0x21 0xF9, one 4-byte sub-block, terminator)
    val gctEnd = 13 + 3 * 16
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = base.take(gctEnd) ++ ext ++ base.drop(gctEnd)
    val img = ImageCodec.parseGifRaster(spliced.toArray)
    assert(img.isDefined && img.get.raster.toSeq ==
      ImageCodec.parseGifRaster(base).get.raster.toSeq)
    // the fixture truncation arm and other cuts fail closed
    for (n <- Seq(30, base.length / 2, base.length - 2))
      assert(ImageCodec.parseGifRaster(
        java.util.Arrays.copyOf(base, n)).isEmpty, s"cut at $n")
    // interlace flag set -> DLT arm (image descriptor packed byte)
    val inter = base.clone()
    inter(gctEnd + 9) = (inter(gctEnd + 9) | 0x40).toByte
    assert(ImageCodec.parseGifRaster(inter).isEmpty)
    // header fixtures carry no image data at all
    assert(ImageCodec.parseGifRaster(
      ImageCodec.gifBytes(9, 9, version89 = true, paletteExp = 2)).isEmpty)
  }

  test("fuzz: no byte sequence makes parseGifRaster throw") {
    val rnd = new java.util.Random(23)
    val valid = ImageCodec.gifRasterBytes(7, 5, 4, version89 = false,
      palette = (j, ch) => (j * 3 + ch * 7) % 256, index = _ % 256)
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(96)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      ImageCodec.parseGifRaster(b)
      val cut = rnd.nextInt(valid.length)
      ImageCodec.parseGifRaster((valid.take(cut) ++ b).toArray)
      val mut = valid.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      ImageCodec.parseGifRaster(mut)
    }
  }
}
