package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageCodec

/** Pixel-level strip-TIFF decode (r7): value-offset chasing, strip
  * reassembly, both byte orders, and the corrupt arms. */
class TiffStripSpec extends AnyFunSuite {

  test("round-trip across byte orders, channel counts, strip heights") {
    for {
      be <- Seq(true, false)
      rgb <- Seq(true, false)
      rps <- Seq(1, 2, 3, 100) // 100 > h: the single-strip inline arm
    } {
      val w = 7; val h = 5
      val c = if (rgb) 3 else 1
      val pixel = (i: Int) => (i * 31 + 7) % 256
      val t = ImageCodec.tiffRasterBytes(w, h, rgb, be, rps, pixel)
      val img = ImageCodec.parseTiffRaster(t)
        .getOrElse(fail(s"be=$be rgb=$rgb rps=$rps did not decode"))
      assert(img.format == (if (be) "tiff_be" else "tiff_le"))
      assert(img.width == w && img.height == h && img.channels == c)
      assert(img.raster.map(_ & 0xff).toSeq ==
        (0 until w * h * c).map(pixel), s"be=$be rgb=$rgb rps=$rps")
      // the header-level parser agrees on the same payload
      assert(ImageCodec.parseTiff(t).exists(m =>
        m.width == w && m.height == h && m.channels == c))
    }
  }

  test("fixture dims round-trip incl. the mod-13 truncation arm") {
    for (id <- 0L to 25L) {
      val w = 5 + (id % 11).toInt
      val h = 4 + (id % 9).toInt
      val pixel =
        (i: Int) => ((id * 9 + i.toLong * 5 + (i % 7) * 23) % 256).toInt
      val full = ImageCodec.tiffRasterBytes(w, h, rgb = id % 2 == 1,
        bigEndian = id % 3 == 0, rowsPerStrip = 1 + (id % 5).toInt, pixel)
      if (id % 13 == 0)
        assert(ImageCodec.parseTiffRaster(
          java.util.Arrays.copyOf(full, 80)).isEmpty, s"doc $id")
      else {
        val img = ImageCodec.parseTiffRaster(full).getOrElse(fail(s"doc $id"))
        assert(img.raster.map(_ & 0xff).toSeq ==
          (0 until w * h * img.channels).map(pixel), s"doc $id")
      }
    }
  }

  test("unsupported shapes fail closed: compression, photometric, " +
    "bit depth, strip-count mismatch") {
    val good = ImageCodec.tiffRasterBytes(6, 4, rgb = false,
      bigEndian = false, rowsPerStrip = 2, _ % 256)
    assert(ImageCodec.parseTiffRaster(good).isDefined)
    // compression != 1 (entry 3 = tag 259, value slot at +8)
    val lzw = good.clone()
    lzw(8 + 2 + 3 * 12 + 8) = 5 // LZW
    assert(ImageCodec.parseTiffRaster(lzw).isEmpty)
    // photometric flipped to RGB while spp stays 1
    val photo = good.clone()
    photo(8 + 2 + 4 * 12 + 8) = 2
    assert(ImageCodec.parseTiffRaster(photo).isEmpty)
    // 16-bit depth rejected (entry 2 = tag 258 inline SHORT)
    val deep = good.clone()
    deep(8 + 2 + 2 * 12 + 8) = 16
    assert(ImageCodec.parseTiffRaster(deep).isEmpty)
    // RowsPerStrip changed so declared strip count no longer matches
    val rps = good.clone()
    rps(8 + 2 + 7 * 12 + 8) = 4
    assert(ImageCodec.parseTiffRaster(rps).isEmpty)
    // meta-level fixtures carry no strip data at all
    assert(ImageCodec.parseTiffRaster(
      ImageCodec.tiffBytes(9, 9, 3, bigEndian = true)).isEmpty)
  }

  test("fuzz: no byte sequence makes parseTiffRaster throw") {
    val rnd = new java.util.Random(31)
    val valid = ImageCodec.tiffRasterBytes(8, 6, rgb = true,
      bigEndian = true, rowsPerStrip = 2, _ % 256)
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(128)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      ImageCodec.parseTiffRaster(b)
      val cut = rnd.nextInt(valid.length)
      ImageCodec.parseTiffRaster((valid.take(cut) ++ b).toArray)
      val mut = valid.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      ImageCodec.parseTiffRaster(mut)
    }
  }
}
