package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageCodec

/** Pixel-level PNG decode (r7): the inflate + five-unfilter path
  * checked against a HAND-WRITTEN zlib stream (stored-block deflate,
  * so the test does not depend on the fixture writer's Deflater),
  * per-filter round trips through the generator, and the corrupt
  * arms (truncated IDAT, bad filter byte, wrong inflated size,
  * unsupported color modes). */
class PngCodecSpec extends AnyFunSuite {

  /** Minimal zlib stream holding `data` in one STORED deflate block:
    * header 0x78 0x01, block type 01 (final + stored), LEN/NLEN
    * little-endian, raw bytes, then the big-endian Adler-32 the
    * Inflater verifies at end of stream. */
  private def storedZlib(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x78); out.write(0x01)
    out.write(0x01) // BFINAL=1, BTYPE=00 (stored)
    out.write(data.length & 0xff); out.write((data.length >> 8) & 0xff)
    val nlen = data.length ^ 0xffff
    out.write(nlen & 0xff); out.write((nlen >> 8) & 0xff)
    out.write(data, 0, data.length)
    val ad = new java.util.zip.Adler32()
    ad.update(data)
    val a = ad.getValue
    out.write(((a >> 24) & 0xff).toInt); out.write(((a >> 16) & 0xff).toInt)
    out.write(((a >> 8) & 0xff).toInt); out.write((a & 0xff).toInt)
    out.toByteArray
  }

  /** Hand-assembled PNG: signature, IHDR, one IDAT holding `zlib`,
    * IEND. CRCs are real (the writer contract) though the parser
    * does not verify them. */
  private def handPng(w: Int, h: Int, colorType: Int,
      zlib: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      be32(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      be32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte // small dims fit one byte
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    chunk("IHDR", ihdr)
    chunk("IDAT", zlib)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("hand-written stored-block PNG decodes to the exact pixels") {
    // 2x2 gray, filter 0 on both rows: scanlines [0,10,20, 0,30,40]
    val scan = Array[Byte](0, 10, 20, 0, 30, 40)
    val img = ImageCodec.parsePngRaster(handPng(2, 2, 0, storedZlib(scan))).get
    assert(img.width == 2 && img.height == 2 && img.channels == 1)
    assert(img.raster.toSeq == Seq[Byte](10, 20, 30, 40))
    // Sub filter on row 0 (left neighbor), Up filter on row 1:
    // row0 raw [5, 7] -> px [5, 12]; row1 raw [1, 2] -> px [6, 14]
    val filt = Array[Byte](1, 5, 7, 2, 1, 2)
    val img2 = ImageCodec.parsePngRaster(handPng(2, 2, 0, storedZlib(filt))).get
    assert(img2.raster.toSeq == Seq[Byte](5, 12, 6, 14))
  }

  test("each of the five filter types round-trips through the generator") {
    for (f <- 0 to 4; gray <- Seq(true, false)) {
      val w = 7; val h = 5
      val c = if (gray) 1 else 3
      val pixel = (i: Int) => (i * 29 + f * 17 + 3) % 256
      val png = ImageCodec.pngRasterBytes(w, h, gray, pixel, _ => f)
      val img = ImageCodec.parsePngRaster(png)
        .getOrElse(fail(s"filter $f gray=$gray did not decode"))
      assert(img.width == w && img.height == h && img.channels == c)
      assert(img.raster.map(_ & 0xff).toSeq ==
        (0 until w * h * c).map(pixel), s"filter $f gray=$gray")
    }
  }

  test("rotating filters + multi-IDAT split round-trip at fixture dims") {
    for (id <- 0L to 25L if id % 13 != 0) {
      val w = 6 + (id % 11).toInt
      val h = 4 + (id % 9).toInt
      val pixel =
        (i: Int) => ((id * 3 + i.toLong * 7 + (i % 11) * 31) % 256).toInt
      val png = ImageCodec.pngRasterBytes(w, h, grayscale = id % 2 == 0,
        pixel, y => ((id + y) % 5).toInt)
      val img = ImageCodec.parsePngRaster(png).getOrElse(fail(s"doc $id"))
      assert(img.raster.map(_ & 0xff).toSeq ==
        (0 until w * h * img.channels).map(pixel), s"doc $id")
    }
  }

  test("Adam7 interlace reconstructs the same canonical raster (r7)") {
    // dims straddling the 8x8 pass grid: odd, sub-8, and aligned
    for ((w, h) <- Seq((6, 4), (8, 8), (13, 11), (16, 9), (7, 3), (1, 1));
         gray <- Seq(true, false)) {
      val pixel = (i: Int) => (i * 37 + 11) % 256
      val plain = ImageCodec.pngRasterBytes(w, h, gray, pixel, _ % 5)
      val inter = ImageCodec.pngRasterBytes(w, h, gray, pixel, _ % 5,
        interlaced = true)
      // different byte streams, same reconstructed pixels
      assert(!inter.sameElements(plain), s"$w x $h gray=$gray")
      val a = ImageCodec.parsePngRaster(plain).get
      val b = ImageCodec.parsePngRaster(inter)
        .getOrElse(fail(s"interlaced $w x $h gray=$gray did not decode"))
      assert(a.raster.toSeq == b.raster.toSeq, s"$w x $h gray=$gray")
    }
    // fixture-arm dims (id % 7 == 3 docs) round-trip too
    for (id <- Seq(3L, 10L, 17L, 24L) if id % 13 != 0) {
      val w = 6 + (id % 11).toInt
      val h = 4 + (id % 9).toInt
      val pixel =
        (i: Int) => ((id * 3 + i.toLong * 7 + (i % 11) * 31) % 256).toInt
      val png = ImageCodec.pngRasterBytes(w, h, grayscale = id % 2 == 0,
        pixel, y => ((id + y) % 5).toInt, interlaced = true)
      val img = ImageCodec.parsePngRaster(png).getOrElse(fail(s"doc $id"))
      assert(img.raster.map(_ & 0xff).toSeq ==
        (0 until w * h * img.channels).map(pixel), s"doc $id")
    }
    // truncated interlaced stream still fails closed
    val full = ImageCodec.pngRasterBytes(9, 7, grayscale = false,
      _ % 256, _ % 5, interlaced = true)
    assert(ImageCodec.parsePngRaster(
      java.util.Arrays.copyOf(full, full.length / 2)).isEmpty)
  }

  test("truncated IDAT fails closed — no partial pixels") {
    val full = ImageCodec.pngRasterBytes(9, 7, grayscale = false,
      _ % 256, _ % 5)
    assert(ImageCodec.parsePngRaster(full).isDefined)
    // the fixture truncation arm (mid-first-IDAT) and every other cut
    for (n <- Seq(41, full.length / 2, full.length - 1))
      assert(ImageCodec.parsePngRaster(
        java.util.Arrays.copyOf(full, n)).isEmpty, s"cut at $n")
  }

  test("bad filter byte, wrong inflated size, unsupported modes rejected") {
    // filter byte 5 is out of spec
    val badFilter = Array[Byte](5, 1, 2, 0, 3, 4)
    assert(ImageCodec.parsePngRaster(
      handPng(2, 2, 0, storedZlib(badFilter))).isEmpty)
    // stream inflates to fewer bytes than h*(1+w*c)
    assert(ImageCodec.parsePngRaster(
      handPng(2, 2, 0, storedZlib(Array[Byte](0, 1, 2)))).isEmpty)
    // ... and to more
    assert(ImageCodec.parsePngRaster(
      handPng(2, 2, 0, storedZlib(new Array[Byte](9)))).isEmpty)
    // palette (3) WITHOUT a PLTE chunk, and RGBA (6), are DLT arms
    val scan = Array[Byte](0, 1, 2, 0, 3, 4)
    assert(ImageCodec.parsePngRaster(
      handPng(2, 2, 3, storedZlib(scan))).isEmpty)
    assert(ImageCodec.parsePngRaster(
      handPng(2, 2, 6, storedZlib(scan))).isEmpty)
    // header-only fixture (no IDAT chunks): inflates to zero bytes
    assert(ImageCodec.parsePngRaster(ImageCodec.pngBytes(4, 4, 2)).isEmpty)
  }

  test("indexed-color PNG: palette expansion matches a direct " +
    "index->palette computation across filters and palette sizes (r7)") {
    for (nPal <- Seq(1, 2, 7, 16, 256); seed <- Seq(0, 5)) {
      val (w, h) = (5 + seed, 4)
      val idx = (i: Int) => (seed * 3 + i * 5) % nPal
      val pal = (j: Int) => (seed * 7 + j * 13) % 256
      val bytes = ImageCodec.pngPaletteBytes(w, h, nPal, idx, pal,
        filterFor = y => y % 5)
      val img = ImageCodec.parsePngRaster(bytes).get
      assert(img.width == w && img.height == h && img.channels == 3)
      val want = (0 until w * h).flatMap { p =>
        val e = idx(p); Seq(pal(3 * e), pal(3 * e + 1), pal(3 * e + 2))
      }
      assert(img.raster.map(_ & 0xff).toSeq == want)
    }
  }

  test("indexed-color PNG corrupt arms: out-of-range index, bad PLTE " +
    "length, truncation all fail closed (r7)") {
    val ok = ImageCodec.pngPaletteBytes(3, 3, 2, i => i % 2, _ % 256,
      _ => 0)
    assert(ImageCodec.parsePngRaster(ok).isDefined)
    // shrink the PLTE to ONE entry: the index plane still holds 1s
    // -> out-of-range index must reject, not clamp. PLTE sits at 33
    // (sig 8 + IHDR 25), spans 12 + 6 bytes for 2 entries.
    def splicePlte(src: Array[Byte], entries: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(src, 0, 33)
      out.write(Array[Byte](0, 0, 0, (3 * entries).toByte), 0, 4)
      out.write("PLTE".getBytes("US-ASCII"), 0, 4)
      out.write(new Array[Byte](3 * entries), 0, 3 * entries)
      out.write(new Array[Byte](4), 0, 4) // crc (unchecked)
      out.write(src, 33 + 12 + 6, src.length - (33 + 12 + 6))
      out.toByteArray
    }
    assert(ImageCodec.parsePngRaster(splicePlte(ok, 1)).isEmpty)
    // PLTE length not divisible by 3
    val badLen = ok.clone()
    badLen(36) = 7 // chunk length 6 -> 7 (still < remaining bytes)
    assert(ImageCodec.parsePngRaster(badLen).isEmpty)
    assert(ImageCodec.parsePngRaster(
      java.util.Arrays.copyOf(ok, 40)).isEmpty)
  }

  test("container dispatch is orthogonal: PNM is not PNG and vice versa") {
    val pnm = ImageCodec.pnmRasterBytes(4, 4, grayscale = true, _ % 256)
    val png = ImageCodec.pngRasterBytes(4, 4, grayscale = true, _ % 256, _ => 0)
    assert(ImageCodec.parsePngRaster(pnm).isEmpty)
    assert(ImageCodec.parsePnmRaster(png).isEmpty)
    // and the PNG still satisfies the header-level parser
    assert(ImageCodec.parseHeader(png).exists(m =>
      m.format == "png" && m.width == 4 && m.height == 4))
  }

  test("fuzz: no byte sequence makes parsePngRaster throw") {
    val rnd = new java.util.Random(7)
    val valid = ImageCodec.pngRasterBytes(6, 4, grayscale = false,
      _ % 256, _ % 5)
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(96)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      ImageCodec.parsePngRaster(b) // must return, never throw
      // valid prefix + random tail
      val cut = rnd.nextInt(valid.length)
      ImageCodec.parsePngRaster(
        (valid.take(cut) ++ b).toArray)
      // random corruption of one byte inside a valid file
      val mut = valid.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      ImageCodec.parsePngRaster(mut)
    }
  }
}
