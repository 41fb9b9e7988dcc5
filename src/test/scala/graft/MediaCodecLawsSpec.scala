package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageCodec

/** Generative round-trip laws for the binary media codecs: for any
  * in-contract (dims, params) the fixture writer + parser must
  * recover exactly the logical content. Randomized geometry catches
  * the edges fixed fixtures miss — w = 1 BMP rows (3 data bytes + 1
  * pad), single-pixel rasters, 16-bit-boundary TIFF dims, the full
  * GIF palette-exponent range. */
class MediaCodecLawsSpec extends AnyFunSuite {

  test("BMP: parse(bmpBytes) recovers every canonical sample for " +
    "random dims including stride-pad edge geometries") {
    val dimGen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
    } yield (w, h)
    val dims = Gen.listOfN(40, dimGen).sample.get ++
      Seq((1, 1), (1, 40), (40, 1), (2, 3), (3, 2))
    dims.foreach { case (w, h) =>
      val seed = w * 41 + h
      val bytes = ImageCodec.bmpBytes(w, h, i => (i * 7 + seed) % 256)
      val img = ImageCodec.parseBmp(bytes)
        .getOrElse(fail(s"($w,$h) did not parse"))
      assert(img.width == w && img.height == h)
      var i = 0
      while (i < w * h * 3) {
        assert((img.raster(i) & 0xff) == (i * 7 + seed) % 256,
          s"($w,$h) sample $i")
        i += 1
      }
    }
  }

  test("TGA: parse(tgaBytes) recovers every canonical sample for random " +
    "dims; run-heavy and literal-heavy extremes both round-trip") {
    val dimGen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
    } yield (w, h)
    val dims = Gen.listOfN(40, dimGen).sample.get ++
      Seq((1, 1), (1, 40), (40, 1), (2, 3), (200, 2))
    dims.foreach { case (w, h) =>
      val seed = w * 43 + h
      // three content regimes: all-constant (maximal RLE, >128-px rows
      // exercise the packet cap), all-varying (maximal raw), mixed
      val regimes: Seq[Int => Int] = Seq(
        _ => seed % 256,
        i => (i * 7 + seed) % 256,
        i => { val p = i / 3; if ((p / 5) % 2 == 0) (p / 5 + seed) % 256
               else (i * 11 + seed) % 256 })
      regimes.zipWithIndex.foreach { case (f, ri) =>
        val img = ImageCodec.parseTga(ImageCodec.tgaBytes(w, h, f))
          .getOrElse(fail(s"($w,$h) regime $ri did not parse"))
        assert(img.width == w && img.height == h)
        var i = 0
        while (i < w * h * 3) {
          assert((img.raster(i) & 0xff) == f(i), s"($w,$h) r$ri sample $i")
          i += 1
        }
      }
    }
    // corrupt arms reject: truncated header, truncated packet stream,
    // unsupported type byte
    val good = ImageCodec.tgaBytes(6, 4, i => (i * 3) % 256)
    assert(ImageCodec.parseTga(java.util.Arrays.copyOf(good, 10)).isEmpty)
    assert(ImageCodec.parseTga(
      java.util.Arrays.copyOf(good, good.length - 2)).isEmpty)
    val badType = good.clone(); badType(2) = 2 // uncompressed: not ours
    assert(ImageCodec.parseTga(badType).isEmpty)
  }

  test("Animated GIF: parse(gifAnimBytes) recovers frame count, summed " +
    "delays, and every frame's pixels in presentation order") {
    val cases = Gen.listOfN(25, for {
      w <- Gen.chooseNum(1, 24)
      h <- Gen.chooseNum(1, 24)
      pe <- Gen.chooseNum(0, 7)
      nf <- Gen.chooseNum(1, 6)
    } yield (w, h, pe, nf)).sample.get ++ Seq((1, 1, 0, 1), (24, 1, 7, 6))
    cases.foreach { case (w, h, pe, nf) =>
      val size = 1 << (pe + 1)
      val bytes = ImageCodec.gifAnimBytes(w, h, pe, nf,
        delayCs = f => 2 + f * 3,
        palette = (j, ch) => (j * 41 + ch * 17 + w) % 256,
        index = (f, i) => (f * 11 + i * 7 + h) % 256)
      val a = ImageCodec.parseGifFrames(bytes)
        .getOrElse(fail(s"($w,$h,$pe,$nf) did not parse"))
      assert(a.width == w && a.height == h && a.nFrames == nf)
      assert(a.totalDelayCs == (0 until nf).map(2 + _ * 3).sum.toLong)
      var f = 0
      while (f < nf) {
        var p = 0
        while (p < w * h) {
          val j = ((f * 11 + p * 7 + h) % 256) % size
          val base = (f * w * h + p) * 3
          (0 until 3).foreach { ch =>
            assert((a.rasters(base + ch) & 0xff) == (j * 41 + ch * 17 + w) % 256,
              s"($w,$h,$pe,$nf) frame $f pixel $p ch $ch")
          }
          p += 1
        }
        f += 1
      }
    }
    // corrupt arms: truncated chain, missing trailer
    val good = ImageCodec.gifAnimBytes(5, 4, 2, 3, _ => 4,
      (j, ch) => j + ch, (f, i) => f + i)
    assert(ImageCodec.parseGifFrames(
      java.util.Arrays.copyOf(good, 25)).isEmpty)
    assert(ImageCodec.parseGifFrames(
      java.util.Arrays.copyOf(good, good.length - 1)).isEmpty)
  }

  test("TIFF: both byte orders round-trip random dims and sample " +
    "counts; the detected order matches the written one") {
    val caseGen = for {
      w <- Gen.chooseNum(1, 65535)
      h <- Gen.chooseNum(1, 65535)
      spp <- Gen.oneOf(1, 3, 4)
      be <- Gen.oneOf(true, false)
    } yield (w, h, spp, be)
    Gen.listOfN(60, caseGen).sample.get.foreach { case (w, h, spp, be) =>
      val m = ImageCodec.parseTiff(ImageCodec.tiffBytes(w, h, spp, be))
        .getOrElse(fail(s"($w,$h,$spp,be=$be) did not parse"))
      assert(m.width == w && m.height == h && m.channels == spp,
        s"($w,$h,$spp,be=$be)")
      assert(m.format == (if (be) "tiff_be" else "tiff_le"))
    }
  }

  test("GIF: random dims, versions and the full palette-exponent " +
    "range round-trip") {
    val caseGen = for {
      w <- Gen.chooseNum(1, 65535)
      h <- Gen.chooseNum(1, 65535)
      v89 <- Gen.oneOf(true, false)
      pe <- Gen.chooseNum(-1, 7)
    } yield (w, h, v89, pe)
    Gen.listOfN(60, caseGen).sample.get.foreach { case (w, h, v89, pe) =>
      val g = ImageCodec.parseGif(ImageCodec.gifBytes(w, h, v89, pe))
        .getOrElse(fail(s"($w,$h,$v89,$pe) did not parse"))
      assert(g.width == w && g.height == h)
      assert(g.format == (if (v89) "gif89" else "gif87"))
      assert(g.palette == (if (pe < 0) 0L else 1L << (pe + 1)))
    }
  }

  test("Hilbert xy2d masks out-of-range coordinates to the 8-bit " +
    "grid (same cell as the reduced coordinates)") {
    val g = for {
      x <- Gen.chooseNum(0L, 1L << 40)
      y <- Gen.chooseNum(0L, 1L << 40)
    } yield (x, y)
    Gen.listOfN(200, g).sample.get.foreach { case (x, y) =>
      assert(graft.functions.HilbertOps.xy2d(x, y) ==
        graft.functions.HilbertOps.xy2d(x & 255L, y & 255L))
    }
  }
}
