package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JpegCodec

/** Baseline-JPEG decode (r7 continuation): the entropy path checked
  * against a HAND-PACKED bit stream (independent of the fixture
  * encoder), DC prediction across blocks and restart resets,
  * AC-bearing blocks against an INDEPENDENT reference IDCT written
  * in this spec, 4:2:0 interleave + upsample, the fixed-point color
  * transform law, and the corrupt arms (truncation, progressive
  * frames, 16-bit quant tables, missing restarts). */
class JpegCodecSpec extends AnyFunSuite {

  // ----- hand-built minimal gray JPEG (independent of the encoder)

  private def u16(v: Int): Seq[Int] = Seq((v >> 8) & 0xff, v & 0xff)

  /** Annex K luminance DC BITS/VALS and the fixture's minimal AC
    * table, restated here independently. */
  private val dcBits = Seq(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = 0 to 11
  private val acBits = Seq(0, 2, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val acVals = Seq(0x00, 0x01, 0x02, 0x11, 0xf0)

  private def handJpeg(entropy: Seq[Int], w: Int = 8, h: Int = 8,
      sofMarker: Int = 0xc0, dqtPrecision: Int = 0): Array[Byte] = {
    val qtBody = Seq(dqtPrecision << 4) ++ (0 until 64).map(k =>
      if (k == 0) 8 else 16)
    val dqtLen = if (dqtPrecision == 0) 2 + 65 else 2 + 129
    val qtBytes = if (dqtPrecision == 0) qtBody
      else Seq(dqtPrecision << 4) ++ (0 until 64).flatMap(k =>
        u16(if (k == 0) 8 else 16))
    val seq = Seq(0xff, 0xd8) ++
      Seq(0xff, 0xdb) ++ u16(dqtLen) ++ qtBytes ++
      Seq(0xff, sofMarker) ++ u16(11) ++ Seq(8) ++ u16(h) ++ u16(w) ++
      Seq(1, 1, 0x11, 0) ++
      Seq(0xff, 0xc4) ++ u16(2 + 17 + 12) ++ Seq(0x00) ++ dcBits ++ dcVals ++
      Seq(0xff, 0xc4) ++ u16(2 + 17 + 5) ++ Seq(0x10) ++ acBits ++ acVals ++
      Seq(0xff, 0xda) ++ u16(8) ++ Seq(1, 1, 0x00, 0, 63, 0) ++
      entropy ++ Seq(0xff, 0xd9)
    seq.map(_.toByte).toArray
  }

  test("hand-packed DC-only block decodes to its constant value") {
    // Annex K DC cat3 code = 100, magnitude bits 101 (=5), then the
    // minimal-table EOB (00): 100 101 00 = 0x94 exactly one byte.
    // dequant dc = 5*8 = 40, idct -> 40/8 + 128 = 133 everywhere.
    val img = JpegCodec.parseJpegRaster(handJpeg(Seq(0x94))).get
    assert(img.width == 8 && img.height == 8 && img.channels == 1)
    assert(img.raster.forall(b => (b & 0xff) == 133))
  }

  test("negative DC difference uses the ones-complement convention") {
    // cat3 code = 100, diff = -5 encoded as bits 010 (= -5 + 7), EOB
    // 00: 100 010 00 = 0x88. dc = -5, pixel = -5 + 128 = 123.
    val img = JpegCodec.parseJpegRaster(handJpeg(Seq(0x88))).get
    assert(img.raster.forall(b => (b & 0xff) == 123))
  }

  test("progressive SOF2 and 16-bit DQT take the DLT arm") {
    assert(JpegCodec.parseJpegRaster(
      handJpeg(Seq(0x94), sofMarker = 0xc2)).isEmpty)
    assert(JpegCodec.parseJpegRaster(
      handJpeg(Seq(0x94), dqtPrecision = 1)).isEmpty)
  }

  test("truncation anywhere fails closed") {
    val full = handJpeg(Seq(0x94))
    Seq(1, 3, 20, 70, 90, full.length - 3).foreach { n =>
      assert(JpegCodec.parseJpegRaster(
        java.util.Arrays.copyOf(full, n)).isEmpty, s"prefix $n")
    }
  }

  // ----- encoder round trips

  private def grayBlock(id: Long)(bx: Int, by: Int): Int =
    ((id * 7 + bx * 29 + by * 53) % 256).toInt

  test("gray round trip across sizes, edge blocks and DC chains") {
    for (id <- 0L to 12L) {
      val w = 9 + (id % 14).toInt
      val h = 6 + (id % 11).toInt
      val bytes = JpegCodec.jpegBaselineBytes(w, h, 0, grayBlock(id))
      val img = JpegCodec.parseJpegRaster(bytes).get
      assert(img.width == w && img.height == h && img.channels == 1)
      for (y <- 0 until h; x <- 0 until w) {
        assert((img.raster(y * w + x) & 0xff) == grayBlock(id)(x / 8, y / 8),
          s"id=$id ($x,$y)")
      }
    }
  }

  test("restart markers: DC predictors reset, indices cycle mod 8") {
    // 22x16 = 3x2 blocks = 6 MCUs with interval 1 -> 5 RSTs (cycle
    // exercised); values chosen so every diff sign appears
    val w = 22; val h = 16
    val bytes = JpegCodec.jpegBaselineBytes(w, h, 0, grayBlock(5L),
      restartInterval = 1)
    val img = JpegCodec.parseJpegRaster(bytes).get
    for (y <- 0 until h; x <- 0 until w)
      assert((img.raster(y * w + x) & 0xff) == grayBlock(5L)(x / 8, y / 8))
    // a flipped restart index must fail closed, not resync
    val idx = bytes.indexOfSlice(Seq(0xff.toByte, 0xd1.toByte))
    assert(idx > 0)
    val bad = bytes.clone()
    bad(idx + 1) = 0xd4.toByte
    assert(JpegCodec.parseJpegRaster(bad).isEmpty)
  }

  test("4:4:4 and 4:2:0 round trips match the oracle's pixel formula") {
    for (id <- 2L to 9L) {
      val w = 10 + (id % 13).toInt
      val h = 7 + (id % 10).toInt
      val mode = if (id % 2 == 0) 1 else 2
      val cd = if (mode == 1) 8 else 16
      def yB(bx: Int, by: Int) = ((id * 11 + bx * 37 + by * 61) % 256).toInt
      def cbB(cx: Int, cy: Int) = ((id * 5 + cx * 19 + cy * 43) % 256).toInt
      def crB(cx: Int, cy: Int) = ((id * 3 + cx * 23 + cy * 31) % 256).toInt
      val bytes = JpegCodec.jpegBaselineBytes(w, h, mode, yB, cbB, crB)
      val img = JpegCodec.parseJpegRaster(bytes).get
      assert(img.width == w && img.height == h && img.channels == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (er, eg, eb) = JpegCodec.ycbcrToRgb(
          yB(x / 8, y / 8), cbB(x / cd, y / cd), crB(x / cd, y / cd))
        val o = (y * w + x) * 3
        assert((img.raster(o) & 0xff) == er, s"id=$id R ($x,$y)")
        assert((img.raster(o + 1) & 0xff) == eg, s"id=$id G ($x,$y)")
        assert((img.raster(o + 2) & 0xff) == eb, s"id=$id B ($x,$y)")
      }
    }
  }

  // ----- AC path against an independent reference IDCT

  /** Independent zigzag + direct 2-D IDCT (double sums, no
    * separability) — a different formulation than the production
    * separable pass, so an algebra slip there fails here. */
  private val zz: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private def referencePixels(coefZigzag: Array[Int]): Array[Int] = {
    val f = new Array[Double](64)
    for (k <- 0 until 64)
      f(zz(k)) = coefZigzag(k).toDouble * (if (k == 0) 8 else 16)
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv * f(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      val px = math.round(s / 4.0 + 128.0).toInt
      out(y * 8 + x) = math.max(0, math.min(255, px))
    }
    out
  }

  test("AC-bearing blocks match the independent reference IDCT") {
    val cases = Seq(
      Array(-9, 3, -1, 0, 1) ++ Array.fill(59)(0), // runs 0 and 1
      Array(40, -3, 2, 1, -1) ++ Array.fill(59)(0),
      Array(0) ++ Array.fill(16)(0) ++ Array(-2) ++ Array.fill(46)(0)) // ZRL
    cases.foreach { coef =>
      val img = JpegCodec.parseJpegRaster(
        JpegCodec.jpegGraySingleBlock(coef)).get
      val ref = referencePixels(coef)
      for (i <- 0 until 64)
        assert((img.raster(i) & 0xff) == ref(i),
          s"coef=${coef.take(6).mkString(",")} i=$i")
    }
  }

  test("fixed-point color transform obeys the floor-division law") {
    for (y <- Seq(0, 1, 77, 128, 254, 255); c1 <- Seq(0, 64, 128, 200, 255);
        c2 <- Seq(0, 50, 128, 255)) {
      val (r, g, b) = JpegCodec.ycbcrToRgb(y, c1, c2)
      def law(num: Long): Int =
        math.max(0L, math.min(255L,
          math.floor(num.toDouble / 65536.0).toLong)).toInt
      assert(r == law(y.toLong * 65536 + 91881L * (c2 - 128) + 32768))
      assert(g == law(y.toLong * 65536 - 22554L * (c1 - 128) -
        46802L * (c2 - 128) + 32768))
      assert(b == law(y.toLong * 65536 + 116130L * (c1 - 128) + 32768))
    }
  }

  test("fuzz: no byte sequence makes parseJpegRaster throw — the " +
    "entropy decoder (Huffman walk, restart markers, MCU indexing) " +
    "must fail closed on corrupt crawls, never crash the executor") {
    val rnd = new java.util.Random(11)
    val valid = JpegCodec.jpegBaselineBytes(13, 9, 0, grayBlock(3L))
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(160)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      JpegCodec.parseJpegRaster(b) // must return, never throw
      // valid prefix + random tail: mid-scan truncation/garbage
      val cut = rnd.nextInt(valid.length)
      JpegCodec.parseJpegRaster((valid.take(cut) ++ b).toArray)
      // single-byte corruption inside a valid file: flips Huffman
      // codes, quant values, marker lengths, dimensions
      val mut = valid.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      JpegCodec.parseJpegRaster(mut)
    }
  }
}
