package graft.operators

/** REAL baseline-JPEG entropy decode (r7 continuation — removes the
  * last "genuinely blocked by missing codec libs" claim: baseline
  * JPEG (ITU-T T.81) is Huffman coding + dequantization + an 8×8
  * IDCT, all pure algorithms needing no library at all).
  *
  * Decoder surface:
  *  - marker walk: SOI, DQT (8-bit precision), DHT (canonical code
  *    construction per Annex C), SOF0 (baseline sequential ONLY —
  *    progressive/arithmetic frames take the DLT arm), DRI, SOS.
  *  - entropy-coded segment: MSB-first bit reader with 0xFF00
  *    unstuffing; restart markers RST0–7 every DRI MCUs (byte
  *    re-alignment + DC-predictor reset, Annex B.2.1.2/E.2.4).
  *  - per data unit: DC category decode + EXTEND (Annex F.2.2.1),
  *    AC run/size loop with EOB and ZRL (F.2.2.2), zigzag
  *    de-serialization, per-coefficient dequantization, separable
  *    floating IDCT (A.3.3) with round + level shift + clamp.
  *  - components: grayscale (1), or YCbCr 3-component in 4:4:4
  *    (all 1×1) or 4:2:0 (Y 2×2, chroma 1×1) MCU interleave;
  *    chroma upsampled by pixel replication (JFIF §4), then the
  *    FIXED-POINT YCbCr→RGB transform below. Other sampling
  *    combinations → None.
  *
  * Exactness contract (what lets a LOSSY format be hash-pinned by a
  * DuckDB oracle that never sees the file): fixtures quantize DC
  * with step 8, and every 8×8 block is constant-valued, so the
  * forward DC is exactly 8·(v−128), the quantized coefficient is
  * exactly v−128, and the DC-only IDCT reproduces v bit-exactly.
  * The decoder is still a COMPLETE baseline decoder — a wrong
  * Huffman table, a missed restart, a bad zigzag index, or a broken
  * IDCT all destroy the position-weighted checksum. AC-bearing
  * blocks are exercised in JpegCodecSpec against an independent
  * reference IDCT (they cannot be DuckDB-pinned, being lossy).
  *
  * The YCbCr→RGB transform is integer-only so the oracle can restate
  * it verbatim:
  *   r = clamp(floorDiv(y·65536 + 91881·(cr−128) + 32768, 65536))
  *   g = clamp(floorDiv(y·65536 − 22554·(cb−128) − 46802·(cr−128)
  *             + 32768, 65536))
  *   b = clamp(floorDiv(y·65536 + 116130·(cb−128) + 32768, 65536))
  * (JFIF §7 coefficients scaled by 2^16; floorDiv — NOT truncating
  * division — so both sides agree on negative numerators.)
  */
object JpegCodec {

  final case class JpegImage(width: Int, height: Int, channels: Int,
      raster: Array[Byte])

  /** Zigzag order: zigzag(k) = raster index of the k-th transmitted
    * coefficient (T.81 Figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 luminance DC table: BITS (#codes of length 1..16)
    * then HUFFVAL (category 0..11). */
  private val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray

  /** Minimal AC table the fixtures encode with: EOB, (0,1), (0,2),
    * (1,1), ZRL — enough for EOB-only declared fixtures plus the
    * AC-bearing spec fixtures. The DECODER builds whatever table the
    * file declares; this literal only feeds the encoder's DHT. */
  private val AcBits: Array[Int] =
    Array(0, 2, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Int] = Array(0x00, 0x01, 0x02, 0x11, 0xf0)

  /** Canonical code assignment (Annex C): codes of each length are
    * consecutive, starting from (prev_start + prev_count) << 1. */
  private def canonicalCodes(bits: Array[Int]): Array[(Int, Int)] = {
    // returns (code, length) per value, in HUFFVAL order
    val out = Array.newBuilder[(Int, Int)]
    var code = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) { out += ((code, len)); code += 1; i += 1 }
      code <<= 1
      len += 1
    }
    out.result()
  }

  /** Decode-side table: per code length, (minCode, maxCode, valPtr)
    * per Annex F.2.2.3 DECODE. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  // ---------------------------------------------------------------
  // Encoder (fixture side)
  // ---------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(bitsVal: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bitsVal >> i) & 1)
        n += 1
        if (n == 8) flushByte()
        i -= 1
      }
    }
    private def flushByte(): Unit = {
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing (B.1.1.5)
      acc = 0; n = 0
    }
    /** Pad the final partial byte with 1-bits (B.1.1.5). */
    def align(): Unit = { if (n > 0) { put(0xff, 8 - n) } }
  }

  private def u16be(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }

  private def dqtSegment(o: java.io.ByteArrayOutputStream, tq: Int): Unit = {
    o.write(0xff); o.write(0xdb); u16be(o, 2 + 1 + 64)
    o.write(tq) // Pq=0 (8-bit) | Tq
    // zigzag-order table: DC step 8 (exactness contract), AC step 16
    var k = 0
    while (k < 64) { o.write(if (k == 0) 8 else 16); k += 1 }
  }

  private def dhtSegment(o: java.io.ByteArrayOutputStream, tcTh: Int,
      bits: Array[Int], vals: Array[Int]): Unit = {
    o.write(0xff); o.write(0xc4); u16be(o, 2 + 1 + 16 + vals.length)
    o.write(tcTh)
    bits.foreach(o.write)
    vals.foreach(o.write)
  }

  /** Category (SSSS) of a DC difference per F.1.2.1.1. */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode one quantized-DC-only data unit: DC diff + EOB. */
  private def putDcOnly(bw: BitWriter, dcCodes: Array[(Int, Int)],
      acCodes: Array[(Int, Int)], diff: Int): Unit = {
    val s = category(diff)
    val (c, l) = dcCodes(s)
    bw.put(c, l)
    if (s > 0) {
      val bitsVal = if (diff >= 0) diff else diff + (1 << s) - 1
      bw.put(bitsVal, s)
    }
    val (ec, el) = acCodes(0) // EOB == AcVals(0)
    bw.put(ec, el)
  }

  /** mode: 0 = grayscale, 1 = YCbCr 4:4:4, 2 = YCbCr 4:2:0.
    * blockY/(blockCb,blockCr) give the CONSTANT sample value of each
    * 8×8 block at its component-grid coordinates; restartInterval
    * (MCUs) > 0 emits DRI + RSTn markers. All blocks are DC-only so
    * the decode is exact (see object scaladoc). */
  def jpegBaselineBytes(w: Int, h: Int, mode: Int,
      blockY: (Int, Int) => Int,
      blockCb: (Int, Int) => Int = (_, _) => 128,
      blockCr: (Int, Int) => Int = (_, _) => 128,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && mode >= 0 && mode <= 2)
    val o = new java.io.ByteArrayOutputStream()
    o.write(0xff); o.write(0xd8) // SOI
    dqtSegment(o, 0)
    if (mode > 0) dqtSegment(o, 1)
    // SOF0
    val nComp = if (mode == 0) 1 else 3
    o.write(0xff); o.write(0xc0); u16be(o, 8 + 3 * nComp)
    o.write(8); u16be(o, h); u16be(o, w); o.write(nComp)
    val ySamp = if (mode == 2) 0x22 else 0x11
    o.write(1); o.write(ySamp); o.write(0)
    if (mode > 0) {
      o.write(2); o.write(0x11); o.write(1)
      o.write(3); o.write(0x11); o.write(1)
    }
    dhtSegment(o, 0x00, DcBits, DcVals)
    dhtSegment(o, 0x10, AcBits, AcVals)
    if (mode > 0) {
      dhtSegment(o, 0x01, DcBits, DcVals)
      dhtSegment(o, 0x11, AcBits, AcVals)
    }
    if (restartInterval > 0) {
      o.write(0xff); o.write(0xdd); u16be(o, 4); u16be(o, restartInterval)
    }
    // SOS
    o.write(0xff); o.write(0xda); u16be(o, 6 + 2 * nComp)
    o.write(nComp)
    o.write(1); o.write(0x00)
    if (mode > 0) { o.write(2); o.write(0x11); o.write(3); o.write(0x11) }
    o.write(0); o.write(63); o.write(0)
    // entropy-coded data
    val dcCodes = canonicalCodes(DcBits)
    val acCodes = canonicalCodes(AcBits)
    val bw = new BitWriter(o)
    val mcuW = if (mode == 2) 16 else 8
    val mcuH = if (mode == 2) 16 else 8
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    var predY = 0; var predCb = 0; var predCr = 0
    var rstCount = 0; var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && rstCount == restartInterval) {
          bw.align()
          o.write(0xff); o.write(0xd0 + (rstIdx % 8))
          rstIdx += 1; rstCount = 0
          predY = 0; predCb = 0; predCr = 0
        }
        if (mode == 2) {
          // four Y blocks raster order inside the MCU (A.2.3)
          var by = 0
          while (by < 2) {
            var bx = 0
            while (bx < 2) {
              val v = blockY(mx * 2 + bx, my * 2 + by) & 0xff
              putDcOnly(bw, dcCodes, acCodes, (v - 128) - predY)
              predY = v - 128
              bx += 1
            }
            by += 1
          }
          val cb = blockCb(mx, my) & 0xff
          putDcOnly(bw, dcCodes, acCodes, (cb - 128) - predCb)
          predCb = cb - 128
          val cr = blockCr(mx, my) & 0xff
          putDcOnly(bw, dcCodes, acCodes, (cr - 128) - predCr)
          predCr = cr - 128
        } else {
          val v = blockY(mx, my) & 0xff
          putDcOnly(bw, dcCodes, acCodes, (v - 128) - predY)
          predY = v - 128
          if (mode == 1) {
            val cb = blockCb(mx, my) & 0xff
            putDcOnly(bw, dcCodes, acCodes, (cb - 128) - predCb)
            predCb = cb - 128
            val cr = blockCr(mx, my) & 0xff
            putDcOnly(bw, dcCodes, acCodes, (cr - 128) - predCr)
            predCr = cr - 128
          }
        }
        rstCount += 1
        mx += 1
      }
      my += 1
    }
    bw.align()
    o.write(0xff); o.write(0xd9) // EOI
    o.toByteArray
  }

  /** Spec-side encoder hook: a raw quantized-coefficient data unit
    * (zigzag order) so JpegCodecSpec can craft AC-bearing blocks the
    * declared fixtures never use. Gray single-block image only. */
  def jpegGraySingleBlock(coefZigzag: Array[Int]): Array[Byte] = {
    require(coefZigzag.length == 64)
    val o = new java.io.ByteArrayOutputStream()
    o.write(0xff); o.write(0xd8)
    dqtSegment(o, 0)
    o.write(0xff); o.write(0xc0); u16be(o, 11)
    o.write(8); u16be(o, 8); u16be(o, 8); o.write(1)
    o.write(1); o.write(0x11); o.write(0)
    dhtSegment(o, 0x00, DcBits, DcVals)
    dhtSegment(o, 0x10, AcBits, AcVals)
    o.write(0xff); o.write(0xda); u16be(o, 8)
    o.write(1); o.write(1); o.write(0x00)
    o.write(0); o.write(63); o.write(0)
    val dcCodes = canonicalCodes(DcBits)
    val acCodes = canonicalCodes(AcBits)
    val bw = new BitWriter(o)
    // DC
    val dc = coefZigzag(0)
    val s = category(dc)
    val (c, l) = dcCodes(s)
    bw.put(c, l)
    if (s > 0) bw.put(if (dc >= 0) dc else dc + (1 << s) - 1, s)
    // AC: encode with the minimal table — only runs expressible as
    // (0,1),(0,2),(1,1),ZRL sequences; spec fixtures stay within it
    var k = 1
    while (k < 64) {
      var run = 0
      while (k < 64 && coefZigzag(k) == 0) { run += 1; k += 1 }
      if (k == 64) {
        val (ec, el) = acCodes(0); bw.put(ec, el) // EOB
      } else {
        while (run >= 16) {
          val (zc, zl) = acCodes(4); bw.put(zc, zl); run -= 16 // ZRL
        }
        val v = coefZigzag(k)
        val sz = category(v)
        val rs = (run << 4) | sz
        val idx = AcVals.indexOf(rs)
        require(idx >= 0, s"run/size $rs not in the minimal AC table")
        val (ac, al) = acCodes(idx)
        bw.put(ac, al)
        bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
        k += 1
      }
    }
    bw.align()
    o.write(0xff); o.write(0xd9)
    o.toByteArray
  }

  // ---------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var hitMarker = false
    /** −1 on truncation; markers (other than stuffing) stop the
      * stream and set hitMarker. */
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) return -1
        var byte0 = b(pos) & 0xff
        pos += 1
        if (byte0 == 0xff) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else { hitMarker = true; pos -= 1; return -1 }
        }
        acc = byte0; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) {
        val x = bit(); if (x < 0) return Int.MinValue
        v = (v << 1) | x; i += 1
      }
      v
    }
    /** Drop to the next byte boundary (restart alignment). */
    def align(): Unit = { n = 0; hitMarker = false }
  }

  private def huffDecode(br: BitReader, t: HuffTable): Int = {
    var code = 0
    var l = 1
    while (l <= 16) {
      val x = br.bit(); if (x < 0) return -1
      code = (code << 1) | x
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) {
        if (code < t.minCode(l)) return -1
        return t.values(t.valPtr(l) + code - t.minCode(l))
      }
      l += 1
    }
    -1
  }

  /** EXTEND (F.2.2.1): map the magnitude bits to a signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0
    else if (v < (1 << (s - 1))) v - (1 << s) + 1
    else v

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Separable floating IDCT (A.3.3) with rounding, level shift and
    * clamp; exact for DC-only blocks. `coef` is in natural (raster)
    * order, already dequantized. */
  private def idct(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    val invSqrt2 = 1.0 / math.sqrt(2.0)
    // rows: for each y, inverse over u
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) invSqrt2 else 1.0
          s += cu * coef(y * 8 + u) * CosTable(x * 8 + u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) invSqrt2 else 1.0
          s += cv * tmp(v * 8 + x) * CosTable(yy * 8 + v)
          v += 1
        }
        val px = math.round(s / 2.0 + 128.0).toInt
        out(yy * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        yy += 1
      }
      x += 1
    }
    out
  }

  private def clamp255(v: Long): Int =
    if (v < 0L) 0 else if (v > 255L) 255 else v.toInt

  /** The fixed-point color transform the oracle restates (object
    * scaladoc). */
  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val r = clamp255(math.floorDiv(
      y.toLong * 65536 + 91881L * (cr - 128) + 32768, 65536))
    val g = clamp255(math.floorDiv(
      y.toLong * 65536 - 22554L * (cb - 128) - 46802L * (cr - 128) + 32768,
      65536))
    val b = clamp255(math.floorDiv(
      y.toLong * 65536 + 116130L * (cb - 128) + 32768, 65536))
    (r, g, b)
  }

  private final case class Component(id: Int, hSamp: Int, vSamp: Int,
      tq: Int, var td: Int = 0, var ta: Int = 0)

  /** Full baseline decode; None (the DLT arm) on: non-baseline frame,
    * 16-bit quant tables, unsupported sampling, truncated entropy
    * data, bad Huffman code, missing/mismatched restart marker,
    * or any bounds violation. */
  def parseJpegRaster(b: Array[Byte]): Option[JpegImage] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    val qt = Array.ofDim[Int](4, 64) // zigzag order as read
    val qtSeen = new Array[Boolean](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var w = 0; var h = 0
    var comps: Array[Component] = null
    var dri = 0
    var i = 2
    def u16(at: Int): Int =
      if (at + 1 >= b.length) -1
      else ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var j = i
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0xd9) return None // EOI before SOS
      val len = u16(j + 1)
      if (len < 2 || j + 1 + len > b.length) return None
      val seg = j + 3 // first payload byte
      val segEnd = j + 1 + len
      marker match {
        case 0xdb => // DQT — possibly several tables per segment
          var p = seg
          while (p < segEnd) {
            val pqTq = b(p) & 0xff
            if ((pqTq >> 4) != 0) return None // 16-bit precision
            val tq = pqTq & 0x0f
            if (tq > 3 || p + 65 > segEnd) return None
            var k = 0
            while (k < 64) { qt(tq)(k) = b(p + 1 + k) & 0xff; k += 1 }
            qtSeen(tq) = true
            p += 65
          }
        case 0xc4 => // DHT — possibly several tables per segment
          var p = seg
          while (p < segEnd) {
            if (p + 17 > segEnd) return None
            val tcTh = b(p) & 0xff
            val tc = tcTh >> 4; val th = tcTh & 0x0f
            if (tc > 1 || th > 3) return None
            val bits = new Array[Int](16)
            var total = 0
            var k = 0
            while (k < 16) {
              bits(k) = b(p + 1 + k) & 0xff; total += bits(k); k += 1
            }
            if (total == 0 || total > 256 || p + 17 + total > segEnd)
              return None
            val vals = new Array[Int](total)
            k = 0
            while (k < total) { vals(k) = b(p + 17 + k) & 0xff; k += 1 }
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            p += 17 + total
          }
        case 0xc0 => // SOF0 baseline
          if (len < 8) return None
          val prec = b(seg) & 0xff
          if (prec != 8) return None
          h = u16(seg + 1); w = u16(seg + 3)
          val n = b(seg + 5) & 0xff
          if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) return None
          if (n != 1 && n != 3) return None
          if (len != 8 + 3 * n) return None
          comps = new Array[Component](n)
          var k = 0
          while (k < n) {
            val cid = b(seg + 6 + 3 * k) & 0xff
            val samp = b(seg + 7 + 3 * k) & 0xff
            val tq = b(seg + 8 + 3 * k) & 0xff
            if (tq > 3) return None
            comps(k) = Component(cid, samp >> 4, samp & 0x0f, tq)
            k += 1
          }
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
          return None // progressive / extended / arithmetic — DLT arm
        case 0xdd => // DRI
          if (len != 4) return None
          dri = u16(seg)
        case 0xda => // SOS — scan header then entropy data
          if (comps == null) return None
          val ns = b(seg) & 0xff
          if (ns != comps.length || len != 6 + 2 * ns) return None
          var k = 0
          while (k < ns) {
            val cid = b(seg + 1 + 2 * k) & 0xff
            val tdTa = b(seg + 2 + 2 * k) & 0xff
            val c = comps.find(_.id == cid).getOrElse(return None)
            c.td = tdTa >> 4; c.ta = tdTa & 0x0f
            if (c.td > 3 || c.ta > 3) return None
            k += 1
          }
          return decodeScan(b, segEnd, w, h, comps, qt, qtSeen, dcT, acT,
            dri)
        case _ => // APPn / COM / others: skip
      }
      i = j + 1 + len
    }
    None
  }

  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Component], qt: Array[Array[Int]],
      qtSeen: Array[Boolean], dcT: Array[HuffTable],
      acT: Array[HuffTable], dri: Int): Option[JpegImage] = {
    // supported sampling: all-1×1 (gray or 4:4:4) or Y 2×2 + chroma 1×1
    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    val is420 = comps.length == 3 && comps(0).hSamp == 2 &&
      comps(0).vSamp == 2 && comps.drop(1).forall(c =>
        c.hSamp == 1 && c.vSamp == 1)
    val all11 = comps.forall(c => c.hSamp == 1 && c.vSamp == 1)
    if (!is420 && !all11) return None
    comps.foreach { c =>
      if (!qtSeen(c.tq)) return None
      if (dcT(c.td) == null || acT(c.ta) == null) return None
    }
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // per-component plane at sampled resolution (padded to MCU grid)
    val planeW = comps.map(c => mcusX * c.hSamp * 8)
    val planeH = comps.map(c => mcusY * c.vSamp * 8)
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * planeH(ci))).toArray
    val br = new BitReader(b, start)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    var rstIdx = 0
    var mcuCount = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcuCount == dri) {
          // byte-align and consume the expected RSTn (E.2.4)
          br.align()
          var p = br.pos
          // skip any fill 0xFFs before the marker byte
          if (p + 1 >= b.length || (b(p) & 0xff) != 0xff) return None
          while (p < b.length && (b(p) & 0xff) == 0xff) p += 1
          if (p >= b.length) return None
          val m = b(p) & 0xff
          if (m != 0xd0 + (rstIdx % 8)) return None
          rstIdx += 1
          br.pos = p + 1
          java.util.Arrays.fill(pred, 0)
          mcuCount = 0
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var byi = 0
          while (byi < c.vSamp) {
            var bxi = 0
            while (bxi < c.hSamp) {
              java.util.Arrays.fill(coef, 0)
              // DC
              val t = huffDecode(br, dcT(c.td))
              if (t < 0 || t > 15) return None
              val dv = br.receive(t)
              if (dv == Int.MinValue) return None
              val diff = extend(dv, t)
              pred(ci) += diff
              coef(0) = pred(ci) * qt(c.tq)(0)
              // AC
              var k = 1
              var done = false
              while (!done && k < 64) {
                val rs = huffDecode(br, acT(c.ta))
                if (rs < 0) return None
                val r = rs >> 4; val s = rs & 0x0f
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else done = true // EOB
                } else {
                  k += r
                  if (k > 63) return None
                  val av = br.receive(s)
                  if (av == Int.MinValue) return None
                  coef(Zigzag(k)) = extend(av, s) * qt(c.tq)(k)
                  k += 1
                }
              }
              val px = idct(coef)
              // place into the component plane
              val ox = (mx * c.hSamp + bxi) * 8
              val oy = (my * c.vSamp + byi) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(ci)((oy + yy) * planeW(ci) + ox + xx) =
                    px(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bxi += 1
            }
            byi += 1
          }
          ci += 1
        }
        mcuCount += 1
        mx += 1
      }
      my += 1
    }
    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = planes(0)(y * planeW(0) + x).toByte
          x += 1
        }
        y += 1
      }
      Some(JpegImage(w, h, 1, out))
    } else {
      // chroma replication upsample (JFIF §4): sample (x/sx, y/sy)
      val out = new Array[Byte](w * h * 3)
      val sx = comps(0).hSamp // 1 (4:4:4) or 2 (4:2:0)
      val sy = comps(0).vSamp
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = planes(0)(y * planeW(0) + x)
          val cb = planes(1)((y / sy) * planeW(1) + (x / sx))
          val cr = planes(2)((y / sy) * planeW(2) + (x / sx))
          val (r, g, bb) = ycbcrToRgb(yv, cb, cr)
          val o = (y * w + x) * 3
          out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = bb.toByte
          x += 1
        }
        y += 1
      }
      Some(JpegImage(w, h, 3, out))
    }
  }
}
