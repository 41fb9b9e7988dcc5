package graft.operators

/** REAL header-level image decode (r5 — closes the "declared stub"
  * caveat on the multimodal family): parses actual PNG / JPEG / PNM
  * byte layouts for (format, width, height, channels). This is the
  * honest version of the decode contract the container's missing
  * codec libraries kept stubbed — header sniffing needs no codec, it
  * is pure byte-format knowledge:
  *
  *  - PNG (spec: PNG 2nd ed., ISO/IEC 15948): 8-byte signature
  *    89 50 4E 47 0D 0A 1A 0A, then the IHDR chunk (must be first):
  *    4-byte big-endian length (13), "IHDR", width u32BE, height
  *    u32BE, bit-depth u8, color-type u8 (0 gray, 2 RGB, 3 palette,
  *    4 gray+alpha, 6 RGBA → 1/3/1/2/4 channels).
  *  - JPEG (ITU-T T.81): SOI FF D8, then a marker walk — each segment
  *    is FF marker u16BE-length(payload incl. itself); the frame
  *    header SOFn (C0–CF minus C4/C8/CC) carries precision u8,
  *    height u16BE, width u16BE, component-count u8 (= channels).
  *    Fill bytes (repeated FF) before a marker are legal and skipped.
  *  - PNM (netpbm): "P5" (graymap, 1 channel) / "P6" (pixmap, 3),
  *    then whitespace-separated ASCII width, height, maxval, with
  *    '#'-to-end-of-line comments allowed between tokens.
  *
  * Unknown/truncated/corrupt headers → None (the route-to-DLT arm of
  * the decode operator). Everything is row-local: the parser runs
  * inside the existing mapPartitions batch contract, so decode
  * parallelism remains the input partitioning. */
object ImageCodec {

  final case class ImageMeta(format: String, width: Long, height: Long,
      channels: Long)

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private val PngSig: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  def parseHeader(bytes: Array[Byte]): Option[ImageMeta] =
    parsePng(bytes).orElse(parseJpeg(bytes)).orElse(parsePnm(bytes))

  private def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 26) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != PngSig(i)) return None; i += 1 }
    // first chunk must be IHDR with length 13
    if (u32(b, 8) != 13L) return None
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = u32(b, 16)
    val h = u32(b, 20)
    val channels = (b(25) & 0xff) match {
      case 0 => 1L // greyscale
      case 2 => 3L // truecolor
      case 3 => 1L // indexed (one palette index per pixel)
      case 4 => 2L // grey + alpha
      case 6 => 4L // RGBA
      case _ => return None
    }
    if (w <= 0 || h <= 0) None
    else Some(ImageMeta("png", w, h, channels))
  }

  private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      // fill bytes before a marker are legal
      if ((b(i) & 0xff) != 0xff) return None
      var j = i
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS first
      if (j + 2 >= b.length) return None
      val len = u16(b, j + 1)
      if (len < 2) return None
      val isSof = marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc
      if (isSof) {
        if (j + 8 >= b.length) return None
        val h = u16(b, j + 4) // after len(2) + precision(1)
        val w = u16(b, j + 6)
        val comps = b(j + 8) & 0xffL
        return if (w > 0 && h > 0 && comps > 0)
          Some(ImageMeta("jpeg", w.toLong, h.toLong, comps)) else None
      }
      i = j + 1 + len
    }
    None
  }

  private def parsePnm(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 2 || b(0) != 'P') return None
    val channels = b(1) match {
      case '5' => 1L
      case '6' => 3L
      case _ => return None
    }
    // whitespace-separated ASCII ints, '#' comments run to end-of-line
    var i = 2
    def nextInt(): Long = {
      while (i < b.length &&
        (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t' ||
          b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      var v = -1L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = (if (v < 0) 0L else v) * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w > 0 && h > 0 && maxval > 0)
      Some(ImageMeta(if (channels == 1) "pgm" else "ppm", w, h, channels))
    else None
  }

  // ---------------------------------------------------------------
  // Deterministic format-correct payload generators (test fixtures:
  // the container ships no image files, so the fixtures are built to
  // the same published byte layouts the parser reads — while the
  // ORACLE pins the expected dimensions from doc_id literals, so a
  // parser bug cannot self-confirm).
  // ---------------------------------------------------------------

  def pngBytes(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(out.write)
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be32(13); out.write('I'); out.write('H'); out.write('D'); out.write('R')
    be32(w.toLong); be32(h.toLong)
    out.write(8) // bit depth
    out.write(colorType)
    out.write(0); out.write(0); out.write(0) // compression/filter/interlace
    be32(0) // CRC (not validated by header sniffers)
    // empty IEND chunk for structural plausibility
    be32(0); out.write('I'); out.write('E'); out.write('N'); out.write('D')
    be32(0)
    out.toByteArray
  }

  def jpegBytes(w: Int, h: Int, nComp: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def be16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xff); b(0xd8) // SOI
    // APP0/JFIF segment (the typical first segment a real encoder writes)
    b(0xff); b(0xe0); be16(16)
    "JFIF".foreach(c => b(c)); b(0)
    b(1); b(1); b(0); be16(72); be16(72); b(0); b(0)
    // SOF0 baseline frame header: len = 8 + 3*nComp
    b(0xff); b(0xc0); be16(8 + 3 * nComp)
    b(8) // precision
    be16(h); be16(w); b(nComp)
    (1 to nComp).foreach { c => b(c); b(0x11); b(0) }
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  def pnmBytes(w: Int, h: Int, grayscale: Boolean): Array[Byte] = {
    val header = s"P${if (grayscale) 5 else 6}\n# synthetic fixture\n$w $h\n255\n"
    // a few payload bytes for plausibility (parsers stop at the header)
    (header.getBytes("US-ASCII").toSeq ++ Seq[Byte](1, 2, 3, 4)).toArray
  }

  // ---------------------------------------------------------------
  // REAL pixel-level PNM decode + resize (r6 — closes the pixel-level
  // stub): P5/P6 rasters are UNCOMPRESSED (after the ASCII header the
  // file is exactly width·height·channels bytes, row-major,
  // interleaved channels), so full decode needs no codec library —
  // just the published netpbm byte layout. This is the step the
  // mapInPandas-shaped batch contract in [[Multimodal]] was stubbing.
  // ---------------------------------------------------------------

  /** Fully-decoded PNM image: header metadata + the raw raster
    * (row-major, channel-interleaved, one byte per sample — maxval
    * must be ≤ 255; 2-byte-per-sample PNMs are rejected). */
  final case class PnmImage(format: String, width: Int, height: Int,
      channels: Int, raster: Array[Byte])

  /** Pixel-level P5/P6 decode: header fields as [[parsePnm]], then
    * the raster copied out whole. Truncated raster / maxval > 255 /
    * non-PNM magic → None (the DLT arm). Row-local. */
  def parsePnmRaster(b: Array[Byte]): Option[PnmImage] = {
    if (b.length < 2 || b(0) != 'P') return None
    val channels = b(1) match {
      case '5' => 1
      case '6' => 3
      case _ => return None
    }
    var i = 2
    def nextInt(): Long = {
      while (i < b.length &&
        (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t' ||
          b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      var v = -1L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = (if (v < 0) 0L else v) * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    // exactly ONE whitespace byte separates the maxval from the raster
    if (i >= b.length ||
      !(b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t'))
      return None
    i += 1
    val n = w * h * channels
    if (w > (1 << 15) || h > (1 << 15) || b.length - i < n) return None
    val raster = java.util.Arrays.copyOfRange(b, i, i + n.toInt)
    Some(PnmImage(if (channels == 1) "pgm" else "ppm",
      w.toInt, h.toInt, channels, raster))
  }

  /** 2×2 integer box-filter downsample (the canonical half-resolution
    * resize): each output sample is the FLOOR MEAN (sum div count) of
    * its up-to-2×2 input block per channel; odd edges use 1×2/2×1/1×1
    * blocks. Integer arithmetic end-to-end so the DuckDB oracle can
    * restate it exactly (sum // count — no float rounding to drift).
    * Returns (raster, outW, outH). */
  def boxHalve(raster: Array[Byte], w: Int, h: Int,
      c: Int): (Array[Byte], Int, Int) = {
    val ow = (w + 1) / 2
    val oh = (h + 1) / 2
    val out = new Array[Byte](ow * oh * c)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var ch = 0
        while (ch < c) {
          var sum = 0; var cnt = 0
          var iy = oy * 2
          val yEnd = math.min(oy * 2 + 2, h)
          while (iy < yEnd) {
            var ix = ox * 2
            val xEnd = math.min(ox * 2 + 2, w)
            while (ix < xEnd) {
              sum += raster((iy * w + ix) * c + ch) & 0xff
              cnt += 1
              ix += 1
            }
            iy += 1
          }
          out((oy * ow + ox) * c + ch) = (sum / cnt).toByte
          ch += 1
        }
        ox += 1
      }
      oy += 1
    }
    (out, ow, oh)
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint over a decoded
    * raster, returned as (hi, lo) 32-bit halves so the value stays
    * nonnegative in BOTH engines (a single 64-bit word with bit 63 set
    * goes negative in two's complement, and cross-engine shift
    * semantics at bit 63 are exactly the kind of edge the oracle
    * should not depend on).
    *
    * The classic algorithm (the dHash/aHash family behind every
    * image-dedup pipeline): downsample to an 8×8 grid of floor-mean
    * cells — input pixel (iy, ix) lands in cell (iy·8/h, ix·8/w), RGB
    * collapses to gray = floor(Σ channels / c) FIRST, per pixel — then
    * bit idx (= cy·8+cx) is set iff cell > floor-mean of the 64 cells.
    * Every step is integer floor arithmetic so the DuckDB oracle can
    * restate it exactly. aHash is invariant to global brightness
    * shifts (a constant added to every pixel shifts every cell AND the
    * mean) and to resolution (the 8×8 grid normalizes dims) — which is
    * precisely what makes it a near-dup KEY rather than a checksum.
    * Caller must guarantee w ≥ 8 and h ≥ 8 (every cell nonempty). */
  def averageHash(raster: Array[Byte], w: Int, h: Int, c: Int): (Long, Long) = {
    require(w >= 8 && h >= 8, s"aHash needs w,h >= 8, got ${w}x$h")
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var iy = 0
    while (iy < h) {
      val cy = iy * 8 / h
      var ix = 0
      while (ix < w) {
        val cx = ix * 8 / w
        var s = 0L
        var ch = 0
        while (ch < c) { s += raster((iy * w + ix) * c + ch) & 0xff; ch += 1 }
        val idx = cy * 8 + cx
        cellSum(idx) += s / c
        cellCnt(idx) += 1
        ix += 1
      }
      iy += 1
    }
    val cells = new Array[Long](64)
    var tot = 0L
    var i = 0
    while (i < 64) { cells(i) = cellSum(i) / cellCnt(i); tot += cells(i); i += 1 }
    val mean = tot / 64
    var hi = 0L
    var lo = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  // ---------------------------------------------------------------
  // REAL GIF header decode (r6): GIF87a/GIF89a signature + the
  // Logical Screen Descriptor (width u16LE, height u16LE, packed
  // byte: bit 7 = global-color-table flag, bits 2-0 = table size
  // exponent, palette = 2^(n+1) entries). The version byte and the
  // packed-bit unpacking are the format knowledge being pinned.
  // ---------------------------------------------------------------

  /** GIF header fields: format "gif87"/"gif89", dims, and the global
    * palette size (0 when the GCT flag is clear). */
  final case class GifMeta(format: String, width: Long, height: Long,
      palette: Long)

  def parseGif(b: Array[Byte]): Option[GifMeta] = {
    if (b.length < 13) return None
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8') return None
    val fmt = b(4) match {
      case '7' => "gif87"
      case '9' => "gif89"
      case _ => return None
    }
    if (b(5) != 'a') return None
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    val packed = b(10) & 0xff
    val palette =
      if ((packed & 0x80) != 0) 1L << ((packed & 0x07) + 1) else 0L
    if (w <= 0 || h <= 0) None
    else Some(GifMeta(fmt, w.toLong, h.toLong, palette))
  }

  /** Deterministic GIF fixture: signature + LSD (+ trailer byte). */
  def gifBytes(w: Int, h: Int, version89: Boolean,
      paletteExp: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    s"GIF8${if (version89) '9' else '7'}a".foreach(c => out.write(c))
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    // packed: GCT present iff paletteExp >= 0, size bits = paletteExp
    out.write(if (paletteExp >= 0) 0x80 | (paletteExp & 0x07) else 0x00)
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    if (paletteExp >= 0) {
      val entries = 1 << (paletteExp + 1)
      (0 until entries * 3).foreach(i => out.write(i & 0xff))
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // REAL TIFF header decode (r6): the ENDIANNESS-POLYMORPHIC header
  // family — a TIFF file declares its own byte order ("II" little /
  // "MM" big, TIFF 6.0 §2), so one decoder must read the same IFD
  // structure under both orders. Magic u16 42, first-IFD offset u32,
  // then 12-byte IFD entries (tag u16, type u16, count u32, value
  // u32, SHORT values left-justified in the value field); tags 256 /
  // 257 / 277 carry width / length / samples-per-pixel.
  // ---------------------------------------------------------------

  /** Header-level TIFF decode under either byte order. Returns
    * format "tiff_le" / "tiff_be" so the oracle pins that the
    * decoder actually detected the declared order. Truncated IFDs,
    * bad magic, nonpositive dims → None (the DLT arm). */
  def parseTiff(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 8) return None
    val be =
      if (b(0) == 'M' && b(1) == 'M') true
      else if (b(0) == 'I' && b(1) == 'I') false
      else return None
    def u16at(i: Int): Int =
      if (be) ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
      else ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    def u32at(i: Int): Long =
      if (be) ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      else (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    if (u16at(2) != 42) return None
    val off = u32at(4)
    if (off < 8L || off + 2 > b.length) return None
    val n = u16at(off.toInt)
    var w = -1L; var h = -1L; var spp = 1L
    var k = 0
    while (k < n) {
      val e = off.toInt + 2 + 12 * k
      if (e + 12 > b.length) return None
      val tag = u16at(e)
      val value: Long = u16at(e + 2) match {
        case 3 => u16at(e + 8).toLong // SHORT: first 2 value bytes
        case 4 => u32at(e + 8)        // LONG
        case _ => -1L
      }
      tag match {
        case 256 => w = value
        case 257 => h = value
        case 277 => spp = value
        case _ =>
      }
      k += 1
    }
    if (w > 0 && h > 0 && spp > 0)
      Some(ImageMeta(if (be) "tiff_be" else "tiff_le", w, h, spp))
    else None
  }

  /** Deterministic minimal TIFF fixture in EITHER byte order: header,
    * one IFD at offset 8 with ascending tags 256 (LONG w), 257
    * (LONG h), 277 (SHORT samples), zero next-IFD pointer. */
  def tiffBytes(w: Int, h: Int, samples: Int, bigEndian: Boolean): Array[Byte] = {
    val out = new Array[Byte](8 + 2 + 3 * 12 + 4)
    def w16(i: Int, v: Int): Unit =
      if (bigEndian) { out(i) = (v >> 8).toByte; out(i + 1) = v.toByte }
      else { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def w32(i: Int, v: Long): Unit =
      if (bigEndian) {
        out(i) = (v >> 24).toByte; out(i + 1) = (v >> 16).toByte
        out(i + 2) = (v >> 8).toByte; out(i + 3) = v.toByte
      } else {
        out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
        out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
      }
    out(0) = if (bigEndian) 'M' else 'I'
    out(1) = if (bigEndian) 'M' else 'I'
    w16(2, 42)
    w32(4, 8L) // first IFD right after the header
    w16(8, 3)  // entry count
    def entry(idx: Int, tag: Int, typ: Int, value: Long): Unit = {
      val e = 10 + idx * 12
      w16(e, tag); w16(e + 2, typ); w32(e + 4, 1L)
      if (typ == 3) { w16(e + 8, value.toInt); w16(e + 10, 0) }
      else w32(e + 8, value)
    }
    entry(0, 256, 4, w.toLong)
    entry(1, 257, 4, h.toLong)
    entry(2, 277, 3, samples.toLong)
    w32(10 + 36, 0L) // no next IFD
    out
  }

  // ---------------------------------------------------------------
  // REAL pixel-level TIFF decode (r7): uncompressed (Compression=1)
  // strip-organized rasters under EITHER byte order. Beyond the
  // header walk this pins the two IFD traps the meta parse never
  // touches: a field whose values exceed 4 bytes stores an OFFSET in
  // the value slot instead of the values (TIFF 6.0 §2 "Value
  // Offset") — so BitsPerSample for RGB (3 SHORTs = 6 B) and any
  // multi-strip StripOffsets/StripByteCounts array must be chased —
  // and the raster itself is split across strips of RowsPerStrip
  // rows that must be reassembled in order.
  // ---------------------------------------------------------------

  /** Decoded baseline TIFF: dims/channels + the raster (top-down
    * row-major, channel-interleaved — TIFF's native order, already
    * canonical). format carries the detected byte order. */
  final case class TiffImage(format: String, width: Int, height: Int,
      channels: Int, raster: Array[Byte])

  /** Pixel-level TIFF decode: 8-bit gray (photometric 1) or RGB
    * (photometric 2), Compression = 1 only; strip walk validated
    * row-exactly (each strip must carry rows·w·spp bytes). Anything
    * else — palette, planar config ≠ chunky, 16-bit, compressed,
    * truncated arrays or strips → None (the DLT arm). */
  def parseTiffRaster(b: Array[Byte]): Option[TiffImage] = {
    if (b.length < 8) return None
    val be =
      if (b(0) == 'M' && b(1) == 'M') true
      else if (b(0) == 'I' && b(1) == 'I') false
      else return None
    def u16at(i: Int): Int =
      if (i < 0 || i + 2 > b.length) -1
      else if (be) ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
      else ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    def u32at(i: Int): Long =
      if (i < 0 || i + 4 > b.length) -1L
      else if (be) ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      else (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    if (u16at(2) != 42) return None
    val ifd = u32at(4)
    if (ifd < 8L || ifd + 2 > b.length) return None
    val n = u16at(ifd.toInt)
    if (n <= 0) return None
    // a field's values live inline in the 4-byte slot when they fit,
    // else the slot holds an offset — the §2 Value Offset rule
    def fieldValues(e: Int): Option[Array[Long]] = {
      val typ = u16at(e + 2)
      val count = u32at(e + 4)
      val unit = typ match {
        case 3 => 2 // SHORT
        case 4 => 4 // LONG
        case _ => return None
      }
      if (count <= 0 || count > 65536) return None
      val total = unit * count
      val at = if (total <= 4) e + 8 else u32at(e + 8).toInt
      if (at < 0 || at + total > b.length) return None
      Some(Array.tabulate(count.toInt) { k =>
        if (typ == 3) u16at(at + 2 * k).toLong else u32at(at + 4 * k)
      })
    }
    var w = -1L; var h = -1L; var spp = 1L; var comp = 1L
    var photo = -1L; var rps = 0xffffffffL
    var bits: Array[Long] = Array(1L)
    var stripOffs: Array[Long] = null
    var stripLens: Array[Long] = null
    var k = 0
    while (k < n) {
      val e = ifd.toInt + 2 + 12 * k
      if (e + 12 > b.length) return None
      u16at(e) match {
        case 256 => w = fieldValues(e).flatMap(_.headOption).getOrElse(-1L)
        case 257 => h = fieldValues(e).flatMap(_.headOption).getOrElse(-1L)
        case 258 => bits = fieldValues(e).getOrElse(return None)
        case 259 => comp = fieldValues(e).flatMap(_.headOption).getOrElse(-1L)
        case 262 => photo = fieldValues(e).flatMap(_.headOption).getOrElse(-1L)
        case 273 => stripOffs = fieldValues(e).getOrElse(return None)
        case 277 => spp = fieldValues(e).flatMap(_.headOption).getOrElse(-1L)
        case 278 => rps = fieldValues(e).flatMap(_.headOption).getOrElse(-1L)
        case 279 => stripLens = fieldValues(e).getOrElse(return None)
        case _ =>
      }
      k += 1
    }
    if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) return None
    if (comp != 1L) return None // uncompressed only
    if (spp != 1L && spp != 3L) return None
    if (photo != (if (spp == 1L) 1L else 2L)) return None
    if (bits.length != spp.toInt || bits.exists(_ != 8L)) return None
    if (stripOffs == null || stripLens == null) return None
    if (rps <= 0) return None
    val nStrips = ((h + rps - 1) / rps).toInt
    if (stripOffs.length != nStrips || stripLens.length != nStrips)
      return None
    val c = spp.toInt
    val rowBytes = w.toInt * c
    val out = new Array[Byte](h.toInt * rowBytes)
    var done = 0L
    var s = 0
    while (s < nStrips) {
      val rows = math.min(rps, h - done)
      val expect = rows * rowBytes
      if (stripLens(s) != expect) return None
      val at = stripOffs(s)
      if (at < 0 || at + expect > b.length) return None
      System.arraycopy(b, at.toInt, out, (done * rowBytes).toInt,
        expect.toInt)
      done += rows
      s += 1
    }
    Some(TiffImage(if (be) "tiff_be" else "tiff_le", w.toInt, h.toInt,
      c, out))
  }

  /** Deterministic strip-organized TIFF fixture in EITHER byte order:
    * canonical sample i = pixel(i); the raster is cut into
    * `rowsPerStrip`-row strips with real offset/length arrays, and
    * every >4-byte field (RGB BitsPerSample, multi-strip arrays) is
    * stored via a genuine value-offset — the traps the decoder must
    * chase. */
  def tiffRasterBytes(w: Int, h: Int, rgb: Boolean, bigEndian: Boolean,
      rowsPerStrip: Int, pixel: Int => Int): Array[Byte] = {
    val spp = if (rgb) 3 else 1
    val rowBytes = w * spp
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val nEntries = 9
    val ifdAt = 8
    val dataAt = ifdAt + 2 + nEntries * 12 + 4
    // data area layout: [bits array if rgb][strip offsets if >1]
    // [strip lens if >1][strip data]
    val bitsAt = dataAt
    val bitsLen = if (rgb) 6 else 0
    val offsAt = bitsAt + bitsLen
    val offsLen = if (nStrips > 1) 4 * nStrips else 0
    val lensAt = offsAt + offsLen
    val lensLen = if (nStrips > 1) 4 * nStrips else 0
    val stripsAt = lensAt + lensLen
    val out = new Array[Byte](stripsAt + h * rowBytes)
    def w16(i: Int, v: Int): Unit =
      if (bigEndian) { out(i) = (v >> 8).toByte; out(i + 1) = v.toByte }
      else { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def w32(i: Int, v: Long): Unit =
      if (bigEndian) {
        out(i) = (v >> 24).toByte; out(i + 1) = (v >> 16).toByte
        out(i + 2) = (v >> 8).toByte; out(i + 3) = v.toByte
      } else {
        out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
        out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
      }
    out(0) = if (bigEndian) 'M' else 'I'
    out(1) = if (bigEndian) 'M' else 'I'
    w16(2, 42)
    w32(4, ifdAt.toLong)
    w16(ifdAt, nEntries)
    def entry(idx: Int, tag: Int, typ: Int, count: Long,
        inline: Long, offset: Long): Unit = {
      val e = ifdAt + 2 + idx * 12
      w16(e, tag); w16(e + 2, typ); w32(e + 4, count)
      val unit = if (typ == 3) 2 else 4
      if (unit * count <= 4) {
        if (typ == 3) { w16(e + 8, inline.toInt); w16(e + 10, 0) }
        else w32(e + 8, inline)
      } else w32(e + 8, offset)
    }
    entry(0, 256, 4, 1, w.toLong, 0)
    entry(1, 257, 4, 1, h.toLong, 0)
    if (rgb) { // 3 SHORTs = 6 B > 4 -> genuine value offset
      entry(2, 258, 3, 3, 0, bitsAt.toLong)
      w16(bitsAt, 8); w16(bitsAt + 2, 8); w16(bitsAt + 4, 8)
    } else entry(2, 258, 3, 1, 8, 0)
    entry(3, 259, 3, 1, 1, 0) // uncompressed
    entry(4, 262, 3, 1, if (rgb) 2 else 1, 0)
    val firstStrip = stripsAt.toLong
    if (nStrips > 1) {
      entry(5, 273, 4, nStrips.toLong, 0, offsAt.toLong)
      entry(8, 279, 4, nStrips.toLong, 0, lensAt.toLong)
      var s = 0
      var at = firstStrip
      var done = 0
      while (s < nStrips) {
        val rows = math.min(rowsPerStrip, h - done)
        w32(offsAt + 4 * s, at)
        w32(lensAt + 4 * s, rows.toLong * rowBytes)
        at += rows.toLong * rowBytes
        done += rows
        s += 1
      }
    } else {
      entry(5, 273, 4, 1, firstStrip, 0)
      entry(8, 279, 4, 1, h.toLong * rowBytes, 0)
    }
    entry(6, 277, 3, 1, spp.toLong, 0)
    entry(7, 278, 4, 1, rowsPerStrip.toLong, 0)
    w32(ifdAt + 2 + nEntries * 12, 0L) // no next IFD
    var i = 0
    while (i < h * rowBytes) {
      out(stripsAt + i) = (pixel(i) & 0xff).toByte
      i += 1
    }
    out
  }

  // ---------------------------------------------------------------
  // REAL pixel-level BMP decode (r6): the third uncompressed raster
  // family beside PNM and WAV-PCM. A 24-bpp BI_RGB Windows bitmap
  // (BITMAPFILEHEADER + BITMAPINFOHEADER, the layout published since
  // Windows 3.0) is fully decodable with zero codec dependencies —
  // but unlike PNM it is a little-endian, BOTTOM-UP, BGR format whose
  // rows pad to 4-byte boundaries: four independent layout traps a
  // decoder can get wrong while still "reading pixels". The decode
  // returns the raster in canonical top-down row-major RGB order, so
  // every downstream stat is layout-independent — and the oracle,
  // which recomputes expected samples from doc_id literals in that
  // canonical order, fails the hash if ANY of the four traps is
  // mishandled.
  // ---------------------------------------------------------------

  /** Decoded 24-bpp BMP: dims + raster re-ordered to top-down
    * row-major RGB (file order is bottom-up BGR with padded rows). */
  final case class BmpImage(width: Int, height: Int, raster: Array[Byte])

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Pixel-level BMP decode: 'BM' magic, pixel-array offset at byte
    * 10 (u32LE), InfoHeader ≥ 40 bytes (size at 14), width s32LE at
    * 18, height s32LE at 22 (positive ⇒ bottom-up, the common case;
    * top-down negative-height bitmaps are accepted too), planes = 1,
    * bpp = 24, compression = 0 (BI_RGB). Stride = ⌈3·w/4⌉·4.
    * Truncated raster / palette formats / compressed bitmaps → None
    * (the DLT arm). Row-local. */
  def parseBmp(b: Array[Byte]): Option[BmpImage] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val offset = u32le(b, 10)
    val hdrSize = u32le(b, 14)
    if (hdrSize < 40L) return None
    val w = u32le(b, 18).toInt
    val hRaw = u32le(b, 22).toInt
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    if (u16le(b, 26) != 1 || u16le(b, 28) != 24) return None
    if (u32le(b, 30) != 0L) return None // BI_RGB only
    // h <= 0 (not h == 0): math.abs(Int.MinValue) is still negative, so a
    // crafted 0x80000000 height field must take the DLT arm, not allocate.
    if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) return None
    val stride = ((3 * w + 3) / 4) * 4
    if (offset < 54L || offset + stride.toLong * h > b.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = offset.toInt + (if (bottomUp) (h - 1 - y) else y) * stride
      var x = 0
      while (x < w) {
        // file order BGR -> canonical RGB
        out((y * w + x) * 3)     = b(srcRow + x * 3 + 2)
        out((y * w + x) * 3 + 1) = b(srcRow + x * 3 + 1)
        out((y * w + x) * 3 + 2) = b(srcRow + x * 3)
        x += 1
      }
      y += 1
    }
    Some(BmpImage(w, h, out))
  }

  /** Deterministic 24-bpp bottom-up BMP fixture: `sample(i)` gives the
    * CANONICAL top-down row-major RGB sample i (= (y·w + x)·3 + ch);
    * the writer re-orders it into the file's bottom-up BGR padded
    * layout, so a decoder that mishandles any layout trap reads
    * different canonical samples than the oracle recomputes. */
  def bmpBytes(w: Int, h: Int, sample: Int => Int): Array[Byte] = {
    val stride = ((3 * w + 3) / 4) * 4
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    def le16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def le32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte
      out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, size.toLong) // file size
    le32(10, 54L)        // pixel-array offset
    le32(14, 40L)        // InfoHeader size
    le32(18, w.toLong)
    le32(22, h.toLong)   // positive: bottom-up
    le16(26, 1)          // planes
    le16(28, 24)         // bpp
    le32(30, 0L)         // BI_RGB
    le32(34, (stride * h).toLong) // image size
    var y = 0
    while (y < h) {
      val dstRow = 54 + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        out(dstRow + x * 3)     = (sample(base + 2) & 0xff).toByte // B
        out(dstRow + x * 3 + 1) = (sample(base + 1) & 0xff).toByte // G
        out(dstRow + x * 3 + 2) = (sample(base) & 0xff).toByte     // R
        x += 1
      }
      y += 1
    }
    out
  }

  // ---------------------------------------------------------------
  // QOI — the "Quite OK Image" format (r10; public spec,
  // qoiformat.org/qoi-specification.pdf): 14-byte header (magic
  // "qoif", u32BE dims, channels, colorspace), then a byte-stream of
  // five chunk ops over a running pixel + a 64-slot color index:
  // RGB (0xFE + 3 bytes), RGBA (0xFF + 4), INDEX (0b00iiiiii),
  // DIFF (0b01drdgdb, 2-bit channel deltas bias 2, wrapping),
  // LUMA (0b10dggggg + drdg/dbdg nibbles, bias 32/8),
  // RUN (0b11rrrrrr, lengths 1..62 bias -1), 8-byte end marker
  // 0x00×7 0x01. Index slot = (r·3 + g·5 + b·7 + a·11) % 64.
  // ---------------------------------------------------------------

  /** Decoded QOI: dims + top-down row-major RGB raster (QOI's native
    * pixel order — no re-ordering needed, unlike BMP). */
  final case class QoiImage(width: Int, height: Int, raster: Array[Byte])

  private def qoiPack(r: Int, g: Int, b: Int, a: Int): Int =
    (r << 24) | (g << 16) | (b << 8) | a

  /** Full QOI decode per the published spec. Truncation (chunk
    * stream or end marker), bad magic/dims/channels → None (the DLT
    * arm). Row-local; the index table and running pixel are the
    * decoder's only state. */
  def parseQoi(b: Array[Byte]): Option[QoiImage] = {
    if (b.length < 22) return None
    if (b(0) != 'q' || b(1) != 'o' || b(2) != 'i' || b(3) != 'f') return None
    def be32(i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    val w = be32(4); val h = be32(8)
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    val ch = b(12) & 0xff
    if ((ch != 3 && ch != 4) || (b(13) & 0xff) > 1) return None
    val n = (w * h).toInt
    val out = new Array[Byte](n * 3)
    val idx = new Array[Int](64) // zero-init = (0,0,0,0), per spec
    var r = 0; var g = 0; var bl = 0; var a = 255
    var p = 14; var px = 0; var run = 0
    while (px < n) {
      if (run > 0) run -= 1
      else {
        if (p >= b.length - 8) return None // truncated chunk stream
        val b1 = b(p) & 0xff; p += 1
        if (b1 == 0xfe) {
          if (p + 3 > b.length - 8) return None
          r = b(p) & 0xff; g = b(p + 1) & 0xff; bl = b(p + 2) & 0xff
          p += 3
        } else if (b1 == 0xff) {
          if (p + 4 > b.length - 8) return None
          r = b(p) & 0xff; g = b(p + 1) & 0xff
          bl = b(p + 2) & 0xff; a = b(p + 3) & 0xff
          p += 4
        } else (b1 >> 6) match {
          case 0 =>
            val v = idx(b1 & 0x3f)
            r = (v >>> 24) & 0xff; g = (v >>> 16) & 0xff
            bl = (v >>> 8) & 0xff; a = v & 0xff
          case 1 =>
            r = (r + ((b1 >> 4) & 3) - 2) & 0xff
            g = (g + ((b1 >> 2) & 3) - 2) & 0xff
            bl = (bl + (b1 & 3) - 2) & 0xff
          case 2 =>
            if (p + 1 > b.length - 8) return None
            val dg = (b1 & 0x3f) - 32
            val b2 = b(p) & 0xff; p += 1
            r = (r + dg - 8 + ((b2 >> 4) & 0xf)) & 0xff
            g = (g + dg) & 0xff
            bl = (bl + dg - 8 + (b2 & 0xf)) & 0xff
          case _ =>
            run = b1 & 0x3f // this pixel + `run` more repeats
        }
        idx((r * 3 + g * 5 + bl * 7 + a * 11) % 64) = qoiPack(r, g, bl, a)
      }
      out(px * 3) = r.toByte; out(px * 3 + 1) = g.toByte
      out(px * 3 + 2) = bl.toByte
      px += 1
    }
    // end marker must be exactly 0x00×7 0x01 at the stream position
    if (p + 8 > b.length) return None
    var k = 0
    while (k < 7) { if (b(p + k) != 0) return None; k += 1 }
    if (b(p + 7) != 1) return None
    Some(QoiImage(w.toInt, h.toInt, out))
  }

  /** Reference QOI encoder (channels = 3, alpha fixed 255) over a
    * canonical sample function — the fixture writer. Faithful to the
    * spec's reference implementation: run path skips the index
    * update, INDEX hit checked before the slot is written, DIFF →
    * LUMA → RGB fallback with int8-wrapped channel deltas. */
  def qoiBytes(w: Int, h: Int, sample: Int => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(14 + w * h * 4 + 8)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(w); be32(h); out.write(3); out.write(0)
    def wrap8(v: Int): Int = (v << 24) >> 24
    val idx = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0 // prev starts (0,0,0,a=255)
    var run = 0
    var p = 0
    while (p < w * h) {
      val r = sample(p * 3) & 0xff
      val g = sample(p * 3 + 1) & 0xff
      val bl = sample(p * 3 + 2) & 0xff
      if (r == pr && g == pg && bl == pb) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val slot = (r * 3 + g * 5 + bl * 7 + 255 * 11) % 64
        val packed = qoiPack(r, g, bl, 255)
        if (idx(slot) == packed) out.write(slot)
        else {
          idx(slot) = packed
          val dr = wrap8(r - pr); val dg = wrap8(g - pg)
          val db = wrap8(bl - pb)
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
              db >= -2 && db <= 1)
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          else {
            val drg = dr - dg; val dbg = db - dg
            if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                dbg >= -8 && dbg <= 7) {
              out.write(0x80 | (dg + 32))
              out.write(((drg + 8) << 4) | (dbg + 8))
            } else {
              out.write(0xfe); out.write(r); out.write(g); out.write(bl)
            }
          }
        }
        pr = r; pg = g; pb = bl
      }
      p += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    var k = 0
    while (k < 7) { out.write(0); k += 1 }
    out.write(1)
    out.toByteArray
  }

  /** Decoded animation: `rasters` is the frame sequence concatenated
    * in presentation order (nFrames · w · h · 3 RGB bytes) so
    * order-sensitive stats catch a shuffled frame walk. */
  final case class GifAnim(width: Int, height: Int, nFrames: Int,
      totalDelayCs: Long, rasters: Array[Byte])

  /** REAL animated-GIF decode (r10) — the multi-frame block walk the
    * single-frame [[parseGifRaster]] stops short of: Graphic Control
    * Extensions carry each frame's delay (centiseconds, LE16),
    * application/comment extensions (e.g. the NETSCAPE2.0 loop
    * block) must be skipped by the generic sub-block chain rule, and
    * every image descriptor is its own LZW stream decoded against
    * the global color table. Full-frame, non-interlaced, GCT-only
    * animations (the fixture contract); anything else → None (DLT
    * arm), as are truncated chains and out-of-protocol LZW. */
  def parseGifFrames(b: Array[Byte]): Option[GifAnim] = {
    val meta = parseGif(b) match {
      case Some(m) => m
      case None => return None
    }
    val w = meta.width.toInt; val h = meta.height.toInt
    if (w > (1 << 12) || h > (1 << 12)) return None
    if (meta.palette <= 0) return None
    val gctAt = 13; val gctSize = meta.palette.toInt
    var p = 13 + 3 * gctSize
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var pendingDelay = 0L; var totalDelay = 0L
    while (p < b.length) {
      (b(p) & 0xff) match {
        case 0x21 =>
          if (p + 2 >= b.length) return None
          val label = b(p + 1) & 0xff
          if (label == 0xf9) { // Graphic Control Extension
            if (p + 7 >= b.length) return None
            if ((b(p + 2) & 0xff) != 4) return None
            pendingDelay =
              ((b(p + 4) & 0xff) | ((b(p + 5) & 0xff) << 8)).toLong
            p += 7
            if ((b(p) & 0xff) != 0) return None // block terminator
            p += 1
          } else { // application/comment/plain-text: skip sub-blocks
            p += 2
            var len = if (p < b.length) b(p) & 0xff else return None
            while (len != 0) {
              p += 1 + len
              if (p >= b.length) return None
              len = b(p) & 0xff
            }
            p += 1
          }
        case 0x2c =>
          if (p + 10 > b.length) return None
          val left = (b(p + 1) & 0xff) | ((b(p + 2) & 0xff) << 8)
          val top = (b(p + 3) & 0xff) | ((b(p + 4) & 0xff) << 8)
          val iw = (b(p + 5) & 0xff) | ((b(p + 6) & 0xff) << 8)
          val ih = (b(p + 7) & 0xff) | ((b(p + 8) & 0xff) << 8)
          val packed = b(p + 9) & 0xff
          if ((packed & 0xc0) != 0) return None // LCT or interlace
          if (left != 0 || top != 0 || iw != w || ih != h) return None
          p += 10
          if (p >= b.length) return None
          val minCode = b(p) & 0xff
          if (minCode < 2 || minCode > 11) return None
          p += 1
          val data = new java.io.ByteArrayOutputStream()
          var len = if (p < b.length) b(p) & 0xff else return None
          while (len != 0) {
            if (p + 1 + len > b.length) return None
            data.write(b, p + 1, len)
            p += 1 + len
            if (p >= b.length) return None
            len = b(p) & 0xff
          }
          p += 1
          val idx = lzwDecode(data.toByteArray, minCode, w * h) match {
            case Some(v) => v
            case None => return None
          }
          val out = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            val ix = idx(i) & 0xff
            if (ix >= gctSize) return None
            out(i * 3) = b(gctAt + ix * 3)
            out(i * 3 + 1) = b(gctAt + ix * 3 + 1)
            out(i * 3 + 2) = b(gctAt + ix * 3 + 2)
            i += 1
          }
          frames += out
          totalDelay += pendingDelay
          pendingDelay = 0L
        case 0x3b =>
          if (frames.isEmpty) return None
          val all = new Array[Byte](frames.length * w * h * 3)
          var f = 0
          while (f < frames.length) {
            System.arraycopy(frames(f), 0, all, f * w * h * 3, w * h * 3)
            f += 1
          }
          return Some(GifAnim(w, h, frames.length, totalDelay, all))
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** Reference animated-GIF encoder — GIF89a header, global color
    * table, a NETSCAPE2.0 infinite-loop application extension (which
    * the decoder must skip by the generic rule), and per frame one
    * GCE (delay in centiseconds) + full-frame image descriptor + LZW
    * stream. */
  def gifAnimBytes(w: Int, h: Int, paletteExp: Int, nFrames: Int,
      delayCs: Int => Int, palette: (Int, Int) => Int,
      index: (Int, Int) => Int): Array[Byte] = {
    val size = 1 << (paletteExp + 1)
    val minCode = math.max(2, paletteExp + 1)
    val out = new java.io.ByteArrayOutputStream()
    "GIF89a".foreach(c => out.write(c))
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0x80 | (paletteExp & 0x07))
    out.write(0); out.write(0)
    for (j <- 0 until size; ch <- 0 until 3) out.write(palette(j, ch) & 0xff)
    out.write(0x21); out.write(0xff); out.write(11) // app extension
    "NETSCAPE2.0".foreach(c => out.write(c))
    out.write(3); out.write(1); out.write(0); out.write(0) // loop forever
    out.write(0)
    var f = 0
    while (f < nFrames) {
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(0) // no disposal, no transparency
      val d = delayCs(f)
      out.write(d & 0xff); out.write((d >> 8) & 0xff)
      out.write(0) // transparent index (unused)
      out.write(0) // terminator
      out.write(0x2c) // full-frame descriptor, no LCT, no interlace
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(w & 0xff); out.write((w >> 8) & 0xff)
      out.write(h & 0xff); out.write((h >> 8) & 0xff)
      out.write(0)
      out.write(minCode)
      val idx = Array.tabulate[Byte](w * h)(i => (index(f, i) % size).toByte)
      val data = lzwEncode(idx, minCode)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n)
        out.write(data, off, n)
        off += n
      }
      out.write(0)
      f += 1
    }
    out.write(0x3b)
    out.toByteArray
  }

  final case class TgaImage(width: Int, height: Int, raster: Array[Byte])

  /** REAL Truevision TGA decode (r10) — image type 10 (RLE-compressed
    * true-color), the format whose traps are all ORDERING: pixels are
    * stored BGR (canonical raster is RGB — a swap-less decoder gets
    * every channel wrong), rows are stored BOTTOM-UP when descriptor
    * bit 5 is clear (the BMP origin lesson in a second container),
    * and the stream interleaves two packet kinds — RLE (bit 7 set:
    * count+1 copies of ONE pixel) and raw (count+1 literal pixels).
    * Returns the canonical TOP-DOWN RGB raster; malformed headers,
    * truncated packet streams, and pixel overruns reject to None
    * (the DLT arm). TGA 2.0 spec: 18-byte header — idLength,
    * colorMapType, imageType, 5-byte colormap spec, x/y origin,
    * width/height LE16, bpp, descriptor. */
  def parseTga(b: Array[Byte]): Option[TgaImage] = {
    if (b.length < 18) return None
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    val idLen = b(0) & 0xff
    if ((b(1) & 0xff) != 0) return None // color-mapped: unsupported
    if ((b(2) & 0xff) != 10) return None // only RLE true-color here
    val w = u16(12); val h = u16(14)
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    if ((b(16) & 0xff) != 24) return None
    val desc = b(17) & 0xff
    if ((desc & 0x0f) != 0) return None // no alpha bits at 24bpp
    val topDown = (desc & 0x20) != 0
    val n = w * h
    val stored = new Array[Byte](n * 3)
    var p = 18 + idLen
    var px = 0
    while (px < n) {
      if (p >= b.length) return None
      val hdr = b(p) & 0xff; p += 1
      val cnt = (hdr & 0x7f) + 1
      if (px + cnt > n) return None // packet overruns the raster
      if ((hdr & 0x80) != 0) { // RLE: one pixel, cnt copies
        if (p + 3 > b.length) return None
        val bl = b(p); val g = b(p + 1); val r = b(p + 2); p += 3
        var i = 0
        while (i < cnt) {
          stored(px * 3) = r; stored(px * 3 + 1) = g
          stored(px * 3 + 2) = bl
          px += 1; i += 1
        }
      } else { // raw: cnt literal pixels
        if (p + 3 * cnt > b.length) return None
        var i = 0
        while (i < cnt) {
          stored(px * 3) = b(p + 2); stored(px * 3 + 1) = b(p + 1)
          stored(px * 3 + 2) = b(p); p += 3
          px += 1; i += 1
        }
      }
    }
    val out =
      if (topDown) stored
      else {
        val o = new Array[Byte](n * 3)
        var y = 0
        while (y < h) {
          System.arraycopy(stored, (h - 1 - y) * w * 3, o, y * w * 3, w * 3)
          y += 1
        }
        o
      }
    Some(TgaImage(w, h, out))
  }

  /** Reference TGA RLE encoder over a canonical TOP-DOWN RGB sample
    * function — the fixture writer. Stores rows bottom-up (descriptor
    * 0x00) in BGR, packets never cross scan lines (spec v2.0), runs
    * of ≥2 equal pixels become RLE packets, everything else
    * accumulates into raw packets; both capped at 128 pixels. */
  def tgaBytes(w: Int, h: Int, sample: Int => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(18 + w * h * 4)
    out.write(0); out.write(0); out.write(10)
    var k = 0
    while (k < 5) { out.write(0); k += 1 } // no colormap
    out.write(0); out.write(0); out.write(0); out.write(0) // x,y origin
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(24); out.write(0) // bottom-up, no alpha
    def px(p: Int): (Int, Int, Int) =
      (sample(p * 3) & 0xff, sample(p * 3 + 1) & 0xff,
        sample(p * 3 + 2) & 0xff)
    def writeBgr(v: (Int, Int, Int)): Unit = {
      out.write(v._3); out.write(v._2); out.write(v._1)
    }
    var y = h - 1
    while (y >= 0) { // stored bottom-up
      var x = 0
      while (x < w) {
        val p0 = y * w + x
        val v0 = px(p0)
        var run = 1
        while (x + run < w && run < 128 && px(p0 + run) == v0) run += 1
        if (run >= 2) {
          out.write(0x80 | (run - 1)); writeBgr(v0)
          x += run
        } else {
          var lit = 1 // literals until the next >=2 run or row end
          while (x + lit < w && lit < 128 &&
              !(x + lit + 1 < w && px(p0 + lit) == px(p0 + lit + 1)))
            lit += 1
          out.write(lit - 1)
          var i = 0
          while (i < lit) { writeBgr(px(p0 + i)); i += 1 }
          x += lit
        }
      }
      y -= 1
    }
    out.toByteArray
  }

  /** Deterministic full P5/P6 fixture WITH raster: header (including
    * a comment line, exercising the tokenizer) followed by
    * width·height·channels bytes where byte i = pixel(i). The oracle
    * recomputes pixel(i) from doc_id literals, so a decode or resize
    * bug cannot self-confirm. */
  def pnmRasterBytes(w: Int, h: Int, grayscale: Boolean,
      pixel: Int => Int): Array[Byte] = {
    val c = if (grayscale) 1 else 3
    val header = s"P${if (grayscale) 5 else 6}\n#r\n$w $h\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * c)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h * c) {
      out(header.length + i) = (pixel(i) & 0xff).toByte
      i += 1
    }
    out
  }

  // ---------------------------------------------------------------
  // REAL pixel-level PNG decode (r7 — the first COMPRESSED raster
  // family): a PNG's pixel data is zlib-deflated scanlines, and the
  // JDK ships the inflater (`java.util.zip.Inflater`), so full decode
  // needs no external codec library — only the published format
  // knowledge (PNG 2nd ed., ISO/IEC 15948): chunk walk concatenating
  // IDAT payloads (one logical zlib stream MAY span many IDAT
  // chunks, §5.6), inflate to h·(1 + w·c) filtered scanline bytes,
  // then invert the per-row filter (§9: 0 None, 1 Sub, 2 Up,
  // 3 Average with FLOOR mean, 4 Paeth predictor) where each
  // reconstructed byte depends on already-reconstructed left/up/
  // up-left neighbors. Supported: 8-bit depth, color type 0 (gray,
  // 1 channel) or 2 (truecolor RGB, 3); palette/alpha/16-bit and
  // interlaced files → None (the DLT arm), like every other codec
  // here. Row-local, zero shuffle.
  // ---------------------------------------------------------------

  /** Fully-decoded PNG: dims/channels + the reconstructed raster in
    * canonical top-down row-major channel-interleaved order — the
    * same order PNM/BMP decode normalizes to, so every downstream
    * kernel (box-filter resize, aHash, stats) is container-agnostic. */
  final case class PngImage(width: Int, height: Int, channels: Int,
      raster: Array[Byte])

  /** Pixel-level PNG decode: signature + IHDR as [[parsePng]], chunk
    * walk to IEND concatenating IDAT, `Inflater` to the exact
    * scanline byte count, then the five unfilters. Truncated stream /
    * bad filter byte / wrong inflated size / unsupported color mode
    * → None (the DLT arm). */
  def parsePngRaster(b: Array[Byte]): Option[PngImage] = {
    if (b.length < 45) return None // sig(8) + IHDR(25) + IEND(12)
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != PngSig(i)) return None; i += 1 }
    if (u32(b, 8) != 13L) return None
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = u32(b, 16)
    val h = u32(b, 20)
    if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) return None
    if ((b(24) & 0xff) != 8) return None // bit depth 8 only
    val palMode = (b(25) & 0xff) == 3
    val c = (b(25) & 0xff) match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // indexed (r7): ONE index byte per pixel in the stream
      case _ => return None // alpha modes: unsupported → DLT
    }
    // compression 0, filter method 0; interlace 0 (none) or 1 (Adam7)
    if (b(26) != 0 || b(27) != 0) return None
    val interlaced = (b(28) & 0xff) match {
      case 0 => false
      case 1 => true
      case _ => return None
    }
    val rowBytes = w.toInt * c
    // Adam7 (r7): the stream is the concatenation of SEVEN
    // independently-filtered sub-images (PNG §8.2); empty passes
    // contribute no scanlines at all
    val passes =
      if (interlaced) adam7Passes(w.toInt, h.toInt)
      else Array((0, 0, 1, 1, w.toInt, h.toInt))
    val expectedL = passes.map { case (_, _, _, _, pw, ph) =>
      ph * (1L + pw.toLong * c) }.sum
    if (expectedL <= 0 || expectedL > (1L << 28)) return None
    val expected = expectedL.toInt
    // chunk walk: concatenate every IDAT payload until IEND; capture
    // PLTE for indexed mode (r7)
    val idat = new java.io.ByteArrayOutputStream()
    var palette: Array[Byte] = null
    var p = 8 + 25 // past the IHDR chunk (len + type + 13 data + crc)
    var sawEnd = false
    while (!sawEnd) {
      if (p + 8 > b.length) return None
      val len = u32(b, p)
      if (len > b.length || p + 8 + len + 4 > b.length) return None
      val t = new String(b, p + 4, 4, "US-ASCII")
      if (t == "IDAT") idat.write(b, p + 8, len.toInt)
      else if (t == "PLTE") {
        if (len % 3 != 0 || len == 0 || len > 768) return None
        palette = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + len.toInt)
      } else if (t == "IEND") sawEnd = true
      p += 8 + len.toInt + 4
    }
    if (palMode && palette == null) return None
    val scan = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(scan, off, expected - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None // truncated / preset-dictionary stream
        off += n
      }
      if (off != expected || !inf.finished()) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // per-pass, per-row unfilter; at 8-bit depth the filter unit
    // (bpp) == c. For the non-interlaced case this is one full-frame
    // pass; for Adam7 each sub-image unfilters against its OWN
    // left/up neighbors, then scatters to the frame grid.
    val out = new Array[Byte](h.toInt * rowBytes)
    var scanOff = 0
    passes.foreach { case (x0, y0, dx, dy, pw, ph) =>
      val prb = pw * c
      val sub = unfilterSub(scan, scanOff, pw, ph, c) match {
        case Some(s) => s
        case None => return None
      }
      scanOff += ph * (1 + prb)
      if (interlaced) {
        var py = 0
        while (py < ph) {
          var px = 0
          while (px < pw) {
            val fy = y0 + py * dy
            val fx = x0 + px * dx
            var ch = 0
            while (ch < c) {
              out((fy * w.toInt + fx) * c + ch) = sub((py * pw + px) * c + ch)
              ch += 1
            }
            px += 1
          }
          py += 1
        }
      } else System.arraycopy(sub, 0, out, 0, sub.length)
    }
    if (!palMode) Some(PngImage(w.toInt, h.toInt, c, out))
    else {
      // indexed → RGB through PLTE; an index past the palette is
      // corrupt (DLT), not clamped
      val nPal = palette.length / 3
      val rgb = new Array[Byte](out.length * 3)
      var k = 0
      while (k < out.length) {
        val idx = out(k) & 0xff
        if (idx >= nPal) return None
        rgb(k * 3) = palette(idx * 3)
        rgb(k * 3 + 1) = palette(idx * 3 + 1)
        rgb(k * 3 + 2) = palette(idx * 3 + 2)
        k += 1
      }
      Some(PngImage(w.toInt, h.toInt, 3, rgb))
    }
  }

  /** The 7 Adam7 passes for a w×h frame as (x0, y0, dx, dy, passW,
    * passH), EMPTY PASSES DROPPED (they contribute no scanlines —
    * PNG §8.2). */
  def adam7Passes(w: Int, h: Int): Array[(Int, Int, Int, Int, Int, Int)] = {
    val grid = Array(
      (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    grid.map { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      (x0, y0, dx, dy, pw, ph)
    }.filter { case (_, _, _, _, pw, ph) => pw > 0 && ph > 0 }
  }

  /** Unfilter one (sub-)image's scanlines starting at `off` in the
    * inflated stream: ph rows of (filter byte + pw·c bytes), the five
    * PNG §9 filters with reconstructed-neighbor math. */
  private def unfilterSub(scan: Array[Byte], off: Int, pw: Int, ph: Int,
      c: Int): Option[Array[Byte]] = {
    val rowBytes = pw * c
    val out = new Array[Byte](ph * rowBytes)
    var y = 0
    while (y < ph) {
      val f = scan(off + y * (1 + rowBytes)) & 0xff
      if (f > 4) return None
      val src = off + y * (1 + rowBytes) + 1
      val dst = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val raw = scan(src + x) & 0xff
        val left = if (x >= c) out(dst + x - c) & 0xff else 0
        val up = if (y > 0) out(dst - rowBytes + x) & 0xff else 0
        val ul = if (y > 0 && x >= c) out(dst - rowBytes + x - c) & 0xff else 0
        val v = f match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2 // floor mean per spec §9.3
          case _ => // Paeth §9.4: nearest of left/up/ul to p = l+u-ul
            val pp = left + up - ul
            val pa = math.abs(pp - left)
            val pb = math.abs(pp - up)
            val pc = math.abs(pp - ul)
            raw + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up
                   else ul)
        }
        out(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  // ---------------------------------------------------------------
  // REAL pixel-level GIF decode (r7 — the SECOND compressed raster
  // family): GIF pixel data is LZW-compressed palette indices
  // (GIF89a spec appendix F), and LZW is a pure algorithm — no codec
  // library involved at all. The decoder walks the block structure
  // (extensions are length-prefixed sub-block chains; the image
  // descriptor carries its own dims + optional local color table),
  // concatenates the image's data sub-blocks, and runs the variable-
  // width LSB-first LZW: clear/EOI codes, code width min+1..12
  // growing as the table fills (decoder bumps at nextFree == 2^width;
  // the encoder's matching bump is one entry later — GIF is a
  // late-change format, unlike TIFF), and the KwKwK case where a
  // code references the entry being defined. Indices map through the
  // color table to a canonical top-down RGB raster — the same
  // normalized order every other decoder here emits.
  // ---------------------------------------------------------------

  /** Fully-decoded GIF frame: dims + RGB raster (palette applied). */
  final case class GifImage(width: Int, height: Int, raster: Array[Byte])

  /** Pixel-level GIF decode: LSD via the [[parseGif]] fields, global
    * color table, block walk to the first image descriptor (full-frame,
    * non-interlaced only — sub-frames/interlace → None, the DLT arm),
    * LZW decompress, palette map. Truncated streams, out-of-range
    * codes or indices, wrong pixel counts → None. */
  def parseGifRaster(b: Array[Byte]): Option[GifImage] = {
    val meta = parseGif(b) match {
      case Some(m) => m
      case None => return None
    }
    val w = meta.width.toInt
    val h = meta.height.toInt
    if (w > (1 << 12) || h > (1 << 12)) return None
    var paletteAt = -1
    var paletteSize = 0
    var p = 13
    if (meta.palette > 0) {
      paletteAt = 13
      paletteSize = meta.palette.toInt
      p += 3 * paletteSize
    }
    // block walk to the first image descriptor
    while (true) {
      if (p >= b.length) return None
      (b(p) & 0xff) match {
        case 0x21 => // extension: label + sub-block chain
          p += 2
          var len = if (p < b.length) b(p) & 0xff else return None
          while (len != 0) {
            p += 1 + len
            if (p >= b.length) return None
            len = b(p) & 0xff
          }
          p += 1
        case 0x2c => // image descriptor
          if (p + 10 > b.length) return None
          val left = (b(p + 1) & 0xff) | ((b(p + 2) & 0xff) << 8)
          val top = (b(p + 3) & 0xff) | ((b(p + 4) & 0xff) << 8)
          val iw = (b(p + 5) & 0xff) | ((b(p + 6) & 0xff) << 8)
          val ih = (b(p + 7) & 0xff) | ((b(p + 8) & 0xff) << 8)
          val packed = b(p + 9) & 0xff
          if ((packed & 0x40) != 0) return None // interlaced: DLT arm
          if (left != 0 || top != 0 || iw != w || ih != h) return None
          p += 10
          if ((packed & 0x80) != 0) { // local color table overrides
            paletteAt = p
            paletteSize = 1 << ((packed & 0x07) + 1)
            p += 3 * paletteSize
          }
          if (paletteAt < 0 || paletteAt + 3 * paletteSize > b.length)
            return None
          // LZW minimum code size + data sub-blocks
          if (p >= b.length) return None
          val minCode = b(p) & 0xff
          if (minCode < 2 || minCode > 11) return None
          p += 1
          val data = new java.io.ByteArrayOutputStream()
          var len = if (p < b.length) b(p) & 0xff else return None
          while (len != 0) {
            if (p + 1 + len > b.length) return None
            data.write(b, p + 1, len)
            p += 1 + len
            if (p >= b.length) return None
            len = b(p) & 0xff
          }
          val idx = lzwDecode(data.toByteArray, minCode, w * h) match {
            case Some(v) => v
            case None => return None
          }
          val out = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            val ix = idx(i) & 0xff
            if (ix >= paletteSize) return None
            out(i * 3) = b(paletteAt + ix * 3)
            out(i * 3 + 1) = b(paletteAt + ix * 3 + 1)
            out(i * 3 + 2) = b(paletteAt + ix * 3 + 2)
            i += 1
          }
          return Some(GifImage(w, h, out))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** GIF-variant LZW decompress to EXACTLY `nPixels` palette indices:
    * LSB-first bit stream, clear = 2^min, EOI = clear+1, code width
    * min+1 growing at nextFree == 2^width (cap 12), KwKwK handled,
    * anything out of protocol (code > nextFree, first code not a
    * root, wrong output count, stream exhausted early) → None. */
  def lzwDecode(data: Array[Byte], minCode: Int,
      nPixels: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    // table as (prefix code, appended byte); roots are prefix -1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](nPixels)
    var nOut = 0
    var width = minCode + 1
    var nextFree = clear + 2
    var prev = -1
    var acc = 0L
    var nBits = 0
    var pos = 0
    // expand a code's string (walk the prefix chain, emit reversed)
    val stack = new Array[Byte](4096)
    def emit(code: Int): Boolean = {
      var c = code
      var sp = 0
      while (c >= clear) { // composite entry
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
        if (sp > 4095) return false
      }
      stack(sp) = c.toByte; sp += 1 // the root
      while (sp > 0) {
        sp -= 1
        if (nOut >= nPixels) return false
        out(nOut) = stack(sp); nOut += 1
      }
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    while (true) {
      while (nBits < width) {
        if (pos >= data.length)
          return if (nOut == nPixels) Some(out) else None
        acc |= (data(pos) & 0xffL) << nBits
        nBits += 8
        pos += 1
      }
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nBits -= width
      if (code == clear) {
        width = minCode + 1
        nextFree = clear + 2
        prev = -1
      } else if (code == eoi) {
        return if (nOut == nPixels) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > nextFree || code == clear || code == eoi) return None
        val cur =
          if (code == nextFree) { // KwKwK: entry being defined
            if (nextFree >= 4096) return None
            prefix(nextFree) = prev
            suffix(nextFree) = firstByte(prev)
            nextFree += 1
            code
          } else {
            if (nextFree < 4096) {
              prefix(nextFree) = prev
              suffix(nextFree) = firstByte(code)
              nextFree += 1
            }
            code
          }
        if (!emit(cur)) return None
        prev = cur
        if (nextFree == (1 << width) && width < 12) width += 1
      }
      if (nOut == nPixels) {
        // consume a trailing EOI if present; either way we are done
        return Some(out)
      }
    }
    None
  }

  /** GIF-variant LZW compress (the fixture encoder): a REAL
    * dictionary encoder (hash map over (prefix, byte)), emitting
    * clear first, growing code width ONE ENTRY LATER than the
    * decoder's bump (the GIF late-change convention — the decoder's
    * table add lags the encoder's by one code in the stream), and
    * clearing if the table ever approaches full. */
  def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val outBits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        outBits.write((acc & 0xff).toInt)
        acc >>>= 8
        nBits -= 8
      }
    }
    var dict = Map.empty[(Int, Int), Int]
    var nextFree = clear + 2
    put(clear)
    if (indices.nonEmpty) {
      var current = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xff
        dict.get((current, k)) match {
          case Some(c) => current = c
          case None =>
            put(current)
            if (nextFree < 4094) {
              dict += ((current, k) -> nextFree)
              nextFree += 1
              // late change: bump one entry after the decoder would
              if (nextFree == (1 << width) + 1 && width < 12) width += 1
            } else {
              put(clear)
              dict = Map.empty
              nextFree = clear + 2
              width = minCode + 1
            }
            current = k
        }
        i += 1
      }
      put(current)
    }
    put(eoi)
    if (nBits > 0) outBits.write((acc & 0xff).toInt)
    outBits.toByteArray
  }

  /** Deterministic REAL-LZW GIF fixture: palette entry (j, ch) and
    * pixel index i both come from caller formulas the oracle
    * restates; the encoder is the real dictionary LZW above, data
    * split into ≤255-byte sub-blocks, so decode must run the actual
    * variable-width algorithm (table growth and KwKwK arise naturally
    * from the periodic index patterns). */
  def gifRasterBytes(w: Int, h: Int, paletteExp: Int, version89: Boolean,
      palette: (Int, Int) => Int, index: Int => Int): Array[Byte] = {
    val size = 1 << (paletteExp + 1)
    val minCode = math.max(2, paletteExp + 1)
    val out = new java.io.ByteArrayOutputStream()
    s"GIF8${if (version89) '9' else '7'}a".foreach(c => out.write(c))
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0x80 | (paletteExp & 0x07)) // GCT present
    out.write(0); out.write(0) // background, aspect
    for (j <- 0 until size; ch <- 0 until 3) out.write(palette(j, ch) & 0xff)
    out.write(0x2c) // image descriptor, full frame
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0) // no LCT, not interlaced
    out.write(minCode)
    val idx = Array.tabulate[Byte](w * h)(i => (index(i) % size).toByte)
    val data = lzwEncode(idx, minCode)
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
    out.write(0) // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Deterministic REAL-compression PNG fixture: canonical raster
    * byte i = pixel(i), forward-filtered per row with
    * `filterFor(y) mod 5` (the writer's rotation covers all five
    * filter types, so every unfilter path is exercised), deflated
    * into a genuine zlib stream SPLIT ACROSS TWO IDAT CHUNKS (the
    * multi-IDAT concatenation trap, §5.6), with correct CRC32 on
    * every chunk. The oracle recomputes pixel(i) from doc_id
    * literals, so decode must actually invert deflate + filtering
    * to agree. */
  def pngRasterBytes(w: Int, h: Int, grayscale: Boolean,
      pixel: Int => Int, filterFor: Int => Int,
      interlaced: Boolean = false): Array[Byte] = {
    val c = if (grayscale) 1 else 3
    val rowBytes = w * c
    val raster = new Array[Byte](h * rowBytes)
    var i = 0
    while (i < raster.length) { raster(i) = (pixel(i) & 0xff).toByte; i += 1 }
    // forward filter: filtered = (orig - predictor) mod 256, where the
    // predictor reads ORIGINAL neighbor bytes (decode reconstructs
    // them). Interlaced mode (r7): each Adam7 pass is extracted as its
    // own sub-image and filtered INDEPENDENTLY (PNG §8.2) — neighbors
    // are pass neighbors, not frame neighbors; filterFor rotates over
    // a global scanline counter so every pass sees every filter type.
    val passes =
      if (interlaced) adam7Passes(w, h) else Array((0, 0, 1, 1, w, h))
    val scanLen = passes.map { case (_, _, _, _, pw, ph) =>
      ph * (1 + pw * c) }.sum
    val scan = new Array[Byte](scanLen)
    var off = 0
    var rowCounter = 0
    passes.foreach { case (x0, y0, dx, dy, pw, ph) =>
      val prb = pw * c
      val sub = new Array[Byte](ph * prb)
      var py = 0
      while (py < ph) {
        var px = 0
        while (px < pw) {
          var ch = 0
          while (ch < c) {
            sub((py * pw + px) * c + ch) =
              raster(((y0 + py * dy) * w + (x0 + px * dx)) * c + ch)
            ch += 1
          }
          px += 1
        }
        py += 1
      }
      py = 0
      while (py < ph) {
        val f = ((filterFor(rowCounter) % 5) + 5) % 5
        rowCounter += 1
        scan(off + py * (1 + prb)) = f.toByte
        var x = 0
        while (x < prb) {
          val orig = sub(py * prb + x) & 0xff
          val left = if (x >= c) sub(py * prb + x - c) & 0xff else 0
          val up = if (py > 0) sub((py - 1) * prb + x) & 0xff else 0
          val ul =
            if (py > 0 && x >= c) sub((py - 1) * prb + x - c) & 0xff else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case _ =>
              val pp = left + up - ul
              val pa = math.abs(pp - left)
              val pb = math.abs(pp - up)
              val pc = math.abs(pp - ul)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          }
          scan(off + py * (1 + prb) + 1 + x) = ((orig - pred) & 0xff).toByte
          x += 1
        }
        py += 1
      }
      off += ph * (1 + prb)
    }
    val defl = new java.util.zip.Deflater()
    val compressed = try {
      defl.setInput(scan)
      defl.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](1024)
      while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
      buf.toByteArray
    } finally defl.end()
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      be32(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      be32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xff).toByte; ihdr(1) = ((w >> 16) & 0xff).toByte
    ihdr(2) = ((w >> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >> 24) & 0xff).toByte; ihdr(5) = ((h >> 16) & 0xff).toByte
    ihdr(6) = ((h >> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (grayscale) 0 else 2).toByte
    // ihdr(10..11): compression / filter = 0
    ihdr(12) = (if (interlaced) 1 else 0).toByte
    chunk("IHDR", ihdr)
    // split the one zlib stream across two IDAT chunks (§5.6 trap)
    val cut = math.max(1, compressed.length / 2)
    chunk("IDAT", java.util.Arrays.copyOfRange(compressed, 0, cut))
    chunk("IDAT", java.util.Arrays.copyOfRange(compressed, cut, compressed.length))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Deterministic indexed-color PNG fixture (r7): reuse the full
    * grayscale filter+deflate+chunk pipeline for the INDEX PLANE,
    * then patch IHDR colorType 0→3 (recomputing its CRC) and splice a
    * PLTE chunk after IHDR — byte-identical to writing colorType 3
    * natively, with zero duplicated filter logic. Indices are taken
    * mod nPal so every fixture is in-range; the corrupt arm comes
    * from truncation, not bad indices. */
  def pngPaletteBytes(w: Int, h: Int, nPal: Int, index: Int => Int,
      palByte: Int => Int, filterFor: Int => Int): Array[Byte] = {
    require(nPal >= 1 && nPal <= 256)
    val base = pngRasterBytes(w, h, grayscale = true,
      pixel = i => ((index(i) % nPal) + nPal) % nPal, filterFor)
    base(25) = 3 // IHDR data byte 9: color type
    val crc = new java.util.zip.CRC32()
    crc.update(base, 12, 4 + 13) // chunk type + data
    val cv = crc.getValue
    base(29) = ((cv >> 24) & 0xff).toByte
    base(30) = ((cv >> 16) & 0xff).toByte
    base(31) = ((cv >> 8) & 0xff).toByte
    base(32) = (cv & 0xff).toByte
    val plte = new Array[Byte](3 * nPal)
    var j = 0
    while (j < plte.length) { plte(j) = (palByte(j) & 0xff).toByte; j += 1 }
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 33) // sig + IHDR chunk
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be32(plte.length.toLong)
    val tb = "PLTE".getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(plte, 0, plte.length)
    val pcrc = new java.util.zip.CRC32()
    pcrc.update(tb); pcrc.update(plte)
    be32(pcrc.getValue)
    out.write(base, 33, base.length - 33)
    out.toByteArray
  }

  /** Apply an EXIF orientation (TIFF 6.0 tag 274, values 1–8) to a
    * single-channel raster, returning the NORMALIZED (orientation-1)
    * raster and its dims. Mapping per the spec: 2 = mirror-H,
    * 3 = 180°, 4 = mirror-V, 5 = transpose, 6 = 90° CW,
    * 7 = transverse, 8 = 270° CW; 5–8 swap width and height. */
  def applyOrientation(raster: Array[Byte], w: Int, h: Int,
      orientation: Int): Option[(Array[Byte], Int, Int)] = {
    if (orientation < 1 || orientation > 8 || raster.length != w * h)
      return None
    val swap = orientation >= 5
    val (ow, oh) = if (swap) (h, w) else (w, h)
    val out = new Array[Byte](w * h)
    var yp = 0
    while (yp < oh) {
      var xp = 0
      while (xp < ow) {
        val (sx, sy) = orientation match {
          case 1 => (xp, yp)
          case 2 => (w - 1 - xp, yp)
          case 3 => (w - 1 - xp, h - 1 - yp)
          case 4 => (xp, h - 1 - yp)
          case 5 => (yp, xp)
          case 6 => (yp, h - 1 - xp)
          case 7 => (w - 1 - yp, h - 1 - xp)
          case 8 => (w - 1 - yp, xp)
        }
        out(yp * ow + xp) = raster(sy * w + sx)
        xp += 1
      }
      yp += 1
    }
    Some((out, ow, oh))
  }

  // -----------------------------------------------------------------
  // ICO: multi-image icon container (ICONDIR + per-entry DIB with
  // doubled height: XOR color raster + 1-bpp AND transparency mask)
  // -----------------------------------------------------------------

  /** One decoded icon: canonical top-down RGB raster + per-pixel
    * visibility (AND-mask bit 0 = visible). */
  final case class IcoImage(width: Int, height: Int,
      raster: Array[Byte], visible: Array[Boolean])

  /** Parse an ICO container: ICONDIR header, per-entry offsets, then
    * each embedded headerless BMP (BITMAPINFOHEADER with height
    * DOUBLED for the XOR+AND pair, 24-bpp XOR rows bottom-up BGR with
    * 4-byte padding, then the 1-bpp AND mask with rows padded to 32
    * bits, MSB-first). Returns None on any structural violation. */
  def parseIco(b: Array[Byte]): Option[Seq[IcoImage]] = {
    def u16(i: Int): Int =
      if (i + 2 > b.length) -1
      else (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32l(i: Int): Long =
      if (i + 4 > b.length) -1L
      else (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    if (b.length < 6 || u16(0) != 0 || u16(2) != 1) return None
    val count = u16(4)
    if (count <= 0 || count > 64) return None
    val images = (0 until count).map { k =>
      val e = 6 + 16 * k
      if (e + 16 > b.length) return None
      val off = u32l(e + 12)
      if (off < 0 || off + 40 > b.length) return None
      val p = off.toInt
      if (u32l(p) != 40L) return None // BITMAPINFOHEADER only
      val w = u32l(p + 4).toInt
      val h2 = u32l(p + 8).toInt
      if (w <= 0 || w > 256 || h2 <= 0 || h2 % 2 != 0 || h2 > 512)
        return None
      val h = h2 / 2
      if (u16(p + 12) != 1 || u16(p + 14) != 24) return None // 24 bpp
      if (u32l(p + 16) != 0L) return None // BI_RGB
      val xorStride = (w * 3 + 3) / 4 * 4
      val andStride = (w + 31) / 32 * 4
      val xor0 = p + 40
      val and0 = xor0 + xorStride * h
      if (and0 + andStride * h > b.length) return None
      val raster = new Array[Byte](w * h * 3)
      val visible = new Array[Boolean](w * h)
      var y = 0
      while (y < h) {
        val srcRow = xor0 + (h - 1 - y) * xorStride // bottom-up
        val maskRow = and0 + (h - 1 - y) * andStride
        var x = 0
        while (x < w) {
          val s = srcRow + x * 3
          val d = (y * w + x) * 3
          raster(d) = b(s + 2)     // BGR -> RGB
          raster(d + 1) = b(s + 1)
          raster(d + 2) = b(s)
          val mb = b(maskRow + (x >> 3)) & 0xff
          visible(y * w + x) = ((mb >> (7 - (x & 7))) & 1) == 0
          x += 1
        }
        y += 1
      }
      IcoImage(w, h, raster, visible)
    }
    Some(images)
  }

  /** Deterministic ICO fixture: `dims(k)` sizes each entry; `sample`
    * gives canonical top-down RGB sample (k, i); `transparent` gives
    * the AND-mask bit per (k, pixel). Writes bottom-up BGR with row
    * padding and MSB-first mask rows — everything the parser must
    * invert. */
  def icoBytes(dims: Seq[(Int, Int)], sample: (Int, Int) => Int,
      transparent: (Int, Int) => Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    w16(0); w16(1); w16(dims.length)
    val bodies = dims.zipWithIndex.map { case ((w, h), k) =>
      val xorStride = (w * 3 + 3) / 4 * 4
      val andStride = (w + 31) / 32 * 4
      val body = new Array[Byte](40 + (xorStride + andStride) * h)
      def b32(i: Int, v: Long): Unit = {
        body(i) = (v & 0xff).toByte; body(i + 1) = ((v >> 8) & 0xff).toByte
        body(i + 2) = ((v >> 16) & 0xff).toByte
        body(i + 3) = ((v >> 24) & 0xff).toByte
      }
      b32(0, 40L); b32(4, w.toLong); b32(8, 2L * h)
      body(12) = 1; body(14) = 24 // planes / bpp (LE low bytes)
      var y = 0
      while (y < h) {
        val dstRow = 40 + (h - 1 - y) * xorStride
        val maskRow = 40 + xorStride * h + (h - 1 - y) * andStride
        var x = 0
        while (x < w) {
          val i = (y * w + x) * 3
          body(dstRow + x * 3) = (sample(k, i + 2) & 0xff).toByte     // B
          body(dstRow + x * 3 + 1) = (sample(k, i + 1) & 0xff).toByte // G
          body(dstRow + x * 3 + 2) = (sample(k, i) & 0xff).toByte     // R
          if (transparent(k, y * w + x))
            body(maskRow + (x >> 3)) =
              (body(maskRow + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
          x += 1
        }
        y += 1
      }
      body
    }
    var off = 6 + 16 * dims.length
    dims.zip(bodies).foreach { case ((w, h), body) =>
      out.write(if (w >= 256) 0 else w); out.write(if (h >= 256) 0 else h)
      out.write(0); out.write(0)
      w16(1); w16(24)
      w32(body.length.toLong); w32(off.toLong)
      off += body.length
    }
    bodies.foreach(body => out.write(body, 0, body.length))
    out.toByteArray
  }

  // -----------------------------------------------------------------
  // EXIF: APP1-embedded TIFF metadata inside a JPEG wrapper
  // (Exif 2.x over TIFF 6.0 — tags 0x010F/0x0110/0x0112, the 0x8769
  //  Exif sub-IFD pointer, and 0x829A/0x8827/0xA002/0xA003 inside it)
  // -----------------------------------------------------------------

  final case class ExifMeta(byteOrder: String, make: String,
      model: String, orientation: Long, iso: Long, pxW: Long,
      pxH: Long, expNum: Long, expDen: Long,
      latRef: String = "", lonRef: String = "",
      latDms: Seq[(Long, Long)] = Nil, lonDms: Seq[(Long, Long)] = Nil)

  /** Parse EXIF out of a JPEG: walk the marker stream to APP1, check
    * the "Exif  " identifier, then walk the EMBEDDED TIFF —
    * all TIFF offsets are relative to the TIFF header start, not the
    * file (the classic EXIF implementation bug). Handles both byte
    * orders, inline (≤ 4 byte) and offset-stored ASCII values, SHORT/
    * LONG numeric entries, RATIONAL (two u32 at offset), and the
    * 0x8769 sub-IFD indirection. Returns None on any structural
    * violation — corrupt files take the DLT arm, never throw. */
  def parseExif(b: Array[Byte]): Option[ExifMeta] = {
    if (b.length < 4 || b(0) != 0xff.toByte || b(1) != 0xd8.toByte)
      return None
    // JPEG marker walk to APP1
    var p = 2
    var tiff0 = -1
    var tiffEnd = -1
    while (tiff0 < 0) {
      if (p + 4 > b.length) return None
      if (b(p) != 0xff.toByte) return None
      val marker = b(p + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no APP1
      val segLen = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      if (segLen < 2 || p + 2 + segLen > b.length) return None
      if (marker == 0xe1 && segLen >= 8 &&
          b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
          b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0) {
        tiff0 = p + 10
        tiffEnd = p + 2 + segLen
      } else p += 2 + segLen
    }
    val n = tiffEnd - tiff0
    if (n < 8) return None
    val be =
      if (b(tiff0) == 'M' && b(tiff0 + 1) == 'M') true
      else if (b(tiff0) == 'I' && b(tiff0 + 1) == 'I') false
      else return None
    def u16(off: Int): Int = {
      val i = tiff0 + off
      if (be) ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
      else ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    }
    def u32(off: Int): Long = {
      val i = tiff0 + off
      if (be) ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      else (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    }
    if (u16(2) != 42) return None
    var make = ""; var model = ""
    var orientation = -1L; var iso = -1L
    var pxW = -1L; var pxH = -1L; var expNum = -1L; var expDen = -1L
    var exifIfd = -1L
    def ascii(count: Long, e: Int): Option[String] = {
      if (count <= 0 || count > 256) return None
      val off = if (count <= 4) e + 8 else {
        val o = u32(e + 8)
        if (o + count > n) return None
        o.toInt
      }
      if (off + count > n) return None
      // count includes the NUL terminator
      Some(new String(b, tiff0 + off, count.toInt - 1, "US-ASCII"))
    }
    var gpsIfd = -1L
    var latRef = ""; var lonRef = ""
    var latDms: Seq[(Long, Long)] = Nil
    var lonDms: Seq[(Long, Long)] = Nil
    // IFD modes: 0 = IFD0, 1 = Exif sub-IFD, 2 = GPS sub-IFD
    def walkIfd(at: Long, mode: Int): Boolean = {
      if (at < 8 || at + 2 > n) return false
      val cnt = u16(at.toInt)
      var k = 0
      while (k < cnt) {
        val e = at.toInt + 2 + 12 * k
        if (e + 12 > n) return false
        val tag = u16(e)
        val typ = u16(e + 2)
        val count = u32(e + 4)
        def num: Long = typ match {
          case 3 => u16(e + 8).toLong
          case 4 => u32(e + 8)
          case _ => -1L
        }
        def rationals(cn: Long): Option[Seq[(Long, Long)]] = {
          if (typ != 5 || count != cn) return None
          val o = u32(e + 8)
          if (o < 0 || o + 8 * cn > n) return None
          Some((0 until cn.toInt).map { r =>
            (u32(o.toInt + 8 * r), u32(o.toInt + 8 * r + 4))
          })
        }
        (mode, tag) match {
          case (0, 0x010f) if typ == 2 =>
            make = ascii(count, e).getOrElse(return false)
          case (0, 0x0110) if typ == 2 =>
            model = ascii(count, e).getOrElse(return false)
          case (0, 0x0112) => orientation = num
          case (0, 0x8769) if typ == 4 => exifIfd = u32(e + 8)
          case (0, 0x8825) if typ == 4 => gpsIfd = u32(e + 8)
          case (1, 0x829a) =>
            val o = u32(e + 8)
            if (typ != 5 || o + 8 > n) return false
            expNum = u32(o.toInt); expDen = u32(o.toInt + 4)
          case (1, 0x8827) => iso = num
          case (1, 0xa002) => pxW = num
          case (1, 0xa003) => pxH = num
          case (2, 0x0001) if typ == 2 =>
            latRef = ascii(count, e).getOrElse(return false)
          case (2, 0x0002) =>
            latDms = rationals(3L).getOrElse(return false)
          case (2, 0x0003) if typ == 2 =>
            lonRef = ascii(count, e).getOrElse(return false)
          case (2, 0x0004) =>
            lonDms = rationals(3L).getOrElse(return false)
          case _ =>
        }
        k += 1
      }
      true
    }
    if (!walkIfd(u32(4), mode = 0)) return None
    if (exifIfd >= 0 && !walkIfd(exifIfd, mode = 1)) return None
    if (gpsIfd >= 0 && !walkIfd(gpsIfd, mode = 2)) return None
    if (orientation < 0 || iso < 0 || pxW < 0 || pxH < 0 ||
      expDen <= 0 || make.isEmpty || model.isEmpty) return None
    Some(ExifMeta(if (be) "MM" else "II", make, model, orientation,
      iso, pxW, pxH, expNum, expDen, latRef, lonRef, latDms, lonDms))
  }

  /** Deterministic EXIF-bearing JPEG fixture: SOI, an optional COM
    * segment BEFORE APP1 (odd ids — the marker walk must SKIP it, a
    * parser that assumes APP1-first fails those docs), APP1 with
    * "Exif  " + embedded TIFF in either byte order, EOI.
    * The TIFF stores make at a DATA OFFSET (5 bytes > the 4-byte
    * inline window), model INLINE (≤ 4 bytes incl. NUL), exposure as
    * an offset RATIONAL — so all three TIFF value-storage modes are
    * exercised; all offsets are TIFF-header-relative. */
  def exifJpegBytes(bigEndian: Boolean, make: String, model: String,
      orientation: Int, iso: Int, pxW: Int, pxH: Int,
      expNum: Int, expDen: Int, leadingComment: Boolean,
      latRef: Char = 'N', lonRef: Char = 'E',
      lat: Seq[(Int, Int)] = Seq((1, 1), (2, 1), (3, 1)),
      lon: Seq[(Int, Int)] = Seq((4, 1), (5, 1), (6, 1))): Array[Byte] = {
    require(make.length == 4 && model.length <= 3)
    require(lat.length == 3 && lon.length == 3)
    // TIFF layout (offsets from TIFF start):
    //  0 header, 8 IFD0 (5 entries, 66 B), 74 ExifIFD (4 entries,
    //  54 B), 128 GPS IFD (4 entries, 54 B), 182 make (5 B + pad),
    //  188 exposure rational, 196 lat DMS (3x8), 220 lon DMS -> 244
    val t = new Array[Byte](244)
    def w16(i: Int, v: Int): Unit =
      if (bigEndian) { t(i) = (v >> 8).toByte; t(i + 1) = v.toByte }
      else { t(i) = v.toByte; t(i + 1) = (v >> 8).toByte }
    def w32(i: Int, v: Long): Unit =
      if (bigEndian) {
        t(i) = (v >> 24).toByte; t(i + 1) = (v >> 16).toByte
        t(i + 2) = (v >> 8).toByte; t(i + 3) = v.toByte
      } else {
        t(i) = v.toByte; t(i + 1) = (v >> 8).toByte
        t(i + 2) = (v >> 16).toByte; t(i + 3) = (v >> 24).toByte
      }
    t(0) = (if (bigEndian) 'M' else 'I').toByte
    t(1) = t(0)
    w16(2, 42); w32(4, 8L)
    def entry(at: Int, tag: Int, typ: Int, count: Long)(value: Int => Unit): Unit = {
      w16(at, tag); w16(at + 2, typ); w32(at + 4, count); value(at + 8)
    }
    // IFD0
    w16(8, 5)
    entry(10, 0x010f, 2, 5L)(w32(_, 182L))            // make at offset
    entry(22, 0x0110, 2, model.length + 1L) { v =>    // model inline
      var i = 0
      while (i < model.length) { t(v + i) = model(i).toByte; i += 1 }
    }
    entry(34, 0x0112, 3, 1L)(w16(_, orientation))
    entry(46, 0x8769, 4, 1L)(w32(_, 74L))
    entry(58, 0x8825, 4, 1L)(w32(_, 128L))            // GPS sub-IFD
    w32(70, 0L) // next-IFD pointer
    // Exif sub-IFD
    w16(74, 4)
    entry(76, 0x829a, 5, 1L)(w32(_, 188L))
    entry(88, 0x8827, 3, 1L)(w16(_, iso))
    entry(100, 0xa002, 4, 1L)(w32(_, pxW.toLong))
    entry(112, 0xa003, 4, 1L)(w32(_, pxH.toLong))
    w32(124, 0L)
    // GPS sub-IFD (Exif 2.x §4.6.6: refs ASCII-2 inline, DMS as
    // three RATIONALs at offset)
    w16(128, 4)
    entry(130, 0x0001, 2, 2L)(v => t(v) = latRef.toByte)
    entry(142, 0x0002, 5, 3L)(w32(_, 196L))
    entry(154, 0x0003, 2, 2L)(v => t(v) = lonRef.toByte)
    entry(166, 0x0004, 5, 3L)(w32(_, 220L))
    w32(178, 0L)
    var i = 0
    while (i < 4) { t(182 + i) = make(i).toByte; i += 1 }
    w32(188, expNum.toLong); w32(192, expDen.toLong)
    lat.zipWithIndex.foreach { case ((nu, de), r) =>
      w32(196 + 8 * r, nu.toLong); w32(200 + 8 * r, de.toLong)
    }
    lon.zipWithIndex.foreach { case ((nu, de), r) =>
      w32(220 + 8 * r, nu.toLong); w32(224 + 8 * r, de.toLong)
    }
    // JPEG wrapper
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    if (leadingComment) {
      val c = "graft".getBytes("US-ASCII")
      out.write(0xff); out.write(0xfe)
      out.write(0); out.write(c.length + 2)
      out.write(c, 0, c.length)
    }
    val segLen = 2 + 6 + t.length
    out.write(0xff); out.write(0xe1)
    out.write((segLen >> 8) & 0xff); out.write(segLen & 0xff)
    out.write("Exif".getBytes("US-ASCII"), 0, 4)
    out.write(0); out.write(0)
    out.write(t, 0, t.length)
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }
}
