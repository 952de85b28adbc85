package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: PNG payload → 64-bit perceptual dHash.
  *
  * The one structurally-missing piece of the multimodal dedup family
  * until now: `mm_dedup_binary` collapses byte-identical payloads, but
  * re-encoded/re-compressed/brightness-shifted duplicates — the dominant
  * near-dup class in crawled images — have different bytes and identical
  * CONTENT. dHash is the standard cheap answer: decode pixels, downsample
  * to a 9×8 grayscale grid, emit one bit per horizontal gradient sign
  * (64 bits). Gradients make it exactly invariant to global brightness
  * shifts and robust to resizing/re-encoding; near-dups then collapse by
  * hamming-block bucketing (the simhash machinery, reused).
  *
  * Decode is a REAL PNG decode with zero new dependencies — the JVM
  * ships the codec parts that matter:
  *   - chunk walk (IHDR dims/depth/color/interlace, all IDATs
  *     concatenated in order, spec: any chunk layout with IHDR first);
  *   - zlib inflate via `java.util.zip.Inflater` (nowrap, with explicit
  *     2- or 6-byte zlib header skip — CRCs and adler are deliberately
  *     NOT verified, like every fast-path image pipeline);
  *   - scanline unfiltering, all five PNG filter types (None/Sub/Up/
  *     Average/Paeth — libpng writers emit adaptive per-row filters, so
  *     a real decoder cannot skip any of them);
  *   - every color type: gray (0), RGB (2), palette (3 — integer luma
  *     over the PLTE entry each index names), gray+alpha (4), RGBA (6);
  *     luma is (77R+150G+29B)>>8, alpha ignored;
  *   - every legal depth: 8- and 16-bit samples (16-bit is big-endian;
  *     the high byte is the spec's >>8 reduction) AND the packed
  *     sub-byte depths (1/2/4, MSB-first) for gray and palette — the
  *     favicon/1-bit-scan shapes; sub-byte gray upscales by
  *     255/(2^d−1), sub-byte rows filter at the spec's 1-byte grain;
  *   - Adam7 INTERLACED streams: the seven reduced-image passes are
  *     unfiltered independently (per-pass widths and filter
  *     neighborhoods) and scattered back to the full grid.
  * Undecodable shapes (dims < 9×8, truncated or non-PNG bytes, palette
  * without/past its PLTE) return NULL rather than a junk hash — callers
  * filter nulls into the "no perceptual signal" bucket.
  *
  * Downsample/bit arithmetic is EXACT integer math (box averages with
  * floor boundaries i·W/9, bit = right cell > left cell, packed
  * row-major MSB-first), so an oracle can replay the hash positions on
  * the synthesized fixture pixels independently of the codec path.
  *
  * Scale shape: pure scan-fused projection — decode cost is per-row CPU,
  * zero shuffle, zero state; at 100 TB the operator is embarrassingly
  * parallel and IO-bound like every other scan.
  */
case class PngDhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"png_dhash needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PngDhash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("dh")
      s"""
         |java.lang.Long $boxed = graft.functions.PngDhash.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PngDhash =
    copy(child = newChild)
}

object PngDhash {

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Adam7 pass geometry: (xStart, yStart, xStep, yStep) per the PNG
    * spec's interlace grid. */
  val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Full pipeline: parse → inflate → unfilter → gray → 9×8 box average →
    * 64-bit dHash. Null (not an exception) on anything undecodable.
    * Called from generated code. */
  def compute(blob: Array[Byte]): java.lang.Long = {
    try {
      if (blob.length < 45) return null
      var i = 0
      while (i < 8) { if (blob(i) != SIG(i)) return null; i += 1 }
      // chunk walk: IHDR must be first (spec); gather all IDAT data
      if (u32(blob, 8) != 13L || blob(12) != 'I' || blob(13) != 'H' ||
          blob(14) != 'D' || blob(15) != 'R') return null
      val w = u32(blob, 16).toInt
      val h = u32(blob, 20).toInt
      val bitDepth = blob(24) & 0xff
      val colorType = blob(25) & 0xff
      val interlace = blob(28) & 0xff
      if (w < 9 || h < 8) return null
      if (interlace > 1) return null // 0 = none, 1 = Adam7; else corrupt
      // 8/16-bit samples everywhere; PLUS the packed sub-byte depths
      // (1/2/4) the spec allows for gray(0) and palette(3) — favicons
      // and 1-bit scans. RGB/gray+alpha/RGBA are 8- or 16-bit only.
      val channels = colorType match {
        case 0 | 3 => 1
        case 2 => 3
        case 4 => 2
        case 6 => 4
        case _ => return null
      }
      val depthOk = bitDepth match {
        case 8 | 16 => colorType != 3 || bitDepth == 8
        case 1 | 2 | 4 => colorType == 0 || colorType == 3
        case _ => false
      }
      if (!depthOk) return null
      val subBits = if (bitDepth < 8) bitDepth else 0
      val bps = math.max(1, bitDepth / 8) // bytes/sample; 16-bit big-endian
      // filter neighborhood distance: ceil(bits per pixel / 8), so every
      // sub-byte depth filters at 1-byte grain (the spec's definition)
      val bpp = channels * bps
      // LONG math: a hostile IHDR width (e.g. 0x20000000 × RGBA) would
      // overflow Int to a NEGATIVE row size, dodge the 64 MB gate below
      // and crash on a negative array alloc instead of returning null
      def rowBytesOf(wp: Int): Long =
        if (subBits > 0) (wp.toLong * subBits + 7) / 8 else wp.toLong * bpp
      // pixel-count gate before any pixel-grain allocation: the raw-size
      // gate alone admits 512 M pixels of 1-bit data = a 2 GB gray array.
      // 16 Mpixel — the SAME bound JpegDhash.viaImageIO applies, so every
      // decoder of the shared hash space holds one hostile-payload memory
      // ceiling (gray Int array ≤ 64 MB per task)
      if (w.toLong * h > (16L << 20)) return null
      // interlace passes: (xStart, yStart, xStep, yStep) — one identity
      // pass when non-interlaced, the seven Adam7 passes otherwise (the
      // raw stream is the concatenation of each pass's own filtered
      // scanlines at the REDUCED width; empty passes contribute nothing)
      val passes: Array[(Int, Int, Int, Int)] =
        if (interlace == 0) Array((0, 0, 1, 1)) else PngDhash.Adam7
      def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
        val (xs, ys, xst, yst) = p
        (if (w > xs) (w - xs + xst - 1) / xst else 0,
          if (h > ys) (h - ys + yst - 1) / yst else 0)
      }
      // dimension sanity BEFORE any allocation: a corrupt/hostile IHDR
      // can claim dims whose raw size overflows Int (negative array
      // size — an uncaught crash, not a null) or allocates gigabytes
      // per row. 64 MB raw (≈ a 16-megapixel RGBA frame) is far above
      // any thumbnail-dedup need; beyond it the payload is "no
      // perceptual signal", same as every other undecodable shape.
      val rawLen = passes.map { p =>
        val (wp, hp) = passDims(p)
        if (wp > 0 && hp > 0) (1L + rowBytesOf(wp)) * hp.toLong else 0L
      }.sum
      if (rawLen > (64L << 20)) return null
      // concatenate IDAT payloads (writers split them freely); for
      // palette images also grab PLTE (spec: precedes the first IDAT)
      val idat = new java.io.ByteArrayOutputStream()
      var plteOff = -1
      var plteLen = 0
      var p = 8 + 12 + 13 // after IHDR chunk (len+type+data+crc)
      var done = false
      while (!done && p + 8 <= blob.length) {
        val len = u32(blob, p).toInt
        if (len < 0 || p + 12 + len > blob.length) return null
        val t = new String(blob, p + 4, 4, "US-ASCII")
        if (t == "IDAT") idat.write(blob, p + 8, len)
        if (t == "PLTE") { plteOff = p + 8; plteLen = len }
        if (t == "IEND") done = true
        p += 12 + len
      }
      // palette luma table: PLTE is RGB triples; an index past the table
      // is a spec violation → null, not a junk hash
      var palLuma: Array[Int] = null
      if (colorType == 3) {
        if (plteOff < 0 || plteLen < 3 || plteLen % 3 != 0) return null
        palLuma = new Array[Int](plteLen / 3)
        var pi = 0
        while (pi < palLuma.length) {
          val o = plteOff + pi * 3
          palLuma(pi) = (77 * (blob(o) & 0xff) + 150 * (blob(o + 1) & 0xff) +
            29 * (blob(o + 2) & 0xff)) >> 8
          pi += 1
        }
      }
      val z = idat.toByteArray
      if (z.length < 3) return null
      // zlib header: CMF/FLG. FDICT streams would need setDictionary with
      // a preset window this decoder doesn't have (PNG forbids them
      // anyway) — null outright rather than attempting an inflate that
      // would silently decode wrong if it never references the window
      if ((z(1) & 0x20) != 0) return null
      val skip = 2
      val raw = new Array[Byte](rawLen.toInt)
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(z, skip, z.length - skip)
        var off = 0
        while (off < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, off, raw.length - off)
          if (n == 0 && inf.needsInput()) return null // truncated
          off += n
        }
        if (off < raw.length) return null
      } finally inf.end()

      // unfilter per pass, scattering gray values to the full grid.
      // 16-bit samples read their HIGH byte (the spec's >>8 reduction);
      // gray+alpha/RGBA ignore alpha for luma like every dHash pipeline.
      val gray = new Array[Int](w * h)
      var rawOff = 0
      var pi2 = 0
      while (pi2 < passes.length) {
        val (xs, ys, xst, yst) = passes(pi2)
        val (wp, hp) = passDims(passes(pi2))
        if (wp > 0 && hp > 0) {
          val rdb = rowBytesOf(wp).toInt // ≤ rawLen ≤ 64 MB post-gate
          val rb = 1 + rdb
          val prior = new Array[Byte](rdb)
          val cur = new Array[Byte](rdb)
          var y = 0
          while (y < hp) {
            val base = rawOff + y * rb
            val ft = raw(base) & 0xff
            var x = 0
            while (x < rdb) {
              val rv = raw(base + 1 + x) & 0xff
              val a = if (x >= bpp) cur(x - bpp) & 0xff else 0 // left
              val b = prior(x) & 0xff // up
              val c = if (x >= bpp) prior(x - bpp) & 0xff else 0 // up-left
              val rec = ft match {
                case 0 => rv
                case 1 => rv + a
                case 2 => rv + b
                case 3 => rv + ((a + b) >> 1)
                case 4 =>
                  val pp = a + b - c
                  val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
                  rv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
                case _ => return null
              }
              cur(x) = (rec & 0xff).toByte
              x += 1
            }
            var px = 0
            while (px < wp) {
              val g =
                if (subBits > 0) {
                  // packed MSB-first sub-byte sample (index or gray)
                  val bitPos = px * subBits
                  val v = (cur(bitPos >> 3) >> (8 - subBits - (bitPos & 7))) &
                    ((1 << subBits) - 1)
                  if (palLuma != null) {
                    if (v >= palLuma.length) return null
                    palLuma(v)
                  } else v * 255 / ((1 << subBits) - 1) // gray upscale
                } else {
                  val o = px * bpp
                  if (palLuma != null) {
                    val idx = cur(o) & 0xff
                    if (idx >= palLuma.length) return null
                    palLuma(idx)
                  } else if (channels < 3) cur(o) & 0xff // gray / gray+alpha
                  else (77 * (cur(o) & 0xff) + 150 * (cur(o + bps) & 0xff) +
                    29 * (cur(o + 2 * bps) & 0xff)) >> 8
                }
              gray((ys + y * yst) * w + (xs + px * xst)) = g
              px += 1
            }
            System.arraycopy(cur, 0, prior, 0, rdb)
            y += 1
          }
          rawOff += hp * rb
        }
        pi2 += 1
      }
      java.lang.Long.valueOf(dhashOfGray(gray, w, h))
    } catch {
      case _: java.util.zip.DataFormatException => null
      case _: ArrayIndexOutOfBoundsException => null
      // belt-and-braces: no size arithmetic should go negative after the
      // Long-math gates above, but a corrupt container must never take
      // down the whole task
      case _: NegativeArraySizeException => null
    }
  }

  /** 9×8 box-average grid (floor boundaries i·W/9 horizontally, j·H/8
    * vertically, integer floor averages), then bit r·8+c (row-major,
    * MSB-first) = grid[r][c+1] > grid[r][c]. Exposed for the oracle-
    * replay spec. */
  def dhashOfGray(gray: Array[Int], w: Int, h: Int): Long = {
    val grid = new Array[Int](9 * 8)
    var j = 0
    while (j < 8) {
      val y0 = j * h / 8
      val y1 = (j + 1) * h / 8
      var i = 0
      while (i < 9) {
        val x0 = i * w / 9
        val x1 = (i + 1) * w / 9
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += gray(y * w + x); x += 1 }
          y += 1
        }
        grid(j * 9 + i) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        i += 1
      }
      j += 1
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        hash = (hash << 1) | (if (grid(r * 9 + c + 1) > grid(r * 9 + c)) 1L else 0L)
        c += 1
      }
      r += 1
    }
    hash
  }
}
