package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** BMP and standalone-TIFF perceptual hashing — the FIFTH and SIXTH
  * image containers of the one-hash-space percept family (after PNG,
  * JPEG, GIF and the audio/video siblings): both containers got header
  * -dims decode in r12 (`TiffBmpDims`); these expressions complete them
  * with full-raster decode → the shared integer-luma → 9×8-grid dHash,
  * so a BMP or TIFF re-encode of a known PNG/JPEG/GIF still collapses
  * with its source. Both decodes are zero-dependency (the GifRaster
  * precedent — the pixel layouts are uncompressed, so a native walk is
  * both the fast path and the smaller trust surface); the JDK's ImageIO
  * BMP/TIFF readers stay as the REFERENCE implementations in the specs.
  *
  *  - [[BmpDhash]]: BITMAPINFO-family, 24-bit BI_RGB uncompressed —
  *    the overwhelmingly dominant wild BMP shape. Rows are 4-byte
  *    -padded BGR, bottom-up for positive heights, top-down for
  *    negative (both decoded; the hash is of the RENDERED orientation,
  *    matching what a viewer and ImageIO show).
  *  - [[TiffDhash]]: both byte orders, 8-bit single-sample grayscale
  *    (PhotometricInterpretation BlackIsZero), Compression=1
  *    (uncompressed), strip-organized via StripOffsets/StripByteCounts
  *    (any strip count). The IFD walk is the TiffBmpDims machinery with
  *    the raster-layout tags added.
  *
  * Shapes outside those profiles return NULL — the percept family's
  * undecodable contract, not a parse failure. Hostile bounds: offsets
  * length-checked, dims gated by the caller-shared 16 Mpixel cap, the
  * 9×8 grid minimum enforced before any allocation.
  *
  * [[SynthCellBmp]]/[[SynthCellTiff]] write the SAME 72×64 cell-formula
  * image as the PNG/JPEG/GIF fixture generators — both containers are
  * lossless here, so the container-blind cell oracle applies unchanged.
  * Scale shape: all four are scan-fused per-row projections, zero
  * shuffle.
  */
case class BmpDhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bmp_dhash needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BmpDhash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("bdh")
      s"""
         |java.lang.Long $boxed = graft.functions.BmpDhash.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BmpDhash =
    copy(child = newChild)
}

object BmpDhash {

  /** 24-bit BI_RGB BITMAPINFO decode → luma → dHash; null otherwise.
    * Called from generated code. */
  def compute(blob: Array[Byte]): java.lang.Long = {
    if (blob == null || blob.length < 54 || blob(0) != 'B' || blob(1) != 'M')
      return null
    def i32(q: Int): Int =
      (blob(q) & 0xff) | ((blob(q + 1) & 0xff) << 8) |
        ((blob(q + 2) & 0xff) << 16) | ((blob(q + 3) & 0xff) << 24)
    def u16(q: Int): Int = (blob(q) & 0xff) | ((blob(q + 1) & 0xff) << 8)
    val dataOff = i32(10)
    val dib = i32(14)
    if (dib != 40 && dib != 52 && dib != 56 && dib != 108 && dib != 124)
      return null
    val w = i32(18)
    val hRaw = i32(22)
    if (w < 9 || hRaw == 0 || hRaw == Int.MinValue) return null
    val h = math.abs(hRaw)
    if (h < 8 || w.toLong * h > (16L << 20)) return null
    if (u16(28) != 24 || i32(30) != 0) return null // 24bpp BI_RGB only
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (dataOff < 14 + dib ||
        dataOff.toLong + rowSize.toLong * h > blob.length) return null
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      // positive height: rows stored bottom-up; negative: top-down
      val srcRow = if (hRaw > 0) h - 1 - y else y
      var p = dataOff + srcRow * rowSize
      var x = 0
      while (x < w) {
        val b = blob(p) & 0xff
        val g = blob(p + 1) & 0xff
        val r = blob(p + 2) & 0xff
        gray(y * w + x) = (77 * r + 150 * g + 29 * b) >> 8
        p += 3; x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(PngDhash.dhashOfGray(gray, w, h))
  }
}

/** See [[BmpDhash]]'s scaladoc — the TIFF half. */
case class TiffDhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tiff_dhash needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TiffDhash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("tdh")
      s"""
         |java.lang.Long $boxed = graft.functions.TiffDhash.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TiffDhash =
    copy(child = newChild)
}

object TiffDhash {

  val MaxIfdEntries = 64
  val MaxStrips = 4096

  /** 8-bit gray uncompressed strip-organized TIFF decode → dHash; null
    * otherwise. Called from generated code. */
  def compute(blob: Array[Byte]): java.lang.Long = {
    if (blob == null || blob.length < 8) return null
    val le =
      if (blob(0) == 'I' && blob(1) == 'I' && blob(2) == 42 && blob(3) == 0) true
      else if (blob(0) == 'M' && blob(1) == 'M' && blob(2) == 0 && blob(3) == 42) false
      else return null
    def u16(q: Int): Int = {
      if (q < 0 || q + 2 > blob.length) return -1
      if (le) (blob(q) & 0xff) | ((blob(q + 1) & 0xff) << 8)
      else ((blob(q) & 0xff) << 8) | (blob(q + 1) & 0xff)
    }
    def u32(q: Int): Long = {
      if (q < 0 || q + 4 > blob.length) return -1L
      if (le) (blob(q) & 0xffL) | ((blob(q + 1) & 0xffL) << 8) |
        ((blob(q + 2) & 0xffL) << 16) | ((blob(q + 3) & 0xffL) << 24)
      else ((blob(q) & 0xffL) << 24) | ((blob(q + 1) & 0xffL) << 16) |
        ((blob(q + 2) & 0xffL) << 8) | (blob(q + 3) & 0xffL)
    }
    val ifd0 = u32(4)
    if (ifd0 < 0 || ifd0 + 2 > blob.length) return null
    val base = ifd0.toInt
    val n = u16(base)
    if (n < 0 || n > MaxIfdEntries) return null
    var width = -1L; var height = -1L
    var bps = 1L; var compression = 1L; var photometric = 1L; var spp = 1L
    var rowsPerStrip = Long.MaxValue
    var stripOffE = -1; var stripCntE = -1 // entry positions, decoded later
    var i = 0
    while (i < n) {
      val e = base + 2 + 12 * i
      if (e + 12 > blob.length) return null
      val tag = u16(e)
      val typ = u16(e + 2)
      val count = u32(e + 4)
      def scalar: Long =
        if (count != 1L) -1L
        else if (typ == 3) u16(e + 8).toLong
        else if (typ == 4) u32(e + 8)
        else -1L
      tag match {
        case 0x0100 => width = scalar
        case 0x0101 => height = scalar
        case 0x0102 => bps = scalar
        case 0x0103 => compression = scalar
        case 0x0106 => photometric = scalar
        case 0x0111 => stripOffE = e
        case 0x0115 => spp = scalar
        case 0x0116 => rowsPerStrip = scalar
        case 0x0117 => stripCntE = e
        case _ => ()
      }
      i += 1
    }
    // decodable profile: 8-bit single-sample BlackIsZero, uncompressed
    if (width < 9 || height < 8 || width * height > (16L << 20)) return null
    if (bps != 8 || compression != 1 || photometric != 1 || spp != 1) return null
    if (stripOffE < 0 || stripCntE < 0 || rowsPerStrip <= 0) return null
    // strip arrays: SHORT or LONG, inline when they fit in the value slot
    def stripArray(e: Int): Array[Long] = {
      val typ = u16(e + 2)
      val count = u32(e + 4)
      if (count <= 0 || count > MaxStrips) return null
      val unit = if (typ == 3) 2 else if (typ == 4) 4 else return null
      val atL = if (count * unit <= 4) (e + 8).toLong else u32(e + 8)
      if (atL < 0 || atL + count * unit > blob.length) return null
      val at = atL.toInt
      val out = new Array[Long](count.toInt)
      var k = 0
      while (k < out.length) {
        out(k) = if (unit == 2) u16(at + 2 * k).toLong else u32(at + 4 * k)
        if (out(k) < 0) return null
        k += 1
      }
      out
    }
    val offs = stripArray(stripOffE)
    val cnts = stripArray(stripCntE)
    if (offs == null || cnts == null || offs.length != cnts.length) return null
    val w = width.toInt; val h = height.toInt
    val expectStrips = (h + rowsPerStrip - 1) / math.min(rowsPerStrip, h.toLong)
    if (offs.length != expectStrips) return null
    val gray = new Array[Int](w * h)
    var row = 0
    var s = 0
    while (s < offs.length) {
      val rows = math.min(rowsPerStrip, h.toLong - row).toInt
      if (cnts(s) != w.toLong * rows) return null
      val off = offs(s)
      if (off < 0 || off + cnts(s) > blob.length) return null
      var k = 0
      val p0 = off.toInt
      val outBase = row * w
      while (k < w * rows) { gray(outBase + k) = blob(p0 + k) & 0xff; k += 1 }
      row += rows
      s += 1
    }
    if (row != h) return null
    java.lang.Long.valueOf(PngDhash.dhashOfGray(gray, w, h))
  }
}

/** See [[BmpDhash]]'s scaladoc — the BMP cell-fixture writer (pure byte
  * assembly, no ImageIO: the container IS the test surface). */
case class SynthCellBmp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_cell_bmp needs a bigint child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SynthCellBmp.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SynthCellBmp.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SynthCellBmp =
    copy(child = newChild)
}

object SynthCellBmp {

  import SynthGrayJpeg.{H, W, cellQ}

  /** 24bpp bottom-up BI_RGB BMP of the cell image; id ≡ 2 (mod 4) of the
    * family's usage writes TOP-DOWN (negative height) so both row orders
    * live in every corpus slice. Called from generated code. */
  def compute(id: Long): Array[Byte] = {
    val pat = java.lang.Math.floorMod(id, 167L)
    val shift = java.lang.Math.floorMod(id / 167, 4L).toInt * 7
    val topDown = java.lang.Math.floorMod(id, 4L) == 2L
    val rowSize = ((W * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + rowSize * H)
    def u16(p: Int, v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >> 8).toByte
    }
    def i32(p: Int, v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >> 8).toByte
      out(p + 2) = (v >> 16).toByte; out(p + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    i32(2, out.length); i32(10, 54)
    i32(14, 40); i32(18, W); i32(22, if (topDown) -H else H)
    u16(26, 1); u16(28, 24); i32(30, 0); i32(34, rowSize * H)
    var y = 0
    while (y < H) {
      // stored row y renders at (bottom-up: H-1-y; top-down: y)
      val imgY = if (topDown) y else H - 1 - y
      var p = 54 + y * rowSize
      var x = 0
      while (x < W) {
        val v = (16 + 24 * cellQ(pat, imgY / 8, x / 8) + shift).toByte
        out(p) = v; out(p + 1) = v; out(p + 2) = v
        p += 3; x += 1
      }
      y += 1
    }
    out
  }
}

/** See [[BmpDhash]]'s scaladoc — the TIFF cell-fixture writer. Byte
  * order alternates with id parity; strip organization alternates
  * between one whole-image strip and 16-row strips, so the decoder's
  * strip walk is exercised by every corpus slice. */
case class SynthCellTiff(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_cell_tiff needs a bigint child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SynthCellTiff.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SynthCellTiff.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SynthCellTiff =
    copy(child = newChild)
}

object SynthCellTiff {

  import SynthGrayJpeg.{H, W, cellQ}

  /** 8-bit gray uncompressed TIFF of the cell image. Called from
    * generated code. */
  def compute(id: Long): Array[Byte] = {
    val pat = java.lang.Math.floorMod(id, 167L)
    val shift = java.lang.Math.floorMod(id / 167, 4L).toInt * 7
    val le = java.lang.Math.floorMod(id, 2L) == 0L
    val rowsPerStrip = if (java.lang.Math.floorMod(id, 4L) < 2L) H else 16
    val nStrips = (H + rowsPerStrip - 1) / rowsPerStrip
    // layout: 8B header | pixel data | strip arrays (if not inline) | IFD
    val pixOff = 8
    val nEntries = 9
    val arrBytes = if (nStrips == 1) 0 else 2 * 4 * nStrips // two LONG arrays
    val arrOff = pixOff + W * H
    val ifdOff = arrOff + arrBytes
    val out = new Array[Byte](ifdOff + 2 + 12 * nEntries + 4)
    def u16(p: Int, v: Int): Unit =
      if (le) { out(p) = v.toByte; out(p + 1) = (v >> 8).toByte }
      else { out(p) = (v >> 8).toByte; out(p + 1) = v.toByte }
    def u32(p: Int, v: Int): Unit =
      if (le) {
        out(p) = v.toByte; out(p + 1) = (v >> 8).toByte
        out(p + 2) = (v >> 16).toByte; out(p + 3) = (v >> 24).toByte
      } else {
        out(p) = (v >> 24).toByte; out(p + 1) = (v >> 16).toByte
        out(p + 2) = (v >> 8).toByte; out(p + 3) = v.toByte
      }
    if (le) { out(0) = 'I'; out(1) = 'I'; out(2) = 42 }
    else { out(0) = 'M'; out(1) = 'M'; out(3) = 42 }
    u32(4, ifdOff)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        out(pixOff + y * W + x) =
          (16 + 24 * cellQ(pat, y / 8, x / 8) + shift).toByte
        x += 1
      }
      y += 1
    }
    // strip arrays past the raster when more than one strip
    if (nStrips > 1) {
      var s = 0
      while (s < nStrips) {
        val rows = math.min(rowsPerStrip, H - s * rowsPerStrip)
        u32(arrOff + 4 * s, pixOff + s * rowsPerStrip * W)
        u32(arrOff + 4 * nStrips + 4 * s, rows * W)
        s += 1
      }
    }
    // IFD: ascending tags, SHORT where the spec prefers it
    u16(ifdOff, nEntries)
    var e = ifdOff + 2
    def entry(tag: Int, typ: Int, count: Int, inline: Int => Unit): Unit = {
      u16(e, tag); u16(e + 2, typ); u32(e + 4, count); inline(e + 8)
      e += 12
    }
    def shortVal(v: Int)(p: Int): Unit = u16(p, v) // upper half stays 0
    entry(0x0100, 3, 1, shortVal(W))
    entry(0x0101, 3, 1, shortVal(H))
    entry(0x0102, 3, 1, shortVal(8))
    entry(0x0103, 3, 1, shortVal(1))
    entry(0x0106, 3, 1, shortVal(1))
    if (nStrips == 1) entry(0x0111, 4, 1, p => u32(p, pixOff))
    else entry(0x0111, 4, nStrips, p => u32(p, arrOff))
    entry(0x0115, 3, 1, shortVal(1))
    entry(0x0116, 3, 1, shortVal(rowsPerStrip))
    if (nStrips == 1) entry(0x0117, 4, 1, p => u32(p, W * H))
    else entry(0x0117, 4, nStrips, p => u32(p, arrOff + 4 * nStrips))
    u32(e, 0) // next IFD
    out
  }
}
