package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: STANDALONE TIFF and BMP header dims —
  * the two remaining crawl image containers the decode family
  * ([[graft.operators.Mm.decodeImageMeta]] for PNG/JPEG, GIF/WebP
  * siblings) didn't reach. The TIFF walk is the same endian-aware IFD
  * scan [[ExifMeta]] performs inside a JPEG APP1, here rooted at byte 0
  * of a bare `II*\0` / `MM\0*` file: IFD0's 12-byte entry table read
  * for ImageWidth (0x0100) and ImageLength (0x0101), SHORT or LONG,
  * inline or offset-addressed. BMP is fixed-offset arithmetic: `BM`,
  * then the DIB header size at byte 14 selects the INFO family
  * (40/52/56/108/124 — core headers with u16 dims are pre-1990 and
  * rejected), width/height as SIGNED i32le at 18/22 (negative height =
  * top-down row order; reported as |height| with the flag).
  *
  * Hostile bounds follow ExifMeta: offsets validated before every read,
  * 64-entry IFD cap, no allocation on garbage — NULL, never junk dims.
  * Scale shape: scan-fused per-row projection, zero shuffle.
  */
case class TiffBmpDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TiffBmpDims.outType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tiff_bmp_dims needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TiffBmpDims.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("tbd")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $out =
         |  graft.functions.TiffBmpDims.compute($c);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TiffBmpDims =
    copy(child = newChild)
}

object TiffBmpDims {

  val outType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("endian", StringType, nullable = true),  // TIFF only
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("top_down", LongType, nullable = true))) // BMP only

  val MaxIfdEntries = 64

  /** Null unless the blob is a standalone TIFF or a BITMAPINFO-family
    * BMP with in-bounds headers. Called from generated code. */
  def compute(blob: Array[Byte]): GenericInternalRow = {
    if (blob.length >= 8 &&
        ((blob(0) == 'I' && blob(1) == 'I' && blob(2) == 42 && blob(3) == 0) ||
         (blob(0) == 'M' && blob(1) == 'M' && blob(2) == 0 && blob(3) == 42)))
      return tiff(blob)
    if (blob.length >= 26 && blob(0) == 'B' && blob(1) == 'M')
      return bmp(blob)
    null
  }

  private def tiff(blob: Array[Byte]): GenericInternalRow = {
    val le = blob(0) == 'I'
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
    var width = -1L
    var height = -1L
    var i = 0
    while (i < n) {
      val e = base + 2 + 12 * i
      if (e + 12 > blob.length) return null
      val tag = u16(e)
      if (tag == 0x0100 || tag == 0x0101) {
        val typ = u16(e + 2)
        val count = u32(e + 4)
        if (count != 1L) return null // dims are scalar per the spec
        // SHORT(3) inline in the first 2 value bytes; LONG(4) fills it
        val v =
          if (typ == 3) u16(e + 8).toLong
          else if (typ == 4) u32(e + 8)
          else return null
        if (v < 0) return null
        if (tag == 0x0100) width = v else height = v
      }
      i += 1
    }
    if (width < 0 || height < 0) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("tiff"),
      UTF8String.fromString(if (le) "II" else "MM"),
      width, height, null))
  }

  private def bmp(blob: Array[Byte]): GenericInternalRow = {
    def i32(q: Int): Int =
      (blob(q) & 0xff) | ((blob(q + 1) & 0xff) << 8) |
        ((blob(q + 2) & 0xff) << 16) | ((blob(q + 3) & 0xff) << 24)
    val dib = i32(14)
    if (dib != 40 && dib != 52 && dib != 56 && dib != 108 && dib != 124)
      return null
    val w = i32(18)
    val h = i32(22)
    if (w <= 0 || h == 0 || h == Int.MinValue) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("bmp"), null,
      w.toLong, math.abs(h).toLong,
      (if (h < 0) 1L else 0L): java.lang.Long))
  }
}
