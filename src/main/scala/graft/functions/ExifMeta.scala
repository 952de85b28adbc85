package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: JPEG EXIF metadata decode — a real crawl
  * image pipeline needs orientation (to normalize before any perceptual
  * hash), camera identity, and capture time, and all three live in the
  * APP1 segment's embedded TIFF structure, NOT in the JPEG codestream.
  *
  * The walk a real reader performs: JPEG marker scan from SOI to the
  * APP1 segment carrying the `Exif\0\0` signature → TIFF header (the
  * byte-order flag `II`/`MM` decides the endianness of EVERY following
  * integer — both orders are produced in the wild and both are pinned in
  * MmSpec) → IFD0 entry table (12-byte entries; inline values occupy the
  * value slot, longer values live at a TIFF-relative offset) → the Exif
  * sub-IFD behind tag 0x8769. Extracted: orientation (0x0112), make
  * (0x010F), capture time (0x0132), and the sub-IFD's pixel-X dimension
  * (0xA002).
  *
  * Hostile bounds: every offset is validated against the segment before
  * any read, IFDs cap at 64 entries, ASCII values at 256 bytes, and the
  * sub-IFD nesting is one level — garbage walks to NULL in bounded
  * reads, never an allocation or a scan. Scale shape: scan-fused per-row
  * projection, zero shuffle.
  */
case class ExifMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ExifMeta.outType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exif_meta needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ExifMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("exif")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $out =
         |  graft.functions.ExifMeta.compute($c);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ExifMeta =
    copy(child = newChild)
}

object ExifMeta {

  val outType: DataType = StructType(Seq(
    StructField("endian", StringType, nullable = false),
    StructField("orientation", LongType, nullable = true),
    StructField("make", StringType, nullable = true),
    StructField("datetime", StringType, nullable = true),
    StructField("pixel_x", LongType, nullable = true)))

  val MaxIfdEntries = 64
  val MaxAsciiBytes = 256

  /** Null unless the blob is a JPEG with a well-formed EXIF APP1.
    * Called from generated code. */
  def compute(blob: Array[Byte]): GenericInternalRow = {
    if (blob.length < 4 || blob(0) != 0xff.toByte || blob(1) != 0xd8.toByte)
      return null
    // marker scan: each segment is FF <marker> <u16 len incl itself>;
    // stop at SOS (no EXIF past entropy-coded data) or a bad structure
    var p = 2
    var tiff = -1
    var tiffEnd = -1
    while (tiff < 0) {
      if (p + 4 > blob.length || blob(p) != 0xff.toByte) return null
      val marker = blob(p + 1) & 0xff
      if (marker == 0xda || marker == 0xd9) return null // SOS/EOI: no EXIF
      val len = ((blob(p + 2) & 0xff) << 8) | (blob(p + 3) & 0xff)
      if (len < 2 || p + 2 + len > blob.length) return null
      if (marker == 0xe1 && len >= 16 &&
          blob(p + 4) == 'E' && blob(p + 5) == 'x' && blob(p + 6) == 'i' &&
          blob(p + 7) == 'f' && blob(p + 8) == 0 && blob(p + 9) == 0) {
        tiff = p + 10
        tiffEnd = p + 2 + len
      } else p += 2 + len
    }
    // TIFF header: byte order, magic 42, IFD0 offset (TIFF-relative)
    val le =
      if (blob(tiff) == 'I' && blob(tiff + 1) == 'I') true
      else if (blob(tiff) == 'M' && blob(tiff + 1) == 'M') false
      else return null
    def u16(q: Int): Int = {
      if (q < tiff || q + 2 > tiffEnd) return -1
      if (le) (blob(q) & 0xff) | ((blob(q + 1) & 0xff) << 8)
      else ((blob(q) & 0xff) << 8) | (blob(q + 1) & 0xff)
    }
    def u32(q: Int): Long = {
      if (q < tiff || q + 4 > tiffEnd) return -1L
      if (le) (blob(q) & 0xffL) | ((blob(q + 1) & 0xffL) << 8) |
        ((blob(q + 2) & 0xffL) << 16) | ((blob(q + 3) & 0xffL) << 24)
      else ((blob(q) & 0xffL) << 24) | ((blob(q + 1) & 0xffL) << 16) |
        ((blob(q + 2) & 0xffL) << 8) | (blob(q + 3) & 0xffL)
    }
    if (u16(tiff + 2) != 42) return null
    val ifd0 = u32(tiff + 4)
    if (ifd0 < 0) return null

    var orientation: java.lang.Long = null
    var make: String = null
    var datetime: String = null
    var pixelX: java.lang.Long = null
    var exifIfdOff = -1L

    /** One IFD walk; extraction by tag. Returns false on malformation. */
    def walk(offset: Long, sub: Boolean): Boolean = {
      val base = tiff + offset
      if (offset < 0 || base + 2 > tiffEnd) return false
      val n = u16(base.toInt)
      if (n < 0 || n > MaxIfdEntries) return false
      var i = 0
      while (i < n) {
        val e = base.toInt + 2 + 12 * i
        if (e + 12 > tiffEnd) return false
        val tag = u16(e)
        val typ = u16(e + 2)
        val count = u32(e + 4)
        if (count < 0) return false
        // SHORT(3)=2 bytes, LONG(4)=4, ASCII(2)=1 — the tags we read
        def scalar: Long =
          if (typ == 3) u16(e + 8).toLong
          else if (typ == 4) u32(e + 8)
          else -1L
        def ascii: String = {
          if (typ != 2 || count > MaxAsciiBytes) return null
          // values ≤ 4 bytes are inline; longer live at a TIFF offset.
          // Bounds-check in Long first: a hostile ~2^32 offset wraps
          // through Int truncation to a small value that passes the guards.
          val atL = if (count <= 4) (e + 8).toLong else tiff + u32(e + 8)
          if (atL < tiff || atL + count > tiffEnd) return null
          val at = atL.toInt
          val len = if (count > 0 && blob((at + count - 1).toInt) == 0)
            count - 1 else count // NUL-terminated per spec
          new String(blob, at, len.toInt, "US-ASCII")
        }
        tag match {
          case 0x0112 if !sub => val v = scalar; if (v >= 0) orientation = v
          case 0x010f if !sub => make = ascii
          case 0x0132 if !sub => datetime = ascii
          case 0x8769 if !sub => exifIfdOff = u32(e + 8)
          case 0xa002 if sub => val v = scalar; if (v >= 0) pixelX = v
          case _ => ()
        }
        i += 1
      }
      true
    }
    if (!walk(ifd0, sub = false)) return null
    if (exifIfdOff >= 0 && !walk(exifIfdOff, sub = true)) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(if (le) "II" else "MM"),
      orientation,
      if (make == null) null else UTF8String.fromString(make),
      if (datetime == null) null else UTF8String.fromString(datetime),
      pixelX))
  }
}

/** Native Catalyst expression: deterministic EXIF-bearing JPEG — the
  * [[SynthGrayJpeg]] image with a hand-built APP1/TIFF block injected
  * after SOI, alternating byte order by id parity (`II` even, `MM` odd)
  * so both endianness paths are exercised in one corpus. IFD0 carries
  * orientation 1+(id mod 8), a make string `GraftCam <id mod 5>`, a
  * formulaic capture time, and the Exif sub-IFD pointer; the sub-IFD
  * carries pixel-X = 72 (the synth image's true width). Every value is
  * stated from id alone, so the oracle replays the decode without
  * parsing anything.
  */
case class SynthExifJpeg(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_exif_jpeg needs a bigint child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SynthExifJpeg.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SynthExifJpeg.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SynthExifJpeg =
    copy(child = newChild)
}

object SynthExifJpeg {

  def orientation(id: Long): Int = 1 + java.lang.Math.floorMod(id, 8L).toInt
  def make(id: Long): String = "GraftCam " + java.lang.Math.floorMod(id, 5L)
  def datetime(id: Long): String = {
    val d = 1 + java.lang.Math.floorMod(id, 28L)
    val h = java.lang.Math.floorMod(id, 24L)
    f"2026:01:$d%02d $h%02d:00:00"
  }
  def littleEndian(id: Long): Boolean = java.lang.Math.floorMod(id, 2L) == 0L

  /** Encode: SOI + APP1(EXIF) + the rest of the SynthGrayJpeg stream.
    * Called from generated code. */
  def compute(id: Long): Array[Byte] = {
    val jpeg = SynthGrayJpeg.compute(id)
    val app1 = buildApp1(id)
    val out = new Array[Byte](jpeg.length + app1.length)
    out(0) = 0xff.toByte; out(1) = 0xd8.toByte
    System.arraycopy(app1, 0, out, 2, app1.length)
    System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
    out
  }

  private def buildApp1(id: Long): Array[Byte] = {
    val le = littleEndian(id)
    val mk = (make(id) + "\u0000").getBytes("US-ASCII")
    val dt = (datetime(id) + "\u0000").getBytes("US-ASCII") // 20 bytes, spec length
    // TIFF layout (offsets TIFF-relative):
    //   0: order(2) 42(2) ifd0off(4)=8
    //   8: IFD0: count(2) + 4 entries*12 + next(4)  → data at 8+2+48+4 = 62
    //   62: make string; 62+mk.len: datetime string; then Exif sub-IFD
    val makeOff = 62
    val dtOff = makeOff + mk.length
    val subOff = dtOff + dt.length
    val tiffLen = subOff + 2 + 12 + 4
    val tiff = new Array[Byte](tiffLen)
    def w16(p: Int, v: Int): Unit =
      if (le) { tiff(p) = v.toByte; tiff(p + 1) = (v >>> 8).toByte }
      else { tiff(p) = (v >>> 8).toByte; tiff(p + 1) = v.toByte }
    def w32(p: Int, v: Int): Unit =
      if (le) { tiff(p) = v.toByte; tiff(p + 1) = (v >>> 8).toByte
        tiff(p + 2) = (v >>> 16).toByte; tiff(p + 3) = (v >>> 24).toByte }
      else { tiff(p) = (v >>> 24).toByte; tiff(p + 1) = (v >>> 16).toByte
        tiff(p + 2) = (v >>> 8).toByte; tiff(p + 3) = v.toByte }
    def entry(p: Int, tag: Int, typ: Int, count: Int): Int = {
      w16(p, tag); w16(p + 2, typ); w32(p + 4, count); p + 8
    }
    tiff(0) = (if (le) 'I' else 'M').toByte; tiff(1) = tiff(0)
    w16(2, 42); w32(4, 8)
    w16(8, 4) // IFD0 entry count
    var p = 10
    p = entry(p, 0x010f, 2, mk.length); w32(p, makeOff); p += 4
    p = entry(p, 0x0112, 3, 1); w16(p, orientation(id)); p += 4
    p = entry(p, 0x0132, 2, dt.length); w32(p, dtOff); p += 4
    p = entry(p, 0x8769, 4, 1); w32(p, subOff); p += 4
    w32(p, 0) // next-IFD terminator
    System.arraycopy(mk, 0, tiff, makeOff, mk.length)
    System.arraycopy(dt, 0, tiff, dtOff, dt.length)
    w16(subOff, 1) // Exif sub-IFD: one entry
    val q = entry(subOff + 2, 0xa002, 4, 1); w32(q, SynthGrayJpeg.W)
    w32(subOff + 2 + 12, 0)
    // APP1 wrapper: FF E1, u16 BE length (incl itself), "Exif\0\0", TIFF
    val seg = new Array[Byte](4 + 6 + tiffLen)
    seg(0) = 0xff.toByte; seg(1) = 0xe1.toByte
    val segLen = 2 + 6 + tiffLen
    seg(2) = (segLen >>> 8).toByte; seg(3) = segLen.toByte
    System.arraycopy("Exif".getBytes("US-ASCII"), 0, seg, 4, 4)
    System.arraycopy(tiff, 0, seg, 10, tiffLen)
    seg
  }
}
