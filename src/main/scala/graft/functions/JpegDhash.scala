package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: JPEG payload → 64-bit perceptual dHash.
  *
  * The JPEG sibling of [[PngDhash]] — crawled image corpora are
  * dominantly JPEG, so a perceptual near-dup pass that only decodes PNG
  * covers the minority container. Decode rides the JDK's BUNDLED
  * baseline/progressive JPEG reader (`javax.imageio`, the same
  * zero-new-dependencies class as `java.util.zip.Inflater`): signature
  * gate (SOI), header-only dimension read FIRST (so a hostile SOF
  * claiming gigapixel dims is rejected before any pixel allocation),
  * full decode, integer luma ((77R+150G+29B)>>8 — for grayscale JPEGs
  * r=g=b so the >>8 of the 256-weight sum reproduces the sample
  * exactly), then the same 9×8 box grid / gradient-sign packing as
  * [[PngDhash.dhashOfGray]] — one hash space, so a PNG re-encode of a
  * JPEG collapses with its source across containers.
  *
  * Undecodable shapes (non-JPEG bytes, truncated entropy stream, dims
  * < 9×8, > 16 Mpixel claims) return NULL — "no perceptual signal",
  * same contract as PngDhash.
  *
  * Scale shape: pure scan-fused projection, per-row CPU, zero shuffle —
  * embarrassingly parallel at 100 TB like every other decode.
  */
case class JpegDhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jpeg_dhash needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    JpegDhash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("jdh")
      s"""
         |java.lang.Long $boxed = graft.functions.JpegDhash.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegDhash =
    copy(child = newChild)
}

object JpegDhash {

  /** Full pipeline: ImageIO JPEG decode → integer luma → 9×8 box grid →
    * 64-bit dHash. Null (never an exception) on anything undecodable.
    * Called from generated code. */
  def compute(blob: Array[Byte]): java.lang.Long = {
    if (blob == null || blob.length < 4) return null
    if (blob(0) != 0xff.toByte || blob(1) != 0xd8.toByte) return null // SOI
    viaImageIO(blob)
  }

  /** Shared ImageIO decode → luma → dHash body: the caller has already
    * gated on its container signature, so whichever bundled JDK reader
    * claims the bytes (JPEG, GIF, BMP, …) does the decode. Same
    * header-dims-first hostile-payload gate and null-on-undecodable
    * contract for every container riding it. */
  private[functions] def viaImageIO(blob: Array[Byte]): java.lang.Long = {
    var iis: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      reader = readers.next()
      reader.setInput(iis, true, true)
      // dims from the header BEFORE decoding: a corrupt/hostile SOF can
      // claim 65535×65535 (4.3 G samples) — reject above 16 Mpixel
      // without allocating pixels, mirroring PngDhash's 64 MB raw cap
      val w = reader.getWidth(0)
      val h = reader.getHeight(0)
      if (w < 9 || h < 8 || w.toLong * h > (16L << 20)) return null
      java.lang.Long.valueOf(dhashOfImage(reader.read(0), w, h))
    } catch {
      case _: java.io.IOException => null
      case _: RuntimeException => null // ImageIO throws IAE/ISE on exotic corruption
    } finally {
      if (reader != null) reader.dispose()
      if (iis != null) try iis.close() catch { case _: java.io.IOException => () }
    }
  }

  /** Decoded BufferedImage → integer luma → dHash. Shared by the
    * single-image path above and the multi-frame GIF walk
    * ([[GifFrameDhashes]]); luma weights sum to 256 so gray inputs
    * (r=g=b=v) reproduce v exactly. */
  private[functions] def dhashOfImage(
      img: java.awt.image.BufferedImage, w: Int, h: Int): Long = {
    val gray = new Array[Int](w * h)
    if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { gray(y * w + x) = r.getSample(x, y, 0); x += 1 }
        y += 1
      }
    } else {
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          gray(y * w + x) =
            (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) + 29 * (p & 0xff)) >> 8
          x += 1
        }
        y += 1
      }
    }
    PngDhash.dhashOfGray(gray, w, h)
  }
}

/** Native Catalyst expression: deterministic synthetic grayscale JPEG
  * from a numeric id — the fixture generator for the JPEG perceptual
  * family ([[JpegDhash]]), the lossy-codec counterpart of
  * `Mm.synthesizePixelPngs`'s pure-SQL PNG assembly (JPEG entropy coding
  * cannot be spelled in SQL expressions, so the encode is a real
  * `javax.imageio` JPEG WRITE — the decode under test then exercises the
  * full DCT/quantization round trip, not a byte replay).
  *
  * The image is 72×64, nine by eight FLAT 8×8-pixel cells — each cell is
  * exactly one JPEG DCT block, so lossy error is DC-quantization only
  * (≤ ~4 grey levels at quality 0.9) — with cell value
  *   v(pat, cy, cx) = 16 + 24·((((pat·31 + cy·7 + cx·13) mod 97) mod 8)) + shift
  * where pat = pmod(id, 167) and shift = pmod(id div 167, 4)·7.
  * Horizontally adjacent cells always differ by ≥ 72 grey levels (the
  * mod-97 step of 13 maps to a mod-8 step of 4 or 5, never 0), so every
  * dHash gradient sign survives quantization with an 18× margin and an
  * oracle can state the hash bits from the FORMULA while the engine must
  * reproduce them through a real lossy container. The shift term gives
  * brightness-shifted near-dup groups (same pat ⇒ identical bits), the
  * class byte dedup cannot see.
  */
case class SynthGrayJpeg(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_gray_jpeg needs a bigint child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SynthGrayJpeg.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SynthGrayJpeg.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SynthGrayJpeg =
    copy(child = newChild)
}

/** Native Catalyst expression: deterministic synthetic grayscale PNG
  * carrying the SAME 72×64 flat-cell image as [[SynthGrayJpeg]] — the
  * cross-container fixture generator (a PNG re-encode of a JPEG has
  * identical pixels; the two containers must land in one dHash space).
  * Stored-deflate IDAT (filter-0 rows, zlib wrapper with dummy
  * checksums — the decoder verifies neither), assembled in a JVM byte
  * loop: the first cut spelled this as nested SQL `transform`s, which
  * are CodegenFallback (interpreted) and measured 45 s for 25k rows at
  * sf1 — the audio family's synthesis-cost lesson, applied again.
  */
case class SynthCellPng(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_cell_png needs a bigint child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SynthCellPng.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SynthCellPng.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SynthCellPng =
    copy(child = newChild)
}

object SynthCellPng {

  import SynthGrayJpeg.{H, W, cellQ}

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // raw = 64·(1+72) = 4672 bytes; IDAT = 2 (zlib hdr) + 5 (stored block
  // hdr: final, LEN 4672 LE, NLEN) + raw + 4 (adler) = 4683 = 0x124B
  private val Head: Array[Byte] = hx(
    "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000048" + "00000040" + "0800000000" + "00000000" +
      "0000124B" + "49444154" + "7801" + "01" + "4012" + "BFED")
  private val Tail: Array[Byte] = hx(
    "00000000" + "00000000" + "0000000049454E44AE426082")

  /** One synthetic cell PNG. Called from generated code. */
  def compute(id: Long): Array[Byte] = {
    val pat = java.lang.Math.floorMod(id, 167L)
    val shift = java.lang.Math.floorMod(id / 167, 4L).toInt * 7
    val out = new Array[Byte](Head.length + (1 + W) * H + Tail.length)
    System.arraycopy(Head, 0, out, 0, Head.length)
    var o = Head.length
    var y = 0
    while (y < H) {
      out(o) = 0 // filter: none
      o += 1
      var x = 0
      while (x < W) {
        out(o) = (16 + 24 * cellQ(pat, y / 8, x / 8) + shift).toByte
        o += 1
        x += 1
      }
      y += 1
    }
    System.arraycopy(Tail, 0, out, o, Tail.length)
    out
  }
}

object SynthGrayJpeg {

  val W = 72
  val H = 64

  /** The oracle-stated cell value (before the brightness shift). */
  def cellQ(pat: Long, cy: Int, cx: Int): Int =
    ((((pat * 31 + cy * 7 + cx * 13) % 97) % 8)).toInt

  /** Encode one synthetic image. Called from generated code. */
  def compute(id: Long): Array[Byte] = {
    val pat = java.lang.Math.floorMod(id, 167L)
    val shift = java.lang.Math.floorMod(id / 167, 4L).toInt * 7
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        raster.setSample(x, y, 0, 16 + 24 * cellQ(pat, y / 8, x / 8) + shift)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(2048)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.9f)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.flush()
    } finally {
      writer.dispose()
      try ios.close() catch { case _: java.io.IOException => () }
    }
    out.toByteArray
  }
}
