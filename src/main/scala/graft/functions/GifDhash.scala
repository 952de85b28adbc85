package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: GIF payload → 64-bit perceptual dHash.
  *
  * The third image container of the percept family — after JPEG and PNG,
  * GIF is the most common crawl container (icons, memes, legacy web
  * graphics), and the reference ingest is container-agnostic
  * (packages/app/bundles/custom/aws/s3/s3-connector.ts:1), so a
  * perceptual pass that skips GIF silently misses a real corpus slice.
  * Decode is the native [[GifRaster]] walk (zero dependencies, r12 —
  * ImageIO-parity-pinned in PropertySpec): signature gate
  * ("GIF87a"/"GIF89a"), bounded palette/LZW decode,
  * the same integer luma and 9×8 box grid — ONE hash space, so a GIF
  * re-encode of a PNG/JPEG collapses with its source across containers.
  * GIF is lossless for ≤256 distinct colors, so flat-cell fixtures
  * round-trip their exact pixel values (the oracle replays the formula).
  *
  * Undecodable shapes return NULL — same contract as Png/JpegDhash.
  * Scale shape: scan-fused per-row projection, zero shuffle.
  */
case class GifDhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gif_dhash needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    GifDhash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("gdh")
      s"""
         |java.lang.Long $boxed = graft.functions.GifDhash.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GifDhash =
    copy(child = newChild)
}

object GifDhash {

  /** Signature gate ("GIF87a"/"GIF89a") then the native [[GifRaster]]
    * decode of the FIRST frame (r12 — the ImageIO path's per-row
    * plumbing measured ~1 ms/image; PropertySpec pins the two decoders
    * luma-identical on ImageIO-written GIFs) → shared luma → dHash
    * body. Called from generated code. */
  def compute(blob: Array[Byte]): java.lang.Long = {
    val fs = GifRaster.frames(blob, 1, 16L << 20)
    if (fs == null || fs.isEmpty) return null
    val f = fs(0)
    if (f.w < 9 || f.h < 8) return null
    java.lang.Long.valueOf(PngDhash.dhashOfGray(f.luma, f.w, f.h))
  }
}

/** Native Catalyst expression: deterministic synthetic grayscale GIF
  * carrying the SAME 72×64 flat-cell image as [[SynthGrayJpeg]] /
  * [[SynthCellPng]] — the third cross-container fixture. The encode is
  * a real `javax.imageio` GIF WRITE (LZW + gray palette); GIF is
  * lossless at ≤256 colors and the cell image uses at most 32 distinct
  * grays, so the decode-under-test recovers the exact formula pixels
  * and the container-blind cell oracle applies unchanged.
  */
case class SynthCellGif(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_cell_gif needs a bigint child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SynthCellGif.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SynthCellGif.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SynthCellGif =
    copy(child = newChild)
}

object SynthCellGif {

  import SynthGrayJpeg.{H, W, cellQ}

  /** Encode one synthetic cell GIF. Called from generated code. */
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
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), null)
      ios.flush()
    } finally {
      writer.dispose()
      try ios.close() catch { case _: java.io.IOException => () }
    }
    out.toByteArray
  }
}
