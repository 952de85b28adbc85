package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native Catalyst expression: animated GIF → one 64-bit perceptual
  * dHash PER FRAME — the GIF counterpart of the mp4 sample-table walk
  * (video-ish content arrives as animated GIFs in any real crawl, and a
  * static-only pass sees just the cover frame). Signature gate, then
  * the native [[GifRaster]] block walk (LZW + palette luma + interlace
  * — r12, replacing the ImageIO reader), each frame hashed through the
  * shared luma→9×8-grid body — the SAME hash space as every other
  * container, so a frame that re-encodes a known still collapses with
  * it.
  *
  * Bounds: frames capped at 64 (the mp4 walk's sample cap), per-frame
  * dims under the shared 16 Mpixel hostile gate. Frames are hashed as
  * their RAW stored rasters (no disposal compositing): full-frame
  * animations — including every fixture this library writes —
  * round-trip exactly; delta-frame GIFs hash their deltas, which still
  * dedups byte-identical re-encodes. NULL on anything undecodable.
  * Scale shape: scan-fused per-row projection, zero shuffle.
  */
case class GifFrameDhashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gif_frame_dhashes needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    GifFrameDhashes.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("gfd")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $boxed =
         |  graft.functions.GifFrameDhashes.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GifFrameDhashes =
    copy(child = newChild)
}

object GifFrameDhashes {

  val MaxFrames = 64

  /** Signature gate then the native multi-frame decode ([[GifRaster]]):
    * the ImageIO reader spent ~1 ms/frame on metadata plumbing, color
    * -model setup and BufferedImage allocation for rasters the LZW
    * decode itself handles in tens of µs. (Two rejected intermediate
    * variants, both measured: a ThreadLocal-reused ImageReader — 2.77
    * → 2.32 s — and read-until-IndexOutOfBounds instead of
    * getNumImages(true), which was SLOWER because the per-row
    * end-of-sequence exception costs more than the pre-scan.)
    * PropertySpec pins GifRaster luma-identical to the JDK decoder on
    * ImageIO-written images. Called from generated code. */
  def compute(blob: Array[Byte]): ArrayData = {
    val fs = GifRaster.frames(blob, MaxFrames, 16L << 20)
    if (fs == null || fs.isEmpty) return null
    val out = new Array[Long](fs.length)
    var i = 0
    while (i < fs.length) {
      val f = fs(i)
      if (f.w < 9 || f.h < 8) return null
      out(i) = PngDhash.dhashOfGray(f.luma, f.w, f.h)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: deterministic synthetic ANIMATED GIF —
  * F = pmod(id,3)+2 full frames of the 72×64 cell-formula family, frame
  * k rendered with pat_k = pmod(id + 37·k, 167) (37 is coprime to 167,
  * so frames sweep distinct patterns) and the sibling generators'
  * brightness shift. A real `javax.imageio` GIF sequence write
  * (prepareWriteSequence/writeToSequence); lossless at ≤256 grays, so
  * every frame's decode replays its formula bits exactly — the oracle
  * can state each frame's dHash from (id, k) alone.
  */
case class SynthAnimGif(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_anim_gif needs a bigint child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SynthAnimGif.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SynthAnimGif.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SynthAnimGif =
    copy(child = newChild)
}

object SynthAnimGif {

  import SynthGrayJpeg.{H, W, cellQ}

  def frameCount(id: Long): Int = java.lang.Math.floorMod(id, 3L).toInt + 2
  def framePat(id: Long, k: Int): Long = java.lang.Math.floorMod(id + 37L * k, 167L)

  /** Encode one synthetic animated GIF. Called from generated code. */
  def compute(id: Long): Array[Byte] = {
    val f = frameCount(id)
    val shift = java.lang.Math.floorMod(id / 167, 4L).toInt * 7
    val out = new java.io.ByteArrayOutputStream(4096)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var k = 0
      while (k < f) {
        val pat = framePat(id, k)
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
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        k += 1
      }
      writer.endWriteSequence()
      ios.flush()
    } finally {
      writer.dispose()
      try ios.close() catch { case _: java.io.IOException => () }
    }
    out.toByteArray
  }
}
