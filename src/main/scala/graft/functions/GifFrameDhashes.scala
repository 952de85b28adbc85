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
  * the JDK's multi-frame GIF reader: `getNumImages(true)` counts the
  * real image descriptors, each frame decodes through the shared
  * [[JpegDhash.dhashOfImage]] luma→9×8-grid body — the SAME hash space
  * as every other container, so a frame that re-encodes a known still
  * collapses with it.
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

  /** One GIF reader per executor thread, reused across rows: the
    * registry lookup + reader construction + dispose cycle is pure
    * per-row overhead (ImageReader is not thread-safe, so the reuse
    * rides a ThreadLocal; `setInput` resets the reader's state between
    * rows). Never disposed — one small object per live thread. */
  private val localReader = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (it.hasNext) it.next() else null
    }
  }

  /** Signature gate then the multi-frame decode. Called from generated
    * code. */
  def compute(blob: Array[Byte]): ArrayData = {
    if (blob == null || blob.length < 6) return null
    if (blob(0) != 'G' || blob(1) != 'I' || blob(2) != 'F' ||
        blob(3) != '8' || (blob(4) != '7' && blob(4) != '9') ||
        blob(5) != 'a') return null
    var iis: javax.imageio.stream.ImageInputStream = null
    val reader: javax.imageio.ImageReader = localReader.get()
    if (reader == null) return null
    try {
      iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      // seekForwardOnly = false: counting frames requires a full scan
      reader.setInput(iis, false, true)
      // getNumImages(true) pre-scans the block structure once; the
      // read-until-IndexOutOfBounds alternative measured SLOWER (the
      // per-row end-of-sequence exception costs more than the scan)
      val n = math.min(reader.getNumImages(true), MaxFrames)
      if (n <= 0) return null
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val w = reader.getWidth(i)
        val h = reader.getHeight(i)
        if (w < 9 || h < 8 || w.toLong * h > (16L << 20)) return null
        out(i) = JpegDhash.dhashOfImage(reader.read(i), w, h)
        i += 1
      }
      new GenericArrayData(out)
    } catch {
      case _: java.io.IOException => null
      case _: RuntimeException => null
    } finally {
      reader.setInput(null) // drop the stream reference, keep the reader
      if (iis != null) try iis.close() catch { case _: java.io.IOException => () }
    }
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
