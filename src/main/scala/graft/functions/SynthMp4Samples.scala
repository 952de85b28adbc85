package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: deterministic MP4 with a REAL sample
  * table — the fixture generator for `mm_frames_mp4` (true video frame
  * extraction: a player finds frame bytes through stsz/stco, not by
  * slicing at even offsets). Layout is the full spec nesting a real
  * muxer emits:
  *
  *   ftyp(20) moov( mvhd(108) trak( tkhd(92) mdia( mdhd(32) minf(
  *     stbl( stts(24) stsz(20+4F) stco(16+4F) ))))) mdat(text bytes)
  *
  * with F = pmod(id,4)+2 samples of size sz(i) = 16 + (id+i) mod 17,
  * one chunk per sample, chunk offsets ABSOLUTE file offsets into the
  * mdat payload (the ISO-BMFF contract) — so the oracle can state every
  * offset/size from id alone and md5 the same text slice the engine
  * must reach THROUGH the table walk. A JVM byte loop per the
  * synthesis-cost lesson (SQL HOF assembly is interpreted).
  */
case class SynthMp4Samples(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_mp4_samples needs (bigint, string), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(id: Any, text: Any): Any =
    SynthMp4Samples.compute(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SynthMp4Samples.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthMp4Samples =
    copy(left = l, right = r)
}

object SynthMp4Samples {

  def sampleCount(id: Long): Int = java.lang.Math.floorMod(id, 4L).toInt + 2
  def sampleSize(id: Long, i: Int): Int = 16 + java.lang.Math.floorMod(id + i, 17L).toInt

  /** Called from generated code. */
  def compute(id: Long, text: UTF8String): Array[Byte] = {
    val f = sampleCount(id)
    val payload = text.getBytes
    // CLAMP the declared sample table to the payload: the formula sizes
    // can total more bytes than the text provides (356/5000 docs at
    // sf0.1), and an unclamped stco/stsz would point past mdat — a
    // spec-invalid file that only round-tripped because both the engine
    // slice and the oracle substr happened to clamp identically. With
    // the clamp the file is valid for ANY payload; trailing samples
    // shrink to 0 bytes (md5 of empty), and the oracle replays
    // least(rel, n) / least(rel+sz, n) - least(rel, n).
    val rel = new Array[Int](f + 1)
    (0 until f).foreach(i => rel(i + 1) = rel(i) + sampleSize(id, i))
    def cl(x: Int): Int = math.min(x, payload.length)
    val stblLen = 8 + 24 + (20 + 4 * f) + (16 + 4 * f)
    val minfLen = 8 + stblLen
    val mdiaLen = 8 + 32 + minfLen
    val trakLen = 8 + 92 + mdiaLen
    val moovLen = 8 + 108 + trakLen
    val mdatOff = 20 + moovLen // file offset of the mdat box header
    val out = java.nio.ByteBuffer.allocate(mdatOff + 8 + payload.length)
    def box(len: Int, tpe: String): Unit = {
      out.putInt(len); out.put(tpe.getBytes("US-ASCII"))
    }
    // ftyp
    box(20, "ftyp"); out.put("isom".getBytes); out.putInt(0x200); out.put("isom".getBytes)
    // moov > mvhd (v0: timescale 1000, duration 1000·f ms)
    box(moovLen, "moov")
    box(108, "mvhd"); out.putInt(0); out.putInt(0); out.putInt(0)
    out.putInt(1000); out.putInt(1000 * f); out.putInt(0x00010000)
    out.putShort(0x0100.toShort); out.putShort(0); out.putInt(0); out.putInt(0)
    putMatrix(out); (0 until 6).foreach(_ => out.putInt(0)); out.putInt(2)
    // trak > tkhd (v0, 320×240)
    box(trakLen, "trak")
    box(92, "tkhd"); out.putInt(7); out.putInt(0); out.putInt(0); out.putInt(1)
    out.putInt(0); out.putInt(1000 * f); out.putInt(0); out.putInt(0)
    out.putShort(0); out.putShort(0); out.putShort(0); out.putShort(0)
    putMatrix(out); out.putInt(320 << 16); out.putInt(240 << 16)
    // mdia > mdhd (v0) > minf > stbl
    box(mdiaLen, "mdia")
    box(32, "mdhd"); out.putInt(0); out.putInt(0); out.putInt(0)
    out.putInt(1000); out.putInt(1000 * f); out.putShort(0x55c4.toShort); out.putShort(0)
    box(minfLen, "minf")
    box(stblLen, "stbl")
    box(24, "stts"); out.putInt(0); out.putInt(1); out.putInt(f); out.putInt(1000)
    box(20 + 4 * f, "stsz"); out.putInt(0); out.putInt(0); out.putInt(f)
    (0 until f).foreach(i => out.putInt(cl(rel(i + 1)) - cl(rel(i))))
    box(16 + 4 * f, "stco"); out.putInt(0); out.putInt(f)
    (0 until f).foreach(i => out.putInt(mdatOff + 8 + cl(rel(i))))
    // mdat
    box(8 + payload.length, "mdat"); out.put(payload)
    out.array()
  }

  private def putMatrix(b: java.nio.ByteBuffer): Unit = {
    b.putInt(0x00010000); b.putInt(0); b.putInt(0)
    b.putInt(0); b.putInt(0x00010000); b.putInt(0)
    b.putInt(0); b.putInt(0); b.putInt(0x40000000)
  }
}
