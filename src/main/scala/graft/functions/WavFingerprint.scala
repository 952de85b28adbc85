package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: WAV (PCM) payload → 64-bit perceptual
  * audio fingerprint — the dHash recipe applied to the second modality.
  *
  * Decode is a real RIFF/WAVE chunk walk (little-endian sizes, `fmt `
  * validated as uncompressed 16-bit PCM, first channel extracted), then
  * EXACT integer feature math so an oracle can replay the bits from a
  * synthesized sample formula:
  *   - the track splits into 17 equal time frames (floor boundaries
  *     f·n/17, mirroring the image grid's box edges);
  *   - each frame yields 4 integer band energies: Σ|x| (amplitude) and
  *     Σ|x[i]−x[i−lag]| for lag 1/2/4 (first differences at three
  *     strides — cheap high-/mid-band proxies; diffs never cross a
  *     frame boundary);
  *   - bit (f·4+b), packed MSB-first over f=0..15: band b's energy
  *     RISES from frame f to f+1. Adjacent-frame gradient signs make
  *     the hash exactly invariant to any uniform gain change (volume
  *     normalization, the audio analog of brightness) and robust to
  *     resampling (band energies scale together), while re-encoded or
  *     gain-ridden duplicates that byte-md5 cannot see collapse within
  *     a small hamming radius — bucketed by the same 4×16-bit
  *     pigeonhole machinery as the image percept family.
  *
  * Undecodable shapes (non-RIFF bytes, compressed/8-bit formats,
  * truncated data, fewer than 34 samples) return NULL — "no perceptual
  * signal". Scale shape: scan-fused per-row projection, zero shuffle.
  */
case class WavFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_fingerprint needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WavFingerprint.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("wfp")
      s"""
         |java.lang.Long $boxed = graft.functions.WavFingerprint.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavFingerprint =
    copy(child = newChild)
}

/** Native Catalyst expression: deterministic synthetic PCM WAV from a
  * numeric id — the audio fixture generator ([[WavFingerprint]]'s
  * counterpart of [[SynthGrayJpeg]]). A real RIFF/WAVE container
  * (mono, 16-bit, 8 kHz) carrying 544 samples of
  *   s(t) = gain · amp(t div 32) · w(t),
  * pat = pmod(id,167), gain = pmod(id div 167,3)+1,
  * amp(f) = ((pat·31+f·13) mod 97) mod 9 + 1,
  * w(t) = (t·37+pat·11) mod 7 − 3 —
  * the exact formula the mm_dedup_percept_audio oracle replays per
  * sample, so the fingerprint bits are externally stated while the
  * engine must re-derive them through the real container parse. A JVM
  * byte loop, not a 544-element SQL hex transform: the construction is
  * fixture plumbing and must not dominate the operator under test
  * (measured 18.5 s at sf1 as expressions).
  */
case class SynthPcmWav(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_pcm_wav needs a bigint child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SynthPcmWav.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SynthPcmWav.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SynthPcmWav =
    copy(child = newChild)
}

object SynthPcmWav {

  val N = 544

  private val Header: Array[Byte] = {
    val dataLen = N * 2
    val bos = new java.io.ByteArrayOutputStream(44)
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    bos.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); le32(16); le16(1); le16(1)
    le32(8000); le32(16000); le16(2); le16(16)
    bos.write("data".getBytes("US-ASCII")); le32(dataLen)
    bos.toByteArray
  }

  /** One synthetic WAV. Called from generated code. */
  def compute(id: Long): Array[Byte] = {
    val pat = java.lang.Math.floorMod(id, 167L)
    val gain = java.lang.Math.floorMod(id / 167, 3L) + 1
    val out = new Array[Byte](Header.length + N * 2)
    System.arraycopy(Header, 0, out, 0, Header.length)
    var t = 0
    while (t < N) {
      val amp = ((pat * 31 + (t / 32) * 13) % 97) % 9 + 1
      val w = (t * 37 + pat * 11) % 7 - 3
      val s = (gain * amp * w).toInt
      out(Header.length + 2 * t) = (s & 0xff).toByte
      out(Header.length + 2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    out
  }
}

object WavFingerprint {

  val Frames = 17
  val Lags: Array[Int] = Array(0, 1, 2, 4) // 0 = plain amplitude

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Full pipeline: RIFF walk → PCM16 channel 0 → 17×4 integer band
    * energies → 64-bit gradient hash. Null on anything undecodable.
    * Called from generated code. */
  def compute(blob: Array[Byte]): java.lang.Long = {
    try {
      if (blob.length < 44) return null
      if (blob(0) != 'R' || blob(1) != 'I' || blob(2) != 'F' || blob(3) != 'F' ||
          blob(8) != 'W' || blob(9) != 'A' || blob(10) != 'V' || blob(11) != 'E')
        return null
      // chunk walk: [4-char id][u32 le size][payload]; sizes from
      // hostile bytes are clamped by the length guards
      var fmtOff = -1
      var dataOff = -1
      var dataLen = 0L
      var p = 12
      while ((fmtOff < 0 || dataOff < 0) && p + 8 <= blob.length) {
        val sz = u32(blob, p + 4)
        val id = new String(blob, p, 4, "US-ASCII")
        if (id == "fmt " && fmtOff < 0) fmtOff = p + 8
        if (id == "data" && dataOff < 0) { dataOff = p + 8; dataLen = sz }
        if (sz < 0 || sz > blob.length) return null
        // RIFF chunks are 2-byte aligned: an odd-sized chunk (LIST/INFO
        // text is the common case) is followed by a pad byte the size
        // field does NOT count — skipping it keeps the walk aligned
        // instead of silently degrading real WAVs to the byte-hash path
        p += 8 + sz.toInt + (sz.toInt & 1)
      }
      if (fmtOff < 0 || dataOff < 0 || fmtOff + 16 > blob.length) return null
      val audioFormat = u16(blob, fmtOff)
      val channels = u16(blob, fmtOff + 2)
      val bits = u16(blob, fmtOff + 14)
      if (audioFormat != 1 || bits != 16 || channels < 1) return null
      val blockAlign = channels * 2
      val avail = math.min(dataLen, (blob.length - dataOff).toLong)
      val n = (avail / blockAlign).toInt
      if (n < 2 * Frames) return null
      // channel 0, signed 16-bit little-endian
      val x = new Array[Int](n)
      var i = 0
      while (i < n) {
        x(i) = (u16(blob, dataOff + i * blockAlign) << 16) >> 16
        i += 1
      }
      java.lang.Long.valueOf(fingerprintOf(x))
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  /** The exact-integer feature half, exposed for the oracle-replay and
    * resample fixtures: frames → band energies → gradient bits. */
  def fingerprintOf(x: Array[Int]): Long = {
    val n = x.length
    val e = Array.ofDim[Long](Frames, Lags.length)
    var f = 0
    while (f < Frames) {
      val i0 = (f.toLong * n / Frames).toInt
      val i1 = ((f + 1).toLong * n / Frames).toInt
      var b = 0
      while (b < Lags.length) {
        val lag = Lags(b)
        var s = 0L
        var i = i0 + lag
        while (i < i1) {
          s += (if (lag == 0) math.abs(x(i).toLong)
                else math.abs(x(i).toLong - x(i - lag)))
          i += 1
        }
        e(f)(b) = s
        b += 1
      }
      f += 1
    }
    var hash = 0L
    f = 0
    while (f < Frames - 1) {
      var b = 0
      while (b < Lags.length) {
        hash = (hash << 1) | (if (e(f + 1)(b) > e(f)(b)) 1L else 0L)
        b += 1
      }
      f += 1
    }
    hash
  }
}
