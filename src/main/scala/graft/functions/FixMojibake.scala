package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: mojibake repair — UTF-8 text that was
  * mis-decoded as Windows-1252 somewhere upstream ("café" shipped as
  * "cafÃ©", "—" as "â€”") is re-encoded through the SAME wrong codec
  * and re-decoded as strict UTF-8, undoing the corruption exactly. The
  * ftfy-style pass every crawl corpus runs: encoding damage multiplies
  * token counts and splits dedup groups, so it must be repaired before
  * any text statistic is trusted.
  *
  * Output struct: `fixed` (repaired text) + `rounds` (repairs applied:
  * 0 = already clean; 2 = double mojibake, the second-most-common form
  * in the wild).
  *
  * The codec is "sloppy cp1252" (ftfy's choice, and what Java's own
  * Cp1252 table does): the five bytes Windows-1252 leaves undefined
  * (81 8D 8F 90 9D) map to the same-valued C1 control chars, because a
  * mis-decoder emits exactly those for e.g. the final byte of `”` —
  * strict cp1252 could never round-trip them back.
  *
  * Repair gates (all must hold, else the input passes through
  * untouched — the fail-closed contract of the decode family):
  *   - every char of the string must map back to one cp1252 byte
  *     (real non-Latin text — CJK, emoji — is unmappable and therefore
  *     structurally immune to false repair);
  *   - the resulting bytes must be STRICT valid UTF-8 (overlongs,
  *     surrogates, out-of-range and truncated sequences all reject —
  *     this is what protects genuine Latin-1-alphabet text: "à la
  *     carte" encodes to E0 20 ..., an invalid sequence);
  *   - the repair must SHRINK the string (true mojibake always
  *     collapses 2-4 chars into one);
  *   - at most [[FixMojibake.MaxRounds]] rounds, stopping at fixpoint.
  *
  * Scale shape: scan-fused per-row projection, zero shuffle; pure ASCII
  * rows exit on the first fixpoint check.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = FixMojibake.outType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fix_mojibake needs a string child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    FixMojibake.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("moji")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $out =
         |  graft.functions.FixMojibake.compute($c);
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {

  val outType: DataType = StructType(Seq(
    StructField("fixed", StringType, nullable = false),
    StructField("rounds", IntegerType, nullable = false)))

  val MaxRounds = 3

  /** cp1252 bytes 0x80-0x9F → chars (the 0x00-0x7F and 0xA0-0xFF ranges
    * are identity); undefined positions take the sloppy C1 mapping. */
  private val Hi: Array[Char] = Array(
    0x20ac, 0x0081, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021,
    0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008d, 0x017d, 0x008f,
    0x0090, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014,
    0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, 0x009d, 0x017e, 0x0178
  ).map(_.toChar)

  /** char → cp1252 byte; absent when unmappable. */
  private val Enc: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    var b = 0x80
    while (b <= 0x9f) { m.put(Hi(b - 0x80), b); b += 1 }
    m
  }

  private def encodeSloppy1252(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80 || (c >= 0xa0 && c <= 0xff)) out(i) = c.toByte
      else {
        val b = Enc.get(c)
        if (b == null) return null
        out(i) = b.intValue.toByte
      }
      i += 1
    }
    out
  }

  /** Strict UTF-8 decode: overlongs, surrogates, >U+10FFFF and
    * truncations all return null. */
  private def decodeStrictUtf8(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val c0 = b(i) & 0xff
      if (c0 < 0x80) { sb.append(c0.toChar); i += 1 }
      else if (c0 < 0xc2) return null // continuation or overlong lead
      else {
        val n = if (c0 < 0xe0) 2 else if (c0 < 0xf0) 3 else if (c0 < 0xf5) 4 else return null
        if (i + n > b.length) return null
        var cp = c0 & (0x7f >> n)
        var j = 1
        while (j < n) {
          val cb = b(i + j) & 0xff
          if ((cb & 0xc0) != 0x80) return null
          cp = (cp << 6) | (cb & 0x3f)
          j += 1
        }
        if (n == 3 && cp < 0x800) return null
        if (n == 4 && cp < 0x10000) return null
        if (cp >= 0xd800 && cp <= 0xdfff) return null
        if (cp > 0x10ffff) return null
        sb.appendCodePoint(cp)
        i += n
      }
    }
    sb.toString
  }

  /** Never null for non-null input. Called from generated code. */
  def compute(text: UTF8String): GenericInternalRow = {
    var cur = text.toString
    var rounds = 0
    var go = true
    while (go && rounds < MaxRounds) {
      val bytes = encodeSloppy1252(cur)
      val dec = if (bytes == null) null else decodeStrictUtf8(bytes)
      if (dec == null || dec == cur || dec.length >= cur.length) go = false
      else { cur = dec; rounds += 1 }
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(cur), rounds))
  }
}
