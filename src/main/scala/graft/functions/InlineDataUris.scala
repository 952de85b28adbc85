package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass extraction of `data:<mime>;base64,` payloads from
  * markup — the extraction half of the inline-image ingest
  * ([[graft.operators.Mm.inlineImageHashes]]). One indexOf-driven scan
  * per row replaces two regex passes (measured 2.0 s → the r11 regex
  * was 1.1 s and could over-capture; the r12 anchored regex pair was
  * correct but 1.8× the cost — this expression is both correct AND
  * cheaper than either).
  *
  * Anchoring contract (the r11 advice finding): a URI opened by a
  * quote or `(` — an HTML attribute value or CSS `url()` — may wrap
  * across CR/LF line breaks (MIME-wrapped base64, which Spark's own
  * `base64` and real crawl markup both emit) and ends at the first
  * character outside the base64 alphabet, such as its closing
  * delimiter. An UNDELIMITED URI ends at the first line break or other
  * non-alphabet character: HTML terminates an unquoted attribute value
  * at whitespace, so newline-followed prose ("…base64,AAAA\nfoo") can
  * no longer bleed into the payload. Line breaks are stripped DURING
  * collection — callers feed the result straight to `unbase64`.
  * Payloads surface in document order, one element per occurrence;
  * other MIME types never match (the needle includes the full
  * `data:<mime>;base64,` prefix).
  *
  * All needle/alphabet bytes are ASCII, so the walk is byte-exact over
  * UTF-8 with no decode. Scale shape: scan-fused per-row projection,
  * zero shuffle; output bounded by the row's own match count.
  */
case class InlineDataUris(child: Expression, mime: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"inline_data_uris needs a string child, got ${child.dataType}")
    else if (mime.isEmpty || !mime.forall(c => c < 128 && !c.isWhitespace))
      TypeCheckResult.TypeCheckFailure(
        s"inline_data_uris mime must be non-empty ASCII, got '$mime'")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val needle: Array[Byte] =
    s"data:$mime;base64,".getBytes("US-ASCII")

  override protected def nullSafeEval(input: Any): Any =
    InlineDataUris.compute(input.asInstanceOf[UTF8String], needle)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val needleRef = ctx.addReferenceObj("needle", needle, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.InlineDataUris.compute($c, $needleRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): InlineDataUris =
    copy(child = newChild)
}

object InlineDataUris {

  private def isB64(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '+' || b == '/' || b == '='

  /** Called from generated code. */
  def compute(html: UTF8String, needle: Array[Byte])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = html.getBytes
    val out = new java.util.ArrayList[AnyRef]()
    var i = indexOf(bytes, needle, 0)
    while (i >= 0) {
      val delimited = i > 0 && {
        val d = bytes(i - 1)
        d == '"' || d == '\'' || d == '('
      }
      var p = i + needle.length
      val sb = new java.lang.StringBuilder()
      var done = false
      while (!done && p < bytes.length) {
        val b = bytes(p)
        if (isB64(b)) { sb.append(b.toChar); p += 1 }
        else if (delimited && (b == '\r' || b == '\n')) p += 1 // MIME wrap
        else done = true
      }
      if (sb.length > 0)
        out.add(UTF8String.fromString(sb.toString))
      i = indexOf(bytes, needle, p)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(Array.empty[AnyRef]))
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    val last = hay.length - needle.length
    var i = math.max(from, 0)
    while (i <= last) {
      if (hay(i) == needle(0)) {
        var j = 1
        while (j < needle.length && hay(i + j) == needle(j)) j += 1
        if (j == needle.length) return i
      }
      i += 1
    }
    -1
  }
}
