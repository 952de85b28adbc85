package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: charset detection for raw ingest bytes —
  * the chardet-style gate a crawl pipeline runs before any text
  * operator touches a payload (feeding Latin-1 bytes to a UTF-8 reader
  * is where mojibake is BORN; this classifier is the upstream
  * prevention, [[FixMojibake]] the downstream cure).
  *
  * Deterministic rule ladder, first match wins:
  *   1. empty input → `empty`;
  *   2. byte-order marks: FF FE → `utf-16le`, FE FF → `utf-16be`,
  *      EF BB BF → `utf-8` (BOM'd UTF-8 is UTF-8);
  *   3. NUL analysis (BEFORE the UTF-8 scan — NUL is technically valid
  *      UTF-8, but NUL-laden streams are never 8-bit text): NULs ONLY
  *      at odd offsets covering ≥ a quarter of the pairs → `utf-16le`
  *      (ASCII-range text in LE puts the zero high byte second), the
  *      even-offset mirror → `utf-16be`, any other NUL → `binary`;
  *   4. strict UTF-8 validation (same overlong/surrogate/range rules as
  *      [[FixMojibake]]'s decoder): all-ASCII → `ascii`, else `utf-8`;
  *   5. otherwise → `latin-1` (8-bit text that is not valid UTF-8).
  *
  * NULL only for NULL input. Scale shape: scan-fused per-row byte walk,
  * zero shuffle, early exit on the first decision.
  */
case class DetectEncoding(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"detect_encoding needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    DetectEncoding.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.DetectEncoding.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): DetectEncoding =
    copy(child = newChild)
}

object DetectEncoding {

  private val Empty = UTF8String.fromString("empty")
  private val Utf16le = UTF8String.fromString("utf-16le")
  private val Utf16be = UTF8String.fromString("utf-16be")
  private val Utf8 = UTF8String.fromString("utf-8")
  private val Ascii = UTF8String.fromString("ascii")
  private val Binary = UTF8String.fromString("binary")
  private val Latin1 = UTF8String.fromString("latin-1")

  /** Never null for non-null input. Called from generated code. */
  def compute(b: Array[Byte]): UTF8String = {
    val n = b.length
    if (n == 0) return Empty
    if (n >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe) return Utf16le
    if (n >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff) return Utf16be
    if (n >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
        (b(2) & 0xff) == 0xbf) return Utf8
    // NUL analysis before the UTF-8 scan (rule 3 above)
    var nulEven = 0
    var nulOdd = 0
    var p = 0
    while (p < n) {
      if (b(p) == 0) { if ((p & 1) == 0) nulEven += 1 else nulOdd += 1 }
      p += 1
    }
    if (nulEven + nulOdd > 0) {
      val pairs = n / 2
      if (nulEven == 0 && nulOdd * 4 >= pairs && pairs > 0) return Utf16le
      if (nulOdd == 0 && nulEven * 4 >= pairs && pairs > 0) return Utf16be
      return Binary
    }
    // strict UTF-8 scan; tracks whether any non-ASCII byte appeared
    var i = 0
    var hasHigh = false
    var valid = true
    while (valid && i < n) {
      val c0 = b(i) & 0xff
      if (c0 < 0x80) i += 1
      else {
        hasHigh = true
        if (c0 < 0xc2) valid = false
        else {
          val len = if (c0 < 0xe0) 2 else if (c0 < 0xf0) 3 else if (c0 < 0xf5) 4 else { valid = false; 0 }
          if (valid) {
            if (i + len > n) valid = false
            else {
              var cp = c0 & (0x7f >> len)
              var j = 1
              while (valid && j < len) {
                val cb = b(i + j) & 0xff
                if ((cb & 0xc0) != 0x80) valid = false
                else { cp = (cp << 6) | (cb & 0x3f); j += 1 }
              }
              if (valid && ((len == 3 && cp < 0x800) || (len == 4 && cp < 0x10000) ||
                  (cp >= 0xd800 && cp <= 0xdfff) || cp > 0x10ffff)) valid = false
              if (valid) i += len
            }
          }
        }
      }
    }
    if (valid) return if (hasHigh) Utf8 else Ascii
    Latin1
  }
}
