package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DISTINCT word n-gram shingles of a text
  * column, in one pass over the UTF-8 bytes.
  *
  * Token contract: tokens are maximal NONEMPTY runs of non-whitespace —
  * i.e. the split chain below with empty tokens dropped (`split(trim(s))`
  * emits an empty first token when the text starts with a tab/newline,
  * since SQL trim strips only spaces; this kernel and the DuckDB oracles'
  * `list_filter(..., t -> t != '')` both discard it).
  *
  * Otherwise semantically identical to
  * `array_distinct(transform(sequence(...), i -> array_join(slice(split(
  * trim(text), "\\s+"), i, n), " ")))` — the chain it replaces — but where
  * that chain allocates a token array, a sliced array and a joined string
  * PER SHINGLE, this kernel tokenises by byte scan (whitespace is ASCII, so
  * the scan is UTF-8 safe) and, when the window's tokens are already
  * single-space separated in the source (the common case for normalised
  * corpora), emits each shingle as a zero-copy `UTF8String` substring view.
  * Dedup preserves first-occurrence order exactly like `array_distinct`.
  * `doGenCode` emits a static call so the surrounding operator stays in
  * whole-stage codegen.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams needs a string child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val SPACE = ' '.toByte

  private def isSpace(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Distinct word n-grams (single-space joined), first-occurrence order. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token boundaries
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isSpace(bytes(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var t = 0
    while (t <= nTok - n) {
      // zero-copy when the window is already single-space separated
      var contiguous = true
      var j = t
      while (contiguous && j < t + n - 1) {
        if (ends.get(j) + 1 != starts.get(j + 1) || bytes(ends.get(j)) != SPACE)
          contiguous = false
        j += 1
      }
      val gram =
        if (contiguous) {
          val from = starts.get(t)
          UTF8String.fromBytes(bytes, from, ends.get(t + n - 1) - from)
        } else {
          val parts = new Array[UTF8String](n)
          var k = 0
          while (k < n) {
            val from = starts.get(t + k)
            parts(k) = UTF8String.fromBytes(bytes, from, ends.get(t + k) - from)
            k += 1
          }
          UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
        }
      seen.add(gram)
      t += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
