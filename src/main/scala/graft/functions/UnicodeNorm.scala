package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a native codegen'd expression —
  * the multilingual canonicalization layer every dedup pass needs:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are the SAME
  * document to a reader but different byte strings to every hash, so an
  * un-normalized exact/near-dup layer silently keeps both. Forms:
  * NFC/NFD (canonical compose/decompose) and NFKC/NFKD (compatibility —
  * additionally folds ligatures "ﬁ"→"fi", fullwidth "Ｇ"→"G",
  * superscripts, etc., the fold a token-count or search layer wants).
  *
  * Fast path: `Normalizer.isNormalized` is a quick-check scan, so
  * already-normalized rows (the overwhelming case for ASCII corpora)
  * skip the rewrite and keep their original UTF8String bytes — at
  * 100 TB the normalization is a zero-shuffle projection fused into
  * the scan.
  *
  * The `form` is a plan-time constant (part of the operator, not data)
  * — invalid names fail analysis via checkInputDataTypes, never at
  * runtime. Reference tie: the reference's ETL sanitize layer
  * (packages/app/bundles/custom/models/ETL.ts:1) trims/cases strings
  * row-at-a-time; this is the Unicode-correct Spark-native version.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize needs a string child, got ${child.dataType}")
    else if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize form must be one of ${UnicodeNormalize.Forms.keys.mkString("/")}, got $form")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize.compute($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  val Forms: Map[String, java.text.Normalizer.Form] = Map(
    "NFC" -> java.text.Normalizer.Form.NFC,
    "NFD" -> java.text.Normalizer.Form.NFD,
    "NFKC" -> java.text.Normalizer.Form.NFKC,
    "NFKD" -> java.text.Normalizer.Form.NFKD)

  /** Normalize one value; already-normalized input (the overwhelming
    * case for ASCII corpora) returns the SAME UTF8String, no copy.
    * Called from generated code. */
  def compute(s: UTF8String, form: String): UTF8String = {
    val f = Forms(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
