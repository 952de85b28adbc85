package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.GraftBridge

/** Column-API and SQL surface for graft's native expressions.
  *
  * `GraftExtensions` is the `SparkSessionExtensions` hook (SURVEY §4):
  * sessions built via `GraftSession` (and the Verify/Bench mains) register
  * `md5_prefix_long(str, offset, seed)` into the function registry, so the
  * expression is reachable from `spark.sql(...)` text as well as from the
  * typed helpers below.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix_long"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "md5_prefix_long"),
      (children: Seq[Expression]) => Md5PrefixLong(
        children.head,
        children(1).eval().asInstanceOf[Number].intValue(),
        String.valueOf(children(2).eval()))))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => WordNgrams(
        children.head,
        children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => ArrayDot(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => WinnowFingerprints(
        children.head,
        children(1).eval().asInstanceOf[Number].intValue(),
        children(2).eval().asInstanceOf[Number].intValue())))
  }
}

object GraftFunctions {
  /** 32-bit md5 prefix of (seed ++ str) as a long — see [[Md5PrefixLong]]. */
  def md5PrefixLong(c: Column, offset: Int, seed: String): Column =
    GraftBridge.column(Md5PrefixLong(GraftBridge.expression(c), offset, seed))

  /** Distinct word n-grams in one byte-scan — see [[WordNgrams]]. */
  def wordNgrams(c: Column, n: Int): Column =
    GraftBridge.column(WordNgrams(GraftBridge.expression(c), n))

  /** Fused ordered-fold dot product — see [[ArrayDot]]. */
  def arrayDot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Per-document winnowing fingerprint set — see [[WinnowFingerprints]]. */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(c), k, w))

  /** `v >> n` with a COLUMN shift amount. `functions.shiftright` only takes
    * a constant Int; the underlying Catalyst ShiftRight is two-expression
    * (and codegen'd), so bridge straight to it.
    */
  def shiftRight(v: Column, n: Column): Column =
    GraftBridge.column(org.apache.spark.sql.catalyst.expressions.ShiftRight(
      GraftBridge.expression(v), GraftBridge.expression(n)))
}
