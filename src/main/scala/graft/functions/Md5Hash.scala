package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 32-bit unsigned prefix of md5(seed ++ str)
  * as a long, straight from the digest bytes.
  *
  * Why a custom Expression (SURVEY §4's preference order, tier b): the
  * dedup/LSH family's hot loop is "hash a seeded shingle, keep 32 bits".
  * With built-ins that is `conv(substring(md5(concat(lit(seed), c)), p, 8),
  * 16, 10)` — which materialises a concatenated UTF8String, a 32-char hex
  * string, a substring, and a radix-parse PER SHINGLE. This expression goes
  * digest-bytes -> long with zero intermediate strings, and stays inside
  * whole-stage codegen (`doGenCode` emits a static call, so the surrounding
  * operator keeps its fused loop).
  *
  * Semantics are bit-identical to the built-in chain (md5 of the UTF-8
  * bytes of seed+input, first/offset 4 bytes big-endian, zero-extended), so
  * the DuckDB oracle can keep verifying signatures via
  * `substr(md5(seed || s), 8*piece+1, 8)` — hex substrings and these longs
  * are the same 4 bytes under an order-preserving encoding.
  */
case class Md5PrefixLong(child: Expression, offset: Int, seed: String)
  extends UnaryExpression {

  require(offset >= 0 && offset <= 12, "offset must address 4 bytes within the 16-byte digest")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix_long needs a string child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.prefixLong(input.asInstanceOf[UTF8String], offset, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("seed", seed, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Hash.prefixLong($c, $offset, $seedRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5Hash {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** md5(seedUtf8 ++ strUtf8), bytes [offset, offset+4) big-endian as an
    * unsigned 32-bit value in a long. Called from generated code.
    */
  def prefixLong(s: UTF8String, offset: Int, seed: String): Long = {
    val md = digests.get()
    md.reset()
    if (seed.nonEmpty) md.update(seed.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(s.getBytes)
    val d = md.digest()
    ((d(offset) & 0xffL) << 24) |
      ((d(offset + 1) & 0xffL) << 16) |
      ((d(offset + 2) & 0xffL) << 8) |
      (d(offset + 3) & 0xffL)
  }

  /** First 4 digest bytes of md5 over a byte slice, unsigned big-endian —
    * `prefixLong(str, 0, "")` for callers that already hold the UTF-8
    * bytes (no per-gram string allocation). Called from generated code.
    */
  def prefixLongBytes(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) |
      ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) |
      (d(3) & 0xffL)
  }
}
