package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the complete winnowing fingerprint set of a
  * document (sorted, distinct window minima of k-gram hashes) in ONE pass
  * over the row — replacing the explode-positions → hash → sliding-window
  * → collect_list shape.
  *
  * Why: winnowing is doc-local — no information crosses documents until
  * the final per-doc digest — yet the exploded shape ships every k-gram
  * POSITION of the corpus through a shuffle on doc_id so a window frame
  * can take w-wide minima (at sf0.1 that is ~40M position rows for 5k
  * docs; at 100 TB it is the dominant cost of the operator, all of it
  * avoidable). This expression computes the same minima with a monotonic
  * deque (O(n) amortised, vs O(n·w) frame re-scans), entirely inside the
  * scan's projection: ZERO shuffle, no explode, no join-back for short
  * docs, and the operator becomes a pure map.
  *
  * Bit-parity with the previous shape and the DuckDB oracle: per-position
  * hash is the unsigned 32-bit big-endian md5 prefix of the k-CHAR
  * substring's UTF-8 bytes (== `Md5PrefixLong(substr(text, pos, k))` ==
  * the oracle's hex-substr of `md5(substr(text, i, k))`). A UTF-8
  * substring by code points is a contiguous byte slice, so grams are
  * hashed straight from the document's byte array via precomputed
  * char-boundary offsets — no per-gram string allocation. Documents with
  * fewer than k+w-1 chars have no w-window: empty array (the operator
  * digests it to md5("")).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 1 && w >= 1, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints needs a string child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFingerprints.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Sorted distinct sliding-window minima of the k-gram hash sequence.
    * Called from generated code.
    */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    // char-boundary byte offsets: gram i (0-based) is bytes [offs(i), offs(i+k))
    var nChars = 0
    var bi = 0
    while (bi < bytes.length) {
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      nChars += 1
    }
    val nGrams = nChars - k + 1
    val nWins = nGrams - w + 1
    if (nWins <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    bi = 0
    while (bi < bytes.length) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(nChars) = bytes.length

    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = Md5Hash.prefixLongBytes(bytes, offs(i), offs(i + k) - offs(i))
      i += 1
    }

    // monotonic-deque sliding minimum: each index enters and leaves the
    // deque once — O(nGrams) total, vs the window frame's O(nGrams * w)
    val mins = new Array[Long](nWins)
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    var j = 0
    while (j < nGrams) {
      while (tail > head && hashes(dq(tail - 1)) >= hashes(j)) tail -= 1
      dq(tail) = j
      tail += 1
      if (dq(head) <= j - w) head += 1
      if (j >= w - 1) mins(j - w + 1) = hashes(dq(head))
      j += 1
    }

    java.util.Arrays.sort(mins)
    var m = 0
    var p = 0
    while (p < nWins) {
      if (p == 0 || mins(p) != mins(p - 1)) { mins(m) = mins(p); m += 1 }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(mins, m))
  }
}
