package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Exact order-free SUM of <=6-decimal-place double measures, without the
  * BigDecimal tax: Spark's `sum(x.cast(decimal(20,6)))` allocates a
  * java.math.BigDecimal per row once the buffer exceeds the compact-long
  * precision (measured +0.2-0.3s per aggregate per 600k rows locally —
  * SURVEY §8 r5). This aggregate keeps the running sum as a signed
  * 128-bit integer of MICRO units in two long buffer slots — pure long
  * carry arithmetic inside whole-stage codegen — and converts to
  * Decimal(38,6) once per group at evaluation.
  *
  * Semantics match `sum(cast(x as decimal(20,6)))` bit-for-bit for
  * |x| < 10^12 (the [[graft.operators.Stable]] measure contract): the
  * per-row micro count is `UnscaledValue(cast(x as decimal(18,6)))` —
  * the IDENTICAL double→decimal conversion the reference path performs,
  * read out of the compact long representation — so the two paths
  * cannot disagree on a single row. Nulls are skipped; an all-null/empty
  * group returns null like Spark's sum. Overflow headroom is 2^127
  * micro units (~1.7e32 — Spark's own decimal(30,6) sum buffer
  * overflows FIRST, at 1e24).
  *
  * 128-bit add of a sign-extended 64-bit value v to (hi, lo):
  * lo' = lo + v (wrapping); carry-out = ((lo & v) | ((lo | v) & ~lo')) >>> 63
  * (the classic bitwise carry recovery); hi' = hi + (v >> 63) + carry.
  */
case class SumDec6(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 6)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sum_dec6 needs a double column, got $other")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** (hi', lo') after adding the signed 64-bit `v` into (h, l). The
    * lo-word add MUST wrap (that is the 128-bit carry mechanism), so it
    * uses legacy eval mode explicitly — ANSI add would throw on exactly
    * the overflows the carry recovers. The hi adds stay ANSI: a hi
    * overflow IS a genuine 128-bit overflow and should throw.
    */
  private def add128(h: Expression, l: Expression,
                     v: Expression): (Expression, Expression) = {
    val newLo = Add(l, v, EvalMode.LEGACY)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(l, v), BitwiseAnd(BitwiseOr(l, v), BitwiseNot(newLo))),
      Literal(63))
    val newHi = Add(Add(h, ShiftRight(v, Literal(63))), carry)
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // micro units via the same double→decimal cast the reference decimal
    // sum performs, read from the compact long representation (precision
    // 18 guarantees compact storage); nulls contribute 0 and do not mark
    // the group non-empty
    val micro = UnscaledValue(Cast(child, DecimalType(18, 6)))
    val v = If(IsNull(child), Literal(0L), Coalesce(Seq(micro, Literal(0L))))
    val (nh, nl) = add128(hi, lo, v)
    Seq(nh, nl, Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // 128-bit + 128-bit: wrapping lo add, its carry feeds the hi add
    val newLo = Add(lo.left, lo.right, EvalMode.LEGACY)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(lo.left, lo.right),
        BitwiseAnd(BitwiseOr(lo.left, lo.right), BitwiseNot(newLo))),
      Literal(63))
    val newHi = Add(Add(hi.left, hi.right), carry)
    Seq(newHi, newLo, Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression = {
    // value = hi * (2^64 / 1e6) + unsigned(lo) / 1e6 — both factors are
    // EXACT decimals (2^64/1e6 = 2^58/5^6 terminates at 6dp), assembled
    // with multiply/add only, once per group, off the hot path.
    // unsigned(lo) = (lo >>> 1) * 2 + (lo & 1) avoids the sign of lo.
    val d20 = DecimalType(20, 0)
    val hiScaled = Multiply(Cast(hi, d20),
      Literal(Decimal(BigDecimal("18446744073709.551616"), 20, 6), DecimalType(20, 6)))
    val loU = Add(
      Multiply(Cast(ShiftRightUnsigned(lo, Literal(1)), d20),
        Literal(Decimal(2, 20, 0), d20)),
      Cast(BitwiseAnd(lo, Literal(1L)), d20))
    val loScaled = Multiply(loU,
      Literal(Decimal(BigDecimal("0.000001"), 7, 6), DecimalType(7, 6)))
    If(seen, Cast(Add(hiScaled, loScaled), DecimalType(38, 6)),
      Literal(null, DecimalType(38, 6)))
  }

  override def prettyName: String = "sum_dec6"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SumDec6 = copy(child = newChildren.head)
}
