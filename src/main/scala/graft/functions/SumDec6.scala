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
  * Semantics match `sum(cast(x as decimal(20,6)))` bit-for-bit on the
  * [[graft.operators.Stable]] measure domain |x| < 2^63/1e6 ≈ 9.2e12:
  * the per-row micro count is `UnscaledValue(cast(x as decimal(20,6)))`
  * — the IDENTICAL double→decimal conversion the reference path
  * performs — so the two paths cannot disagree on a single row. Beyond
  * the domain the conversion FAILS FAST (the unscaled value no longer
  * fits a long) rather than corrupting a sum. Rows whose cast is null
  * (null input; NaN/Infinity/overflow under non-ANSI sessions) are
  * skipped AND do not mark the group non-empty — exactly the reference
  * sum's behaviour, so an all-null/all-NaN group returns null.
  * Accumulator headroom is 2^127 micro units (~1.7e32 — Spark's own
  * decimal(30,6) sum buffer overflows FIRST, at 1e24).
  *
  * Operational note: the aggregation BUFFER schema differs from the
  * decimal sum's (hi/lo longs + seen boolean vs one decimal) — batch
  * results are identical, but a STREAMING query checkpointed with one
  * path cannot restart on the other (state-store schema check).
  *
  * 128-bit add: lo' = lo1 + lo2 (wrapping); carry-out =
  * ((lo1 & lo2) | ((lo1 | lo2) & ~lo')) >>> 63 (the classic bitwise
  * carry recovery); hi' = hi1 + hi2 + carry.
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

  /** (hi', lo') = (h1, l1) + (h2, l2) in 128-bit two's complement — the
    * ONE carry implementation behind both the update and merge paths.
    * The lo-word add MUST wrap (that is the carry mechanism), so it pins
    * legacy eval mode — ANSI add would throw on exactly the overflows
    * the carry recovers. The hi adds pin ANSI explicitly (never the
    * session default): a hi overflow IS a genuine 128-bit overflow and
    * must throw in any session.
    */
  private def add128(h1: Expression, l1: Expression,
                     h2: Expression, l2: Expression): (Expression, Expression) = {
    val newLo = Add(l1, l2, EvalMode.LEGACY)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(l1, l2), BitwiseAnd(BitwiseOr(l1, l2), BitwiseNot(newLo))),
      Literal(63))
    val newHi = Add(Add(h1, h2, EvalMode.ANSI), carry, EvalMode.ANSI)
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // micro units via the same double→decimal cast the reference decimal
    // sum performs; a null cast result (null/NaN/Inf/overflow under
    // non-ANSI) is skipped and leaves `seen` untouched, mirroring sum
    val micro = UnscaledValue(Cast(child, DecimalType(20, 6)))
    val v = Coalesce(Seq(micro, Literal(0L)))
    val (nh, nl) = add128(hi, lo, ShiftRight(v, Literal(63)), v)
    Seq(nh, nl, Or(seen, IsNotNull(micro)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nh, nl) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(nh, nl, Or(seen.left, seen.right))
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
