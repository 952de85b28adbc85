package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent aggregates over double columns.
  *
  * Floating-point sums depend on summation order, and Spark's partial
  * aggregation order differs from any single-node engine's — ~1e-13 of
  * drift that `round()` amplifies to a full output unit whenever a group's
  * sum lands on a rounding boundary (observed at sf0.1: 1 group in ~3000).
  * The test corpus's measures are <= 6-decimal values, so summing them as
  * DECIMAL(20,6) is EXACT and order-free in both Spark and DuckDB; derived
  * doubles (rounded sums, averages) are then bitwise identical everywhere,
  * at any scale factor. On a cluster this also makes results run-to-run
  * deterministic regardless of partitioning.
  */
object Stable {

  /** Exact order-free sum of a <=6dp measure (|value| < 10^12), via the
    * native 128-bit long-carry aggregate [[graft.functions.SumDec6]] —
    * bit-identical to `sum(c.cast("decimal(20,6)"))` (the per-row
    * conversion IS that cast, read from the compact representation;
    * property-tested through 2^63-crossing partial sums) without the
    * per-row BigDecimal allocation. Measured A/B at sf0.1: a 4-sum scan
    * agg drops 0.96s → 0.63s, but WINDOW frames run ~25% SLOWER (the
    * per-frame-row update re-evaluates the cast + carry chain, where the
    * built-in decimal Sum is two expression nodes) — so groupBy callers
    * use this and window callers use [[sumDecRef]].
    */
  def sumDec(c: Column): Column = graft.functions.GraftFunctions.sumDec6(c)

  /** The reference BigDecimal-path sum — [[sumDec]] must stay bit-equal
    * to it (the PropertySpec + the whole oracle gate pin this); also the
    * faster choice inside window frames (see [[sumDec]]). */
  def sumDecRef(c: Column): Column = sum(c.cast("decimal(20,6)"))

  /** round(sum, dp) as double — stable under any summation order. The
    * round happens on the EXACT decimal (both engines round decimals half
    * away from zero), only the final value converts to double.
    */
  def sumRounded(c: Column, dp: Int): Column = round(sumDec(c), dp).cast("double")

  /** [[sumRounded]] for STREAMING stateful aggregates, over the builtin
    * decimal Sum instead of [[graft.functions.SumDec6]]. Two reasons a
    * streaming agg must not ride the kernel: (a) the aggregation-buffer
    * schema is part of the checkpoint contract — swapping one decimal
    * buffer for SumDec6's (hi, lo, seen) makes every existing checkpoint
    * unrestartable; (b) SumDec6 fail-fasts above ~9.2e12 absolute input,
    * a narrowing a long-lived stream can't tolerate mid-flight. Values
    * are identical (both sums are exact decimals; PropertySpec pins the
    * bit-equality), so the streaming==batch twin specs hold either way.
    */
  def sumRoundedStream(c: Column, dp: Int): Column =
    round(sumDecRef(c), dp).cast("double")

  /** round(sum/n, dp) as double — stable average. round() on a DOUBLE is
    * NOT portable at exact decimal halves (Spark rounds the shortest
    * decimal string half-up; DuckDB rounds the binary value, which sits
    * below the half) — and exact halves are COMMON once sums are exact
    * (2dp data, n with small factors). So the half-up rounding is done in
    * scaled-integer arithmetic on the exact sum: q = floor((|T| + half)/
    * den) with T = sum*10^6 exact, den = 10^(6-dp) * n — identical in both
    * engines by construction. (All doubles involved stay far below 2^53,
    * so the float add/divide/floor are exact-or-safely-rounded in both.)
    */
  def avgRounded(c: Column, n: Column, dp: Int): Column =
    avgRoundedFromSum(sumDec(c), n, dp)

  /** Same scaled-integer half-up average, but over an ALREADY-AGGREGATED
    * exact decimal sum — for windowed averages, where the sum and count
    * come from window frames rather than a groupBy (an aggregate-composite
    * Column can't take `.over`). */
  def avgRoundedFromSum(sumDecCol: Column, n: Column, dp: Int): Column = {
    val t = (sumDecCol * lit(1000000L)).cast("long")
    val half = lit(math.pow(10, 6 - dp).toLong / 2)
    val den = lit(math.pow(10, 6 - dp).toLong)
    val sign = when(t < 0, lit(-1.0)).otherwise(lit(1.0))
    val q = floor((abs(t).cast("double") + (half * n).cast("double")) /
      (den * n).cast("double"))
    sign * q / lit(math.pow(10, dp))
  }

  /** round-half-up(num/den, dp) for non-negative integer columns, in exact
    * integer arithmetic: floor((2*10^dp*num + den) / (2*den)) / 10^dp.
    * Ratios of ints routinely land on exact decimal halves (1/160 =
    * 0.00625), where `round(double)` is engine-dependent (see avgRounded).
    */
  def ratioRounded(num: Column, den: Column, dp: Int): Column = {
    val scale = math.pow(10, dp).toLong
    floor((num * lit(2 * scale) + den).cast("double") /
      (den * lit(2)).cast("double")) / lit(scale.toDouble)
  }

  /** DuckDB mirror of [[ratioRounded]]. */
  def sqlRatioRounded(num: String, den: String, dp: Int): String = {
    val scale = math.pow(10, dp).toLong
    s"floor((${2 * scale} * ($num) + ($den)) / (2.0 * ($den))) / $scale.0"
  }

  /** Sample standard deviation from EXACT decimal sums: sqrt((Σx² −
    * (Σx)²/n) / (n−1)) with Σx, Σx² aggregated as decimals (x ≤ 6dp so x²
    * ≤ 12dp — both sums exact and order-free). The engines then perform
    * the identical double arithmetic on identical inputs, so the result —
    * unlike each engine's own stddev_samp accumulation — matches bitwise.
    * greatest(...,0) guards the tiny negative from double cancellation.
    */
  def stddevRounded(c: Column, n: Column, dp: Int): Column = {
    // decimal(18,6): the product is (37,12) which FITS in 38 digits, so
    // Spark keeps the full 12-decimal scale exactly. decimal(20,6) would
    // overflow the product's precision (41) and trigger Spark's
    // precision-loss rule (scale truncated to 9dp per row) while DuckDB
    // keeps 12dp — breaking the exactness the formula relies on.
    val d = c.cast("decimal(18,6)")
    val sx = sum(d).cast("double")
    val sx2 = sum(d * d).cast("double")
    // n = 1 guard: sample stddev is undefined for a single row, and the
    // (n-1) division would raise DIVIDE_BY_ZERO under Spark 4's default
    // ANSI mode instead of flowing a null — mirrored in the SQL twin
    when(n > 1,
      round(sqrt(greatest((sx2 - sx * sx / n) / (n - 1), lit(0.0))), dp))
  }

  /** DuckDB mirror of [[stddevRounded]]. DuckDB needs (20,6) — its (18,6)
    * multiply stays on int64 and overflows; (20,6) takes the int128 path
    * and is exact. The two engines' declared widths differ but both
    * compute the exact product sums, which is what must match.
    */
  def sqlStddevRounded(c: String, dp: Int): String = {
    val d = s"CAST($c AS DECIMAL(20,6))"
    s"CASE WHEN count(*) > 1 THEN round(sqrt(greatest((sum($d * $d)::DOUBLE - sum($d)::DOUBLE * sum($d)::DOUBLE / count(*)) / (count(*) - 1), 0.0)), $dp) END"
  }

  /** DuckDB mirror of [[avgRoundedFromSum]]: the sum/count are arbitrary
    * SQL expressions (e.g. window-frame results). */
  def sqlAvgRoundedFrom(sumExpr: String, nExpr: String, dp: Int): String = {
    val half = math.pow(10, 6 - dp).toLong / 2
    val den = math.pow(10, 6 - dp).toLong
    val t = s"CAST(($sumExpr) * 1000000 AS BIGINT)"
    s"(CASE WHEN $t < 0 THEN -1.0 ELSE 1.0 END) * floor((abs($t)::DOUBLE + $half * ($nExpr)) / ($den * ($nExpr))) / ${math.pow(10, dp)}"
  }

  /** The DuckDB mirror of [[avgRounded]] for oracle SQL generation. */
  def sqlAvgRounded(c: String, dp: Int): String = {
    val half = math.pow(10, 6 - dp).toLong / 2
    val den = math.pow(10, 6 - dp).toLong
    val t = s"CAST(sum(CAST($c AS DECIMAL(20,6))) * 1000000 AS BIGINT)"
    s"(CASE WHEN $t < 0 THEN -1.0 ELSE 1.0 END) * floor((abs($t)::DOUBLE + $half * count(*)) / ($den * count(*))) / ${math.pow(10, dp)}"
  }
}
