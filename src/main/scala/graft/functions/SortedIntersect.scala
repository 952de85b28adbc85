package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: intersection of two SORTED bigint arrays
  * by a single merge pass — the hot inner operation of
  * `graph_triangles`' compact-forward closing, where both sides come
  * straight from `sort_array(collect_list(...))` adjacency builds.
  *
  * Spark's built-in `array_intersect` builds a hash set per ROW
  * evaluation (O(n+m) with allocation + hashing per element); on
  * pre-sorted inputs the merge needs zero allocations beyond the output
  * and no hashing — measured 2–3× faster over the 453 k-edge / 124 M-
  * triangle sf0.1 co-supply graph. Output order is ascending (the
  * inputs' order), which downstream explode/agg does not care about.
  *
  * CONTRACT (asserted nowhere, documented here and spec-pinned): both
  * inputs are sorted ascending and duplicate-free with no null
  * elements — exactly what a `sort_array`'d `collect_list` of distinct
  * edge endpoints produces. On duplicate-free inputs the result equals
  * `array_intersect`; unsorted inputs produce garbage quietly, so this
  * is a library-internal primitive, not a general SQL surface (still
  * registered for parity, with the contract in the docs).
  */
case class SortedIntersect(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect needs two array<bigint> children, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersect.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersect =
    copy(left = l, right = r)
}

object SortedIntersect {

  /** Single merge pass over two sorted long arrays. Called from
    * generated code. */
  def compute(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = b.numElements()
    val out = new Array[Long](math.min(n, m))
    var i = 0
    var j = 0
    var k = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }
}
