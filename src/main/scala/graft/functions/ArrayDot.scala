package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: ordered-fold dot product of two numeric
  * arrays, replacing `aggregate(zip_with(a, b, (x, y) -> x*y), 0d, +)`.
  *
  * Why: Spark's higher-order functions are `CodegenFallback` — every
  * cosine under the similarity operators was an interpreted lambda fold
  * PLUS a zip_with array allocation per pair. This kernel is one fused
  * Java loop over the unsafe array data, and `doGenCode` keeps the
  * surrounding operator in whole-stage codegen.
  *
  * Semantics match the built-in chain bit-for-bit: elements promoted to
  * double, products accumulated left-to-right from 0.0 (the same IEEE fold
  * the DuckDB oracle replays via `list_reduce`), null if either side is
  * null or lengths differ (the padded-zip behaviour).
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // the length-mismatch null means this can be null even with non-nullable
  // children; without this override codegen would emit an assignment to a
  // folded `false` isNull (compile failure -> silent interpreted fallback)
  // and the optimizer would mis-fold IsNull on the result
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot needs float/double arrays, got ${left.dataType} and ${right.dataType}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = ArrayDot.compute(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))
    if (r == null) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left)
    val rf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.ArrayDot.compute($a, $lf, $b, $rf);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

object ArrayDot {
  /** Left fold from 0.0 over promoted doubles; null when lengths differ
    * (mirrors the null-padded zip_with chain) or when any element is null
    * (a null product nulls the `aggregate` fold). Called from generated code.
    */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
