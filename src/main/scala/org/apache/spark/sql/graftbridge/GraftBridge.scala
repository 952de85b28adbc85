package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the conversion utilities
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so a
  * library that ships native Catalyst expressions needs this one-file
  * residence inside the org.apache.spark.sql namespace — the standard
  * pattern for Spark extension libraries. Nothing else of Spark's
  * internals is touched.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a LogicalPlan (`Dataset.ofRows` went `private[sql]`
    * with the rest of the classic internals in Spark 4).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The RDD-level storage beneath a (local)checkpointed Dataset.
    *
    * `Dataset.unpersist()` only consults the CacheManager
    * (InMemoryRelation entries) and silently IGNORES the persisted RDD a
    * localCheckpoint created — the checkpointed blocks stay resident
    * until the GC-driven ContextCleaner happens to reclaim the RDD
    * object, which is nondeterministic and can lag arbitrarily on a busy
    * driver. Deterministically freeing checkpoint storage therefore
    * requires unpersisting the LogicalRDD's rdd directly.
    */
  def checkpointRdds(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
}
