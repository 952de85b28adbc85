package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.{logical => logical}
import org.apache.spark.sql.graftbridge.GraftBridge
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator family's query registry. Each `queries` key has
  * a matching `oracleSql` entry (ANSI SQL for DuckDB over the same parquet
  * tables) unless the op isn't SQL-expressible.
  */
object SparkEntry {

  private val families: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Etl.queries, Etl.oracles),
      (Flow.queries, Flow.oracles),
      (Events.queries, Events.oracles),
      (TextOps.queries, TextOps.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (Mm.queries, Mm.oracles),
      (Pipelines.queries, Pipelines.oracles),
      (graft.sources.Io.queries, graft.sources.Io.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** Every registered query ends in a total-order `orderBy` so the dumped
    * result is deterministic row-for-row. A GLOBAL sort plans as a range
    * exchange, which costs an extra job (the range-bound sampling pass)
    * per query — pure scheduling overhead for ANSWER-SIZED outputs (every
    * result here is a final, consumer-facing result set, ≤ tens of
    * thousands of rows). Rewriting the top-level Sort to a
    * single-partition local sort produces the IDENTICAL row order (same
    * keys, total order) with one plain exchange and no sampling job. Only
    * the trailing presentation sort is touched: sorts feeding limits
    * (TakeOrdered), windows, or anything below the root keep their
    * scale-right shapes, and a cluster deployment sorting a LARGE output
    * would keep the range sort (this is the materialize-the-answer path).
    */
  private def answerSort(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case s @ logical.Sort(_, true, child, _) =>
        GraftBridge.ofRows(df.sparkSession,
          s.copy(global = false, child = logical.Repartition(1, shuffle = true, child)))
      case _ => df
    }

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Each invocation first sweeps checkpoint blocks the PREVIOUS query
    * registered in [[CacheScope]] — by construction the previous result
    * has been consumed by then, so this bounds cached-block growth to one
    * invocation's worth across a long session (see CacheScope docs).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.iterator.map(_._1).reduce(_ ++ _).map { case (name, f) =>
      name -> ((s: SparkSession, d: String) => {
        CacheScope.sweep(); answerSort(f(s, d))
      })
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.iterator.map(_._2).reduce(_ ++ _)
}
