package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialised group index: the scale answer to prefix-filtered
  * group-options queries.
  *
  * The reference maintains a group index per indexed column and serves
  * `group-options` from it (protonode/src/lib/db.ts:291
  * `getGroupIndexOptions`; generateApi.ts:215-227). A predicate like
  * `lower(col) LIKE 'pro%'` cannot push into a parquet scan (function over
  * column), so at 100 TB the naive plan scans the whole fact table to list
  * a handful of distinct values. The index is that handful materialised:
  * distinct values (plus a pre-lowered sort key so the prefix filter is a
  * plain pushable range predicate), kept fresh by the ingest pipeline,
  * queried in milliseconds regardless of fact-table size.
  */
object GroupIndex {

  /** Build/refresh the index for `field`: distinct values + lowered key. */
  def build(df: DataFrame, field: String, path: String): Unit =
    df.select(col(field)).distinct()
      .withColumn("opt_lower", lower(col(field)))
      .coalesce(1)
      .write.mode("overwrite").parquet(path)

  /** Serve group-options from the index: the prefix predicate hits the
    * pre-lowered column as a pushable startsWith filter on a tiny file.
    */
  def options(spark: SparkSession, path: String, field: String,
              prefix: String, limit: Int): DataFrame =
    spark.read.parquet(path)
      .filter(col("opt_lower").startsWith(prefix.toLowerCase))
      .select(col(field).as("opt"))
      .orderBy("opt").limit(limit)
}
