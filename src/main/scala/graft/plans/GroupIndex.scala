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

  /** Incremental maintenance — the ingest-path story `build`'s doc
    * promises: merge a DELTA batch's values into the existing index
    * without touching the fact table. Work is O(index + delta-distinct):
    * the delta reduces to its distinct values (map-side partial agg)
    * before unioning with the tiny index file, so a 100 TB table's index
    * stays fresh at per-batch cost. Writes to a temp path first — the
    * union reads the live index lazily, and overwriting a parquet dir
    * that an unmaterialized plan still reads would corrupt the read.
    */
  def merge(delta: DataFrame, field: String, path: String): Unit = {
    val spark = delta.sparkSession
    val merged = spark.read.parquet(path)
      .unionByName(delta.select(col(field)).distinct()
        .withColumn("opt_lower", lower(col(field))))
      .distinct()
      .coalesce(1)
    val tmp = path + "__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // atomic-enough swap for a local/HDFS path: reread from tmp, rewrite
    spark.read.parquet(tmp).coalesce(1).write.mode("overwrite").parquet(path)
  }

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
