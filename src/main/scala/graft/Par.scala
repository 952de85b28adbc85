package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Guarded scan fan-out for per-row-CPU-heavy projections (guide §2.5,
  * "input skew / one huge unsplittable file": the read starves
  * parallelism).
  *
  * The test fixtures — like any compacted upstream extract — arrive as
  * ONE parquet file with ONE row group, so Spark's split planner gives
  * the scan a single task and every scan-fused projection (regex
  * scoring, shingle+md5 explosion, media synthesis/decode, decimal
  * product sums) runs on one core of the whole machine. A real corpus
  * scan arrives with thousands of splits and must NOT pay a gratuitous
  * corpus shuffle — so the repartition is gated on the scan's OWN
  * degeneracy, exactly the [[graft.operators.Link]] r15 precedent: it
  * fires only when the input's planned partition count is under half
  * the cluster's parallelism (never on a production-shaped scan, nor on
  * intermediates that already carry a shuffle's partitioning).
  *
  * The key must be a deterministic high-cardinality column (id or the
  * payload itself) — NEVER round-robin: keyless repartition assigns
  * rows by position, which under task retry re-draws and can duplicate
  * or lose rows (SPARK-38388 class); a hash key reassigns identically
  * on every re-run.
  *
  * Results are unchanged: hash repartitioning is a row-preserving
  * exchange, and every registered query ends in a total-order sort.
  */
object Par {
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val want = sc.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < want) df.repartition(want, key) else df
  }
}
