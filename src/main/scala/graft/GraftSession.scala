package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Local-mode defaults that mirror what we'd set cluster-side: AQE on
  * (runtime re-planning, skew-join handling), shuffle partitions sized to
  * the parallelism actually available rather than the 200 default, UTC so
  * timestamp semantics match the DuckDB oracle.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // test tables carry TIMESTAMP(NANOS) which the vectorized reader
      // rejects; read as long and convert in Tables.events (μs-lossless)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the default 100-entry generated-class cache thrashes once ~60
      // distinct queries (some with large literal-array expressions) run
      // in one JVM: re-Janino-compiling the biggest classes cost seconds
      // PER EXECUTION (dedup_embedding 7.2s -> 1.9s warm). Static conf —
      // must be set before the first session is created.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // ObjectHashAggregate (collect_set/collect_list/percentile/sketches)
      // falls back to SORT-BASED aggregation once its hash map passes this
      // row count — default 128(!), so any real-cardinality group-by with a
      // collection aggregate silently becomes a per-partition full sort
      // (etl_dedup_merge: 150k groups → 1.4s of sort, 3.7× the oracle).
      // 128k entries of small agg buffers fit comfortably in a task's heap
      // share at 128MB-bounded input splits; beyond that the sort fallback
      // still protects memory — same safety story, sane trigger point.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
