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
      // generator emits TIMESTAMP(μs) without isAdjustedToUTC; with the
      // session pinned to UTC the LTZ reading is value-identical to NTZ
      // and matches DuckDB's naive-timestamp reading of the same files
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // the default 100-entry generated-class cache thrashes once ~60
      // distinct queries (some with large literal-array expressions) run
      // in one JVM: re-Janino-compiling the biggest classes cost seconds
      // PER EXECUTION (dedup_embedding 7.2s -> 1.9s warm). Static conf —
      // must be set before the first session is created.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // ObjectHashAggregate (collect_set/collect_list/percentile/sketches)
      // falls back to SORT-BASED aggregation once its hash map passes 128
      // rows. MEASURED at sf0.1 (etl_dedup_merge, 150k groups of
      // min(struct)+collect_set): raising the threshold to 128k made the
      // query 1.6x SLOWER (1.02s -> 1.63s median-of-5) — a hash map of
      // 150k object agg buffers loses to the Tungsten binary sort on
      // locality and GC. The conservative default stays; if anything, the
      // sort fallback IS the scale path here.
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
