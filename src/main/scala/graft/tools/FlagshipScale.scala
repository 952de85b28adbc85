package graft.tools

/** Scale smoke for the three composed flagships (training_data_e2e,
  * mm_pipeline_e2e, web_ingest_e2e) at an arbitrary SF directory —
  * built for the sf100 decade (5M docs): the r14 verdict noted sf100
  * evidence existed for exactly one query, while the flagships compose
  * 5+ operators whose interaction only shows at scale. Timed noop
  * sinks, median-of-3 after one warmup pass (the MmProbe pattern);
  * all three flagships read ONLY the documents table, so a documents-
  * only corpus (tools/make_sf1.py replication semantics) suffices.
  *
  *   SPARK_DRIVER_MEM=16g sbt "runMain graft.tools.FlagshipScale /tmp/sf100"
  */
object FlagshipScale {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/tmp/sf100")
    val queries = if (a.length > 1) a.drop(1).toSeq
      else Seq("training_data_e2e", "mm_pipeline_e2e", "web_ingest_e2e")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    queries.foreach { q =>
      noop(graft.SparkEntry.queries(q)(spark, sfDir)) // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(graft.SparkEntry.queries(q)(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"FLAGSHIP $q ${ts.sorted.apply(1)}%.2f s (passes ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
