package graft.tools

import org.apache.spark.sql.functions._

/** Recall decomposition of the graph-ANN family at one SF: where do the
  * misses come from — seeds, graph edges, beam width, or hop depth?
  * Sweeps beam/hops/rounds and reports recall@5 per configuration plus
  * two structural diagnostics: seed-only recall (hop 0) and "truth edge
  * present in graph" coverage (is the missed neighbor even wired to the
  * query's reachable component at 1 hop from its own node).
  */
object GraphAnnProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables
    import graft.operators.{Similarity => S}

    val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val nrm = S.normalized(e, "vec_id", "embedding").localCheckpoint(true)
    val truth = S.simTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = S.graphTopK, prebuiltNrm = Some(nrm))
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)

    def recall(got: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val perQ = truth.join(got.withColumn("h", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("t"), sum(coalesce(col("h"), lit(0L))).as("h"))
        .agg(sum("h").as("h"), sum("t").as("t"),
          min(col("h") / col("t")).as("mn"))
        .head()
      (perQ.getLong(0).toDouble / perQ.getLong(1), perQ.getDouble(2))
    }

    for (k <- Seq(8, 12, 16); rounds <- Seq(S.graphRounds)) {
      val g = S.knnGraph(e, "vec_id", "embedding", k = k,
        rounds = rounds, tabs = S.annTabs, bucketCap = S.graphInitCap,
        prebuiltNrm = Some(nrm)).localCheckpoint(true)
      // structural: truth neighbor directly wired to query node?
      val edgeCov = recall(g.select(col("src").as("query_id"),
        col("dst").as("neighbor_id")))
      println(f"k=$k rounds=$rounds: truth-in-graph-edge recall ${edgeCov._1}%.2f min ${edgeCov._2}%.2f")
      for (beam <- Seq(12, 16, 24); hops <- Seq(3)) {
        val got = S.graphSearch(e, "vec_id", "embedding", g,
          col("vec_id") < 10, beam = beam, hops = hops, k = S.graphTopK,
          tabs = S.annTabs, bucketCap = S.graphInitCap,
          prebuiltNrm = Some(nrm))
          .select("query_id", "neighbor_id")
        val (r, mn) = recall(got)
        println(f"k=$k rounds=$rounds beam=$beam hops=$hops: recall $r%.2f min $mn%.2f")
      }
    }
    spark.stop()
  }
}
