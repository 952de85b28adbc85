package graft.tools

import org.apache.spark.sql.functions._

/** sf0.1 floor decomposition of graph_components: derivation checkpoint
  * vs propagation rounds vs size-join+sort — what the 4 s letter-ratio
  * row is actually made of. */
object CcFloor {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one warmup of the whole query to absorb JIT/codegen
    graft.operators.Graph.queries("graph_components")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"$tag%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      t0 = System.nanoTime()
    }
    val e0 = graft.CacheScope.register(
      graft.operators.Graph.nationTradeEdges(spark, sfDir).localCheckpoint(true))
    lap("e0 checkpoint")
    val nodes = e0.select(col("a").as("node"))
      .unionByName(e0.select(col("b").as("node"))).distinct()
    val comp = graft.operators.Dedup.connectedComponents(nodes, "node", e0, "a", "b")
    lap("propagation (all rounds)")
    val sizes = comp.groupBy("cluster").agg(count(lit(1)).as("comp_size"))
    comp.join(broadcast(sizes), "cluster")
      .select(col("node"), col("cluster"), col("comp_size"))
      .orderBy("node")
      .write.format("noop").mode("overwrite").save()
    lap("sizes + sort + sink")
    spark.stop()
  }
}
