package graft.tools

import org.apache.spark.sql.functions._

/** sf0.1 floor decomposition of graph_pagerank and graph_kcore — the
  * CcFloor sibling the r12 verdict asked for: what the two remaining
  * ≥2 s letter rows are actually made of (derivation checkpoint vs the
  * iteration loop vs the final agg + presentation sort), plus the
  * per-iteration marginal cost from an iters ∈ {1,2,3} sweep.
  */
object GraphFloor {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmups: absorb JIT/codegen for both whole queries
    noop(graft.operators.Graph.queries("graph_pagerank")(spark, sfDir))
    noop(graft.operators.Graph.queries("graph_kcore")(spark, sfDir))

    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"$tag%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      t0 = System.nanoTime()
    }

    println("== graph_pagerank decomposition ==")
    val g = graft.CacheScope.register(
      graft.operators.Graph.tradeGraph(spark, sfDir).localCheckpoint(true))
    g.count()
    lap("tradeGraph derivation checkpoint")
    // iters sweep: marginal = per-round plan depth; intercept = floor
    Seq(1, 2, 3).foreach { it =>
      noop(graft.operators.Graph.pageRank(g, "src", "dst", iters = it)
        .orderBy("node"))
      lap(s"pageRank(iters=$it) + sort + sink")
    }

    println("== graph_kcore decomposition ==")
    val pairs = graft.CacheScope.register(
      graft.operators.Graph.tradePairs(spark, sfDir).localCheckpoint(true))
    pairs.count()
    lap("tradePairs derivation checkpoint")
    val core = graft.operators.Graph.kCore(pairs, "a", "b", k = 8)
    lap("peel loop (eager checkpoint rounds)")
    noop(core.orderBy("node"))
    lap("core-degree agg + sort + sink")

    spark.stop()
  }
}
