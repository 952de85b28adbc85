package graft.tools

import org.apache.spark.sql.functions._

/** Scratch decomposition of graph_components' cost at a given SF: edge
  * derivation vs per-round min-label propagation (round count, per-round
  * wall time, changed counts). Drives the scale diagnosis for the sf10
  * smoke (530 s vs 12.5 s at sf1 — 42x at 10x data). */
object CcProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/tmp/sf1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var t0 = System.nanoTime()
    def lap(tag: String, n: Long): Unit = {
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows $n)")
      t0 = System.nanoTime()
    }

    val e0 = graft.operators.Graph.nationTradeEdges(spark, sfDir)
      .localCheckpoint(true)
    lap("edge derivation", e0.count())

    val e = e0.select(col("a").as("_src"), col("b").as("_dst"))
      .unionByName(e0.select(col("b").as("_src"), col("a").as("_dst")))
      .localCheckpoint(true)
    lap("symmetrize+checkpoint", e.count())

    var labels = e.select(col("_src").as("node")).distinct()
      .select(col("node"), col("node").as("cluster")).localCheckpoint(true)
    lap("seed labels", labels.count())

    var changed = 1L
    var it = 0
    while (changed > 0 && it < 20) {
      val msgs1 = e.join(labels, e("_src") === labels("node"))
        .select(col("_dst").as("node"), col("cluster"), lit(0).as("_self"))
      val mid = labels.withColumn("_self", lit(1)).unionByName(msgs1)
        .groupBy(col("node")).agg(min(col("cluster")).as("cluster"),
          max(when(col("_self") === 1, col("cluster"))).as("_prev"))
      val msgs2 = e.join(mid.select(col("node"), col("cluster")), e("_src") === col("node"))
        .select(col("_dst").as("node"), col("cluster"),
          col("cluster").as("_prev"), lit(0).as("_self"))
      val obs = org.apache.spark.sql.Observation()
      val next = mid.withColumn("_self", lit(1)).unionByName(msgs2)
        .groupBy(col("node")).agg(min(col("cluster")).as("cluster"),
          max(when(col("_self") === 1, col("_prev"))).as("_prev"))
        .observe(obs, count(when(col("cluster") =!= col("_prev"), lit(1))).as("changed"))
        .localCheckpoint(true)
      changed = obs.get("changed").asInstanceOf[Long]
      labels = next.select(col("node"), col("cluster"))
      it += 1
      lap(s"round $it (changed=$changed)", 0L)
    }
    println(s"rounds: $it converged=${changed == 0}")
    spark.stop()
  }
}
