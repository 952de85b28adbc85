package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Per-stage decomposition of graph_bfs at scale (sf10 smoke showed
  * 327 s at local[4] vs 9.7 s at sf1 — 34x at 10x data): edge
  * derivation+checkpoint vs per-round frontier cost, broadcast vs
  * shuffle dist join, full-table-min vs frontier-only messages. */
object BfsProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/tmp/sf10")
    val cpus = a.lift(1).getOrElse("4")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var t0 = System.nanoTime()
    def lap(tag: String, n: Long): Unit = {
      println(f"$tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows $n)")
      t0 = System.nanoTime()
    }

    val e = graft.operators.Graph.tradeGraph(spark, sfDir)
      .select(col("src").cast("bigint").as("src"), col("dst").cast("bigint").as("dst"))
      .localCheckpoint(true)
    lap("derive+checkpoint edges", e.count())

    val seed = e.agg(min(col("src"))).head().getLong(0)
    lap("seed scan", seed)

    // variant A: current shape — full dist table broadcast + full min-agg
    var dist: DataFrame = e.sparkSession.range(0, 1)
      .select(lit(seed).as("node"), lit(0L).as("hops"))
    (1 to 6).foreach { r =>
      val msgs = e.join(broadcast(dist), e("src") === dist("node"))
        .select(col("dst").as("node"), (col("hops") + 1).as("hops"))
      val next = dist.unionByName(msgs).groupBy("node")
        .agg(min(col("hops")).as("hops")).localCheckpoint(true)
      val n = next.count()
      dist.unpersist()
      dist = next
      lap(s"A round $r (broadcast full)", n)
    }
    dist.unpersist()

    // variant B: frontier-only messages — only nodes REACHED LAST ROUND
    // send; new nodes = anti-join against known; known grows by union.
    // (BFS invariant: a node's first reach is its final hop count.)
    var known: DataFrame = e.sparkSession.range(0, 1)
      .select(lit(seed).as("node"), lit(0L).as("hops")).localCheckpoint(true)
    var frontier = known
    (1 to 6).foreach { r =>
      val msgs = e.join(broadcast(frontier), e("src") === frontier("node"))
        .select(col("dst").as("node"), (col("hops") + 1).as("hops"))
        .groupBy("node").agg(min(col("hops")).as("hops"))
      val fresh = msgs.join(broadcast(known.select(col("node").as("kn"))),
          col("node") === col("kn"), "leftanti")
        .localCheckpoint(true)
      val nf = fresh.count()
      val nextKnown = known.unionByName(fresh).localCheckpoint(true)
      nextKnown.count()
      known.unpersist(); frontier.unpersist()
      known = nextKnown; frontier = fresh
      lap(s"B round $r (frontier)", nf)
    }
    println(s"B total known: ${known.count()}")
    spark.stop()
  }
}
