package graft.tools

import org.apache.spark.sql.functions._

/** Scratch decomposition of graph_triangles' cost at sf0.1: how much is
  * the per-edge intersect + joins vs the corner-attribution explode +
  * final agg. Drives the decision whether a native sorted-merge
  * intersect expression is worth building. */
object TriProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows/val $n)")
    }

    // shared prefix, built fresh per variant (checkpoint included in cost)
    def oriented() = {
      val e = graft.operators.Graph.coSupplyEdges(spark, sfDir)
        .select(col("a").cast("bigint").as("a"), col("b").cast("bigint").as("b"))
        .localCheckpoint(true)
      val deg = e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
      val withDeg = e
        .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
      withDeg.select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst")))
        .as("o")).select(col("o.src"), col("o.dst"))
        .localCheckpoint(true)
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      time("prefix (ckpt oriented)") { oriented().count() }
      val o = oriented()
      val adj = o.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      def joined = o
        .join(broadcast(adj.select(col("src"), col("nbrs").as("na"))), Seq("src"))
        .join(broadcast(adj.select(col("src").as("dst"), col("nbrs").as("nb"))), Seq("dst"))
      time("joins only (count)") { joined.count() }
      time("+ intersect size sum") {
        joined.select(size(array_intersect(col("na"), col("nb"))).as("s"))
          .agg(sum("s")).head().getLong(0)
      }
      val withT = joined.select(col("src"), col("dst"),
        array_intersect(col("na"), col("nb")).as("i"))
      time("+ corner explode agg") {
        withT.select(explode(concat(
          array(struct(col("src").as("node"), size(col("i")).cast("long").as("w")),
            struct(col("dst").as("node"), size(col("i")).cast("long").as("w"))),
          transform(col("i"), c => struct(c.as("node"), lit(1L).as("w"))))).as("x"))
          .groupBy(col("x.node").as("node"))
          .agg(sum(col("x.w")).as("t")).count()
      }
    }
    spark.stop()
  }
}
