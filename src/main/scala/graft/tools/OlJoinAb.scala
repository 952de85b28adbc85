package graft.tools

import org.apache.spark.sql.functions._

/** A/B: orders⋈lineitem (the floor under every trade-graph query) as
  * SMJ (planner default at scale) vs SHUFFLE_HASH (skip both sorts,
  * hash-build the 10x-smaller orders side per partition). */
object OlJoinAb {
  def main(a: Array[String]): Unit = {
    val d = a.headOption.getOrElse("/tmp/sf10")
    val cpus = a.lift(1).getOrElse("4")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows $n)")
    }

    def pairs(hint: Boolean) = {
      val o = graft.Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val oh = if (hint) o.hint("SHUFFLE_HASH") else o
      oh.join(graft.Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
    }
    // interleave to share cache-warm state fairly
    (1 to 2).foreach { p =>
      time(s"SMJ pass $p")(pairs(false).localCheckpoint(true).count())
      time(s"SHJ pass $p")(pairs(true).localCheckpoint(true).count())
    }
    spark.stop()
  }
}
