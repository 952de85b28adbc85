package graft.tools

import org.apache.spark.sql.functions._

/** Stage-wise decomposition of nationTradeEdges at scale: which join
  * makes the sf10 derivation 294 s. */
object CcProbe2 {
  def main(a: Array[String]): Unit = {
    val d = a.headOption.getOrElse("/tmp/sf10")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    var t0 = System.nanoTime()
    def lap(tag: String, n: Long): Unit = {
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows $n)")
      t0 = System.nanoTime()
    }

    val ol = graft.Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
    lap("orders x lineitem", ol.count())

    val wc = ol.join(graft.Tables.customer(s, d).select("c_custkey", "c_nationkey"),
      col("o_custkey") === col("c_custkey"))
    lap("+ customer", wc.count())

    val ws = wc.join(graft.Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
      col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
    lap("+ supplier + filter", ws.count())

    val e = ws.select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b")).distinct()
    lap("+ distinct", e.count())
    e.explain("formatted")
    spark.stop()
  }
}
