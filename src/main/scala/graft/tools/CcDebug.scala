package graft.tools

import org.apache.spark.sql.functions._

/** Hand-graph check of connectedComponents round counts: a 5-path has
  * single-step fixpoint depth 4 (min-neighbor seed prepays 1), so the
  * 2-step engine must finish in ceil(3/2)+confirm = 3 rounds. */
object CcDebug {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    import s.implicits._
    val nodes = (1L to 5L).toDF("id")
    val edges = Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L)).toDF("a","b")
    val out = graft.operators.Dedup.connectedComponents(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println("labels: " + out.toSeq.sorted.mkString(", "))
    spark.stop()
  }
}
