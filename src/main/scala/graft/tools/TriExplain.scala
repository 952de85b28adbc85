package graft.tools

/** Ad-hoc plan dump for graph_triangles (round-10 re-plan audit). */
object TriExplain {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.builder("local[16]").getOrCreate()
    val df = graft.operators.Graph.queries("graph_triangles")(s, "/root/testdata/sf0.01")
    df.explain("formatted")
    s.stop()
  }
}
