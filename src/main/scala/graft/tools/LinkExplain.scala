package graft.tools

/** Ad-hoc plan dump for the record-linkage family (round-11 audit). */
object LinkExplain {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val name = if (a.nonEmpty) a(0) else "link_fuzzy_best"
    val df = graft.SparkEntry.queries(name)(s, "/root/testdata/sf0.01")
    df.explain("formatted")
  }
}
