package graft.tools

/** Floor anatomy for the sub-second bench pool (r15): per query, split
  * wall time into BUILD (SparkEntry.queries closure → DataFrame: table
  * listing/schema, plan construction, any eager index/checkpoint work)
  * and EXEC (noop write of the built plan). Median of `passes` after a
  * warm-up, interleaved like Bench.
  *
  * Usage: runMain graft.tools.FloorProbe <q1,q2,...> [sfDir] [passes]
  */
object FloorProbe {
  def main(a: Array[String]): Unit = {
    val names = a(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sf = if (a.length > 1) a(1) else "/root/testdata/sf0.1"
    val passes = if (a.length > 2) a(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def once(n: String): (Double, Double) = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(s, sf)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }
    names.foreach(once) // warmup
    val acc = scala.collection.mutable.Map[String, List[(Double, Double)]]()
      .withDefaultValue(Nil)
    for (p <- 1 to passes; n <- names) acc(n) = once(n) :: acc(n)
    def med(xs: List[Double]): Double = {
      val ss = xs.sorted; ss(ss.size / 2)
    }
    names.foreach { n =>
      val b = med(acc(n).map(_._1)); val e = med(acc(n).map(_._2))
      println(f"[floor] $n%-28s build=$b%6.3f exec=$e%6.3f total=${b + e}%6.3f")
    }
    s.stop()
  }
}
