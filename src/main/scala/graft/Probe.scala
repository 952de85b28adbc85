package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries (2 passes each after a
  * shared session warm-up) and optionally dump their formatted plans.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Probe [-explain] q1 q2 ..."
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-"))
    if (args.contains("-all")) { // reproduce Bench's long-session state
      SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        System.err.println(f"PROBEALL $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    names.foreach { name =>
      if (explain) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"PROBE $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
