package graft.tools
import org.apache.spark.sql.functions._
object JaroDump {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val clean = graft.operators.Link.cleanEntities(graft.Tables.customer(s, "/root/testdata/sf0.01"), "c_custkey")
    val dirty = graft.operators.Link.dirtyRecords(clean)
    graft.operators.Link.candidates(dirty, clean)
      .withColumn("jw_micro", expr("cast(round(jaro_winkler(dname, cname) * 1000000) as bigint)"))
      .select("record_id", "dname", "e", "cname", "jw_micro")
      .write.mode("overwrite").parquet("/tmp/jaro_pairs")
  }
}
