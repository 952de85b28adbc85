package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session fixture: one local SparkSession per JVM (sbt forks one
  * test JVM), sf0.001 data for speed.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    // GRAFT_MASTER=local-cluster[2,16,4096] runs this same suite through
    // real executor processes (serialized closures/expressions/exchanges)
    val master = GraftSession.effectiveMaster("local[4]")
    val b0 = SparkSession.builder()
      .master(master)
      .appName("graft-test")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
    val b = if (master.startsWith("local-cluster")) GraftSession.clusterConfigs(b0) else b0
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  def sfDir: String = SparkSpec.sfDir
  def run(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)
  /** the physical plan, for plan-shape assertions */
  def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString
}
