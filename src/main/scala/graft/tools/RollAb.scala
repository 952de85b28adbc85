package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Stable

/** Scratch A/B harness for the rolling-window frame shapes (sliding vs
  * cum-minus-cum vs count-only variants) — measurement tooling, not part
  * of the library surface.
  */
object RollAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "user_id", "ts", "value")
    val ord = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
    val back = 3600000000L
    val wSlide = ord.rangeBetween(-back, 0)
    val wCum = ord.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wOld = ord.rangeBetween(Window.unboundedPreceding, -back - 1)
    val zero = lit(BigDecimal(0)).cast(org.apache.spark.sql.types.DecimalType(20, 6))
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("slide count+sum")(ev.select(col("event_id"),
      count(lit(1)).over(wSlide).as("n"),
      round(Stable.sumDecRef(col("value")).over(wSlide), 2).as("s")))
    time("cum2  count+sum")(ev.select(col("event_id"),
      (count(lit(1)).over(wCum) - count(lit(1)).over(wOld)).as("n"),
      round(Stable.sumDecRef(col("value")).over(wCum) -
        coalesce(Stable.sumDecRef(col("value")).over(wOld), zero), 2).as("s")))
    time("slide count-only")(ev.select(col("event_id"),
      count(lit(1)).over(wSlide).as("n")))
    time("cum2  count-only")(ev.select(col("event_id"),
      (count(lit(1)).over(wCum) - count(lit(1)).over(wOld)).as("n")))
    time("cum1  count-only")(ev.select(col("event_id"),
      count(lit(1)).over(wCum).as("n")))
    time("cum2  sum-double")(ev.select(col("event_id"),
      (sum(col("value")).over(wCum) - coalesce(sum(col("value")).over(wOld), lit(0.0))).as("s")))
    time("registered query (with presentation sort)")(
      graft.SparkEntry.queries("events_rolling_1h")(spark, dir))
    time("rollingRange via Tables, no sort")(
      graft.operators.Events.rollingRange(
        graft.Tables.events(spark, dir), "event_id", "user_id", "ts", "value",
        3600000000L))
    spark.stop()
  }
}
