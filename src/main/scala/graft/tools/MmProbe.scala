package graft.tools

import org.apache.spark.sql.functions._

/** Staged decomposition of `mm_pipeline_e2e` (the r13 verdict watch
  * item: the row read 1.22 → 1.89/2.05 s across two windows on
  * unchanged code). Times each pipeline stage cumulatively — corpus
  * synthesis, exact dedup, percept pairs + anti-join, vision-token
  * budget, full pipeline with the pack + presentation sort — so a real
  * regression localizes to one stage and a window artifact shows as a
  * uniform inflation. GifProbe pattern: warm first, then median-of-3
  * per stage.
  */
object MmProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Mm

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med3(tag: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-44s ${ts.sorted.apply(1)}%6.2f s")
    }

    val docs = graft.Tables.documents(spark, sfDir)
    def corpus = Mm.mixedPerceptCorpus(docs, "doc_id", "text")

    med3("corpus synthesis (noop)") { noop(corpus) }

    import org.apache.spark.sql.expressions.Window
    val wMd5 = Window.partitionBy("_md5")
    def kept1 = corpus.withColumn("_md5", md5(col("blob")))
      .withColumn("n_copies", count(lit(1)).over(wMd5))
      .withColumn("_keep", min(col("doc_id")).over(wMd5))
      .filter(col("doc_id") === col("_keep"))
      .drop("_md5", "_keep")
    med3("+ exact dedup (md5 window)") { noop(kept1) }

    def pairs = Mm.dedupPercept(kept1.select("doc_id", "blob"), hashOf = c =>
      coalesce(graft.functions.GraftFunctions.pngDhash(c),
        graft.functions.GraftFunctions.jpegDhash(c)))
    med3("+ percept pairs") { noop(pairs) }

    def kept2 = kept1.join(pairs.select(col("id_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    med3("+ percept anti-join") { noop(kept2) }

    def vis = Mm.visionTokens(Mm.decodeImageMeta(kept2), patch = 16)
      .select(col("doc_id"), col("format"), col("vision_tokens"))
    med3("+ vision tokens") { noop(vis) }

    med3("full mm_pipeline_e2e (query, sorted)") {
      noop(Mm.queries("mm_pipeline_e2e")(spark, sfDir))
    }

    spark.stop()
  }
}
