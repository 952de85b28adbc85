package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposition of the two decoder-asymmetry bench rows that carried
  * no split: how much of mm_frames_gif / mm_inline_images is FIXTURE
  * SYNTHESIS (ImageIO multi-frame LZW encode; PNG encode + base64 +
  * HTML assembly) vs the OPERATOR under test (the multi-frame GIF
  * decode walk; the data-URI extract → decode → dHash chain). Three
  * measurements per row, median of 3 after a warm-up:
  *   synth-only   — materialize the fixture corpus to the noop sink
  *   full chain   — synth + operator fused in one plan (the pre-r12
  *                  bench shape)
  *   operator     — the operator over a localCheckpoint'ed corpus
  *                  (the steady-state shape the IndexCache now gives
  *                  the bench after its warm-up pass)
  * Published in BASELINE.md (r12).
  */
object GifProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def medianOf3(tag: String)(f: => Unit): Unit = {
      f // warm-up
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$tag%-34s ${ts(1)}%6.2f s  (min ${ts.head}%.2f max ${ts.last}%.2f)")
    }

    def gifCorpus(s: SparkSession): DataFrame =
      graft.Tables.documents(s, sfDir)
        .select(col("doc_id").cast("bigint").as("doc_id"),
          graft.functions.GraftFunctions.synthAnimGif(
            col("doc_id").cast("bigint")).as("blob"))
    def gifOp(corpus: DataFrame): DataFrame =
      corpus.select(col("doc_id"), posexplode(
          graft.functions.GraftFunctions.gifFrameDhashes(col("blob"))))
        .select(col("doc_id"), col("pos").cast("bigint").as("fi"),
          lpad(hex(col("col")), 16, "0").as("frame_dhash_hex"))
        .orderBy("doc_id", "fi")

    def htmlCorpus(s: SparkSession): DataFrame =
      graft.Tables.documents(s, sfDir)
        .select(col("doc_id").cast("bigint").as("doc_id"), col("text"))
        .select(col("doc_id"), expr(
          """concat('<html><body><p>', substring(text, 1, 40),
            |  '</p><a href="data:text/plain;base64,',
            |  base64(CAST(substring(text, 1, 16) AS BINARY)), '">t</a>',
            |  array_join(transform(sequence(0, CAST(doc_id % 3 AS INT)), k ->
            |    concat('<img alt="fig', k, '" src="data:image/png;base64,',
            |      base64(synth_cell_png(doc_id + 53 * k)), '">')), '<br>'),
            |  '</body></html>')""".stripMargin).as("html"))
    def htmlOp(corpus: DataFrame): DataFrame =
      graft.operators.Mm.inlineImageHashes(corpus).orderBy("doc_id", "ii")

    println(s"=== $sfDir")
    println("--- mm_frames_gif")
    medianOf3("synth only (LZW encode)") { noop(gifCorpus(spark)) }
    medianOf3("full chain (synth+decode)") { noop(gifOp(gifCorpus(spark))) }
    val gifCkpt = gifCorpus(spark).localCheckpoint(true)
    medianOf3("operator only (decode walk)") { noop(gifOp(gifCkpt)) }

    println("--- mm_inline_images")
    medianOf3("synth only (png+b64+html)") { noop(htmlCorpus(spark)) }
    medianOf3("full chain (synth+extract)") { noop(htmlOp(htmlCorpus(spark))) }
    val htmlCkpt = htmlCorpus(spark).localCheckpoint(true)
    medianOf3("operator only (extract+hash)") { noop(htmlOp(htmlCkpt)) }

    spark.stop()
  }
}
