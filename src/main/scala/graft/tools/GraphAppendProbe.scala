package graft.tools

import org.apache.spark.sql.functions._

/** Stage decomposition of `sim_graph_append` (the r14 suite's slowest
  * row, 13.7 s at sf0.1): where does one timed pass go — the batch
  * beam search (seeds + hops), the splice re-rank, the pass-through
  * union, or the presentation sort? Cumulative noop sinks, median-of-3
  * after warmup (the MmProbe pattern).
  */
object GraphAppendProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Similarity => S}

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med3(tag: String)(body: => Unit): Unit = {
      body
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-44s ${ts.sorted.apply(1)}%6.2f s")
    }

    val e = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val batch = col("vec_id") % 10 === S.graphBatchMod
    val nrm = S.normalized(e, "vec_id", "embedding").localCheckpoint(true)
    val g = S.knnGraph(e.filter(!batch), "vec_id", "embedding",
      k = S.graphK, rounds = S.graphRounds, tabs = S.annTabs,
      bucketCap = S.graphInitCap,
      prebuiltNrm = Some(nrm.filter(!batch))).localCheckpoint(true)
    g.count()

    med3("batch beam search (seeds + 3 hops + rank)") {
      noop(S.graphSearch(e, "vec_id", "embedding", g, batch,
        beam = S.graphBeam, hops = S.graphHops, k = S.graphK,
        tabs = S.annTabs, bucketCap = S.graphInitCap,
        prebuiltNrm = Some(nrm), corpusPred = !batch))
    }
    med3("full append (search + splice + unions)") {
      noop(S.graphAppend(e, "vec_id", "embedding", g, batch,
        k = S.graphK, beam = S.graphBeam, hops = S.graphHops,
        tabs = S.annTabs, bucketCap = S.graphInitCap,
        prebuiltNrm = Some(nrm)))
    }
    med3("registered query (incl. presentation sort)") {
      noop(S.queries("sim_graph_append")(spark, sfDir))
    }

    // appended-node recall@5: forward edges vs brute-force truth of the
    // batch against the FULL corpus (base ∪ other batch nodes — since
    // r15 inserts link batch-mates too, the truth set must include them)
    val out = S.graphAppend(e, "vec_id", "embedding", g, batch,
      k = S.graphK, beam = S.graphBeam, hops = S.graphHops,
      tabs = S.annTabs, bucketCap = S.graphInitCap,
      prebuiltNrm = Some(nrm))
      .filter(col("src") % 10 === S.graphBatchMod && col("rank") <= 5)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = S.simTopK(e, e.filter(batch),
      "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"appended-node recall@5: ${(truth & out).size.toDouble / truth.size}%.3f")
    val truthBase = S.simTopK(e.filter(!batch), e.filter(batch),
      "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"vs base-only truth (r14 metric): ${(truthBase & out).size.toDouble / truthBase.size}%.3f")
    spark.stop()
  }
}
