package graft.tools

import org.apache.spark.sql.functions._

/** A/B the two graph-ANN scoring strategies at one SF: the gated
  * broadcast path vs the post-gate grid (replicated cell-partitioned
  * vector table, [[graft.operators.Similarity.gridTopK]]). Forces each
  * mode through `spark.graft.graph.scoring`, builds the full knn graph
  * twice, reports wall seconds and row-count agreement. The grid block
  * size is shrunk so the grid genuinely splits at probe scale (at the
  * default 64 MiB a 200k×64-dim table is a single split pair).
  *
  *   sbt "runMain graft.tools.GridGateProbe /tmp/sf10 16777216"
  */
object GridGateProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/tmp/sf10")
    val blockBytes = if (a.length > 1) a(1).toLong else 16L << 20
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Similarity => S}

    val e = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val nrm = S.normalized(e, "vec_id", "embedding").localCheckpoint(true)
    val n = nrm.count()
    val dims = nrm.select(size(col("ne"))).head.getInt(0)
    println(s"GRIDPROBE corpus n=$n dims=$dims bytes=${n * (8L * dims + 32L)}")

    def build(mode: String): (Double, Long) = {
      spark.conf.set(S.scoringModeKey, mode)
      spark.conf.set(S.gridBlockBytesKey, blockBytes.toString)
      val t0 = System.nanoTime()
      val g = S.knnGraph(e, "vec_id", "embedding", k = S.graphK,
        rounds = S.graphRounds, tabs = S.annTabs,
        bucketCap = S.graphInitCap, prebuiltNrm = Some(nrm))
      val rows = g.count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // broadcast first (warm-up absorbed there makes grid look no better
    // than it is), then grid — then broadcast again for a warm pair
    val (tB1, rB1) = build("broadcast")
    val (tG, rG) = build("grid")
    val (tB2, rB2) = build("broadcast")
    println(f"GRIDPROBE broadcast-cold $tB1%.2f s rows=$rB1")
    println(f"GRIDPROBE grid          $tG%.2f s rows=$rG (block=$blockBytes)")
    println(f"GRIDPROBE broadcast-warm $tB2%.2f s rows=$rB2")
    println(f"GRIDPROBE grid/broadcast-warm ratio ${tG / tB2}%.2f")
    assert(rG == rB2, s"row counts diverge: grid $rG vs broadcast $rB2")
    spark.stop()
  }
}
