package graft.tools

import org.apache.spark.sql.functions._

/** Scratch phase-timing harness for sim_knn_join at scale — measurement
  * tooling, not part of the library surface.
  */
object KnnAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Similarity, Dedup}
    val e = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
    val tabs = Similarity.dupTabs
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val b = Similarity.lshBuckets(e, "vec_id", "embedding", tabs)
      .select(col("vec_id"), col("t"), col("bucket"))
    time("buckets count")(println("  rows=" + b.count()))
    val a = b.select(col("vec_id").as("query_id"), col("t"), col("bucket"))
    val bb = Dedup.capBuckets(b, Seq("t", "bucket"), "vec_id", 64)
      .select(col("vec_id").as("neighbor_id"), col("t").as("t2"), col("bucket").as("bucket2"))
    time("capped count")(println("  rows=" + bb.count()))
    val cand = a.join(bb, col("t") === col("t2") && col("bucket") === col("bucket2") &&
        col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    time("cand distinct count")(println("  rows=" + cand.count()))
    val full = Similarity.simKnnJoin(e, "vec_id", "embedding", tabs, k = 3)
    time("full knn join")(full.write.format("noop").mode("overwrite").save())
    // the production composition for copy-heavy corpora: exact-vector
    // collapse first (identical vectors share identical neighbor sets),
    // knn at representative grain, fan results back by copy identity
    val reps = e.groupBy(md5(col("embedding").cast("string")).as("_vh"))
      .agg(min(col("vec_id")).as("vec_id"), first(col("embedding")).as("embedding"))
      .select("vec_id", "embedding")
    time("rep-grain: collapse + knn join")({
      println("  reps=" + reps.count())
      Similarity.simKnnJoin(reps, "vec_id", "embedding", tabs, k = 3)
        .write.format("noop").mode("overwrite").save()
    })
  }
}
