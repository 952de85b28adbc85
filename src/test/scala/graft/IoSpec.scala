package graft

import org.apache.spark.sql.functions._

/** Sources/sinks: the round-trip queries prove writer+reader losslessness
  * against the original tables; partitioned layout is checked on disk.
  */
class IoSpec extends SparkSpec {

  test("jsonlines write/read round-trip is lossless") {
    val got = run("src_jsonlines_file")
    val n = Tables.events(spark, sfDir).count()
    assert(got.count() == n)
    assert(got.schema.fieldNames.sameElements(Array("event_id", "event_type", "value")))
  }

  test("csv write/read round-trip is lossless") {
    val got = run("src_csv_roundtrip").collect()
    val src = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey").collect()
    assert(got.length == src.length)
    got.zip(src).foreach { case (g, s) => assert(g == s) }
  }

  test("partitioned write produces hive-style partition dirs") {
    run("sink_partitioned").collect()
    val dirs = new java.io.File("/tmp/graft_io/part").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("o_orderpriority=")))
  }

  test("merge-schema read: old-era rows read the evolved column as NULL") {
    val rows = run("src_parquet_merge_schema").collect()
    assert(rows.length == Tables.orders(spark, sfDir).count())
    rows.foreach { r =>
      if (r.getLong(0) % 2 == 0) assert(r.isNullAt(2), s"era-0 row ${r.getLong(0)}")
      else assert(!r.isNullAt(2), s"era-1 row ${r.getLong(0)}")
    }
  }

  test("binaryFile blob read-back: every exported doc arrives byte-complete") {
    val got = run("src_binary_files").collect()
    val src = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(concat(lit("doc_"), col("doc_id"), lit(".txt")).as("file_name"), col("text"))
      .orderBy("file_name").collect()
    assert(got.length == src.length && got.nonEmpty)
    got.zip(src).foreach { case (g, s) =>
      assert(g.getString(0) == s.getString(0))
      assert(g.getLong(1) == s.getString(1).getBytes("UTF-8").length.toLong)
      assert(g.getString(2) == s.getString(1))
    }
  }

  test("wholetext read: one row per file, content identical to the export") {
    val got = run("src_text_files").collect()
    val bin = run("src_binary_files").collect()
    assert(got.length == bin.length)
    got.zip(bin).foreach { case (t, b) =>
      assert(t.getString(0) == b.getString(0) && t.getString(1) == b.getString(2))
    }
  }

  test("binaryFile pathGlobFilter prunes non-matching files at listing time") {
    run("src_binary_files").collect() // materialize the fixture dir
    val blobDir = s"${graft.sources.Io.scratch}/blob"
    val planted = java.nio.file.Paths.get(blobDir, "ignore.bin")
    try {
      java.nio.file.Files.write(planted, "not a doc".getBytes("UTF-8"))
      val got = graft.sources.Io.readBinaryFiles(spark, blobDir, "*.txt")
      assert(!got.select("path").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().exists(_.endsWith("ignore.bin")))
    } finally {
      // shared fixture dir: don't leave the foreign file for later tests
      java.nio.file.Files.deleteIfExists(planted)
    }
  }

  test("atomicParquetArtifact: a crashed half-write is swept and rebuilt") {
    val s = spark
    import s.implicits._
    val path = "/tmp/graft_io/atomic_artifact_test"
    val dir = new java.io.File(path)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    // simulate a builder that died mid-write: directory present, one
    // stale/partial part file, NO _SUCCESS commit marker
    Seq((99L, "stale")).toDF("id", "v")
      .write.mode("overwrite").parquet(path)
    new java.io.File(dir, "_SUCCESS").delete()
    assert(dir.exists() && !new java.io.File(dir, "_SUCCESS").exists())
    var built = 0
    def fresh = { built += 1; Seq((1L, "good"), (2L, "good")).toDF("id", "v") }
    val got = graft.sources.Io.atomicParquetArtifact(s, path)(fresh)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // the partial artifact was NOT trusted: rebuilt, committed, correct
    assert(built == 1)
    assert(got == Set((1L, "good"), (2L, "good")))
    assert(new java.io.File(dir, "_SUCCESS").exists())
    // a second reader serves the committed artifact without rebuilding
    val again = graft.sources.Io.atomicParquetArtifact(s, path)(fresh)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(built == 1 && again == got)
    // no temp-dir litter left behind
    val litter = dir.getParentFile.listFiles()
      .filter(_.getName.startsWith(dir.getName + ".tmp-"))
    assert(litter.isEmpty, litter.mkString(","))
  }

  test("overwritePartitions backfills ONE partition, leaves the rest untouched") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_dyn_overwrite"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val base = Seq((1L, "d1", 10.0), (2L, "d2", 20.0), (3L, "d3", 30.0))
      .toDF("id", "day", "v")
    graft.sources.Io.writePartitioned(base, dir, Seq("day"))
    // backfill d2 only, with corrected values and a new row
    val fix = Seq((2L, "d2", 21.0), (4L, "d2", 40.0)).toDF("id", "day", "v")
    graft.sources.Io.overwritePartitions(fix, dir, Seq("day"))
    val got = s.read.parquet(dir).select("id", "day", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // d1/d3 survive; d2 fully replaced (old row 2@20.0 gone)
    assert(got == Set((1L, "d1", 10.0), (3L, "d3", 30.0),
      (2L, "d2", 21.0), (4L, "d2", 40.0)))
  }

  test("contentFingerprint: order-free, but any content change re-keys") {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val s = spark
    import s.implicits._
    def fp(rows: Seq[(Long, String)]): String =
      graft.sources.Io.contentFingerprint(rows.toDF("id", "t"),
        Seq(col("id").cast("string"), coalesce(col("t"), lit("~null~"))))
    val base = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    // row ORDER must not matter (partitioned scans have none)
    assert(fp(base) == fp(base.reverse))
    // a changed row, an added row, a dropped row, and — the xor trap —
    // a content SWAP between two rows must all produce a different key
    assert(fp(base) != fp(Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma2")))
    assert(fp(base) != fp(base :+ (4L -> "delta")))
    assert(fp(base) != fp(base.take(2)))
    assert(fp(base) != fp(Seq(1L -> "beta", 2L -> "alpha", 3L -> "gamma")))
    // null and empty are distinct contents
    assert(fp(Seq(1L -> null)) != fp(Seq(1L -> "")))
  }

  test("persisted artifacts re-key on regenerated inputs (staleness contract)") {
    // The decon_bloom_persisted contract applied to the other two
    // persisted families: the on-disk key carries a corpus content
    // fingerprint, so REGENERATING the input at the same path yields a
    // NEW artifact path and atomicParquetArtifact rebuilds — a fresh
    // session can never serve an index of vanished data. (Within one
    // session the in-memory index caches are keyed by dir and
    // documented deterministic; this pins the cross-session disk layer.)
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stale").toString
    def writeDocs(texts: Seq[String]): Unit =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def writeEmb(shift: Double): Unit =
      (0L until 40L).map(i => (i, Array.tabulate(8)(j => (i * 7 + j + shift).toFloat)))
        .toDF("vec_id", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    writeDocs(Seq("aa bb cc", "aa bb cc", "dd ee ff"))
    writeEmb(0.0)
    val compPath1 = graft.operators.Dedup.componentsArtifactPath(spark, dir)
    val ivfPath1 = graft.operators.Similarity.ivfPqArtifactPath(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"), dir)
    // regenerate both inputs at the SAME dir
    writeDocs(Seq("aa bb cc", "zz yy xx", "dd ee ff"))
    writeEmb(0.5)
    val compPath2 = graft.operators.Dedup.componentsArtifactPath(spark, dir)
    val ivfPath2 = graft.operators.Similarity.ivfPqArtifactPath(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"), dir)
    assert(compPath1 != compPath2, "components artifact did not re-key")
    assert(ivfPath1 != ivfPath2, "ivfpq artifact did not re-key")
    // and the rebuild actually happens at the new key: the artifact
    // committed under key 1 is untouched, key 2 builds fresh content
    val a1 = graft.sources.Io.atomicParquetArtifact(spark, compPath1)(
      Tables.documents(spark, dir).select("doc_id", "text")).count()
    val a2 = graft.sources.Io.atomicParquetArtifact(spark, compPath2)(
      Tables.documents(spark, dir).filter(col("doc_id") < 2)
        .select("doc_id", "text")).count()
    assert(a1 == 3 && a2 == 2, s"expected fresh builds per key, got $a1/$a2")
    assert(new java.io.File(compPath1, "_SUCCESS").exists())
    assert(new java.io.File(compPath2, "_SUCCESS").exists())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
