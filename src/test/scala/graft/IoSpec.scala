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
}
