package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Events, Flow}
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Reading

/** Streaming twins verified against their batch analogs: identical rows fed
  * through MemoryStream in two batches (so cross-batch state continuity is
  * exercised) must reproduce the batch operators' output exactly.
  */
class StreamingSpec extends SparkSpec {

  private lazy val eventRows = {
    import org.apache.spark.sql.Row
    Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "value")
      .filter(col("user_id") < 20)
      .orderBy("ts", "event_id")
      .collect()
      .map(r => Reading(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSeq
  }

  test("streaming windowedAgg matches batch windowAgg") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Reading]
    val agg = StreamOps.windowedAgg(
      input.toDF().withColumnRenamed("user_id", "event_type"),
      ts = "ts", delay = "1 hour", win = "1 hour", keys = Seq("event_type"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      val (b1, b2) = eventRows.splitAt(eventRows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = s.table("win_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet

      val batch = Events.windowAgg(
        eventRows.toDF().withColumnRenamed("user_id", "event_type"),
        "ts", "hour", Seq("event_type"))
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming sketch maintenance: rollup over streamed sketch table == batch rollup") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Reading]
    val daily = StreamOps.sketchMaintainStream(
      input.toDF().withColumnRenamed("user_id", "event_type"),
      ts = "ts", delay = "1 hour", key = "event_type", member = "event_id")
    val q = daily.writeStream.format("memory").queryName("sketch_daily")
      .outputMode("complete").start()
    try {
      // two micro-batches: day-window sketch state must merge across them
      val (b1, b2) = eventRows.splitAt(eventRows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      def rollRows(df: org.apache.spark.sql.DataFrame) =
        Events.sketchRollup(df, "event_type")
          .collect().map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
      val streamed = rollRows(s.table("sketch_daily"))
      val batch = rollRows(Events.sketchDaily(
        eventRows.toDF().withColumnRenamed("user_id", "event_type"),
        "ts", "event_type", "event_id"))
      assert(streamed.nonEmpty)
      // register-wise max is associative + idempotent: the cross-batch
      // streamed sketches must union to the identical estimates
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming SLIDING windowedAgg matches batch slidingWindowAgg") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Reading]
    val agg = StreamOps.windowedAgg(input.toDF(), ts = "ts", delay = "1 hour",
      win = "10 minutes", keys = Nil, slide = Some("5 minutes"))
    val q = agg.writeStream.format("memory").queryName("slide_out")
      .outputMode("complete").start()
    try {
      val (b1, b2) = eventRows.splitAt(eventRows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = s.table("slide_out").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = Events.slidingWindowAgg(eventRows.toDF(), "ts",
        durMin = 10, slideMin = 5)
        .select("w_start", "n_events", "sum_value").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == batch && got.nonEmpty)
    } finally q.stop()
  }

  test("parquet file SINK: exactly-once append lands every row once") {
    // rounds out the streaming I/O story: checkpointed file sink — the
    // durable landing zone of a streaming ETL — replays must not
    // duplicate rows (sink transaction log), and the landed table must
    // equal the fed input exactly
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val outDir = "/tmp/graft_stream_sink/out"
    val ckDir = "/tmp/graft_stream_sink/ck"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/graft_stream_sink"))
    val input = MemoryStream[Reading]
    val q = input.toDF().writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .outputMode("append").start()
    try {
      val (b1, b2) = eventRows.splitAt(eventRows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val landed = s.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(landed.length == eventRows.length) // every row exactly once
    assert(landed.toSet ==
      eventRows.map(r => (r.user_id, r.ts, r.event_id, r.value)).toSet)
  }

  test("file streaming source: directory tail -> windowed agg matches batch") {
    val dir = "/tmp/graft_stream_in"
    val fs = new java.io.File(dir)
    org.apache.commons.io.FileUtils.deleteQuietly(fs)
    fs.mkdirs()
    // two files arriving = two micro-batches
    val src = Tables.events(spark, sfDir).select("ts", "event_type", "value")
    val (a, b) = (src.filter(col("event_type") =!= "error"),
      src.filter(col("event_type") === "error"))
    a.write.mode("overwrite").parquet(s"$dir/f1")
    val schema = src.schema
    val stream = graft.sources.Io.fileStream(spark, s"$dir/f*", schema)
    val agg = StreamOps.windowedAgg(stream, "ts", "1 hour", "1 hour", Seq("event_type"))
    val q = agg.writeStream.format("memory").queryName("file_win_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      b.write.mode("overwrite").parquet(s"$dir/f2")
      q.processAllAvailable()
      val got = spark.table("file_win_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = graft.operators.Events.windowAgg(src, "ts", "hour", Seq("event_type"))
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming session_window sessionization matches batch sessionStats") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Reading]
    val sess = StreamOps.sessionAgg(input.toDF(), ts = "ts", key = "user_id",
      gap = "1 hour", delay = "1 hour")
    val q = sess.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      val (b1, b2) = eventRows.splitAt(eventRows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = s.table("sess_out")
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
        .toSet

      val batch = Events.sessionStats(eventRows.toDF(),
        key = "user_id", ts = "ts", gapSec = 3600, tiebreak = "event_id")
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(got.nonEmpty)
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming dedup keeps one row per key across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Reading]
    val deduped = StreamOps.streamingDedup(input.toDF(), "ts", "2 hours", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = eventRows.splitAt(eventRows.length / 2)
      input.addData(b1 ++ b1.take(50)); q.processAllAvailable()   // dupes within batch
      input.addData(b2 ++ b1.take(50)); q.processAllAvailable()   // dupes across batches
      val ids = s.table("dedup_out").select("event_id").collect().map(_.getLong(0))
      assert(ids.length == ids.distinct.length)
      assert(ids.length == eventRows.length)
    } finally q.stop()
  }

  test("dedup state store is bounded by the watermark, not by history") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Reading]
    val deduped = StreamOps.streamingDedup(input.toDF(), "ts", "10 minutes", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_state_out")
      .outputMode("append").start()
    try {
      val base = 1700000000000L // fixed epoch — the spec must be deterministic
      def r(id: Long, min: Long) =
        Reading(id % 20, new java.sql.Timestamp(base + min * 60000L), id, 1.0)
      // epoch 1: 500 distinct keys inside one watermark window
      input.addData((0L until 500L).map(i => r(i, i % 10)))
      q.processAllAvailable()
      val afterEpoch1 = q.lastProgress.stateOperators.head.numRowsTotal
      assert(afterEpoch1 >= 500) // all keys resident while the window is open
      // epoch 2: the stream moves on ~17 hours — the watermark passes every
      // epoch-1 key, so their state must be EVICTED, not accumulated
      input.addData((1000L until 1500L).map(i => r(i, 1000 + i % 10)))
      q.processAllAvailable()
      // one more micro-batch so the advanced watermark's eviction lands
      input.addData(Seq(r(2000L, 1020L)))
      q.processAllAvailable()
      val finalRows = q.lastProgress.stateOperators.head.numRowsTotal
      // 1001 distinct keys were fed; bounded state holds only the live
      // window's ~501 — an unbounded store would sit at ~1001
      assert(finalRows <= 600L,
        s"state store held $finalRows rows — epoch-1 keys were not evicted")
      // and the dedup semantics still held across all batches
      val n = s.table("dedup_state_out").count()
      assert(n == 1001L)
    } finally q.stop()
  }

  test("streaming ETL e2e: file tail -> normalize -> dedup -> kv batches matches batch") {
    // the reference's ETL loop (apis/etl.ts) as a live pipeline: batch
    // files land in a directory, each micro-batch is normalized, deduped
    // against state, and written as KV batches via foreachBatch
    val dir = "/tmp/graft_stream_etl_in"
    val outDir = "/tmp/graft_stream_etl_out"
    Seq(dir, outDir).foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
      new java.io.File(d).mkdirs()
    }
    val src = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // split by TIME (files arrive in event-time order): rows older than the
    // watermark established by file 1 would be discarded as late data
    val tsSorted = src.select("ts").orderBy("ts").collect().map(_.getTimestamp(0))
    val cut = tsSorted(tsSorted.length / 2)
    val (a, b) = (src.filter(col("ts") <= lit(cut)), src.filter(col("ts") > lit(cut)))
    a.write.mode("overwrite").parquet(s"$dir/f1")

    val stream = graft.sources.Io.fileStream(spark, s"$dir/f*", src.schema)
    val normed = graft.operators.Etl.renameNormalize(stream,
      renames = Map("user_id" -> "clientId"), statusCol = "event_type",
      domain = Seq("click", "view", "purchase"),
      remap = Map("error" -> "pending"), fallback = "in-progress")
    val deduped = StreamOps.streamingDedup(normed, "ts", "2 hours", Seq("event_id"))
    val q = deduped.writeStream.outputMode("append")
      .foreachBatch { (batchDf: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchDf.persist()
        batchDf.write.mode("append").parquet(s"$outDir/rows")
        graft.sources.Io.kvBatches(batchDf,
          key = pmod(col("clientId"), lit(20)),
          payload = to_json(struct(col("event_id"), col("clientId"), col("value"))),
          batchSize = 25)
          .write.mode("append").parquet(s"$outDir/kv")
        batchDf.unpersist(); ()
      }.start()
    try {
      q.processAllAvailable()
      // second file: the remaining rows PLUS a re-send of the newest 100
      // already-processed rows (at-least-once upstream). Filter the
      // resend to the dedup watermark window by construction — rows whose
      // state has been evicted would legitimately re-emit and the test's
      // premise (all resends are duplicates in state) would not hold
      val resend = a
        .filter(col("ts") > lit(new java.sql.Timestamp(cut.getTime - 2 * 3600 * 1000L)))
        .orderBy(col("ts").desc, col("event_id")).limit(100)
      b.unionByName(resend).write.mode("overwrite").parquet(s"$dir/f2")
      q.processAllAvailable()

      val got = spark.read.parquet(s"$outDir/rows")
        .select("event_id", "clientId", "event_type", "value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      assert(got.length == got.map(_._1).distinct.length, "duplicates survived dedup")
      val want = graft.operators.Etl.renameNormalize(src,
        renames = Map("user_id" -> "clientId"), statusCol = "event_type",
        domain = Seq("click", "view", "purchase"),
        remap = Map("error" -> "pending"), fallback = "in-progress")
        .select("event_id", "clientId", "event_type", "value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      assert(got.toSet == want.toSet, "streamed rows != batch pipeline rows")
      // the kv write ran per micro-batch and carried every deduped row
      val kv = spark.read.parquet(s"$outDir/kv")
      assert(kv.agg(sum("n_items")).collect().head.getLong(0) == want.length)
    } finally q.stop()
  }

  test("streamingTopK: closed windows emit exactly once, match batch rank") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val winMs = 3600 * 1000L
    val input = MemoryStream[Reading]
    // user_id stands in for the event type key (string form)
    val typed = input.toDF().withColumn("event_type", concat(lit("t"), col("user_id")))
    val out = StreamOps.streamingTopK(typed, "ts", "event_type",
      delay = "30 minutes", winMs = winMs, k = 3)
    val q = out.writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = eventRows.splitAt(eventRows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // closing flush: one far-future row drags the watermark past every window
      val last = eventRows.map(_.ts.getTime).max
      input.addData(Seq(Reading(999L, new java.sql.Timestamp(last + 48 * 3600 * 1000L), 0L, 0.0)))
      q.processAllAvailable()
      val flushWs = math.floorDiv(last + 48 * 3600 * 1000L, winMs) * winMs
      val got = s.table("topk_out")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getInt(3)))
        .filter(_._1 != flushWs) // the flush row's own (still-open) window
        .toSet
      // batch reference: plain Scala count + rank over the same rows
      val want = eventRows.groupBy(r => math.floorDiv(r.ts.getTime, winMs) * winMs)
        .flatMap { case (ws, g) =>
          g.groupBy(r => "t" + r.user_id).view.mapValues(_.size.toLong).toSeq
            .sortBy { case (t, n) => (-n, t) }.take(3).zipWithIndex
            .map { case ((t, n), i) => (ws, t, n, i + 1) }
        }.toSet
      assert(got == want && got.nonEmpty)
      // exactly-once: no (window, type) appears twice
      val keys = s.table("topk_out").collect().map(r => (r.getTimestamp(0), r.getString(1)))
      assert(keys.length == keys.distinct.length)
    } finally q.stop()
  }

  test("streaming upsertSink: CDC merge across micro-batches == batch mergeUpsert") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = "/tmp/graft_stream_upsert"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    new java.io.File(dir).mkdirs()

    val input = MemoryStream[(Long, Long, Boolean, String)]
    val changes = input.toDF().toDF("k", "ver", "del", "payload")
    val q = StreamOps.upsertSink(changes, dir, key = "k", version = "ver",
      deleted = "del")
    val b1 = Seq((1L, 1L, false, "a"), (2L, 1L, false, "b"), (3L, 1L, false, "c"))
    // update key 1, tombstone key 2, insert key 4
    val b2 = Seq((1L, 2L, false, "a2"), (2L, 2L, true, "x"), (4L, 1L, false, "d"))
    // at-least-once upstream REDELIVERS key 2's old pre-delete version:
    // the stored tombstone must keep the key dead
    val b3 = Seq((2L, 1L, false, "b"))
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
      val got = StreamOps.liveSnapshot(s, dir, deleted = "del").get
        .select("k", "ver", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val all = (b1 ++ b2 ++ b3).toDF("k", "ver", "del", "payload")
      val want = graft.operators.Etl.mergeUpsert(
        all.filter(lit(false)), all, "k", "ver", "del")
        .select("k", "ver", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == want)
      assert(got == Set((1L, 2L, "a2"), (3L, 1L, "c"), (4L, 1L, "d")))
      // retention: at most the committed snapshot plus one predecessor
      val snaps = new java.io.File(dir).listFiles().map(_.getName)
        .filter(_.startsWith("snap_"))
      assert(snaps.length <= 2, snaps.mkString(","))
    } finally q.stop()
  }

  test("upsertSink crash consistency: half-committed snapshots never served, restart converges") {
    // The two-file commit protocol (versioned snapshot dir + atomic
    // pointer flip) under the failure the protocol exists for: the
    // builder dies BETWEEN finishing (or half-finishing) a snapshot
    // write and flipping the pointer.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = "/tmp/graft_stream_upsert_crash"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    new java.io.File(dir).mkdirs()

    val b1 = Seq((1L, 1L, false, "a"), (2L, 1L, false, "b"))
    val b2 = Seq((1L, 2L, false, "a2"), (3L, 1L, false, "c"))
    val in1 = MemoryStream[(Long, Long, Boolean, String)]
    val q1 = StreamOps.upsertSink(in1.toDF().toDF("k", "ver", "del", "payload"),
      dir, key = "k", version = "ver", deleted = "del")
    try {
      in1.addData(b1); q1.processAllAvailable()
      in1.addData(b2); q1.processAllAvailable()
    } finally q1.stop()
    val committed = java.nio.file.Files
      .readString(java.nio.file.Paths.get(dir, "_latest")).trim
    val want12 = Set((1L, 2L, "a2"), (2L, 1L, "b"), (3L, 1L, "c"))
    def live: Set[(Long, Long, String)] =
      StreamOps.liveSnapshot(s, dir, deleted = "del").get
        .select("k", "ver", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(live == want12)

    // CRASH SIMULATION: a successor snapshot half-written (no _SUCCESS
    // commit marker, wrong content) and an orphaned pointer temp file —
    // the exact on-disk state of a death between write and flip
    val half = s"$dir/snap_99"
    Seq((1L, 9L, false, "CORRUPT")).toDF("k", "ver", "del", "payload")
      .write.mode("overwrite").parquet(half)
    new java.io.File(half, "_SUCCESS").delete()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_latest.tmp"), "99")

    // the half-commit is INVISIBLE: pointer untouched, reads serve the
    // last committed snapshot
    assert(java.nio.file.Files
      .readString(java.nio.file.Paths.get(dir, "_latest")).trim == committed)
    assert(live == want12)

    // RESTART with at-least-once redelivery (everything again + new
    // changes): converges to the batch merge, commits past the orphan,
    // vacuums it, and clears the stale temp pointer
    val b3 = Seq((2L, 2L, true, "x"), (4L, 1L, false, "d"))
    val in2 = MemoryStream[(Long, Long, Boolean, String)]
    val q2 = StreamOps.upsertSink(in2.toDF().toDF("k", "ver", "del", "payload"),
      dir, key = "k", version = "ver", deleted = "del")
    try {
      in2.addData(b1 ++ b2 ++ b3); q2.processAllAvailable()
    } finally q2.stop()
    assert(live == Set((1L, 2L, "a2"), (3L, 1L, "c"), (4L, 1L, "d")))
    // the committed pointer names a snapshot with a commit marker, and
    // the half-written orphan is gone (max+1 id ordering put the new
    // commit ABOVE it, so the vacuum swept it)
    val ptr = java.nio.file.Files
      .readString(java.nio.file.Paths.get(dir, "_latest")).trim
    assert(ptr.toLong > 99L, s"commit did not advance past the orphan: $ptr")
    assert(new java.io.File(s"$dir/snap_$ptr/_SUCCESS").exists())
    assert(!new java.io.File(half).exists(), "half-written snapshot survived vacuum")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_latest.tmp")))
    val snaps = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("snap_"))
    assert(snaps.length <= 2, snaps.mkString(","))
  }

  test("append-mode session_window: closed sessions emit exactly once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def t(min: Long) = new java.sql.Timestamp(base + min * 60000L)

    val input = MemoryStream[Reading]
    val sess = StreamOps.sessionAgg(input.toDF(), ts = "ts", key = "user_id",
      gap = "1 hour", delay = "1 hour")
    val q = sess.writeStream.format("memory").queryName("sess_append")
      .outputMode("append").start()
    try {
      // an open session emits NOTHING in append mode (state, not output)
      input.addData(Reading(1L, t(0), 1L, 10.0), Reading(1L, t(10), 2L, 5.0))
      q.processAllAvailable()
      assert(s.table("sess_append").count() == 0, "open session leaked into append output")

      // an event 10h later advances the watermark past the session's end
      // (t10 + 1h gap + 1h delay) -> the closed session emits exactly once
      input.addData(Reading(2L, t(600), 3L, 1.0))
      q.processAllAvailable()
      val afterClose = s.table("sess_append")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4)))
      assert(afterClose.toSeq == Seq((1L, t(0), t(10), 2L, 15.0)),
        s"expected exactly the closed user-1 session, got ${afterClose.toSeq}")

      // more data later: the already-emitted session must NOT re-emit
      // (exactly-once session emission is the 100 TB state-eviction story)
      input.addData(Reading(2L, t(1200), 4L, 1.0))
      q.processAllAvailable()
      val user1Rows = s.table("sess_append").filter(col("user_id") === 1L).count()
      assert(user1Rows == 1, s"user-1 session emitted $user1Rows times")
      // and user 2's first session (t600, closed by t1200) emitted once
      val user2 = s.table("sess_append").filter(col("user_id") === 2L)
        .collect().map(r => (r.getTimestamp(1), r.getLong(3), r.getDouble(4)))
      assert(user2.toSeq == Seq((t(600), 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming record linkage: stream-static deletion-index match equals batch, zero state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.operators.Link
    import graft.streaming.StreamOps.DirtyRec

    val clean = Link.cleanEntities(Tables.customer(s, sfDir), "c_custkey")
    val dirtyAll = Link.dirtyRecords(clean)
      .select("record_id", "dname")
      .collect().map(r => DirtyRec(r.getLong(0), r.getString(1))).toSeq

    val dir = java.nio.file.Files.createTempDirectory("graft_stream_link").toString
    val input = MemoryStream[DirtyRec]
    val q = StreamOps.streamingLink(input.toDF(), clean, dir)
    try {
      // records split across micro-batches: each batch must link
      // independently (per-record completeness — no cross-batch state)
      val (b1, b2) = dirtyAll.splitAt(dirtyAll.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()

      // the sink writes one batch=<id> subdir per micro-batch (retry
      // idempotence); the discovered partition column is bookkeeping
      val got = s.read.parquet(dir).drop("batch")
      val batch = Link.bestMatch(Link.candidates(
        dirtyAll.toDF(), clean))
      assert(got.count() === dirtyAll.length.toLong)
      assert(got.except(batch).count() === 0L && batch.except(got).count() === 0L,
        "streamed linkage diverged from the batch pipeline")
      // the linkage itself is stateless: no state operators at all
      val p = q.lastProgress
      assert(p.stateOperators.isEmpty, p.stateOperators.mkString(","))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("stream-static enrichment join: broadcast dim, zero join state, matches batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val dim = Seq((1L, "gold"), (2L, "silver"), (3L, "gold"))
      .toDF("user_id", "segment")
    val input = MemoryStream[Reading]
    val agg = StreamOps.enrichJoin(input.toDF(), dim, key = "user_id",
      ts = "ts", delay = "1 hour", win = "1 hour", attr = "segment")
    val q = agg.writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      val rows = eventRows.filter(r => Set(1L, 2L, 3L)(r.user_id))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = s.table("enrich_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

      val batch = rows.toDF().join(dim, "user_id")
        .groupBy(window(col("ts"), "1 hour"), col("segment"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("segment"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got == batch && got.nonEmpty)
      // the join itself must hold no streaming state: only the agg does
      val p = q.lastProgress
      assert(p.stateOperators.length == 1, p.stateOperators.mkString(","))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join, state bounded by watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val leftIn = MemoryStream[Reading]
    val rightIn = MemoryStream[Reading]
    def asRight(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("ts").as("rts"),
        col("event_id").as("r_id"), col("value").as("r_value"))
    val joined = StreamOps.intervalJoin(
      leftIn.toDF(), asRight(rightIn.toDF().filter(col("event_id") % 3 === 0)),
      key = "user_id", leftTs = "ts", rightTs = "rts",
      delay = "1 hour", before = "1 hour")
      .select("user_id", "event_id", "r_id")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      // split by event TIME (rows behind the watermark would be dropped
      // as late, which the batch analog has no notion of)
      val (b1, b2) = eventRows.splitAt(eventRows.length / 2)
      leftIn.addData(b1); rightIn.addData(b1); q.processAllAvailable()
      leftIn.addData(b2); rightIn.addData(b2); q.processAllAvailable()
      val got = s.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val l = eventRows.toDF()
      val r = asRight(eventRows.toDF().filter(col("event_id") % 3 === 0))
      val batch = l.join(r, l("user_id") === r("user_id") &&
          col("rts") >= col("ts") - expr("INTERVAL 1 hour") &&
          col("rts") <= col("ts"))
        .select(l("user_id"), col("event_id"), col("r_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("thresholdAutomation: fires once per excursion, re-arms below low, across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Reading]
    val triggers = StreamOps.thresholdAutomation(input.toDS(), high = 100.0, low = 50.0)
    val q = triggers.writeStream.format("memory").queryName("auto_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = eventRows.splitAt(eventRows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = s.table("auto_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      // oracle: the same hysteresis state machine folded in plain Scala
      // over the globally (key, ts, event_id)-ordered rows
      // .toSeq: Map#flatMap over tuple results would collapse to one
      // entry per user key
      val want = eventRows.groupBy(_.user_id).toSeq.flatMap { case (u, rs) =>
        var armed = true
        rs.sortBy(r => (r.ts.getTime, r.event_id)).flatMap { r =>
          if (armed && r.value >= 100.0) { armed = false; Some((u, r.event_id)) }
          else { if (!armed && r.value <= 50.0) armed = true; None }
        }
      }.toSet
      assert(got == want)
      assert(got.nonEmpty)
      // hysteresis really suppresses: strictly fewer triggers than
      // above-threshold readings
      assert(got.size < eventRows.count(_.value >= 100.0))
    } finally q.stop()
  }

  test("streaming stateMachineStream: last per-key snapshot equals the batch replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.streaming.StreamOps.TypedEvent

    val rows = Tables.events(s, sfDir)
      .select("user_id", "ts", "event_id", "event_type")
      .filter(col("user_id") < 20)
      .orderBy("ts", "event_id")
      .collect()
      .map(r => TypedEvent(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .toSeq

    val input = MemoryStream[TypedEvent]
    val updates = StreamOps.stateMachineStream(input.toDS(),
      initial = "idle", table = graft.operators.Events.intentMachine)
    val q = updates.writeStream.format("memory").queryName("sm_out")
      .outputMode("append").start()
    try {
      // split on time boundaries so per-key order across batches matches
      // the batch operator's (ts, event_id) order; three batches prove
      // the state store carries (st, counters) across triggers
      val t1 = rows(rows.length / 3).ts
      val t2 = rows(2 * rows.length / 3).ts
      val b1 = rows.filter(_.ts.compareTo(t1) <= 0)
      val b2 = rows.filter(r => r.ts.compareTo(t1) > 0 && r.ts.compareTo(t2) <= 0)
      val b3 = rows.filter(_.ts.compareTo(t2) > 0)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
      // multiple snapshots per key (one per touched batch): the LAST one
      // (max n_events per key) is the final state
      val got = s.table("sm_out").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
        .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).maxBy(_._1) }

      val batch = graft.operators.Events.stateMachineReplay(rows.toDF(),
        key = "user_id", typeCol = "event_type", tsCol = "ts",
        tiebreak = "event_id", initial = "idle",
        table = graft.operators.Events.intentMachine)
        .select("user_id", "n_events", "n_transitions", "final_state")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == batch)
      assert(got.nonEmpty)
      // the machine actually moves: someone left the initial state
      assert(got.values.exists(_._3 != "idle"))
      // intermediate snapshots exist (state carried across batches)
      assert(s.table("sm_out").count() > got.size)
    } finally q.stop()
  }

  test("streaming edgeDetector matches batch rising edges across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Reading]
    val edges = StreamOps.edgeDetector(input.toDS(), threshold = 100.0)
    val q = edges.writeStream.format("memory").queryName("edge_out")
      .outputMode("append").start()
    try {
      // split on a time boundary so per-key order across batches matches
      // the batch operator's (ts, event_id) order
      val splitTs = eventRows(eventRows.length / 2).ts
      val (b1, b2) = eventRows.partition(r => r.ts.compareTo(splitTs) <= 0)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = s.table("edge_out")
        .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap // event_id -> rising

      val batch = Flow.risingEdge(eventRows.toDF(),
        key = "user_id", ts = "ts", tiebreak = "event_id", v = "value",
        threshold = 100.0, as = "rising")
        .select("event_id", "rising")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got.size == eventRows.length)
      assert(got == batch)
      assert(got.values.exists(identity)) // at least one edge fired
    } finally q.stop()
  }

  test("streaming percept dedup: cross-container re-encodes collapse across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.functions.{SynthCellGif, SynthCellPng, SynthGrayJpeg}

    val base = 1700000000000L
    def row(id: Long, min: Long, blob: Array[Byte]) =
      (id, new java.sql.Timestamp(base + min * 60000L), blob)
    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Byte])]
    val out = StreamOps.streamingPerceptDedup(
      input.toDF().toDF("doc_id", "ts", "blob"), "ts", "2 hours", "blob")
    val q = out.writeStream.format("memory").queryName("pdedup_out")
      .outputMode("append").start()
    try {
      // batch 1: a PNG of pattern 5, a distinct pattern 6, and a text blob
      input.addData(Seq(
        row(1, 0, SynthCellPng.compute(5L)),
        row(2, 1, SynthCellPng.compute(6L)),
        row(3, 2, "opaque payload one".getBytes)))
      q.processAllAvailable()
      // batch 2: the JPEG RE-ENCODE of pattern 5 (different bytes, same
      // image — byte dedup cannot see it), the GIF RE-ENCODE of pattern
      // 6 (the third container, same hash space), a fresh pattern, the
      // SAME text bytes again, and a different text blob
      input.addData(Seq(
        row(4, 5, SynthGrayJpeg.compute(5L)),
        row(5, 6, SynthCellPng.compute(7L)),
        row(6, 7, "opaque payload one".getBytes),
        row(7, 8, "opaque payload two".getBytes),
        row(8, 9, SynthCellGif.compute(6L))))
      q.processAllAvailable()
      val ids = s.table("pdedup_out").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      // 4 (cross-container re-encode of 5's image), 6 (exact byte
      // duplicate of the opaque payload) and 8 (GIF re-encode of 2's
      // image) must be dropped
      assert(ids == Set(1L, 2L, 3L, 5L, 7L), s"survivors: $ids")
    } finally q.stop()
  }

  test("streaming archive ingest: tar shards arriving as a stream explode to member rows") {
    // WebDataset shards land continuously (an object-store listing feed);
    // the codec expressions are plain projections, so they run inside a
    // streaming micro-batch with no state and no watermark — this pins
    // that composition (explode of tar_entries under writeStream).
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.functions._
    import graft.functions.{GraftFunctions, TarBuild}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String

    def shard(ids: Seq[Long]): Array[Byte] = TarBuild.compute(
      new GenericArrayData(ids.flatMap(i => Seq(
        UTF8String.fromString(s"$i.cls"), UTF8String.fromString(s"$i.txt"))).toArray[Any]),
      new GenericArrayData(ids.flatMap(i => Seq(
        s"${i % 10}".getBytes("UTF-8"), s"document body $i".getBytes("UTF-8"))).toArray[Any]))

    val input = MemoryStream[(Long, Array[Byte])]
    val out = input.toDF().toDF("shard_id", "blob")
      .select(col("shard_id"), explode(GraftFunctions.tarEntries(col("blob"))).as("e"),
        col("blob"))
      .select(col("shard_id"), col("e.name").as("name"), col("e.size").as("size"),
        expr("CAST(substring(blob, CAST(e.off AS INT) + 1, CAST(e.size AS INT)) AS STRING)")
          .as("payload"))
    val q = out.writeStream.format("memory").queryName("tar_stream_out")
      .outputMode("append").start()
    try {
      input.addData(Seq((0L, shard(Seq(1L, 2L)))))
      q.processAllAvailable()
      input.addData(Seq((1L, shard(Seq(3L))), (2L, shard(Seq(4L, 5L, 6L)))))
      q.processAllAvailable()
      val rows = s.table("tar_stream_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
      assert(rows.size == 12, s"2+1+3 docs x 2 members: ${rows.size}")
      assert(rows.contains((0L, "1.txt", "document body 1")))
      assert(rows.contains((2L, "6.cls", "6")))
    } finally q.stop()
  }

  test("streaming expectations: per-window rule violations equal the batch agg") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val rules = Seq(
      "value_range" -> (col("value") < 0.0 || col("value") > 1000.0),
      "user_known" -> col("user_id").isNull)
    val input = MemoryStream[Reading]
    val agg = StreamOps.streamingExpectations(
      input.toDF(), ts = "ts", delay = "1 hour", win = "1 hour", rules = rules)
    val q = agg.writeStream.format("memory").queryName("expect_out")
      .outputMode("complete").start()
    try {
      val (b1, b2) = eventRows.splitAt(eventRows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = s.table("expect_out").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = eventRows.toDF()
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"),
          sum(when(rules.head._2, 1L).otherwise(0L)).as("v1"),
          sum(when(rules(1)._2, 1L).otherwise(0L)).as("v2"))
        .select(col("window.start"), col("n"), col("v1"), col("v2"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == batch && got.nonEmpty)
      // one state operator: the window agg itself — the rules add none
      assert(q.lastProgress.stateOperators.length == 1)
    } finally q.stop()
  }

  test("streaming text hygiene: mojibake repair + typed PII scrub are stateless and batch-equal") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.functions.GraftFunctions.{fixMojibake, piiScrub}

    // corrupted + PII-bearing docs, the live half of corpus intake
    val docs = Seq(
      (1L, "cafÃ© mail a@b.org"),
      (2L, "plain call 555-200-3000 now"),
      (3L, "cafÃƒÂ© card 4111 1111 1111 1111"),
      (4L, "clean text id 12345"))
    def hygiene(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("fixed", fixMojibake(col("text")).getField("fixed"))
      .withColumn("r", piiScrub(col("fixed")))
      .select(col("doc_id"), col("r.masked").as("masked"),
        (col("r.emails") + col("r.phones") + col("r.cards")).as("n_pii"))

    val input = MemoryStream[(Long, String)]
    val q = hygiene(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("hygiene_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = s.table("hygiene_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val batch = hygiene(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(got == batch && got.size == 4)
      assert(got.contains((1L, "café mail <EMAIL>", 1)))
      assert(got.contains((3L, "café card <CARD>", 1)))
      assert(got.contains((4L, "clean text id 12345", 0)))
      // pure projections: zero streaming state
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streaming crawl admission: canonicalize + robots gate + first-seen dedup equals batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.operators.Web
    import graft.streaming.StreamOps.RawUrl

    val docs = Tables.documents(s, sfDir).limit(400)
    val robots = Web.synthesizeRobots(docs, "doc_id")
    val rawRows = Web.synthesizeUrls(docs, "doc_id").collect()
      .map(r => RawUrl(new java.sql.Timestamp(1700000000000L + r.getLong(0) * 1000L),
        r.getLong(0), r.getString(1))).toSeq

    val input = MemoryStream[RawUrl]
    val admitted = StreamOps.streamingCrawlAdmission(
      input.toDF(), robots, ts = "ts", delay = "10 minutes")
    val q = admitted.writeStream.format("memory").queryName("crawl_out")
      .outputMode("append").start()
    try {
      // the five raw variants of one page arrive across BOTH batches:
      // the canonical key must still admit the page exactly once
      val (b1, b2) = rawRows.partition(_.doc_id % 2 == 0)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()

      val got = s.table("crawl_out").select("url").collect()
        .map(_.getString(0))
      val batch = Web.robotsFilter(
          Web.canonicalize(Web.synthesizeUrls(docs, "doc_id"), "raw_url"),
          robots, "url")
        .filter(col("allowed")).select("url").distinct()
        .collect().map(_.getString(0))
      assert(got.length == got.distinct.length, "a canonical URL was admitted twice")
      assert(got.toSet == batch.toSet,
        s"streamed admission diverged: ${got.length} vs ${batch.length}")
      // exactly one state operator: the watermark-bounded URL dedup
      val p = q.lastProgress
      assert(p.stateOperators.length == 1, p.stateOperators.mkString(","))
    } finally q.stop()
  }
}
