package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators: the reference's
  * automations react to live event streams (protolib/src/bundles/events —
  * state machines and monitors consume `filter[from]` windows of the event
  * log, e.g. agentsApi.ts:85), which in Spark is `readStream` -> the same
  * declarative transforms -> `writeStream`.
  *
  * Batch analogs are the oracles: `Events.windowAgg` for [[windowedAgg]]
  * and `Flow.risingEdge` for [[edgeDetector]] — the streaming specs feed
  * identical rows through MemoryStream (across multiple batches, so state
  * continuity is exercised) and assert result equality.
  *
  * Scale: windowed agg is watermark + tumbling window — partial-agg
  * map-side, state bounded by (watermark horizon x key cardinality).
  * The edge detector keeps exactly one value per key in the state store
  * (`flatMapGroupsWithState`), so state is O(keys), shuffled once on the
  * key — the same layout the batch lag-window uses, minus the sort.
  */
object StreamOps {

  /** Tumbling (or, with `slide`, OVERLAPPING) window counts/sums per key
    * with late-data watermark. Emits one row per (window_start, keys...)
    * in Append mode once the watermark passes the window end. A slide
    * makes it the streaming twin of Events.slidingWindowAgg — same
    * declared ×(win/slide) row expansion before the stateful agg, state
    * still bounded by the watermark (windows per key per event are a
    * constant, not data-driven).
    */
  def windowedAgg(events: DataFrame, ts: String, delay: String, win: String,
                  keys: Seq[String], slide: Option[String] = None): DataFrame =
    events.withWatermark(ts, delay)
      .groupBy(slide.map(s => window(col(ts), win, s)).getOrElse(window(col(ts), win)) +:
        keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        graft.operators.Stable.sumRoundedStream(col("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start") +: keys.map(col) :+
        col("n_events") :+ col("sum_value"): _*)

  /** Streaming gap-based sessionization: Spark's native `session_window`
    * merges events within `gap` of each other into one growing window per
    * key — the streaming twin of Events.sessionize/sessionStats (same
    * session definition: a new session starts when the gap is exceeded).
    * State is bounded by the watermark; sessions emit once closed (Append)
    * or continuously (Complete/Update).
    */
  def sessionAgg(events: DataFrame, ts: String, key: String, gap: String,
                 delay: String): DataFrame =
    events.withWatermark(ts, delay)
      .groupBy(col(key), session_window(col(ts), gap))
      .agg(count(lit(1)).as("n_events"),
        graft.operators.Stable.sumRoundedStream(col("value"), 2).as("sum_value"),
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"))
      .select(col(key), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming maintenance of the day×key HLL sketch table — the
    * Structured Streaming twin of `Events.sketchDaily` and the live half
    * of the `events_sketch_maintain` contract: each micro-batch folds its
    * members into the day-window sketch state (DataSketches HLL updates
    * are associative + idempotent, so replays and out-of-order arrivals
    * within the watermark cannot change the merged registers); the
    * watermark bounds state to open days × keys. The emitted rows ARE the
    * standing sketch table — downstream range rollups
    * (`Events.sketchRollup`) consume them with zero raw-log IO.
    */
  def sketchMaintainStream(events: DataFrame, ts: String, delay: String,
                           key: String, member: String): DataFrame =
    events.withWatermark(ts, delay)
      .groupBy(window(col(ts), "1 day"), col(key))
      .agg(hll_sketch_agg(col(member)).as("sk"), count(lit(1)).as("n"))
      .select(col("window.start").cast("date").as("day"), col(key),
        col("sk"), col("n"))

  /** Streaming exact dedup (twin of TextOps.dedupExact): keep the first
    * record per key across micro-batches. State holds one entry per key
    * and is evicted once the watermark passes — the standard
    * streaming-ingest dedup (at-least-once upstream -> exactly-once
    * downstream) with bounded state.
    */
  def streamingDedup(df: DataFrame, ts: String, delay: String,
                     keyCols: Seq[String]): DataFrame =
    df.withWatermark(ts, delay).dropDuplicatesWithinWatermark(keyCols)

  /** Streaming PERCEPTUAL media dedup — [[streamingDedup]] keyed on the
    * perceptual hash instead of bytes: re-encoded / brightness-shifted /
    * cross-container duplicate images arriving in different micro-
    * batches collapse to the first copy, which byte-keyed dedup
    * structurally cannot do. Decodable payloads key on the coalesced
    * PNG/JPEG/GIF dHash (one hash space); undecodable payloads fall back to
    * an exact byte-hash key in a DISJOINT key namespace (prefix marker),
    * so "no perceptual signal" degrades to exact dedup instead of
    * collapsing all opaque rows together. The decode is the same
    * scan-fused expression the batch family uses; state is one row per
    * live key, watermark-evicted.
    */
  def streamingPerceptDedup(df: DataFrame, ts: String, delay: String,
                            blobCol: String): DataFrame = {
    val phash = coalesce(
      graft.functions.GraftFunctions.pngDhash(col(blobCol)),
      graft.functions.GraftFunctions.jpegDhash(col(blobCol)),
      graft.functions.GraftFunctions.gifDhash(col(blobCol)))
    val key = when(phash.isNotNull, concat(lit("p"), phash.cast("string")))
      .otherwise(concat(lit("b"), xxhash64(col(blobCol)).cast("string")))
    streamingDedup(df.withColumn("_pkey", key), ts, delay, Seq("_pkey"))
      .drop("_pkey")
  }

  /** Streaming data-quality expectations — the live twin of
    * Etl.expectations: every row-level rule evaluated as a sum inside
    * ONE watermarked windowed aggregation (per window: row count +
    * violations per rule). The monitoring shape a production intake
    * runs: rules ride the window agg that already exists, adding
    * partial-agg sums and ZERO extra state beyond the window's.
    */
  def streamingExpectations(df: DataFrame, ts: String, delay: String,
                            win: String,
                            rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    // coalesce mirrors Etl.expectations' empty-input contract (a window
    // only forms with rows, so this is defensive consistency here)
    val aggs = rules.map { case (r, v) =>
      coalesce(sum(when(v, 1L).otherwise(0L)), lit(0L)).as(r)
    } :+ count(lit(1)).as("_n")
    df.withWatermark(ts, delay)
      .groupBy(window(col(ts), win))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("win_start") +:
        col("_n").as("n_rows") +: rules.map(r => col(r._1)): _*)
  }

  /** Streaming crawl admission — the live half of the r12 web-ingest
    * family: raw URLs arriving on a stream are RFC 3986-canonicalized
    * (Web.canonicalize's expression, scan-fused), gated by their site's
    * robots.txt verdict (stream-STATIC broadcast join at site grain —
    * the rules parse once per site, never per URL), and first-seen
    * deduped on the canonical key ([[streamingDedup]], watermark-
    * bounded state: one row per live canonical URL). Unparseable URLs
    * are dropped (no fetchable identity — the batch dedup_url
    * contract); a site with no robots row crawls by default.
    */
  def streamingCrawlAdmission(raw: DataFrame, robots: DataFrame,
                              ts: String, delay: String): DataFrame = {
    val rules = robots.select(col("site"),
      graft.functions.GraftFunctions.robotsRules(
        col("robots"), lit("graftbot")).as("rules"))
    val canon = raw.withColumn("url",
        graft.functions.GraftFunctions.urlCanonical(col("raw_url")))
      .filter(col("url").isNotNull)
      .withColumn("site",
        regexp_extract(col("url"), "site([0-9]+)\\.", 1).cast("bigint"))
      .withColumn("path",
        regexp_extract(col("url"), "^[a-z]+://[^/]+(/.*)$", 1))
    val gated = canon.join(broadcast(rules), Seq("site"), "left")
      .filter(coalesce(
        graft.functions.GraftFunctions.robotsAllowed(col("rules"), col("path")),
        lit(true)))
    streamingDedup(gated, ts, delay, Seq("url"))
      .select("doc_id", "url")
  }

  /** Streaming CDC upsert sink — Etl.mergeUpsert as a live pipeline (the
    * engine-agnostic image of a Delta/Iceberg MERGE): each micro-batch
    * of change rows merges into a maintained keyed snapshot via
    * foreachBatch — read the current snapshot, keep-latest merge with
    * tombstone deletes, write the result as a NEW versioned snapshot and
    * flip a pointer file (never overwrite the directory being read: the
    * scan is lazy). Per batch the work is one key-partitioned window
    * over snapshot ∪ changes — at real scale the snapshot is a
    * partitioned/bucketed table and the merge rewrites only affected
    * partitions; the versioned-dir + pointer swap is exactly the commit
    * protocol table formats implement properly.
    */
  def upsertSink(changes: DataFrame, dir: String, key: String,
                 version: String, deleted: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    changes.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        // snapshots RETAIN winning tombstones (Etl.mergeLatest, not
        // mergeUpsert): dropping a deleted key from the stored state
        // would let an at-least-once REDELIVERY of an older version
        // resurrect it — the live view filters them on read instead
        val prevCommitted: Option[Long] = {
          val p = java.nio.file.Paths.get(dir, "_latest")
          if (java.nio.file.Files.exists(p))
            Some(java.nio.file.Files.readString(p).trim.toLong)
          else None
        }
        val cur = latestSnapshot(s, dir).getOrElse(batch.filter(lit(false)))
        // snapshot ids are max(existing)+1, NOT the micro-batch id: a
        // restarted query's batch ids begin again at 0, and bid-keyed
        // dirs would OVERWRITE the very snapshot the pointer still
        // references — a crash mid-overwrite then leaves the pointer
        // naming a half-written directory (the crash spec pins this).
        // max+1 also sweeps crash orphans: a snapshot written without a
        // pointer flip has a lower id than the next commit and falls to
        // the vacuum below. Re-running a batch after a crash writes a
        // NEW id with identical merged content — convergent, never
        // destructive.
        // snap_\d+ only: a stray non-numeric snap_* entry (debug dir,
        // partial copy) must be ignored, not NumberFormatException the
        // whole micro-batch
        val snapId = Option(new java.io.File(dir).listFiles()).toSeq.flatten
          .filter(_.getName.matches("snap_\\d+"))
          .map(_.getName.stripPrefix("snap_").toLong)
          .foldLeft(-1L)(math.max) + 1
        graft.operators.Etl.mergeLatest(cur.unionByName(batch),
            key, version, deleted)
          .write.mode("overwrite").parquet(s"$dir/snap_$snapId")
        val tmp = java.nio.file.Paths.get(dir, "_latest.tmp")
        java.nio.file.Files.writeString(tmp, snapId.toString)
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, "_latest"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // retention: superseded snapshots are dead weight (only _latest
        // is ever read); keep the previously COMMITTED snapshot for
        // in-flight readers that resolved the pointer just before the
        // flip — keeping it by pointer identity, not "highest id below
        // the commit", because after a crash the highest lower id can be
        // an UNCOMMITTED half-write (the crash spec plants exactly that
        // orphan and requires the vacuum to sweep it)
        val keep = Set(snapId) ++ prevCommitted
        val dead = new java.io.File(dir).listFiles()
          .filter(f => f.getName.matches("snap_\\d+"))
          .map(f => (f.getName.stripPrefix("snap_").toLong, f))
          .filter(p => !keep.contains(p._1))
        dead.foreach { case (_, f) =>
          org.apache.commons.io.FileUtils.deleteQuietly(f) }
        ()
    }.start()
  }

  /** The committed snapshot the pointer file names (tombstones
    * included), if any. */
  def latestSnapshot(s: org.apache.spark.sql.SparkSession,
                     dir: String): Option[DataFrame] = {
    val p = java.nio.file.Paths.get(dir, "_latest")
    if (java.nio.file.Files.exists(p))
      Some(s.read.parquet(s"$dir/snap_${java.nio.file.Files.readString(p).trim}"))
    else None
  }

  /** The live rows of the maintained table: winning tombstones filtered
    * out on read. */
  def liveSnapshot(s: org.apache.spark.sql.SparkSession, dir: String,
                   deleted: String): Option[DataFrame] =
    latestSnapshot(s, dir).map(_.filter(!col(deleted)).drop(deleted))

  /** Stream-STATIC enrichment join: every streaming event joined to a
    * static dimension table — the standard enrichment shape (event →
    * customer segment, device → model, doc → source metadata). Unlike
    * the stream-stream join below this needs NO join state at all: the
    * static side broadcasts and each micro-batch probes it map-side, so
    * the only streaming state is whatever runs downstream (here a
    * watermarked windowed agg keyed by the enriched attribute, proving
    * the join composes with normal state eviction). At 100 TB/day the
    * dim refresh is a re-broadcast, not a reshuffle of the stream.
    */
  def enrichJoin(events: DataFrame, dim: DataFrame, key: String,
                 ts: String, delay: String, win: String,
                 attr: String): DataFrame =
    events.withWatermark(ts, delay)
      .join(broadcast(dim), Seq(key))
      .groupBy(window(col(ts), win), col(attr))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col(attr), col("n_events"))

  /** Stream-stream interval join: left events enriched with right events
    * of the same key that happened within [leftTs - before, leftTs]. Both
    * sides carry watermarks and the join condition bounds the right
    * timestamp RELATIVE to the left one — the two constraints Structured
    * Streaming needs to evict buffered rows, so state is bounded by
    * (delay + before) per side instead of growing forever. This is the
    * streaming twin of the batch as-of/range join family (Events.asofJoin
    * / rangeJoin): the reference's "enrich an event with the latest
    * matching state" automations as a live pipeline.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   delay: String, before: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before") &&
        r(rightTs) <= l(leftTs),
      "inner")
      .drop(r(key))
  }

  /** Streaming record linkage: dirty records arriving on a stream are
    * matched against a STATIC clean-entity table through the same
    * deletion-neighborhood index + levenshtein argmin as the batch
    * family ([[graft.operators.Link.candidates]]/[[graft.operators.Link.bestMatch]]),
    * one micro-batch at a time via foreachBatch. Linkage is
    * per-record and each record's candidate set is complete within its
    * own batch (the index explode and the stream-static join add no
    * cross-batch dependency), so the query holds ZERO streaming state —
    * no watermark, nothing to restore on restart beyond source offsets.
    * Matches land in a parquet dir PARTITIONED BY batch id: each
    * micro-batch OVERWRITES its own `batch=<id>` subdir, so a batch
    * retried after a sink-side failure replaces its previous (possibly
    * partial) output instead of appending a duplicate — the sink is
    * effectively-once, not merely at-least-once. Readers scan the root
    * dir; the discovered `batch` partition column is bookkeeping they
    * can drop. `dirty` needs (record_id, dname); `clean` needs
    * (e, cname).
    */
  def streamingLink(dirty: DataFrame, clean: DataFrame, dir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    dirty.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Link
          .bestMatch(graft.operators.Link.candidates(batch, clean))
          .write.mode("overwrite").parquet(s"$dir/batch=$batchId")
        ()
    }.start()

  case class Reading(user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)
  case class TypedEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                        event_type: String)
  case class SmState(st: String, ntr: Long, ne: Long)
  case class SmUpdate(user_id: Long, n_events: Long, n_transitions: Long,
                      final_state: String)
  case class DirtyRec(record_id: Long, dname: String)
  case class RawUrl(ts: java.sql.Timestamp, doc_id: Long, raw_url: String)
  case class Edge(user_id: Long, event_id: Long, value: Double, rising: Boolean)
  case class LastValue(value: Double)

  case class AutoState(armed: Boolean)
  case class Trigger(user_id: Long, event_id: Long, value: Double)

  case class TopKRow(window_start: java.sql.Timestamp, event_type: String,
                     n: Long, rank: Int)
  case class TopKState(counts: Map[String, Long])

  /** Streaming per-window top-k (twin of the batch events_windowed_topk):
    * per tumbling event-time window, the k most frequent event types,
    * emitted EXACTLY ONCE when the watermark passes the window end.
    * Spark's windowed agg can't chain a rank after a streaming agg, so
    * the window's type-count map rides custom state keyed by window
    * start, and an EVENT-TIME TIMEOUT set to the window end fires the
    * final top-k and drops the state. State is bounded by (windows
    * inside the watermark horizon) × (distinct types per window) —
    * timeouts evict every closed window, and the per-window map is
    * |types|-bounded, not row-bounded, so a hot window costs counting,
    * not buffering.
    */
  def streamingTopK(events: DataFrame, ts: String, typeCol: String,
                    delay: String, winMs: Long, k: Int): Dataset[TopKRow] = {
    import events.sparkSession.implicits._
    events.withWatermark(ts, delay)
      .select(col(ts).as("ts"), col(typeCol).as("t"))
      .as[(java.sql.Timestamp, String)]
      .groupByKey { case (time, _) => math.floorDiv(time.getTime, winMs) * winMs }
      .flatMapGroupsWithState[TopKState, TopKRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (ws, rows, state: GroupState[TopKState]) =>
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
              .zipWithIndex.iterator.map { case ((t, n), i) =>
                TopKRow(new java.sql.Timestamp(ws), t, n, i + 1)
              }
          } else {
            val cur = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
            val upd = rows.foldLeft(cur) { case (m, (_, t)) =>
              m.updated(t, m.getOrElse(t, 0L) + 1L)
            }
            state.update(TopKState(upd))
            // fires once the WATERMARK (event time, not wall clock)
            // passes the window end
            state.setTimeoutTimestamp(ws + winMs)
            Iterator.empty
          }
      }
  }

  /** Threshold automation with hysteresis — the reference's trigger/
    * state-machine plane (protolib/src/bundles/events automations, state
    * machines in apis/) as a streaming operator: FIRE once when a key's
    * value rises to >= high, then stay disarmed until it falls back to
    * <= low (no alert storms). One boolean per key in the state store,
    * shuffled once on the key — O(keys) state, the same contract as the
    * edge detector. Rows are ordered by (ts, event_id) within each batch
    * so cross-batch behaviour is deterministic.
    */
  def thresholdAutomation(readings: Dataset[Reading], high: Double,
                          low: Double): Dataset[Trigger] = {
    import readings.sparkSession.implicits._
    readings.groupByKey(_.user_id)
      .flatMapGroupsWithState[AutoState, Trigger](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[AutoState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
          var armed = state.getOption.forall(_.armed)
          val out = scala.collection.mutable.ListBuffer[Trigger]()
          sorted.foreach { r =>
            if (armed && r.value >= high) {
              out += Trigger(r.user_id, r.event_id, r.value); armed = false
            } else if (!armed && r.value <= low) armed = true
          }
          state.update(AutoState(armed))
          out.iterator
      }
  }

  /** Streaming twin of [[graft.operators.Events.stateMachineReplay]] —
    * the live half of the reference's xstate automations: the SAME
    * declared (state, event) → state table replayed per key as events
    * arrive, with [[thresholdAutomation]] being the 2-state instance
    * this generalizes. Per-key state is a CONSTANT-width struct
    * (current state + two counters) in the state store — bounded at
    * any key cardinality; each batch folds its rows in (ts, event_id)
    * order and emits the updated per-key snapshot, so the last emission
    * per key equals the batch replay when batches respect event-time
    * order (the spec's split-on-a-time-boundary contract, same as
    * [[edgeDetector]]).
    */
  def stateMachineStream(events: Dataset[TypedEvent], initial: String,
                         table: Seq[(String, String, String)]): Dataset[SmUpdate] = {
    import events.sparkSession.implicits._
    val tmap = table.map { case (f, e, t) => (f, e) -> t }.toMap
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SmState, SmUpdate](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, rows, state: GroupState[SmState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
          var cur = state.getOption.getOrElse(SmState(initial, 0L, 0L))
          sorted.foreach { r =>
            val nxt = tmap.get((cur.st, r.event_type))
            cur = SmState(nxt.getOrElse(cur.st),
              cur.ntr + (if (nxt.isDefined) 1L else 0L), cur.ne + 1L)
          }
          state.update(cur)
          Iterator.single(SmUpdate(uid, cur.ne, cur.ntr, cur.st))
      }
  }

  /** Stateful rising-edge detector (streaming twin of Flow.risingEdge /
    * reference context/flowEdgeDetector.ts): one LastValue per key in the
    * state store; rows within a batch are ordered by (ts, event_id) so
    * in-batch edges are deterministic.
    */
  def edgeDetector(readings: Dataset[Reading], threshold: Double): Dataset[Edge] = {
    import readings.sparkSession.implicits._
    readings.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastValue, Edge](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[LastValue]) =>
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
          var prev: Option[Double] = state.getOption.map(_.value)
          val out = sorted.map { r =>
            val rising = prev.exists(p => p < threshold && r.value >= threshold)
            prev = Some(r.value)
            Edge(r.user_id, r.event_id, r.value, rising)
          }
          prev.foreach(v => state.update(LastValue(v)))
          out.iterator
      }
  }
}
