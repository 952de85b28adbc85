package graft

import org.apache.spark.sql.functions._
import graft.operators.{Etl, Flow}

/** Etl / Flow / Events families: value invariants that the oracle's
  * hash-compare can't express (determinism across runs, whole-row
  * semantics, session gap bounds) plus plan-shape guards.
  */
class EtlFlowEventsSpec extends SparkSpec {

  test("etl_dedup_merge is deterministic and keeps whole-row firsts") {
    val a = run("etl_dedup_merge").collect()
    val b = run("etl_dedup_merge").collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    // whole-row: the winning (suppkey, quantity, returnflag) triple must
    // exist together in some source row of that orderkey
    val src = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_quantity", "l_returnflag")
      .collect()
      .groupBy(_.getLong(0))
    a.take(50).foreach { r =>
      val rows = src(r.getLong(0))
      assert(rows.exists(s => s.getLong(1) == r.getLong(1) &&
        s.getDouble(2) == r.getDouble(2) && s.getString(3) == r.getString(3)))
    }
  }

  test("etl_snapshot_diff: added/removed/changed partition exactly, unchanged never surfaces") {
    val rows = run("etl_snapshot_diff").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    docs.foreach { case (id, text, nChars) =>
      val expected =
        if (nChars < 50) Some("removed")
        else if (id % 7 == 0 && text.toUpperCase != text) Some("changed")
        else None
      expected match {
        case Some(st) => assert(rows(id)._1 == st, s"doc $id expected $st")
        case None     => assert(!rows.contains(id), s"doc $id should be unchanged")
      }
    }
    docs.filter(_._1 < 10).foreach { case (id, _, _) =>
      assert(rows(id + 1000000L)._1 == "added")
    }
    // all three statuses exercised; added rows have no old hash,
    // removed rows no new hash, changed rows both
    rows.values.foreach {
      case ("added", oh, nh)   => assert(oh == null && nh != null)
      case ("removed", oh, nh) => assert(oh != null && nh == null)
      case ("changed", oh, nh) => assert(oh != null && nh != null && oh != nh)
      case other               => fail(s"unexpected status $other")
    }
    assert(Set("added", "removed", "changed").subsetOf(rows.values.map(_._1).toSet))
  }

  test("snapshotDiff: NULL content is presence, not absence") {
    val s = spark
    import s.implicits._
    val v1 = Seq((1L, null: String), (2L, "x"), (3L, null: String), (4L, "same"))
      .toDF("id", "t")
    val v2 = Seq((1L, "hello"), (2L, null: String), (3L, null: String), (4L, "same"))
      .toDF("id", "t")
    val got = graft.operators.Etl.snapshotDiff(v1, v2, "id", "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // NULL -> value and value -> NULL are CHANGES (both snapshots hold
    // the doc), NULL -> NULL and same -> same are unchanged
    assert(got == Map(1L -> "changed", 2L -> "changed"))
  }

  test("mix_token_budget: a configured source absent from the corpus still surfaces") {
    val s = spark
    import s.implicits._
    val docs = Seq(("src0", "three token text"), ("src1", "two tokens"))
      .toDF("source", "text")
    val got = graft.operators.Dedup.mixTokenBudget(docs, "source", "text",
      weightsPct = Seq(("src0", 50L), ("srcNew", 50L)),
      budgetTokens = 1000L, epochCap = 4.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.isNullAt(4), r.getBoolean(5))).toMap
    assert(got.keySet == Set("src0", "srcNew"), "absent source must not vanish")
    val (avail0, target0, eNull0, cap0) = got("src0")
    assert(avail0 == 3L && target0 == 500L && !eNull0 && cap0)
    val (availN, targetN, eNullN, capN) = got("srcNew")
    // zero availability: epochs undefined, over_cap = the collect signal
    assert(availN == 0L && targetN == 500L && eNullN && capN)
  }

  test("merge_upsert: update wins, delete tombstones, insert lands, late version loses") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "a", 0L, false), (2L, "b", 0L, false), (3L, "c", 0L, false)
    ).toDF("k", "v", "version", "deleted")
    val changes = Seq(
      (1L, "a2", 1L, false),  // update
      (2L, "b", 1L, true),    // delete
      (3L, "stale", -1L, false), // lower version than base: must lose
      (4L, "d", 1L, false),   // insert
      (4L, "d2", 2L, false)   // second update of the insert
    ).toDF("k", "v", "version", "deleted")
    val out = Etl.mergeUpsert(base, changes, "k", "version", "deleted")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> (("a2", 1L)), 3L -> (("c", 0L)), 4L -> (("d2", 2L))))
    // delete-wins at equal version (tombstone sorts first)
    val tie = Etl.mergeUpsert(base,
      Seq((1L, "x", 1L, false), (1L, "y", 1L, true)).toDF("k", "v", "version", "deleted"),
      "k", "version", "deleted").filter(col("k") === 1L).collect()
    assert(tie.isEmpty)
    // the merged result of the registered query matches delete/update rules
    val rows = run("merge_upsert").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getLong(0)
      if (key < 10000000L) { // inserted keys (base+10M) aren't delete targets
        assert(key % 13 != 0, s"deleted key $key survived")
        if (key % 7 == 0) assert(r.getString(2) == "U" && r.getLong(4) == 1L)
      }
    }
  }

  test("etl_scd2: intervals chain per key, exactly one current row") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      (1L, "a", 0L), (1L, "a2", 3L), (1L, "a3", 7L), // gaps in versions are fine
      (2L, "b", 5L)
    ).toDF("k", "v", "version")
    val out = Etl.scd2(changes, "k", "version")
      .select("k", "version", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    val k1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(k1.map(_._3) === Seq(Some(3L), Some(7L), None)) // [0,3) [3,7) [7,∞)
    assert(out.count(_._4) == 2) // one current per key
    // registered query: every key has exactly one current row and
    // contiguous intervals (valid_to == next valid_from)
    val rows = run("etl_scd2").collect()
      .map(r => (r.getLong(0), r.getLong(4),
        if (r.isNullAt(6)) None else Some(r.getLong(6)), r.getBoolean(7)))
    rows.groupBy(_._1).foreach { case (_, hist) =>
      val sorted = hist.sortBy(_._2)
      assert(sorted.count(_._4) == 1 && sorted.last._4)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2))
        case _ =>
      }
    }
  }

  test("events_histogram: bins partition the events exactly") {
    val rows = run("events_histogram").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 9))
    val total = Tables.events(spark, sfDir).count()
    assert(rows.map(_._3).sum == total) // every event lands in exactly one bin
  }

  test("etl_scd2: duplicate (key, version) rows order deterministically") {
    val s = spark
    import s.implicits._
    // two rows tie on (k, version) — the whole-row tiebreak (payload asc)
    // must pin which one the interval chain visits first, every run
    val changes = Seq((1L, "b", 5L), (1L, "a", 5L), (1L, "c", 9L))
      .toDF("k", "v", "version")
    val expect = Seq(("a", 5L, Some(5L)), ("b", 5L, Some(9L)), ("c", 9L, None))
    (1 to 3).foreach { _ =>
      val got = Etl.scd2(changes, "k", "version")
        .select("v", "version", "valid_to").collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(t => (t._1, t._2))
      assert(got.toSeq === expect)
    }
  }

  test("events_funnel: strict stage order, same-instant does not advance") {
    val s = spark
    import s.implicits._
    import graft.operators.Events
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val e = Seq(
      // user 1: full funnel in order
      (1L, "view", t(10)), (1L, "click", t(20)), (1L, "purchase", t(30)),
      // user 2: click BEFORE first view -> stays at stage 1
      (2L, "click", t(5)), (2L, "view", t(10)),
      // user 3: click at the SAME instant as view -> not strictly after
      (3L, "view", t(10)), (3L, "click", t(10)),
      // user 4: never viewed -> excluded
      (4L, "purchase", t(10)),
      // user 5: second click after view counts even though first was before
      (5L, "click", t(1)), (5L, "view", t(2)), (5L, "click", t(9))
    ).toDF("user_id", "event_type", "ts")
    val out = Events.funnel(e, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 5L -> 2L))
    // one shuffle: all three stage windows share the user partition
    val p = plan(Events.funnel(e, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("events_anomaly: flagged rows clear the z threshold against exact stats") {
    val rows = run("events_anomaly").collect()
    assert(rows.nonEmpty)
    // >=, not >: the operator filters on the UNROUNDED z, so a genuine
    // anomaly at |z| = 2.50003 is emitted with z rounded to exactly 2.5
    assert(rows.forall(r => math.abs(r.getDouble(3)) >= 2.5))
    // anomalies are rare by construction: a small fraction of the stream
    val total = Tables.events(spark, sfDir).count()
    assert(rows.length < total / 10)
  }

  test("events_retention: offset-0 cell equals cohort size, offsets non-negative") {
    val rows = run("events_retention").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0))
    // every user is active on their own cohort day, so the offset-0 cell
    // is the largest in its cohort row
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val zero = cells.find(_._2 == 0L)
      assert(zero.isDefined)
      assert(cells.forall(_._3 <= zero.get._3))
    }
  }

  test("etl_sanitize fills defaults, keeps non-empty values") {
    val rows = run("etl_sanitize").collect()
    assert(rows.forall(r => r.getString(1).nonEmpty && r.getString(2).nonEmpty))
  }

  test("etl_quarantine: channels partition the input, nulls fail rules") {
    val rows = run("etl_quarantine").collect()
    assert(rows.length == Tables.orders(spark, sfDir).count().toInt)
    rows.foreach { r =>
      val failed = r.getString(3); val valid = r.getBoolean(4)
      assert(valid == failed.isEmpty)
      assert(valid == (r.getDouble(1) <= 300000.0 && r.getDouble(1) >= 1000.0))
    }
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)))
    // a NULL predicate input quarantines (validation semantics, not 3VL SQL)
    val s = spark
    import s.implicits._
    val withNulls = Seq((1L, Some(5.0)), (2L, None), (3L, Some(-1.0)))
      .toDF("id", "v")
    val checked = Etl.validateRules(withNulls,
      Seq("v_pos" -> (col("v") > 0))).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(checked(1L) == "" && checked(2L) == "v_pos" && checked(3L) == "v_pos")
  }

  test("flow split/join round-trips") {
    val joined = run("flow_join").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
    docs.take(20).foreach { d =>
      assert(joined(d.getLong(0)) == d.getString(1).split(" ").mkString("|"))
    }
  }

  test("flow_edge_detector: rising and falling edges are mutually exclusive") {
    val rows = run("flow_edge_detector").collect()
    assert(rows.exists(_.getBoolean(3)))
    assert(rows.exists(_.getBoolean(4)))
    assert(rows.forall(r => !(r.getBoolean(3) && r.getBoolean(4))))
  }

  test("flow_push appends, flow_foreach maps elementwise") {
    val pushed = run("flow_push").collect()
    assert(pushed.forall(_.getString(1).endsWith("|EOS")))
    val upped = run("flow_foreach").collect()
    assert(upped.forall(r => r.getString(1) == r.getString(1).toUpperCase))
  }

  test("flow to_json / json_parse round-trip semantics") {
    val js = run("flow_to_json").collect()
    assert(js.forall(_.getString(1).startsWith("{\"event_id\":")))
    val parsed = run("flow_json_parse").collect()
    assert(parsed.forall(r => r.getLong(2) == 2 * r.getLong(1)))
  }

  test("events_sessionize: gaps within a session never exceed the threshold") {
    val sess = run("events_sessionize").collect()
    assert(sess.nonEmpty)
    // session_end of session n precedes session_start of session n+1 by > gap
    sess.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      sorted.zip(sorted.tail).foreach { case (prev, next) =>
        val gapUs = (next.getTimestamp(2).getTime - prev.getTimestamp(3).getTime) * 1000L
        assert(gapUs > 3600L * 1000000L - 1000000L) // >= gap (ms precision)
      }
    }
  }

  test("q_join_salted returns exactly the plain inner join") {
    val salted = run("q_join_salted").collect().map(_.toString).sorted
    val plain = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
      .orderBy("o_orderkey").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("asofJoin: latest right row at or before each left row, nulls before any") {
    val s = spark
    import s.implicits._
    def t(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val left = Seq((1L, t(1), 101L), (1L, t(2), 102L), (1L, t(3), 103L),
      (1L, t(5), 105L), (2L, t(4), 201L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, t(2), 20.0), (1L, t(4), 40.0), (9L, t(0), 90.0))
      .toDF("user_id", "ts", "v")
    val out = graft.operators.Events.asofJoin(left, right,
      key = "user_id", leftTs = "ts", rightTs = "ts", payload = Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(out == Map(
      101L -> None,          // before any right row
      102L -> Some(20.0),    // <= includes the equal-ts right row
      103L -> Some(20.0),
      105L -> Some(40.0),
      201L -> None))         // key with no right rows at all
  }

  test("events_range_join: bin equi-join plan (no nested loop), matches contained events") {
    val p = plan(run("events_range_join"))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"range join fell back to BNLJ:\n$p")
    assert(!p.contains("CartesianProduct"))
    val rows = run("events_range_join").collect()
    assert(rows.nonEmpty)
    // brute-force check on the small SF: every matched event really falls
    // inside the claimed window, and no containment is missed
    val ev = Tables.events(spark, sfDir).select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val wins = graft.operators.Events.sessionStats(
      Tables.events(spark, sfDir).filter(col("user_id") < 3),
      key = "user_id", ts = "ts", gapSec = 3600, tiebreak = "event_id")
      .select("user_id", "session_seq", "session_start", "session_end").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getTimestamp(2), r.getTimestamp(3)))).toMap
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (eid, ts) <- ev.toSeq
      ((wu, wseq), (s0, s1)) <- wins.toSeq
      if !ts.before(s0) && !ts.after(s1)
    } yield (eid, wu, wseq)).toSet
    assert(got == want)
  }

  test("events_sketch_rollup: flags green; incremental merge row-identical to rebuild; rollup reads only the sketch table") {
    val roll = run("events_sketch_rollup").collect()
    assert(roll.nonEmpty)
    roll.foreach(r => assert(r.getBoolean(4),
      s"week ${r.get(0)}/${r.getString(1)}: sketch-union estimate outside bound"))
    // register-wise max is associative + idempotent: the standing-table +
    // day-batch union must reproduce the from-scratch build row-for-row
    val maint = run("events_sketch_maintain").collect().map(_.toString).sorted.toSeq
    assert(maint == roll.map(_.toString).sorted.toSeq)
    // the production rollup path consumes ONLY the day-grain sketch table:
    // one raw-log scan total (the daily build), none added by the rollup
    val ev = Tables.events(spark, sfDir)
    val daily = graft.operators.Events.sketchDaily(ev, "ts", "event_type", "user_id")
    val p = plan(graft.operators.Events.sketchRollup(daily, "event_type"))
    assert(p.split("Scan parquet").length - 1 == 1, "rollup must not rescan the raw log")
  }

  test("events_approx_stats: sketches graded in-query, every flag green") {
    // the registered query outputs exact values + bound flags; the raw
    // sketches must sit inside their documented error bounds
    val rows = run("events_approx_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} HLL outside +-15%")
      assert(r.getBoolean(4), s"${r.getString(0)} p50 rank outside bound")
      assert(r.getBoolean(5), s"${r.getString(0)} p95 rank outside bound")
    }
    // and the exact half agrees with the dedicated exact query
    val exact = run("events_distinct_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
    // the raw sketch surface keeps its direct bound check too
    val approx = graft.operators.Events.approxStats(
      Tables.events(spark, sfDir), "event_type", "user_id", "value").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    approx.foreach { case (k, (users, p50, p95)) =>
      assert(math.abs(users - exact(k)).toDouble / exact(k) < 0.1, s"$k HLL off >10%")
      assert(p50 <= p95)
    }
  }

  test("mm_chunks reassemble to the full payload size") {
    val rows = run("mm_chunks").collect()
    val bytesByDoc = rows.groupBy(_.getLong(0)).map { case (id, cs) =>
      id -> cs.map(_.getLong(2)).sum }
    val meta = run("mm_meta").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    bytesByDoc.foreach { case (id, n) => assert(n == meta(id)) }
    assert(rows.forall(_.getString(3).length == 32))
  }

  test("text_pii_mask leaves no digits behind") {
    val rows = run("text_pii_mask").collect()
    assert(rows.forall(!_.getString(1).exists(_.isDigit)))
    assert(rows.exists(_.getString(1).contains("<NUM>")))
  }

  test("q_topk_group plan is two-phase (salted partial rank first)") {
    val p = plan(run("q_topk_group"))
    assert(p.split("Window").length - 1 >= 2, "expected two window phases")
    assert(p.contains("pmod"), "expected salt in phase-1 partitioning")
  }

  test("events_recent compiles to a global top-N, not a full sort") {
    val p = plan(run("events_recent"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("events_gap_fill: complete daily grid, forward fill carries last value") {
    val rows = run("events_gap_fill").collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    val dayUs = 86400L * 1000000L
    byUser.foreach { case (u, rs) =>
      val buckets = rs.map(r => r.getTimestamp(1).getTime * 1000)
      // grid completeness: consecutive days from first to last, no holes
      assert(buckets.sorted.sliding(2).forall {
        case Array(a, b) => b - a == dayUs
        case _ => true
      }, s"user $u grid has holes")
      // edges are observations, never filled
      val sortedRs = rs.sortBy(_.getTimestamp(1).getTime)
      assert(!sortedRs.head.getBoolean(3) && !sortedRs.last.getBoolean(3),
        s"user $u span edge marked filled")
      // forward fill: a filled row repeats the previous row's value
      sortedRs.sliding(2).foreach {
        case Array(a, b) =>
          if (b.getBoolean(3)) assert(b.getDouble(2) == a.getDouble(2),
            s"user $u filled row does not carry forward")
        case _ =>
      }
    }
    // at least one gap actually got filled at this sf
    assert(rows.exists(_.getBoolean(3)), "no filled rows — grid degenerate")
  }

  test("events_transitions matches a brute-force per-user walk") {
    val rows = run("events_transitions").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val brute = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).toSeq.sliding(2).collect {
        case Seq(a, b) => (a, b)
      }
    }.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    assert(rows == brute)
  }

  test("events_cumulative_users: monotone growth curve totalling distinct users") {
    val rows = run("events_cumulative_users").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // cumulative = running sum of new; final = exact distinct user count
    rows.foldLeft(0L) { case (acc, (_, nu, cum)) =>
      assert(cum == acc + nu); cum
    }
    val distinctUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.last._3 == distinctUsers)
    assert(rows.map(_._2).sum == distinctUsers)
  }

  test("events_sliding_window: each window = the sum of its tumbling halves") {
    val sliding = run("events_sliding_window").collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(2)).toMap
    assert(sliding.nonEmpty)
    // 5-minute tumbling counts from the raw table
    val tumb = Tables.events(spark, sfDir).select(col("ts")).collect()
      .map { r =>
        val t = r.getTimestamp(0).getTime
        t - java.lang.Math.floorMod(t, 5 * 60 * 1000L)
      }
      .groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    // a [s, s+10min) window holds exactly the events of buckets s and s+5min
    sliding.foreach { case (ms, n) =>
      val expect = tumb.getOrElse(ms, 0L) + tumb.getOrElse(ms + 5 * 60 * 1000L, 0L)
      assert(n == expect, s"window at $ms: $n != $expect")
    }
    // every event is counted exactly twice across the sliding windows
    assert(sliding.values.sum == 2 * Tables.events(spark, sfDir).count())
  }

  test("events_pattern == brute-force next-purchase walk, no self-join") {
    val df = run("events_pattern")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // brute force: per user, in (ts, event_id) order, each view's next
    // purchase ts (min over strictly-later rows) within the hour
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), us(r.getTimestamp(2)), r.getString(3)))
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (user, rows) =>
      val ord = rows.sortBy(r => (r._3, r._2))
      ord.zipWithIndex.collect { case ((_, eid, ts, "view"), i) =>
        val later = ord.drop(i + 1).filter(_._4 == "purchase").map(_._3)
        (eid, ts, if (later.isEmpty) None else Some(later.min))
      }.collect { case (eid, ts, Some(b)) if b - ts <= 3600000000L =>
        (user, eid) -> (b - ts)
      }
    }.toMap
    assert(got == expect)
    // one window pass — the naive shape (events self-joined to events)
    // must not appear
    assert(!plan(df).contains("Join"))
  }

  test("events_rolling_p90 == brute-force trailing-frame rank walk") {
    val got = run("events_rolling_p90").collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), us(r.getTimestamp(2)), r.getDouble(3)))
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ord = rows.sortBy(r => (r._3, r._2))
      ord.zipWithIndex.map { case ((_, eid, _, _), i) =>
        val frame = ord.slice(math.max(0, i - 9), i + 1).map(_._4).sorted
        val rank = math.ceil(0.9 * frame.length).toInt
        eid -> ((frame.length.toLong, frame(rank - 1)))
      }
    }.toMap
    assert(got == expect && got.nonEmpty)
    // early rows have growing frames; steady state is exactly 10
    assert(got.values.exists(_._1 < 10L) && got.values.exists(_._1 == 10L))
    // NULL readings: dropped from the frame, and an all-NULL frame
    // yields NULL instead of an element_at(_, 0) error
    val s2 = spark
    import s2.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val nulls = Seq((1L, 1L, t(1), null.asInstanceOf[java.lang.Double]),
      (1L, 2L, t(2), java.lang.Double.valueOf(5.0)),
      (1L, 3L, t(3), null.asInstanceOf[java.lang.Double]))
      .toDF("user_id", "event_id", "ts", "value")
    val nr = graft.operators.Events.rollingPercentile(nulls, "user_id", "ts",
      "event_id", "value", frameRows = 10, p = 0.9)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(1), r.getLong(4), Option(r.get(5))))
    assert(nr(0) == ((1L, 0L, None)))           // all-NULL frame -> NULL
    assert(nr(1) == ((2L, 1L, Some(5.0))))      // NULLs dropped from count
    assert(nr(2) == ((3L, 1L, Some(5.0))))
  }

  test("events_windowed_topk: per-bucket top-3 by count, ties on type") {
    val rows = run("events_windowed_topk").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val direct = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("b"), col("event_type")).count()
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.groupBy(_._1).foreach { case (b, rs) =>
      assert(rs.length <= 3 && rs.map(_._4).sorted.sameElements(1L to rs.length))
      // rank order == (count desc, type asc), counts match the direct agg
      val ord = rs.sortBy(_._4)
      assert(ord.map(r => (-r._3, r._2)).sorted.sameElements(ord.map(r => (-r._3, r._2))))
      ord.foreach { case (_, t, n, _) => assert(direct((b, t)) == n) }
      // nothing outside the top-3 beats anything inside it
      val inMin = ord.map(_._3).min
      val outside = direct.collect { case ((`b`, t), n) if !rs.exists(_._2 == t) => n }
      assert(outside.forall(_ <= inMin))
    }
  }

  test("etl_agg_maintain: chained delta folds == full rebuild, empty delta is a no-op") {
    val ev = Tables.events(spark, sfDir).select("event_type", "ts", "value")
    val full = Etl.aggOf(ev, "event_type", "value").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    // fold the stream in as FOUR chronological delta batches
    val cuts = Seq("2024-01-08", "2024-01-16", "2024-01-24")
      .map(c => lit(java.sql.Timestamp.valueOf(s"$c 00:00:00")))
    val parts = Seq(
      ev.filter(col("ts") < cuts(0)),
      ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      ev.filter(col("ts") >= cuts(1) && col("ts") < cuts(2)),
      ev.filter(col("ts") >= cuts(2)))
    val folded = parts.tail.foldLeft(Etl.aggOf(parts.head, "event_type", "value")) {
      (acc, delta) => Etl.aggMaintain(acc, delta, "event_type", "value")
    }
    val got = folded.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    assert(got.keySet == full.keySet)
    got.foreach { case (k, (n, s)) =>
      assert(n == full(k)._1 && s.compareTo(full(k)._2) == 0)
    }
    // an empty delta batch changes nothing
    val noop = Etl.aggMaintain(folded, ev.filter(lit(false)), "event_type", "value")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    assert(noop.keySet == got.keySet)
    noop.foreach { case (k, (n, s)) =>
      assert(n == got(k)._1 && s.compareTo(got(k)._2) == 0)
    }
  }

  test("events_retention_maintain: chained out-of-order folds == full rebuild at every prefix") {
    import graft.operators.Events
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Any, Long), Long] =
      df.collect().map(r => (r.get(0), r.getLong(1)) -> r.getLong(2)).toMap
    // OUT-OF-ORDER deltas: event_id % 4 interleaves days, so later
    // batches carry days EARLIER than a user's standing cohort and the
    // min-merge must genuinely move cohorts (the late-data case)
    val parts = (0 to 3).map(i => ev.filter(pmod(col("event_id"), lit(4)) === i))
    var st = Events.retentionStateOf(parts.head, "user_id", "ts")
    var seen = parts.head
    parts.tail.foreach { delta =>
      st = (st._1.localCheckpoint(true), st._2.localCheckpoint(true))
      st = Events.retentionMaintain(st._1, st._2, delta, "user_id", "ts")
      seen = seen.unionByName(delta)
      // fold == rebuild at EVERY prefix, not just the final state
      val got = cells(Events.retentionFromState(st._1, st._2, "user_id"))
      val want = cells(Events.retention(seen, "user_id", "ts"))
      assert(got == want, s"prefix diverged: ${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
    }
    // an empty delta batch changes nothing
    val empty = ev.filter(lit(false))
    val st2 = Events.retentionMaintain(
      st._1.localCheckpoint(true), st._2.localCheckpoint(true),
      empty, "user_id", "ts")
    assert(cells(Events.retentionFromState(st2._1, st2._2, "user_id")) ==
      cells(Events.retentionFromState(st._1, st._2, "user_id")))
  }

  test("etl_fk_integrity: orphan counts match direct anti-join counts, TPC-H edges clean") {
    val rows = run("etl_fk_integrity").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 5)
    // the TPC-H-shaped relationships hold by construction
    for (r <- Seq("orders_customer", "lineitem_orders", "lineitem_part",
        "customer_nation"))
      assert(rows(r) == 0L, s"$r should have no orphans")
    // the unconstrained edge really measures something
    val direct = Tables.events(spark, sfDir).select(col("user_id"))
      .join(Tables.customer(spark, sfDir).select(col("c_custkey")),
        col("user_id") === col("c_custkey"), "left_anti").count()
    assert(rows("events_customer") == direct)
  }

  test("data_profile: one row per column, aggregates agree with direct queries") {
    val rows = run("data_profile").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))).toMap
    val o = Tables.orders(spark, sfDir)
    assert(rows.keySet == o.columns.toSet)
    for (c <- o.columns)
      assert(rows(c)._2 == o.select(c).distinct().count())
    assert(rows.values.forall(_._1 == 0L)) // generator emits no nulls
    val keys = o.select("o_orderkey").collect().map(_.getLong(0))
    assert(rows("o_orderkey")._3 == keys.min.toString &&
      rows("o_orderkey")._4 == keys.max.toString)
    // doubles render through DECIMAL(18,2): exactly two decimals
    assert(rows("o_totalprice")._3.matches("""-?\d+\.\d\d"""))
  }

  test("events_paths: first-k journeys, counted and rank-limit pushed down") {
    val s = spark
    import s.implicits._
    import graft.operators.Events
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val ev = Seq(
      (1L, t(0), 100L, "view"), (2L, t(1), 100L, "click"), (3L, t(2), 100L, "purchase"),
      (4L, t(0), 200L, "view"), (5L, t(1), 200L, "click"), (6L, t(2), 200L, "purchase"),
      (7L, t(0), 300L, "view"),
      // a 4-event user truncates at k=3: the 4th type never shows up
      (8L, t(0), 400L, "view"), (9L, t(1), 400L, "click"),
      (10L, t(2), 400L, "purchase"), (11L, t(3), 400L, "error")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val df = Events.topPaths(ev, "user_id", "event_type", "ts", "event_id",
      k = 3, top = 10)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view>click>purchase" -> 3L, "view" -> 1L))
    // rn <= k must prune map-side: partial + final WindowGroupLimit
    assert("WindowGroupLimit".r.findAllIn(plan(df)).size >= 2, plan(df))
  }

  test("events_rolling_1h: RANGE frame includes ties, excludes beyond-horizon") {
    val s = spark
    import s.implicits._
    import graft.operators.Events
    def t(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      (1L, t(0), 5L, 1.0),
      (2L, t(30), 5L, 2.0),
      (3L, t(30), 5L, 4.0),   // tie with event 2: both are frame peers
      (4L, t(61), 5L, 8.0),   // events at t=0 now beyond the 1h horizon
      (5L, t(0), 6L, 16.0)    // other user: frames never cross users
    ).toDF("event_id", "ts", "user_id", "value")
    val got = Events.rollingRange(ev, "event_id", "user_id", "ts", "value",
      backUs = 3600L * 1000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1L, 1.0)))
    // ties: BOTH rows at t=30 see each other (peer inclusion)
    assert(got(2L) == ((3L, 7.0)))
    assert(got(3L) == ((3L, 7.0)))
    // t=61: the t=0 row fell out, the two t=30 rows remain
    assert(got(4L) == ((3L, 14.0)))
    assert(got(5L) == ((1L, 16.0)))
  }

  test("events_rolling_1h: trailing window is growing frames, never a sliding frame") {
    // Spark re-aggregates a SLIDING frame per row (no retraction):
    // O(rows × frame) per key, 1.6× slower on the sf10 hot-key smoke and
    // unbounded as frames densify. The trailing hour must stay decomposed
    // as cum[-inf, t] − cum[-inf, t−1h−1] — every frame lower bound
    // UnboundedPreceding, so both processors are add-only incremental.
    val p = plan(run("events_rolling_1h"))
    assert(!p.contains("RangeFrame, -"),
      s"sliding RANGE frame (negative lower bound) reappeared:\n${p.take(1200)}")
    assert(p.contains("unboundedpreceding"), p.take(1200))
  }

  test("events_stickiness: partial windows at corpus start, exact ratio") {
    val s = spark
    import s.implicits._
    import graft.operators.Events
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 09:00:00")
    val ev = Seq(
      (1L, t(1), 10L), (2L, t(1), 20L), // d1: users {10, 20}
      (3L, t(2), 10L),                  // d2: {10}
      (4L, t(10), 30L)                  // d10: {30}; d1..d2 within its 28d, outside its 7d
    ).toDF("event_id", "ts", "user_id")
    val got = Events.stickiness(ev, "user_id", "ts")
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("2024-01-01") == ((2L, 2L, 2L, 1.0)))
    assert(got("2024-01-02") == ((1L, 2L, 2L, 0.5)))
    // d10: dau {30}; wau [d4,d10] = {30}; mau [pre,d10] = {10,20,30}
    assert(got("2024-01-10") == ((1L, 1L, 3L, 0.3333)))
  }

  test("q_trend_monthly: first-row NULL lag, gap months lag to the previous PRESENT month") {
    val s = spark
    import s.implicits._
    import graft.SparkEntry
    val dir = "/tmp/graft_trend_spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-$m%02d-15 00:00:00")
    // months 1, 2, 4 — month 3 has no orders
    Seq((1L, t(1), 10.0), (2L, t(2), 30.0), (3L, t(4), 20.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q_trend_monthly")(s, dir)
      .collect().map(r => (r.getTimestamp(0).toString.take(7),
        (if (r.isNullAt(3)) null else r.getDouble(3)), r.isNullAt(4),
        (if (r.isNullAt(4)) 0.0 else r.getDouble(4))))
    assert(got(0) == (("2024-01", null, true, 0.0)))
    assert(got(1) == (("2024-02", 10.0, false, 20.0)))
    // gap: April's prev is February (the previous PRESENT month)
    assert(got(2) == (("2024-04", 30.0, false, -10.0)))
  }

  test("events_engagement: power-of-2 buckets with exact boundaries") {
    val s = spark
    import s.implicits._
    import graft.operators.Events
    // user -> event count: 1, 2 (boundary), 3, 8 (boundary), 100
    val ev = Seq(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 8, 5L -> 100).flatMap {
      case (u, n) => (1 to n).map(i => (u * 1000 + i, u))
    }.toDF("event_id", "user_id")
    val got = Events.engagement(ev, "user_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 1L)), 2L -> ((2L, 5L)),
      8L -> ((1L, 8L)), 64L -> ((1L, 100L))))
  }

  test("events_active_users: DAU exact, WAU is a true rolling distinct") {
    val s = spark
    import s.implicits._
    import graft.operators.Events
    def t(day: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 10:00:00").getTime)
    val ev = Seq(
      (1L, t(1), 100L, "view"), (2L, t(1), 100L, "view"), // same user twice on d1
      (3L, t(1), 200L, "view"),
      (4L, t(3), 100L, "view"),                           // same user again d3
      (5L, t(12), 300L, "view")                           // beyond d1's 7-day reach
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.activeUsers(ev, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    // d1: users {100,200}; d3: {100}; d12: {300}
    assert(got("2024-01-01") == ((2L, 2L)))
    // WAU at d3 = distinct over d1..d3 = {100,200} = 2, NOT 3 (100 counted once)
    assert(got("2024-01-03") == ((1L, 2L)))
    // d12 is beyond both earlier days' windows
    assert(got("2024-01-12") == ((1L, 1L)))
  }

  test("events_heatmap: Sunday-first 0-6 cells, exact decimal sums") {
    val s = spark
    import s.implicits._
    import graft.operators.Events
    // 2024-01-01 was a Monday; 2024-01-07 a Sunday
    val ev = Seq(
      ("2024-01-01 09:15:00", 1.5), ("2024-01-01 09:45:00", 2.25),
      ("2024-01-01 17:00:00", 1.0), ("2024-01-07 09:30:00", 4.0)
    ).toDF("s", "value").withColumn("ts", col("s").cast("timestamp"))
    val got = Events.heatmap(ev, "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map((1L, 9L) -> ((2L, 3.75)), (1L, 17L) -> ((1L, 1.0)),
      (0L, 9L) -> ((1L, 4.0))))
  }

  test("events_ohlc: open/close follow (ts, id) order; single-agg plan") {
    val s = spark
    import s.implicits._
    import graft.operators.Events
    val ev = Seq(
      (1L, "2024-01-01 09:05:00", 5.0), (2L, "2024-01-01 09:10:00", 1.0),
      (4L, "2024-01-01 09:55:00", 3.0), (3L, "2024-01-01 09:55:00", 9.0)
    ).toDF("event_id", "s", "value")
      .withColumn("ts", col("s").cast("timestamp"))
      .withColumn("event_type", lit("x"))
    val r = Events.ohlc(ev, "ts", "event_id", "value", "hour", Seq("event_type"))
      .collect().head
    // open = earliest; close = ts-tie broken by event_id (4 > 3 -> 3.0)
    assert(r.getDouble(2) == 5.0 && r.getDouble(5) == 3.0)
    assert(r.getDouble(3) == 9.0 && r.getDouble(4) == 1.0)
    assert(r.getLong(6) == 4L)
    // one map-side-combinable hash agg: no window functions anywhere
    val p = plan(run("events_ohlc"))
    assert(!p.contains("Window"), s"candle must not plan a window:\n${p.take(800)}")
  }

  test("zorderKey interleaves bits; layout report is lossless and local") {
    val s = spark
    import s.implicits._
    import graft.operators.Etl
    // 0b1111 ⨯ 0b0000 -> odd bit positions only = 0b10101010 = 170
    val k = Seq((15L, 0L)).toDF("a", "b")
      .select(Etl.zorderKey(col("a"), col("b"), 4).as("z"))
      .collect().head.getLong(0)
    assert(k == 170L)
    // and the mirror case lands on the even positions
    val k2 = Seq((0L, 15L)).toDF("a", "b")
      .select(Etl.zorderKey(col("a"), col("b"), 4).as("z"))
      .collect().head.getLong(0)
    assert(k2 == 85L)
    val rows = run("data_zorder_layout").collect()
    val total = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == total, "every row lands in exactly one file")
    // locality: the average file bounding box must cover a small fraction
    // of the z-space (uniform data splits into ~1/2^fileBits boxes)
    val fracs = rows.map(_.getDouble(6))
    assert(fracs.forall(f => f > 0 && f <= 1))
    assert(fracs.sum / fracs.length < 0.1,
      s"z-order files must be local, mean bbox ${fracs.sum / fracs.length}")
  }

  test("data_skew_report: desc heavy hitters with consistent ratios") {
    val rows = run("data_skew_report").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    val cnts = rows.map(_._2)
    assert(cnts.sameElements(cnts.sorted.reverse))
    rows.foreach { case (_, cnt, share, xavg) =>
      assert(cnt > 0 && share > 0 && share <= 1)
      assert(xavg > 0, "heavy hitters sit above zero of the mean")
    }
  }

  test("expectations: null-flow, range, accepted-values and uniqueness semantics") {
    val s = spark
    import s.implicits._
    import graft.operators.Etl
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 5.0, "A"), (2L, null, "B"), (2L, 120.0, "X"), (null, 7.0, "A"))
      .toDF("k", "v", "f")
    val rows = Etl.expectations(df, "t", Seq(
        "k_not_null" -> col("k").isNull,
        "v_range" -> !col("v").between(0.0, 100.0),
        "f_accepted" -> !col("f").isin("A", "B")))
      .unionAll(Etl.uniqueExpectation(df, "t", "k"))
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(rows("k_not_null") == 1L)
    // NULL v flows to "no violation", exactly like SQL's CASE
    assert(rows("v_range") == 1L)
    assert(rows("f_accepted") == 1L)
    // 4 rows, distinct keys {1, 2, null->counted? no: countDistinct skips null} = 2 -> 2 dups
    assert(rows("k_unique") == 2L)
  }

  test("expectations over an empty table report zero violations, not NULL") {
    val s = spark
    import s.implicits._
    import graft.operators.Etl
    val empty = Seq.empty[(java.lang.Long, java.lang.Double)].toDF("k", "v")
    val rows = Etl.expectations(empty, "t", Seq(
        "k_not_null" -> col("k").isNull,
        "v_range" -> !col("v").between(0.0, 100.0)))
      .unionAll(Etl.uniqueExpectation(empty, "t", "k"))
      .withColumn("pass", col("violations") === 0L)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(!r.isNullAt(3) && r.getLong(3) == 0L, s"violations null/nonzero: $r")
      assert(r.getBoolean(4), s"pass must be true on empty input: $r")
      assert(r.getLong(2) == 0L)
    }
  }

  test("stateMachineReplayChunked equals the unchunked replay, incl. a hot key") {
    val s = spark
    import s.implicits._
    import graft.operators.Events
    // real corpus: chunked (per-user-day transfer folds stitched at
    // chunk grain) must equal the unchunked fold row for row
    val base = Events.stateMachineReplay(Tables.events(s, sfDir),
        key = "user_id", typeCol = "event_type", tsCol = "ts",
        tiebreak = "event_id", initial = "idle", table = Events.intentMachine)
      .select("user_id", "n_events", "n_transitions", "final_state")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val chunked = run("events_state_machine_chunked").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(chunked == base, "chunked replay diverged from the unchunked fold")
    // hot key: ONE user owning 40k events across 60 days — the case the
    // chunked fold exists for (the unchunked per-key array). Events
    // cycle through the machine's whole alphabet so every chunk
    // boundary crosses live state; equality is vs the unchunked fold.
    val types = Seq("signup", "view", "click", "purchase", "error")
    val hot = (0 until 40000).map { i =>
      (7L, new java.sql.Timestamp(1700000000000L + (i / 667) * 86400000L +
        (i % 667) * 1000L), i.toLong, types(i % types.size))
    }.toDF("user_id", "ts", "event_id", "event_type")
    val want = Events.stateMachineReplay(hot, "user_id", "event_type",
        "ts", "event_id", "idle", Events.intentMachine)
      .select("user_id", "n_events", "n_transitions", "final_state")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    val got = Events.stateMachineReplayChunked(hot, "user_id", "event_type",
        "ts", "event_id", "idle", Events.intentMachine)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(got == want, s"hot-key chunked $got != $want")
    assert(want.head._2 == 40000L)
    assert(want.head._3 > 0L, "hot-key machine never moved")
  }
}
