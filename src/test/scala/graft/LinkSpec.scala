package graft

import org.apache.spark.sql.functions._
import graft.operators.Link

/** Record-linkage family: deletion-neighborhood exactness for the three
  * modeled typo classes, argmin bit-packing equivalence, and the plan
  * shapes that keep candidate generation linear at scale.
  */
class LinkSpec extends SparkSpec {

  private def pipeline() = {
    val clean = Link.cleanEntities(Tables.customer(spark, sfDir), "c_custkey")
    val dirty = Link.dirtyRecords(clean)
    (dirty, clean)
  }

  test("deletion-neighborhood recall is exact: every record's candidates contain its true NAME's representative") {
    val (dirty, clean) = pipeline()
    // the clean side is name-collapsed (nameReps), so the recall
    // contract is per NAME: each record's candidate set must contain
    // the min-e representative of its true entity's clean name
    val expected = dirty
      .join(clean.select(col("e").as("true_e"), col("cname")), "true_e")
      .join(Link.nameReps(clean).select(col("cname"), col("e").as("rep_e")), "cname")
      .select(col("record_id").as("exp_rid"), col("rep_e"))
    // cand descends from dirty, so rename BOTH join columns to fresh
    // names — a dirty("record_id") === cand("record_id") condition
    // resolves self-referentially (trivially true) and silently weakens
    // the assertion to "rep matched under ANY record"
    val cand = Link.candidates(dirty, clean)
      .select(col("record_id").as("cand_rid"), col("e").as("cand_e"))
    val missed = expected
      .join(cand,
        col("exp_rid") === col("cand_rid") && col("rep_e") === col("cand_e"),
        "left_anti")
      .count()
    assert(missed === 0L,
      s"$missed records lost their true name's rep in blocking — k=1 deletion index must cover delete/transpose/substitute")
  }

  test("name-collapse equivalence: best match over the FULL entity table equals the rep-collapsed pipeline") {
    // the exactness argument, measured: same-name entities all sit at
    // the same lev from any record, so the (lev, e) argmin over the
    // uncollapsed index must land on exactly the rep the collapse keeps
    val (dirty, clean) = pipeline()
    val full = {
      val dv = Link.deletionIndex(dirty, "dname", Seq("record_id", "dname"))
      val cv = Link.deletionIndex(clean, "cname", Seq("e", "cname"))
      dv.join(cv.hint("shuffle_hash"), "variant")
        .select("record_id", "dname", "e", "cname").distinct()
    }
    val viaFull = Link.bestMatch(full)
    val viaRep = Link.bestMatch(Link.candidates(dirty, clean))
    assert(viaFull.except(viaRep).count() === 0L && viaRep.except(viaFull).count() === 0L,
      "name-collapse changed the best-match output — tie-break argument broken")
  }

  test("adjacent transposition shares a deletion variant (the k=1 coverage argument, by hand)") {
    // clean "abcd", transpose at p=2 -> "acbd": clean\{p} = "abd", dirty\{p+1} = "abd"
    val df = {
      val s = spark
      import s.implicits._
      Seq("abcd", "acbd").toDF("n")
    }
    val idx = Link.deletionIndex(df, "n", Seq("n"))
    val shared = idx.groupBy("variant").agg(countDistinct("n").as("k"))
      .filter(col("k") === 2).count()
    assert(shared >= 1, "transposed pair shares no deletion variant — k=1 index argument broken")
  }

  test("exact records (v0) match their entity at lev 0; every record matches something") {
    val (dirty, clean) = pipeline()
    val best = Link.bestMatch(Link.candidates(dirty, clean))
    val joined = dirty.join(best, Seq("record_id"), "left")
    assert(joined.filter(col("matched_e").isNull).count() === 0L, "full recall expected at lev <= 2")
    // v0 is byte-identical to SOME entity's clean name, so lev must be 0
    assert(joined.filter(col("v") === 0 && col("lev") =!= 0).count() === 0L)
    // and every lev is within the declared verify threshold
    assert(joined.filter(col("lev") > 2).count() === 0L)
  }

  test("bit-packed argmin equals the window-ranked reference tie-break (lev, e)") {
    val (dirty, clean) = pipeline()
    val cand = Link.candidates(dirty, clean)
      .withColumn("lev", levenshtein(col("dname"), col("cname")))
      .filter(col("lev") <= 2)
    val viaWindow = cand
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("record_id").orderBy(col("lev"), col("e"))))
      .filter(col("rn") === 1)
      .select(col("record_id"), col("e").as("matched_e"), col("lev"))
    val viaPack = Link.bestMatch(Link.candidates(dirty, clean))
    assert(viaPack.except(viaWindow).count() === 0L && viaWindow.except(viaPack).count() === 0L,
      "packed argmin diverged from the definitional (lev, e) tie-break")
  }

  test("plan: argmin is a HashAggregate pair, join is equi (no cartesian), scan prunes to c_custkey") {
    val df = run("link_fuzzy_best")
    val p = plan(df)
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("SortAggregate"), "struct-min SortAggregate regressed:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(2000))
    // r15: under the name-count gate the variant join BROADCASTS the
    // name-collapsed clean index (bounded, distinct-name grain) so the
    // corpus-grain dirty index never shuffles. The mis-plan this family
    // guards against is broadcasting the CORPUS side (the sf1 smoke
    // measured it at >16 min vs seconds) — so pin: the join is a
    // BroadcastHashJoin AND its build subtree contains NO file scan
    // (the parquet corpus must only ever appear on the probe side).
    assert(p.contains("BroadcastHashJoin"),
      "gated clean-index broadcast regressed to a shuffle:\n" + p.take(2000))
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def all(pl: SparkPlan): Seq[SparkPlan] = pl +: pl.children.flatMap(all)
    val bhjs = all(df.queryExecution.sparkPlan)
      .collect { case b: BroadcastHashJoinExec => b }
    assert(bhjs.nonEmpty, "no BroadcastHashJoinExec in the pre-AQE plan")
    bhjs.foreach { b =>
      val build = b.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
        case _ => b.left
      }
      val fileScans = all(build).count(
        _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
      assert(fileScans === 0,
        s"corpus-side file scan landed on the broadcast BUILD side:\n$b")
    }
    val rs = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(rs.contains("c_custkey") && !rs.contains("c_name") && !rs.contains("c_acctbal"),
      s"link reads more than the entity key: $rs")
  }

  test("incremental linkage through the persisted index equals the in-session pipeline on the batch") {
    val viaArtifact = run("link_incremental")
    val reference = run("link_fuzzy_best")
      .filter(expr("(record_id div 4) % 10 = 0"))
    assert(viaArtifact.except(reference).count() === 0L &&
      reference.except(viaArtifact).count() === 0L,
      "persisted-index answers diverged from the in-session pipeline")
    // and the artifact actually exists behind a _SUCCESS marker
    val clean = Link.cleanEntities(Tables.customer(spark, sfDir), "c_custkey")
    val path = Link.linkIndexArtifactPath(spark, clean, sfDir)
    assert(new java.io.File(path, "_SUCCESS").exists(), s"no committed artifact at $path")
  }

  test("report is bounded (4 variant rows) and internally consistent") {
    val (dirty, clean) = pipeline()
    val rep = run("link_er_report").collect()
    assert(rep.length === 4)
    rep.foreach { r =>
      val (n, m, c) = (r.getAs[Long]("n_records"), r.getAs[Long]("n_matched"), r.getAs[Long]("n_correct"))
      assert(m <= n && c <= m, s"report row violates n_correct <= n_matched <= n_records: $r")
      assert(m === n, s"recall must be total for the modeled typo classes: $r")
    }
  }
}
