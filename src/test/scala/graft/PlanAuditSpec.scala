package graft

import org.apache.spark.sql.functions._

/** Plan audit: projections and filters must reach the parquet scans.
  * ReadSchema pruning is the difference between reading 2 columns and
  * reading every column of a 100 TB table.
  */
class PlanAuditSpec extends SparkSpec {

  private def readSchema(p: String): String =
    p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")

  test("text ops scan only doc_id and text") {
    Seq("text_tokencount", "text_quality", "text_langid", "text_fingerprint").foreach { q =>
      val rs = readSchema(plan(run(q)))
      assert(rs.contains("doc_id") && rs.contains("text"), s"$q: $rs")
      assert(!rs.contains("n_chars") && !rs.contains("source"), s"$q reads extra columns: $rs")
    }
  }

  test("dedup pipelines scan only doc_id and text") {
    Seq("dedup_minhash", "dedup_simhash").foreach { q =>
      val rs = readSchema(plan(run(q)))
      assert(!rs.contains("lang") && !rs.contains("source"), s"$q reads extra columns: $rs")
    }
  }

  test("similarity ops scan only vec_id and embedding") {
    Seq("sim_topk", "dedup_embedding").foreach { q =>
      val rs = readSchema(plan(run(q)))
      assert(!rs.contains("label"), s"$q reads the unused label column: $rs")
    }
  }

  test("relational filters push to the scan") {
    Seq("q_filter_range" -> "o_totalprice", "events_recent" -> "event_type").foreach {
      case (q, f) =>
        val p = plan(run(q))
        assert(p.contains("PushedFilters") && p.contains(f), s"$q missing pushdown of $f")
    }
  }

  test("q1_agg scans only the aggregated lineitem columns") {
    val rs = readSchema(plan(run("q1_agg")))
    assert(!rs.contains("l_comment") && !rs.contains("l_shipmode"), rs)
  }
}
