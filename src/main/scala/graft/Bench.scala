package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line to stdout.
  *
  * Methodology: results go to the `noop` sink — the full result set is
  * computed and serialised, so projection work is measured (a bare
  * `.count()` lets column pruning and EliminateSorts delete most of a
  * map-shaped query's work). One full warm-up pass first absorbs JIT,
  * codegen compilation and FS cache effects; then FIVE timed passes per
  * query and the per-query MEDIAN is reported — this host shows random
  * per-query contention spikes (BASELINE.md documents 43-94s swings on
  * identical code), and a single-shot number is noise, not signal.
  *
  * The timed passes are INTERLEAVED (five rounds over the full query
  * list, not five back-to-back runs per query): this host's contention
  * windows last tens of seconds, long enough to swallow all consecutive
  * passes of one query (observed: 7.4s/11.9s/1.9s for a 1.9s query) —
  * spreading a query's passes ~45s apart means one window inflates at
  * most one round's visit, and a median-of-5 survives even two poisoned
  * rounds. Requires the enlarged codegen cache (GraftSession) so round
  * 2+ doesn't re-Janino-compile.
  *
  * Failure policy: only NonFatal errors are caught (an OOM must kill the
  * run, not improve it); failed queries are listed explicitly in the
  * output JSON so a regression cannot silently shrink the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import scala.util.control.NonFatal
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the query set (local
    // iteration on one hot query); unset = full suite (driver mode).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n => // warm-up pass (not timed)
      try runOnce(n)
      catch { case NonFatal(e) => System.err.println(s"bench warmup: $n failed: $e") }
    }
    // 5 rounds: host contention windows last long enough to poison two
    // rounds' visits to the same query; median-of-5 tolerates that
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt).getOrElse(5)
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    // rotate the visit order each round: the host's contention is roughly
    // periodic at about one round's duration, so a FIXED order aliases
    // the same query onto the disturbance every round (observed: 3 of 5
    // passes of one query poisoned while neighbors ran clean). Rotation
    // (not reversal — reversal runs the edge queries back-to-back across
    // round boundaries) keeps every query's visits ~4/5 of a round apart
    // AND phase-shifts them against any periodic disturbance.
    val shift = math.max(1, names.size / passes)
    for (p <- 1 to passes) {
      val rot = (p - 1) * shift % names.size
      for (n <- names.drop(rot) ++ names.take(rot)) {
      try {
        val t = runOnce(n)
        System.err.println(f"bench: $n pass$p $t%.2f s") // diag only; driver reads stdout
        times(n) = t :: times(n)
      } catch { case NonFatal(e) => System.err.println(s"bench: $n failed: $e") }
      }
    }
    // contract: a query in `failed` contributed NOTHING to the total (its
    // per-query value is -1), so the headline number is comparable across
    // runs; a partially-failed query can't sneak a biased median in
    val failed = scala.collection.mutable.ListBuffer[String]()
    def median(ts: List[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = names.map { n =>
      val ts = times(n)
      if (ts.size < passes) { failed += n; n -> -1.0 }
      else n -> median(ts)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The harness that collects this line keeps only a bounded tail of the
    // build output (observed: 2000 chars, with an "[info] " prefix on this
    // line and an sbt "[success] ..." line after it — usable budget
    // ≈ 1915). With 80+ queries a full-precision line overflows that
    // window and the whole benchmark is lost to truncation. So: values are
    // rounded with trailing zeros stripped, sub-second (floor-dominated)
    // queries degrade before the heavy ones where ratios actually matter,
    // the `failed` key appears only when non-empty, and precision steps
    // down (heavyDec, floorDec) tier by tier until the line fits.
    def fmt(v: Double, dec: Int): String = {
      val s = BigDecimal(v).setScale(dec, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
      if (s == "-0") "0" else s
    }
    def line(heavyDec: Int, floorDec: Int): String = {
      val qs = results.map { case (k, v) =>
        "\"" + k + "\":" + fmt(v, if (v >= 1.0) heavyDec else floorDec)
      }.mkString("{", ",", "}")
      val failedPart = if (failed.isEmpty) "" else s""","failed":$failedJson"""
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":$qs$failedPart,"sf":"$sfDir"}"""
    }
    // Past ~90 queries even the lowest-precision full list overflows the
    // window. Final fallback: itemize only the queries where ratios matter
    // (median >= 1s — the rest sit on the fixed local-mode scheduling
    // floor) and roll the sub-second queries into {"n","sum"} so the total
    // stays reconstructible: total = sum(itemized) + sub1s.sum.
    def lineCompact(): String = {
      val heavy = results.filter(_._2 >= 1.0)
      val floor = results.filter { case (_, v) => v >= 0 && v < 1.0 }
      val qs = heavy.map { case (k, v) => "\"" + k + "\":" + fmt(v, 2) }
        .mkString("{", ",", "}")
      val failedPart = if (failed.isEmpty) "" else s""","failed":$failedJson"""
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":$qs,"sub1s":{"n":${floor.size},"sum":${fmt(floor.map(_._2).sum, 2)}}$failedPart,"sf":"$sfDir"}"""
    }
    val out = Seq((3, 3), (3, 2), (2, 2), (3, 1), (2, 1), (1, 1))
      .map { case (h, f) => line(h, f) }
      .find(_.length <= 1875)
      .getOrElse(lineCompact())
    // Sidecar with FULL precision and every per-pass sample (pass order
    // is newest-first: times were prepended). The stdout line is budgeted
    // against a bounded tail window; this file is where per-query values
    // are never lost and per-pass outliers stay diagnosable.
    val sidecar = names.map { n =>
      val ts = times(n).map(t => fmt(t, 3)).mkString("[", ",", "]")
      s"""  "$n": {"median": ${fmt(results.toMap.apply(n), 3)}, "passes": $ts}"""
    }.mkString("{\n", ",\n", ",\n") +
      s"""  "_total": ${fmt(total, 3)}, "_sf": "$sfDir", "_failed": $failedJson\n}\n"""
    // a SPARK_GRAFT_BENCH_ONLY subset run must not clobber the full-suite
    // record — it lands in its own sidecar
    val sidecarName =
      if (only.isEmpty) "bench_full.json" else "bench_subset.json"
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sidecarName),
      sidecar.getBytes("UTF-8"))
    catch { case NonFatal(e) => System.err.println(s"bench sidecar write failed: $e") }
    println(out)
    spark.stop()
  }
}
