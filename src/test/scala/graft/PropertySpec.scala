package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.{Etl, Relational}

/** Seeded randomized properties: operators vs plain-Scala reference
  * implementations on generated data (fixed seeds — reproducible).
  */
class PropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  test("dedupMerge == brute-force first-wins + set-union on random data") {
    val s = spark
    import s.implicits._
    // duplicate (key, order) pairs on purpose
    val rows = (1 to 800).map { _ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(5).toLong,
        rnd.nextInt(9).toLong, rnd.nextInt(100) / 4.0, rnd.nextInt(20).toLong)
    }
    val df = rows.toDF("k", "ord", "s1", "s2", "set")
    val got = Etl.dedupMerge(df, "k", "ord", Seq("s1", "s2"), "set")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getString(3)))).toMap

    val want = rows.groupBy(_._1).map { case (k, g) =>
      // lexicographic min of (ord, s1, s2, set) — the operator's contract
      val first = g.map(t => (t._2, t._3, t._4, t._5)).min
      val set = g.map(_._5).distinct.sorted.mkString(",")
      k -> ((first._2, first._3, set))
    }
    assert(got == want)
  }

  test("topKPerGroup == naive single-window top-k for random data and salts") {
    val s = spark
    import s.implicits._
    val rows = (1 to 500).map(i => (rnd.nextInt(4).toString, i.toLong, rnd.nextInt(40) / 2.0))
    val df = rows.toDF("g", "id", "v")
    for (salts <- Seq(1, 3, 16)) {
      val got = Relational.topKPerGroup(df, "g", "v", "id", k = 5, salts = salts)
        .select("g", "id", "rn").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case (t, i) => (g, t._2, (i + 1).toLong) }
      }.toSet
      assert(got == want, s"salts=$salts")
    }
  }

  test("WordNgrams.compute == reference split-based n-grams on random text") {
    val alphabet = "ab \t\n  c∂é "
    for (_ <- 1 to 300) {
      val text = (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val n = 1 + rnd.nextInt(4)
      val got = {
        val arr = graft.functions.WordNgrams.compute(UTF8String.fromString(text), n)
        (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      }
      // tokens-are-nonempty-runs contract: the split chain emits an empty
      // first token for leading non-space whitespace (trim strips only
      // chars <= 0x20 in Java but the SQL trim strips only spaces);
      // WordNgrams and the DuckDB oracle (list_filter t != '') both drop it
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val want = if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      assert(got == want, s"text=${text.replace("\n", "\\n")} n=$n")
    }
  }

  test("Md5Hash.prefixLong == MessageDigest reference") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (_ <- 1 to 200) {
      val s = rnd.nextString(rnd.nextInt(40))
      val seed = Seq("", "0|", "15|")(rnd.nextInt(3))
      val off = rnd.nextInt(4) * 4
      md.reset()
      val d = md.digest((seed + s).getBytes("UTF-8"))
      val want = ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
        ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
      assert(graft.functions.Md5Hash.prefixLong(UTF8String.fromString(s), off, seed) == want)
    }
  }

  test("Stable.avgRounded applies half-up at exact decimal halves") {
    val s = spark
    import s.implicits._
    // sum = 94.5075, n = 2 -> avg exactly 47.25375 -> half-up 47.2538
    val df = Seq(("a", 47.25), ("a", 47.2575)).toDF("k", "v")
    val got = df.groupBy("k")
      .agg(graft.operators.Stable.avgRounded(col("v"), count(lit(1)), 4).as("avg"))
      .collect().head.getDouble(1)
    assert(got == 47.2538)
    // negative mirror: away from zero
    val dfn = Seq(("a", -47.25), ("a", -47.2575)).toDF("k", "v")
    val gotN = dfn.groupBy("k")
      .agg(graft.operators.Stable.avgRounded(col("v"), count(lit(1)), 4).as("avg"))
      .collect().head.getDouble(1)
    assert(gotN == -47.2538)
  }
}
