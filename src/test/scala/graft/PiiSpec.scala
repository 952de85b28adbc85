package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{luhnValid, piiScrub}

/** The typed PII scanner ([[graft.functions.PiiScrub]]) and Luhn
  * validator: hostile inputs the formula oracle can't reach — boundary
  * adjacency, checksum failures, range violations, bare digit runs —
  * plus the SQL registration path.
  */
class PiiSpec extends SparkSpec {

  private def scrubOne(s: String): (String, Int, Int, Int, Int) = {
    val sp = spark
    import sp.implicits._
    val r = Seq(s).toDF("t")
      .select(piiScrub(col("t")).as("r"))
      .select("r.masked", "r.emails", "r.phones", "r.ips", "r.cards")
      .collect().head
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  test("pii_scrub masks validated matches of all four types") {
    val (m, e, p, i, c) = scrubOne(
      "write a@b.org or call +1-555-200-3000 from 192.168.1.9 card 4111 1111 1111 1111 ok")
    assert(m == "write <EMAIL> or call <PHONE> from <IP> card <CARD> ok")
    assert((e, p, i, c) == (1, 1, 1, 1))
  }

  test("pii_scrub leaves invalid candidates in the clear") {
    // Luhn-broken card, out-of-range octet, bare digit run, short run
    val s = "ref 4111111111111112 host 10.9.299.1 epoch 1723804800000000 id 12345"
    val (m, e, p, i, c) = scrubOne(s)
    assert(m == s)
    assert((e, p, i, c) == (0, 0, 0, 0))
  }

  test("bare digit runs are never phones; separators or + gate the match") {
    assert(scrubOne("n 5552003000 x")._1 == "n 5552003000 x") // bare 10: not phone
    assert(scrubOne("n 555-200-3000 x")._1 == "n <PHONE> x")
    assert(scrubOne("n +15552003000 x")._1 == "n <PHONE> x")
    assert(scrubOne("n (555) 200-3000 x")._1 == "n <PHONE> x")
    // 9 digits with separators: too short
    assert(scrubOne("n 555-200-300 x")._1 == "n 555-200-300 x")
    // 16 digits with separators, Luhn-broken: neither card (checksum)
    // nor phone (>15 digits)
    assert(scrubOne("n 4111-1111-1111-1112 x")._1 == "n 4111-1111-1111-1112 x")
    // spaced US phone and amex 4-6-5 grouping bridge; date+time does not
    assert(scrubOne("n 555 200 3000 x")._1 == "n <PHONE> x")
    assert(scrubOne("amex 3782 822463 10005 x")._1 == "amex <CARD> x")
    assert(scrubOne("at 2026-08-16 12:34:56 utc")._1 == "at 2026-08-16 12:34:56 utc")
  }

  test("word-boundary adjacency voids a match; emails need a real TLD") {
    assert(scrubOne("x4111111111111111 y")._1 == "x4111111111111111 y")
    assert(scrubOne("4111111111111111z")._1 == "4111111111111111z")
    assert(scrubOne("a@localhost b")._1 == "a@localhost b")     // one label
    assert(scrubOne("a@b.c d")._1 == "a@b.c d")                 // TLD len 1
    assert(scrubOne("a@b.co2 d")._1 == "a@b.co2 d")             // TLD not alpha
    assert(scrubOne("see a@b.com.")._1 == "see <EMAIL>.")       // trailing dot stays
    assert(scrubOne("über 4111111111111111")._1 == "über <CARD>") // utf-8 prefix ok
  }

  test("dates, versions and ip-lookalikes stay clear") {
    for (s <- Seq("2026-08-16 12:34:56", "v1.2.3.4 build", "1.2.3.4.5 x",
                  "555.123.4567 dot-phone", "10.0.0.255 edge")) {
      val (m, _, _, ips, _) = scrubOne(s)
      if (s.startsWith("555")) assert(m == "<PHONE> dot-phone") // 10 digits + seps
      else if (s.startsWith("10.0")) { assert(m == "<IP> edge"); assert(ips == 1) }
      else assert(m == s, s"'$s' must stay clear, got '$m'")
    }
  }

  test("luhn_valid: checksum, separators, null contract") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      ("4111111111111111", Some(true)),   // classic test PAN
      ("4111 1111 1111 1111", Some(true)),
      ("4111-1111-1111-1112", Some(false)),
      ("79927398713", Some(true)),        // the textbook Luhn example
      ("79927398710", Some(false)),
      ("4111a11111111111", None),         // non-digit -> null
      ("9", None),                        // too short
      ("1".repeat(33), None)              // too long
    ).toDF("s", "want")
      .select(luhnValid(col("s")).as("got"), col("want")).collect()
    rows.foreach { r =>
      val want = if (r.isNullAt(1)) null else r.getBoolean(1)
      val got = if (r.isNullAt(0)) null else r.getBoolean(0)
      assert(got == want, s"luhn mismatch: got $got want $want")
    }
  }

  test("pii_scrub and luhn_valid are SQL-registered via GraftExtensions") {
    val r = spark.sql(
      "SELECT pii_scrub('mail a@b.com x').masked AS m, luhn_valid('79927398713') AS v")
      .collect().head
    assert(r.getString(0) == "mail <EMAIL> x" && r.getBoolean(1))
  }

  test("pii_scrub null/empty contract and count aggregation") {
    val sp = spark
    import sp.implicits._
    val df = Seq[(Integer, String)]((1, null), (2, ""), (3, "a@b.com c@d.net"))
      .toDF("id", "t")
      .select(col("id"), piiScrub(col("t")).as("r"))
    val rows = df.select(col("id"), col("r.masked"), col("r.emails"))
      .orderBy("id").collect()
    assert(rows(0) == Row(1, null, null))
    assert(rows(1) == Row(2, "", 0))
    assert(rows(2) == Row(3, "<EMAIL> <EMAIL>", 2))
  }
}
