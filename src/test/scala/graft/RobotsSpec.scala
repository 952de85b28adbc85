package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{robotsAllowed, robotsRules}

/** robots.txt parse + match ([[graft.functions.RobotsRules]] /
  * [[graft.functions.RobotsAllowed]]): the RFC 9309 semantics the
  * formula oracle can't reach — group selection, wildcard/anchor
  * matching, longest-match ties, and the null/empty contracts.
  */
class RobotsSpec extends SparkSpec {

  private def rules(txt: String, agent: String): Seq[(Boolean, String)] = {
    val sp = spark
    import sp.implicits._
    Seq(txt).toDF("t")
      .select(explode(robotsRules(col("t"), lit(agent))).as("r"))
      .select("r.allow", "r.pattern")
      .collect().toSeq.map(r => (r.getBoolean(0), r.getString(1)))
  }

  private def allowed(txt: String, agent: String, path: String): Boolean = {
    val sp = spark
    import sp.implicits._
    Seq(txt).toDF("t")
      .select(robotsAllowed(robotsRules(col("t"), lit(agent)), lit(path)).as("a"))
      .collect().head.getBoolean(0)
  }

  private val basic =
    """User-agent: *
      |Disallow: /search
      |Allow: /search/about
      |Disallow: /private/
      |""".stripMargin

  test("parse: rules in file order, comments and blank lines tolerated") {
    val noisy = "# hello\r\n\r\nUser-agent: *  # trailing comment\r\n" +
      "Disallow: /a\r\nunknown: x\r\nAllow: /a/b\r\n"
    assert(rules(noisy, "anybot") == Seq((false, "/a"), (true, "/a/b")))
  }

  test("group selection: exact agent group replaces *, never merges") {
    val txt =
      """User-agent: *
        |Disallow: /all/
        |User-agent: graftbot
        |Disallow: /gb/
        |""".stripMargin
    assert(rules(txt, "graftbot") == Seq((false, "/gb/")))
    assert(rules(txt, "otherbot") == Seq((false, "/all/")))
    // case-insensitive product token and key
    assert(rules(txt.replace("graftbot", "GraftBot").replace("User-agent", "USER-AGENT"),
      "graftbot") == Seq((false, "/gb/")))
  }

  test("consecutive user-agent lines share one rule set; later UA line starts a new group") {
    val txt =
      """User-agent: a
        |User-agent: b
        |Disallow: /ab/
        |User-agent: c
        |Disallow: /c/
        |""".stripMargin
    assert(rules(txt, "a") == Seq((false, "/ab/")))
    assert(rules(txt, "b") == Seq((false, "/ab/")))
    assert(rules(txt, "c") == Seq((false, "/c/")))
  }

  test("two groups naming the same agent contribute all their rules") {
    val txt =
      """User-agent: graftbot
        |Disallow: /one/
        |User-agent: other
        |Disallow: /x/
        |User-agent: graftbot
        |Disallow: /two/
        |""".stripMargin
    assert(rules(txt, "graftbot") == Seq((false, "/one/"), (false, "/two/")))
  }

  test("empty Disallow means allow-everything (no rule); orphan rules are dropped") {
    assert(rules("User-agent: *\nDisallow:\n", "x").isEmpty)
    assert(rules("Disallow: /orphan/\nUser-agent: *\nDisallow: /a/\n", "x") ==
      Seq((false, "/a/")))
  }

  test("match: prefix semantics, longest rule wins, tie resolves to allow") {
    assert(!allowed(basic, "bot", "/search"))
    assert(!allowed(basic, "bot", "/search?q=x"))
    assert(allowed(basic, "bot", "/search/about"))
    // RFC 9309 matches byte prefixes, not path segments: /search blocks /searching
    assert(!allowed(basic, "bot", "/searching"))
    assert(allowed(basic, "bot", "/other"))
    // tie at equal length -> allow
    val tie = "User-agent: *\nDisallow: /p/\nAllow: /p/\n"
    assert(allowed(tie, "bot", "/p/x"))
  }

  test("wildcard * spans any run; trailing $ anchors; mid-pattern $ is literal") {
    val txt =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /tmp*/
        |Disallow: /lit$eral
        |""".stripMargin
    assert(!allowed(txt, "bot", "/docs/a.pdf"))
    assert(allowed(txt, "bot", "/docs/a.pdf?x=1")) // anchored: query breaks it
    assert(!allowed(txt, "bot", "/tmp123/file"))
    assert(allowed(txt, "bot", "/tmp123"))         // '/' after * not matched
    assert(!allowed(txt, "bot", "/lit$eral/x"))    // literal mid-$
    assert(allowed(txt, "bot", "/literal/x"))
  }

  test("no matching group or no matching rule crawls by default; null robots is null") {
    val sp = spark
    import sp.implicits._
    assert(allowed("User-agent: special\nDisallow: /\n", "bot", "/anything"))
    assert(allowed(basic, "bot", "/"))
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(robotsAllowed(robotsRules(col("t"), lit("bot")), lit("/x")).as("a"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("overlong patterns are dropped, not truncated") {
    val long = "/" + "a" * 3000
    assert(rules(s"User-agent: *\nDisallow: $long\n", "bot").isEmpty)
  }

  test("sitemap records are group-independent, case-tolerant, kept in order") {
    val sp = spark
    import sp.implicits._
    val txt =
      """Sitemap: https://a.example/s1.xml
        |User-agent: special
        |Disallow: /
        |SITEMAP: https://a.example/s2.xml  # trailing comment
        |User-agent: *
        |sitemap: https://a.example/s3.xml
        |Sitemap:
        |""".stripMargin
    val got = Seq(txt).toDF("t")
      .select(graft.functions.GraftFunctions.robotsSitemaps(col("t")).as("m"))
      .collect().head.getSeq[String](0)
    // all three survive regardless of which group surrounds them; the
    // empty value is dropped; file order preserved
    assert(got == Seq("https://a.example/s1.xml", "https://a.example/s2.xml",
      "https://a.example/s3.xml"))
    // and their presence does not perturb rule parsing
    assert(rules(txt, "anybot") == Seq.empty ||
      rules(txt, "anybot").forall(_._2 != "/"), "the special group leaked into *")
  }

  test("empty exact-agent group replaces *, does not fall back to it") {
    // RFC 9309: a PRESENT group for the agent governs even when its
    // rule list is empty (the `Disallow:` allow-everything idiom) —
    // falling back to `*` here would block the whole site
    val txt =
      """User-agent: graftbot
        |Disallow:
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(rules(txt, "graftbot").isEmpty)
    assert(allowed(txt, "graftbot", "/anything"))
    assert(!allowed(txt, "otherbot", "/anything"))
    // even a RULE-LESS group (UA line sealed by EOF) replaces *
    val eof = "User-agent: *\nDisallow: /\nUser-agent: graftbot\n"
    assert(rules(eof, "graftbot").isEmpty)
    assert(allowed(eof, "graftbot", "/x"))
  }

  test("non-rule records do not seal a user-agent run (RFC 9309 §2.2.4)") {
    // Sitemap / unknown keys between UA lines must leave the run open:
    // a and b share one group and both get the disallow
    val txt =
      """User-agent: a
        |Sitemap: https://x.example/s.xml
        |User-agent: b
        |Crawl-delay: 5
        |User-agent: c
        |Disallow: /x/
        |""".stripMargin
    for (agent <- Seq("a", "b", "c"))
      assert(rules(txt, agent) == Seq((false, "/x/")), s"agent $agent")
    // but a rule line DOES seal: d is a new group
    val sealed2 = txt + "User-agent: d\nDisallow: /d/\n"
    assert(rules(sealed2, "a") == Seq((false, "/x/")))
    assert(rules(sealed2, "d") == Seq((false, "/d/")))
  }

  test("empty unanchored pattern matches every path; anchored $ only the empty path") {
    // unreachable via robots_rules (empty values dropped) but
    // robots_allowed is SQL-registered and takes arbitrary rule arrays
    val sp = spark
    def gate(pattern: String, path: String): Boolean = sp.sql(
      s"SELECT robots_allowed(array(named_struct('allow', false, 'pattern', '$pattern')), '$path') AS v")
      .collect().head.getBoolean(0)
    assert(!gate("", "/any/path")) // empty prefix matches -> disallowed
    assert(!gate("", ""))
    assert(gate("$", "/any/path")) // anchored empty: full-path match only
    assert(!gate("$", ""))
  }

  test("robots functions are SQL-registered via GraftExtensions") {
    val r = spark.sql(
      "SELECT robots_allowed(robots_rules('User-agent: *\nDisallow: /a/', '*'), '/a/x') AS v")
      .collect().head
    assert(!r.getBoolean(0))
  }
}
