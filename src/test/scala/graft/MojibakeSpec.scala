package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.fixMojibake

/** Mojibake repair ([[graft.functions.FixMojibake]]): the fail-closed
  * gates the literal-table oracle can't reach — genuine accented text,
  * non-Latin scripts, the shrink guard, the round cap.
  */
class MojibakeSpec extends SparkSpec {

  private def fix(s: String): (String, Int) = {
    val sp = spark
    import sp.implicits._
    val r = Seq(s).toDF("t").select(fixMojibake(col("t")).as("r"))
      .select("r.fixed", "r.rounds").collect().head
    (r.getString(0), r.getInt(1))
  }

  test("true mojibake repairs; clean text of every script passes through") {
    assert(fix("cafÃ©") == ("café", 1))
    // genuine Latin-1-alphabet text: the re-encoded bytes are invalid
    // UTF-8, so repair fails closed
    assert(fix("à la carte") == ("à la carte", 0))
    assert(fix("café crème") == ("café crème", 0))
    // non-Latin scripts are unmappable to cp1252: structurally immune
    assert(fix("日本語 text") == ("日本語 text", 0))
    assert(fix("🎉 party") == ("🎉 party", 0))
    assert(fix("") == ("", 0))
  }

  test("cp1252 C1-page mojibake (curly quotes, dashes, undefined 0x9d) repairs") {
    assert(fix("I\u00e2\u20ac\u2122m fine") == ("I\u2019m fine", 1))
    // the closing curly quote's final byte is cp1252-UNDEFINED 0x9d:
    // only the sloppy C1 mapping can round it back
    assert(fix("\u00e2\u20ac\u0153q\u00e2\u20ac\u009d") == ("\u201cq\u201d", 1))
    // em dash: E2 80 94, the 0x94 byte mis-decodes to a curly quote
    assert(fix("a\u00e2\u20ac\u201db") == ("a\u2014b", 1))
  }

  test("double and triple mojibake repair in rounds; the cap stops there") {
    assert(fix("caf\u00c3\u0192\u00c2\u00a9") == ("caf\u00e9", 2))
    // triple: each round strips one layer, MaxRounds=3 reaches clean
    assert(fix("caf\u00c3\u0192\u00c6\u2019\u00c3\u201a\u00c2\u00a9") == ("caf\u00e9", 3))
  }

  test("mixed genuine-plus-mojibake strings fail closed (no partial repair)") {
    // a clean 'é' beside a mojibake 'Ã©': whole-string re-encode yields
    // invalid UTF-8, so NOTHING is altered — repair is all-or-nothing
    val s = "café and cafÃ©"
    assert(fix(s) == (s, 0))
  }

  test("null flows; SQL registration works") {
    val sp = spark
    import sp.implicits._
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(fixMojibake(col("t")).as("r")).select("r.fixed").collect().head
    assert(r.isNullAt(0))
    val v = spark.sql("SELECT fix_mojibake('cafÃ©').fixed AS f")
      .collect().head.getString(0)
    assert(v == "café")
  }
}
