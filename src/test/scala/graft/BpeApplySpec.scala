package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.bpeApply
import graft.operators.TextOps

/** The native BpeApply expression (k-independent frozen-tokenizer encode):
  * byte-equality with the chained-replace semantics at production-ish k,
  * fixed-point correctness and throughput at a real tokenizer's 50k
  * merges, and edge cases.
  */
class BpeApplySpec extends SparkSpec {

  /** Driver-side replay of the former k-chained-replace projection:
    * " c1 c2 ... " then one full left-to-right literal replace per merge
    * in rank order — the semantics BpeApply must reproduce exactly. */
  private def chainEncode(w: String, merges: Seq[(String, String)]): String = {
    // split by CODE POINTS, not UTF-16 units — BpeApply.encode and the
    // former regexp_replace("(.)") chain both iterate code points, so a
    // supplementary-plane word must not make the replay diverge
    var repr = " " + w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)) + " ").mkString
    merges.foreach { case (x, y) => repr = repr.replace(s" $x $y ", s" $x$y ") }
    repr
  }

  /** A valid synthetic merge table of size k: level-1 merges pair the 26
    * base letters (676), level-2 merges pair the level-1 symbols — every
    * merge's components exist before it, the invariant real trainers
    * guarantee and the rank-priority algorithm relies on. */
  private def synthTable(k: Int): Seq[(String, String)] = {
    val base = ('a' to 'z').map(_.toString)
    val lvl1 = for (x <- base; y <- base) yield (x, y)
    val sym1 = lvl1.map { case (x, y) => x + y }
    val lvl2 = for (x <- sym1.iterator; y <- sym1.iterator) yield (x, y)
    (lvl1.iterator ++ lvl2).take(k).toSeq
  }

  test("bpe_apply matches the replace-chain semantics at k >= 2000") {
    // A 2000-merge valid table over a 6-letter alphabet: dense enough
    // that most words hit many applicable ranks, including the chain's
    // one semantic quirk (a match consumes the next symbol's leading
    // space, so runs like 'aaaa' merge with stride 3, not 2).
    val merges = synthTable(2000)
    val rnd = new scala.util.Random(42)
    val words = Seq("aaaa", "aaaaaaa", "ababab", "abcabcabc", "zzzz") ++
      (0 until 3000).map { _ =>
        (0 until (3 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      }
    val s = spark
    import s.implicits._
    val got = words.distinct.toDF("w")
      .select(col("w"), bpeApply(col("w"), merges).as("repr")).collect()
    assert(got.length > 1000, s"word set unexpectedly small: ${got.length}")
    got.foreach { r =>
      val (w, repr) = (r.getString(0), r.getString(1))
      assert(repr == chainEncode(w, merges),
        s"'$w': native '$repr' != chain '${chainEncode(w, merges)}'")
    }
  }

  test("bpe_apply matches a TRAINED table to exhaustion (trainer consistency)") {
    // The real corpus has a ~31-word vocabulary, so training exhausts at
    // well under 2000 merges — run it to exhaustion and pin equality on
    // the table the trainer actually emits (the k>=2000 equality above
    // covers scale; this covers the trained-table path end-to-end).
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val merges = TextOps.bpeMergesLocal(docs, "text", 100000)
      .orderBy("merge_rank").select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(merges.nonEmpty)
    val vocab = docs
      .select(explode(split(lower(regexp_replace(col("text"), "[^\\p{L}\\p{N}]+", " ")), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val got = vocab.select(col("w"), bpeApply(col("w"), merges).as("repr")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (w, repr) = (r.getString(0), r.getString(1))
      assert(repr == chainEncode(w, merges),
        s"'$w': native '$repr' != chain '${chainEncode(w, merges)}'")
    }
  }

  test("bpe_apply at 50k merges: k-independent, fixed point reached") {
    val k = 50000
    val table = synthTable(k)
    assert(table.size == k)
    val vocab = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(explode(split(lower(regexp_replace(col("text"), "[^\\p{L}\\p{N}]+", " ")), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val t0 = System.nanoTime()
    val rows = vocab.select(col("w"), bpeApply(col("w"), table).as("repr")).collect()
    val ms = (System.nanoTime() - t0) / 1e6
    info(f"encoded ${rows.length} vocabulary words against $k merges in $ms%.0f ms")
    rows.foreach { r =>
      val (w, repr) = (r.getString(0), r.getString(1))
      val syms = repr.split(" ").filter(_.nonEmpty)
      // invariant 1: the symbols re-concatenate to the word
      assert(syms.mkString == w, s"'$w' mangled to '$repr'")
      // invariant 2: full chain equality even at 50k merges (affordable
      // because the corpus vocabulary is tiny; a plain "no mergeable
      // adjacent pair" fixed point would be WRONG here — the chain's
      // consumed-space skip can legally leave mergeable pairs behind)
      assert(repr == chainEncode(w, table),
        s"'$w': native '$repr' != chain at 50k merges")
    }
    // k-independence sanity: the same vocabulary against 10x fewer merges
    // must not be ~10x faster (both are dominated by per-word len work)
    val t1 = System.nanoTime()
    vocab.select(bpeApply(col("w"), synthTable(5000)).as("r")).collect()
    val ms2 = (System.nanoTime() - t1) / 1e6
    info(f"same vocabulary against 5k merges: $ms2%.0f ms")
    assert(ms < ms2 * 20, f"50k-merge encode ($ms%.0f ms) is super-linear in k vs 5k ($ms2%.0f ms)")
  }

  test("bpe_apply edge cases: single char, repeats, unicode, no applicable merges") {
    val s = spark
    import s.implicits._
    val merges = Seq(("a", "a"), ("aa", "a"), ("b", "c"), ("κ", "ό"))
    val df = Seq("a", "aaa", "aaaa", "bc", "cb", "κόσμε", "zzz").toDF("w")
    val got = df.select(col("w"), bpeApply(col("w"), merges).as("r")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    got.foreach { case (w, r) =>
      assert(r == chainEncode(w, merges), s"'$w': '$r' != '${chainEncode(w, merges)}'")
    }
    // null propagates
    val n = Seq[String](null).toDF("w").select(bpeApply(col("w"), merges)).collect()
    assert(n.head.isNullAt(0))
  }

  test("bpe_apply: duplicate-rank pairs run their second replace pass (chain parity)") {
    // A trained table CAN repeat a pair: the consumed-space skip leaves
    // occurrences behind, the trainer re-counts them, and the pair can
    // win a later round — the chain then runs a SECOND full pass for
    // it. The rank lookup must keep every rank of a pair, or the
    // skipped occurrences stay unmerged forever.
    val s = spark
    import s.implicits._
    val tables = Seq(
      Seq(("a", "a"), ("a", "a")),
      Seq(("a", "a"), ("b", "b"), ("a", "a")),
      Seq(("a", "b"), ("c", "d"), ("a", "b"), ("ab", "ab")),
      Seq(("a", "a"), ("a", "a"), ("a", "a"), ("aa", "aa")))
    val words = Seq("aaaa", "aaaaa", "aaaaaaaa", "abab", "ababab",
      "abcdabcd", "bbbb", "aabb")
    tables.foreach { merges =>
      val got = words.toDF("w")
        .select(col("w"), bpeApply(col("w"), merges).as("r")).collect()
      got.foreach { r =>
        val (w, repr) = (r.getString(0), r.getString(1))
        assert(repr == chainEncode(w, merges),
          s"table=$merges '$w': native '$repr' != chain '${chainEncode(w, merges)}'")
      }
    }
  }
}
