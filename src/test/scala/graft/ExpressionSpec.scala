package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.md5PrefixLong

/** The native Md5PrefixLong expression: bit-parity with the built-in
  * hex chain, SQL registration via GraftExtensions, null handling.
  */
class ExpressionSpec extends SparkSpec {

  test("md5_prefix_long matches the built-in conv(substr(md5)) chain") {
    val s = spark
    import s.implicits._
    val df = Seq("", "a", "hello world", "κόσμε unicode", "x" * 1000).toDF("s")
    for (piece <- 0 to 3; seed <- Seq("", "0|", "7|")) {
      val rows = df.select(
        md5PrefixLong(col("s"), 4 * piece, seed).as("native"),
        conv(substring(md5(concat(lit(seed), col("s"))), 1 + 8 * piece, 8), 16, 10)
          .cast("long").as("builtin")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"mismatch at piece=$piece seed=$seed"))
    }
  }

  test("md5_prefix_long is registered for SQL text via GraftExtensions") {
    val got = spark.sql("SELECT md5_prefix_long('abc', 0, '') AS v").collect().head.getLong(0)
    val want = spark.sql("SELECT CAST(conv(substring(md5('abc'), 1, 8), 16, 10) AS BIGINT) AS v")
      .collect().head.getLong(0)
    assert(got == want)
  }

  test("word_ngrams matches the split/slice/array_join chain on real docs") {
    import graft.functions.GraftFunctions.wordNgrams
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val toks = split(trim(col("text")), "\\s+")
    val chain = when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => array_join(slice(toks, i, lit(3)), " "))))
      .otherwise(array().cast("array<string>"))
    val bad = docs.select(wordNgrams(col("text"), 3).as("native"), chain.as("builtin"))
      .filter(not(col("native") === col("builtin"))).count()
    assert(bad == 0)
  }

  test("word_ngrams edge cases: multi-space, tabs, short and empty input") {
    val s = spark
    import s.implicits._
    import graft.functions.GraftFunctions.wordNgrams
    val df = Seq("a  b\tc d", "a b", "", "   ", "x y z").toDF("t")
    val rows = df.select(wordNgrams(col("t"), 3)).collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq())
    assert(rows(2) == Seq())
    assert(rows(3) == Seq())
    assert(rows(4) == Seq("x y z"))
  }

  test("array_dot matches the zip_with/aggregate fold bitwise on embeddings") {
    import graft.functions.GraftFunctions.arrayDot
    val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val a = e.select(col("vec_id"), col("embedding").as("x"))
    val b = e.select(col("vec_id"), col("embedding").as("y"))
    val both = a.join(b, "vec_id")
    val chain = aggregate(zip_with(col("x"), col("y"),
      (p, q) => p.cast("double") * q.cast("double")), lit(0.0), (acc, v) => acc + v)
    val bad = both.select(arrayDot(col("x"), col("y")).as("native"), chain.as("builtin"))
      .filter(col("native") =!= col("builtin")).count() // bitwise: no tolerance
    assert(bad == 0)
  }

  test("array_dot: doubles, length mismatch -> null, null propagation") {
    val s = spark
    import s.implicits._
    import graft.functions.GraftFunctions.arrayDot
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(1.0), Array(1.0, 2.0))).toDF("a", "b")
    val rows = df.select(arrayDot(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).isNullAt(0))
    val viaSql = spark.sql("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) v")
      .collect().head.getDouble(0)
    assert(viaSql == 11.0)
    // non-nullable (literal) children + length mismatch: the expression
    // must still be allowed to return null (nullable override)
    val mismatch = spark.sql("SELECT array_dot(array(1.0D), array(1.0D, 2.0D)) v").collect().head
    assert(mismatch.isNullAt(0))
  }

  test("sorted_intersect matches array_intersect on sorted distinct arrays") {
    import graft.functions.GraftFunctions.sortedIntersect
    val s = spark
    import s.implicits._
    // deterministic pseudo-random sorted distinct arrays, incl. empty,
    // disjoint, identical, and containment shapes
    val rnd = new scala.util.Random(42)
    def arr(n: Int, stride: Int, off: Int): Seq[Long] =
      (0 until n).scanLeft(off.toLong)((a, _) => a + 1 + rnd.nextInt(stride)).tail
    val cases = Seq(
      (arr(50, 3, 0), arr(40, 4, 5)),
      (arr(0, 1, 0), arr(10, 2, 0)),
      (arr(10, 2, 0), arr(0, 1, 0)),
      (arr(30, 1, 0), arr(30, 1, 0)),          // identical
      (arr(30, 2, 0), arr(30, 2, 1000)),       // disjoint ranges
      (arr(100, 5, 0), arr(7, 60, 0)),         // big vs small
      (Seq(1L, 2L, 3L), Seq(2L)),              // containment
      (arr(500, 2, 0), arr(500, 2, 3)))
    val df = cases.toDF("a", "b")
    val bad = df.select(
        sortedIntersect(col("a"), col("b")).as("native"),
        array_intersect(col("a"), col("b")).as("builtin"))
      .filter(not(col("native") === col("builtin"))).count()
    assert(bad == 0)
    // null propagation + SQL registration
    assert(df.limit(1).select(sortedIntersect(lit(null).cast("array<bigint>"),
      col("b"))).head().isNullAt(0))
    val viaSql = spark.sql(
      "SELECT sorted_intersect(array(1L,3L,5L), array(3L,4L,5L)) AS v")
      .head().getSeq[Long](0)
    assert(viaSql == Seq(3L, 5L))
  }

  test("md5_prefix_long propagates nulls") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("a"), None).toDF("s")
    val rows = df.select(md5PrefixLong(col("s"), 0, "")).collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("SQL registration rejects bad arity / non-literal / wrong-type args") {
    import org.apache.spark.sql.AnalysisException
    // wrong arity -> WRONG_NUM_ARGS, not IndexOutOfBounds
    val arity = intercept[AnalysisException] {
      spark.sql("SELECT winnow_fingerprints('abc', 4)").collect()
    }
    assert(arity.getCondition != null && arity.getCondition.startsWith("WRONG_NUM_ARGS"))
    // non-literal k -> NON_FOLDABLE_ARGUMENT, not ClassCastException
    val nonLit = intercept[AnalysisException] {
      spark.sql("SELECT winnow_fingerprints(s, length(s), 4) FROM (SELECT 'ab' s)").collect()
    }
    assert(nonLit.getCondition == "NON_FOLDABLE_ARGUMENT")
    // string literal where an int is required
    val wrongType = intercept[AnalysisException] {
      spark.sql("SELECT winnow_fingerprints('abc', 'k', 4)").collect()
    }
    assert(wrongType.getCondition == "NON_FOLDABLE_ARGUMENT")
    // word_ngrams / md5_prefix_long share the same validation path
    val wn = intercept[AnalysisException] { spark.sql("SELECT word_ngrams('a b')").collect() }
    assert(wn.getCondition.startsWith("WRONG_NUM_ARGS"))
    val seed = intercept[AnalysisException] {
      spark.sql("SELECT md5_prefix_long('a', 0, 7)").collect()
    }
    assert(seed.getCondition == "NON_FOLDABLE_ARGUMENT")
    // valid literal args still work through SQL after the checks
    assert(spark.sql("SELECT winnow_fingerprints('abcdefgh', 4, 3) v")
      .collect().head.getAs[scala.collection.Seq[Long]](0).nonEmpty)
  }

  test("tiff_bmp_dims reads ImageIO-written TIFF and BMP, rejects hostile input") {
    import graft.functions.TiffBmpDims
    // reference-writer cross-validation: the JDK's own TIFF and BMP
    // encoders produce the files, our walker reads the dims back
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    for ((w, h) <- Seq((13, 7), (640, 480), (1, 1))) {
      val t = TiffBmpDims.compute(encode("tiff", w, h))
      assert(t != null && t.getUTF8String(0).toString == "tiff" &&
        t.getLong(2) == w && t.getLong(3) == h, s"tiff ${w}x$h: $t")
      val b = TiffBmpDims.compute(encode("bmp", w, h))
      assert(b != null && b.getUTF8String(0).toString == "bmp" &&
        b.getLong(2) == w && b.getLong(3) == h && b.getLong(4) == 0L,
        s"bmp ${w}x$h: $b")
    }
    // top-down BMP: hand-flip the height field to its negative
    val bmp = encode("bmp", 16, 8)
    def putI32(b: Array[Byte], p: Int, v: Int): Unit = {
      b(p) = v.toByte; b(p + 1) = (v >> 8).toByte
      b(p + 2) = (v >> 16).toByte; b(p + 3) = (v >> 24).toByte
    }
    putI32(bmp, 22, -8)
    val td = TiffBmpDims.compute(bmp)
    assert(td != null && td.getLong(3) == 8L && td.getLong(4) == 1L)
    // hostile inputs: junk, truncation, oversized IFD, core-header BMP
    assert(TiffBmpDims.compute("plain text".getBytes) == null)
    assert(TiffBmpDims.compute(Array[Byte]('I', 'I', 42, 0)) == null)
    val tiff = encode("tiff", 9, 9)
    assert(TiffBmpDims.compute(tiff.take(12)) == null, "truncated IFD")
    val badBmp = encode("bmp", 4, 4); putI32(badBmp, 14, 12) // BITMAPCOREHEADER
    assert(TiffBmpDims.compute(badBmp) == null, "core-family DIB rejected")
    // seeded fuzz: magic-prefixed noise never throws
    val rnd = new scala.util.Random(135792468L)
    for (magic <- Seq(Array[Byte]('I', 'I', 42, 0), Array[Byte]('M', 'M', 0, 42),
        Array[Byte]('B', 'M')); _ <- 1 to 40) {
      val tail = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(tail)
      TiffBmpDims.compute(magic ++ tail)
    }
    // SQL registration + codegen path
    val r = spark.sql("SELECT tiff_bmp_dims(CAST(NULL AS BINARY)) n").collect().head
    assert(r.isNullAt(0))
  }

  test("jaro_winkler matches the published hand values and DuckDB's edge semantics") {
    // classic Winkler pairs (published values) + the edges that pin the
    // DuckDB-parity contract: strict > 0.7 boost threshold (crate/trace
    // is 0.7333 with prefix 0 — unboosted; abcdef/abx is 2/3 with
    // prefix 2 — below threshold, unboosted), window 0 for 2-char
    // swaps, and 0.0 for empty inputs (including BOTH empty)
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("duane", "dwayne", 0.8400000000000001),
      ("crate", "trace", 0.7333333333333334),
      ("abcdef", "abx", 0.6666666666666666),
      ("ab", "ba", 0.0),
      ("", "x", 0.0),
      ("", "", 0.0),
      ("a", "a", 1.0),
      ("kai stone ames", "kai stone amse", 0.9857142857142858),
      // ODD out-of-order count (11) under greedy matching: t must be
      // the integer floor 5, not 5.5 — fractional halving gives
      // 0.892341 and diverges from DuckDB (found by the sf0.01 sweep)
      ("ninb akira durant", "nina akira durant", 0.8996323529411765))
    cases.foreach { case (a, b, want) =>
      val got = graft.functions.JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(math.abs(got - want) < 1e-12, s"jw($a, $b) = $got, want $want")
      // symmetric by definition
      val rev = graft.functions.JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(math.abs(got - rev) < 1e-15, s"jw not symmetric on ($a, $b)")
    }
    // SQL registration + null propagation + codegen path (runs through
    // a projection, not direct compute)
    val row = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') v, jaro_winkler(CAST(NULL AS STRING), 'x') n").collect().head
    assert(math.abs(row.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(row.isNullAt(1))
    val arity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT jaro_winkler('a')").collect()
    }
    assert(arity.getCondition.startsWith("WRONG_NUM_ARGS"))
  }

  test("detect_encoding: rule ladder on hostile byte shapes") {
    import graft.functions.DetectEncoding.{compute => enc}
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    assert(enc(Array.empty[Byte]).toString == "empty")
    assert(enc("plain".getBytes("UTF-8")).toString == "ascii")
    assert(enc("café—".getBytes("UTF-8")).toString == "utf-8")
    assert(enc("café".getBytes("ISO-8859-1")).toString == "latin-1")
    // BOMs win over content
    assert(enc(b(0xff, 0xfe) ++ "hi".getBytes("UTF-16LE")).toString == "utf-16le")
    assert(enc(b(0xfe, 0xff) ++ "hi".getBytes("UTF-16BE")).toString == "utf-16be")
    assert(enc(b(0xef, 0xbb, 0xbf) ++ "x".getBytes).toString == "utf-8")
    // BOM-less utf-16: the alternating-NUL heuristic
    assert(enc("hello world".getBytes("UTF-16LE")).toString == "utf-16le")
    assert(enc("hello world".getBytes("UTF-16BE")).toString == "utf-16be")
    // NULs at both parities, or sparse NULs, are payload
    assert(enc(b(0, 0, 0xff, 65, 66)).toString == "binary")
    assert(enc(("a" * 40).getBytes :+ 0.toByte).toString == "binary")
    // overlong / truncated / surrogate utf-8 all fall to latin-1
    assert(enc(b(0xc0, 0x80)).toString == "latin-1")       // overlong NUL
    assert(enc(b(0xe9, 0x20)).toString == "latin-1")       // bare latin-1 é
    assert(enc(b(0xed, 0xa0, 0x80)).toString == "latin-1") // surrogate
    assert(enc(b(0xf0, 0x9f)).toString == "latin-1")       // truncated 4-byte
    // SQL registration
    val r = spark.sql("SELECT detect_encoding(CAST('ok' AS BINARY)) AS e")
      .collect().head
    assert(r.getString(0) == "ascii")
  }
}
