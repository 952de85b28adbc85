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

  test("mergeUpsert == brute-force keep-latest with tombstones on random data") {
    val s = spark
    import s.implicits._
    // deliberately includes (key, version) ties (both deleted and not)
    def gen(n: Int, del: Boolean) = (1 to n).map { _ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(8).toString, rnd.nextInt(4).toLong,
        if (del) rnd.nextInt(3) == 0 else false)
    }
    val base = gen(200, del = false)
    val changes = gen(300, del = true)
    val got = graft.operators.Etl.mergeUpsert(
      base.toDF("k", "v", "version", "deleted"),
      changes.toDF("k", "v", "version", "deleted"),
      "k", "version", "deleted")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

    val want = (base ++ changes).groupBy(_._1).flatMap { case (k, g) =>
      // winner: max version; ties -> tombstone first, then min remaining
      // cols — mirrors (version DESC, deleted DESC, rest ASC) rank 1
      val win = g.minBy(t => (-t._3, if (t._4) 0 else 1, t._2))
      if (win._4) None else Some(k -> ((win._2, win._3)))
    }
    assert(got == want)
  }

  test("asofJoin == brute-force latest-at-or-before on random data") {
    val s = spark
    import s.implicits._
    def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val left = (1 to 300).map(i => (rnd.nextInt(10).toLong, t(rnd.nextInt(100)), i.toLong))
    val right = (1 to 120).map(i => (rnd.nextInt(12).toLong, t(rnd.nextInt(100)), 1000L + i))
    // right deduped per (key, ts) keep max payload — the documented
    // deterministic contract under ties
    val got = graft.operators.Events.asofJoin(
      left.toDF("k", "ts", "lid"), right.toDF("k", "ts", "pay"),
      key = "k", leftTs = "ts", rightTs = "ts", payload = Seq("pay"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val byKey = right.groupBy(_._1)
    val want = left.map { case (k, ts, lid) =>
      val cands = byKey.getOrElse(k, Nil).filter(!_._2.after(ts))
      lid -> (if (cands.isEmpty) None
              else Some(cands.map(c => (c._2.getTime, c._3)).max._2))
    }.toMap
    assert(got == want)
  }

  test("rangeJoin == brute-force interval containment on random data") {
    val s = spark
    import s.implicits._
    def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val points = (1 to 400).map(i => (i.toLong, t(rnd.nextInt(2000))))
    val ivs = (1 to 40).map { i =>
      val a = rnd.nextInt(2000); (100L + i, t(a), t(a + rnd.nextInt(300)))
    }
    val got = graft.operators.Events.rangeJoin(
      points.toDF("pid", "ts"), "ts",
      ivs.toDF("wid", "s0", "s1"), "s0", "s1", binSeconds = 3600)
      .select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (pid, ts) <- points
      (wid, s0, s1) <- ivs
      if !ts.before(s0) && !ts.after(s1)
    } yield (pid, wid)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("funnel == brute-force stage fold on random event streams") {
    val s = spark
    import s.implicits._
    val types = Seq("view", "click", "purchase", "other")
    val rows = (1 to 600).map { i =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(types.length)),
        new java.sql.Timestamp(rnd.nextInt(50) * 1000L))
    }
    val got = graft.operators.Events.funnel(
      rows.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .select("user_id", "funnel_stage")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: first view; first click strictly after it; first purchase
    // strictly after that
    val want = rows.groupBy(_._1).flatMap { case (u, evs) =>
      def first(tpe: String, after: Long): Option[Long] = {
        val ts = evs.filter(e => e._2 == tpe && e._3.getTime > after).map(_._3.getTime)
        if (ts.isEmpty) None else Some(ts.min)
      }
      first("view", Long.MinValue).map { t1 =>
        val t2 = first("click", t1)
        val t3 = t2.flatMap(first("purchase", _))
        u -> (1L + t2.size + t3.size)
      }
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

  test("WinnowFingerprints.compute == brute-force window minima on random text") {
    val alphabet = "abc de∂é\n"
    for (_ <- 1 to 300) {
      val text = (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val k = 1 + rnd.nextInt(6)
      val w = 1 + rnd.nextInt(5)
      val got = {
        val arr = graft.functions.WinnowFingerprints.compute(UTF8String.fromString(text), k, w)
        (0 until arr.numElements()).map(arr.getLong)
      }
      // reference: hash every k-char substring via the already-verified
      // prefixLong, brute-force min of each w-window, distinct + sorted
      val chars = text.toCharArray // ASCII + BMP chars only in alphabet
      val grams = if (chars.length < k) Seq.empty
        else (0 to chars.length - k).map(i => new String(chars, i, k))
      val hashes = grams.map(g => graft.functions.Md5Hash.prefixLong(UTF8String.fromString(g), 0, ""))
      val want = if (hashes.length < w) Seq.empty
        else hashes.sliding(w).map(_.min).toSeq.distinct.sorted
      assert(got == want, s"text=${text.replace("\n", "\\n")} k=$k w=$w")
    }
  }

  test("GifRaster == JDK ImageIO decoder, luma for luma, on ImageIO-written GIFs") {
    // the native walk replaced ImageIO in the hot path; the JDK reader
    // stays as the REFERENCE implementation here. Random gray AND
    // random-RGB-palette images, odd dims, single- and multi-frame.
    val seeded = new scala.util.Random(975318642L)
    def viaImageIO(blob: Array[Byte]): Seq[(Int, Int, Array[Int])] = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      try {
        reader.setInput(iis, false, true)
        (0 until reader.getNumImages(true)).map { i =>
          val img = reader.read(i)
          val (w, h) = (img.getWidth, img.getHeight)
          val gray = new Array[Int](w * h)
          for (y <- 0 until h; x <- 0 until w) {
            val p = img.getRGB(x, y)
            gray(y * w + x) =
              (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) + 29 * (p & 0xff)) >> 8
          }
          (w, h, gray)
        }
      } finally { reader.dispose(); iis.close() }
    }
    for (trial <- 1 to 32) {
      // trials 31/32: large random-gray frames — thousands of distinct
      // pixel runs fill the LZW dictionary, exercising code-size growth
      // to 12 bits and the encoder's clear-on-full behavior
      val big = trial > 30
      val w = if (big) 120 + seeded.nextInt(40) else 9 + seeded.nextInt(60)
      val h = if (big) 100 + seeded.nextInt(40) else 8 + seeded.nextInt(60)
      val frames = 1 + seeded.nextInt(3)
      val gray = big || seeded.nextBoolean()
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (_ <- 1 to frames) {
        val img = new java.awt.image.BufferedImage(w, h,
          if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          else java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w)
          // few distinct colors (or 256 exact grays) so the GIF palette
          // quantizer is lossless
          if (gray) {
            val v = if (big) seeded.nextInt(256) else seeded.nextInt(6) * 40
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
          } else img.setRGB(x, y, Seq(0x000000, 0x3366cc, 0xff9900,
            0xffffff, 0x808080, 0x22aa55)(seeded.nextInt(6)))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); ios.flush(); writer.dispose(); ios.close()
      val blob = bos.toByteArray
      val want = viaImageIO(blob)
      val got = graft.functions.GifRaster.frames(blob, 64, 16L << 20)
      assert(got != null && got.length == want.length,
        s"trial $trial: frame count ${if (got == null) "null" else got.length} vs ${want.length}")
      for ((f, (ww, wh, wg)) <- got.zip(want)) {
        assert(f.w == ww && f.h == wh, s"trial $trial dims")
        assert(f.luma.sameElements(wg), s"trial $trial: luma mismatch (${w}x$h, gray=$gray)")
      }
    }
  }

  test("GifRaster decodes INTERLACED GIFs identically to ImageIO (hand-built fixture)") {
    // ImageIO's writer never emits the interlace flag, so the parity
    // sweep above cannot reach GifRaster's 4-pass reorder. Build an
    // interlaced GIF by hand with the degenerate-LZW encoding (a CLEAR
    // code before every literal keeps the dictionary empty and the code
    // size fixed — spec-legal and trivially correct), then require the
    // JDK reader and GifRaster to agree on the de-interlaced raster.
    val seeded = new scala.util.Random(246801357L)
    def buildInterlaced(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      bos.write("GIF89a".getBytes("US-ASCII"))
      u16(w); u16(h)
      bos.write(0xf7) // GCT present, 256 entries, 8-bit color res
      bos.write(0); bos.write(0)
      for (i <- 0 until 256) { bos.write(i); bos.write(i); bos.write(i) } // gray GCT
      bos.write(0x2c) // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      bos.write(0x40) // INTERLACED, no LCT
      bos.write(8)    // LZW min code size
      // interlaced row order: pixels are stored pass by pass
      val order = Seq(0 until h by 8, 4 until h by 8, 2 until h by 4,
        1 until h by 2).flatten
      val codes = scala.collection.mutable.ArrayBuffer[Int]()
      for (y <- order; x <- 0 until w) { codes += 256; codes += px(y * w + x) }
      codes += 256; codes += 257 // clear, EOI
      // pack 9-bit codes LSB-first (a clear precedes every literal, so
      // the dictionary never grows and the code size stays 9)
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L; var n = 0
      for (c <- codes) {
        acc |= c.toLong << n; n += 9
        while (n >= 8) { bits.write((acc & 0xff).toInt); acc >>>= 8; n -= 8 }
      }
      if (n > 0) bits.write((acc & 0xff).toInt)
      val payload = bits.toByteArray
      var off = 0
      while (off < payload.length) {
        val k = math.min(255, payload.length - off)
        bos.write(k); bos.write(payload, off, k); off += k
      }
      bos.write(0)    // sub-block terminator
      bos.write(0x3b) // trailer
      bos.toByteArray
    }
    for ((w, h) <- Seq((17, 13), (40, 32), (9, 8))) {
      val px = Array.fill(w * h)(seeded.nextInt(256))
      val blob = buildInterlaced(w, h, px)
      // the JDK reader de-interlaces the same bytes
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      reader.setInput(iis, false, true)
      val img = reader.read(0)
      assert(img.getWidth == w && img.getHeight == h)
      val got = graft.functions.GifRaster.frames(blob, 4, 16L << 20)
      assert(got != null && got.length == 1)
      val f = got(0)
      assert(f.w == w && f.h == h)
      for (y <- 0 until h; x <- 0 until w) {
        val want = img.getRGB(x, y) & 0xff // gray palette: B channel = value
        assert(f.luma(y * w + x) == want,
          s"($x,$y): got ${f.luma(y * w + x)}, want $want (raw ${px(y * w + x)})")
        assert(want == px(y * w + x), s"ImageIO disagrees with the fixture at ($x,$y)")
      }
      reader.dispose(); iis.close()
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

  test("validateRules == brute-force rule evaluation on random data with nulls") {
    val s = spark
    import s.implicits._
    val rows = (1 to 400).map { i =>
      (i.toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(200) - 50),
        if (rnd.nextInt(7) == 0) None else Some(rnd.nextInt(4).toString))
    }
    val df = rows.toDF("id", "x", "cat")
    val got = Etl.validateRules(df, Seq(
      "x_nonneg" -> (col("x") >= 0),
      "x_lt_100" -> (col("x") < 100),
      "cat_known" -> col("cat").isInCollection(Seq("0", "1", "2"))))
      .collect().map(r => r.getLong(0) -> ((r.getString(3), r.getBoolean(4)))).toMap
    val want = rows.map { case (id, x, cat) =>
      val failed = Seq(
        if (x.exists(_ >= 0)) None else Some("x_nonneg"),
        if (x.exists(_ < 100)) None else Some("x_lt_100"),
        if (cat.exists(Set("0", "1", "2"))) None else Some("cat_known")).flatten
      id -> ((failed.mkString(","), failed.isEmpty))
    }.toMap
    assert(got == want)
  }

  test("ntileBands == brute-force NTILE on random data (ties included)") {
    val s = spark
    import s.implicits._
    // duplicate values on purpose: the tiebreak column must decide bands
    val rows = (1 to 500).map { i =>
      (i.toLong, s"g${rnd.nextInt(4)}", (rnd.nextInt(40) / 4.0))
    }
    val got = Relational.ntileBands(rows.toDF("id", "g", "v"),
      group = "g", value = "v", tiebreak = "id", buckets = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val want = rows.groupBy(_._2).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(t => (t._3, t._1))
      val n = sorted.length
      // standard NTILE: first (n mod 4) bands get the extra row
      val base = n / 4; val extra = n % 4
      var idx = 0
      (1 to 4).flatMap { b =>
        val sz = base + (if (b <= extra) 1 else 0)
        val band = sorted.slice(idx, idx + sz); idx += sz
        if (band.isEmpty) None
        else Some((g, b.toLong) ->
          ((band.length.toLong, band.map(_._3).min, band.map(_._3).max)))
      }
    }
    assert(got == want)
  }

  test("cumulativeUsers == brute-force first-seen fold on random event data") {
    val s = spark
    import s.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (1 to 600).map { _ =>
      (rnd.nextInt(80).toLong,
        new java.sql.Timestamp(base + rnd.nextInt(14) * 86400000L + rnd.nextInt(86400000)))
    }
    val got = graft.operators.Events.cumulativeUsers(
      rows.toDF("user_id", "ts"), "ts", "user_id")
      .orderBy("day").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2)))
    val firstDay = rows.groupBy(_._1).map { case (_, es) =>
      val t = es.map(_._2.getTime).min
      t - java.lang.Math.floorMod(t, 86400000L)
    }
    val daily = firstDay.groupBy(x => x).map { case (d, v) => d -> v.size.toLong }
      .toSeq.sortBy(_._1)
    val want = daily.scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (d, nu)) =>
      (d, nu, cum + nu)
    }.drop(1)
    assert(got.toSeq == want)
  }

  test("patternWithin == brute-force next-b scan on random streams (dup timestamps)") {
    val s = spark
    import s.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // duplicate (key, ts) pairs ON PURPOSE: the strictly-after contract
    // must resolve through the tiebreak, and b-events at the same ts as
    // their a-event must not match
    val rows = (1L to 900L).map { i =>
      (rnd.nextInt(12).toLong, i,
        new java.sql.Timestamp(base + rnd.nextInt(200) * 1000L),
        if (rnd.nextBoolean()) "a" else "b")
    }
    val got = graft.operators.Events.patternWithin(
      rows.toDF("k", "eid", "ts", "typ"),
      key = "k", typeCol = "typ", tsCol = "ts", tiebreak = "eid",
      a = "a", b = "b", withinSec = 60L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    val want = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      val ord = g.sortBy(t => (t._3.getTime, t._2))
      ord.zipWithIndex.collect { case ((_, eid, ts, "a"), i) =>
        val later = ord.drop(i + 1).filter(_._4 == "b").map(_._3.getTime)
        (eid, ts.getTime, later.minOption)
      }.collect { case (eid, t, Some(b)) if (b - t) * 1000L <= 60000000L =>
        (k, eid) -> (b - t) * 1000L
      }
    }.toMap
    assert(got == want && got.nonEmpty)
  }

  test("groupingSetsAgg margins == brute-force sums on random data (with NULL keys)") {
    val s = spark
    import s.implicits._
    val rows = (1 to 500).map { _ =>
      (if (rnd.nextInt(10) == 0) null else s"g${rnd.nextInt(3)}",
        if (rnd.nextInt(10) == 0) null else s"h${rnd.nextInt(4)}",
        rnd.nextInt(1000) / 4.0)
    }
    val got = Relational.groupingSetsAgg(rows.toDF("g1", "g2", "m"), "g1", "g2", "m")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    def key(x: String) = if (x == null) "(null)" else x
    def agg(g: Seq[(String, String, Double)]) =
      (g.size.toLong, g.map(t => BigDecimal(t._3)).sum
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val cells = rows.groupBy(t => (key(t._1), key(t._2))).map { case (k, g) => k -> agg(g) }
    val m1 = rows.groupBy(t => key(t._1)).map { case (k, g) => (k, "ALL") -> agg(g) }
    val m2 = rows.groupBy(t => key(t._2)).map { case (k, g) => ("ALL", k) -> agg(g) }
    assert(got == cells ++ m1 ++ m2) // and no ("ALL","ALL") grand total
  }

  test("SumDec6 == decimal sum bitwise on random data; 128-bit carries exact") {
    val s = spark
    import s.implicits._
    import graft.functions.GraftFunctions.sumDec6
    // random 6dp measures, negatives and nulls included, many partitions
    val rows = (1 to 20000).map { i =>
      val v = if (rnd.nextInt(20) == 0) null
        else java.lang.Double.valueOf((rnd.nextLong() % 1000000000L) / 1000.0)
      (i % 37L, v)
    }
    val df = rows.toDF("g", "v").repartition(16)
    val fast = df.groupBy("g").agg(sumDec6(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val ref = df.groupBy("g").agg(sum(col("v").cast("decimal(20,6)")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(fast.keySet == ref.keySet)
    fast.foreach { case (g, d) =>
      assert(d.compareTo(ref(g)) == 0, s"group $g: $d vs ${ref(g)}") }

    // lo-word overflow: ALL-POSITIVE rows so partial micro sums genuinely
    // cross 2^63 (25 rows × 8e17 micros = 2.0e19 > 9.22e18) — exercises
    // the wrapping LEGACY add, the carry into hi, and the hi>0 branch of
    // the evaluation; repartition forces crossings in MERGE too
    val big = (1 to 25).map(_ => (1L, 8e11)).toDF("g", "v").repartition(5)
    val bigFast = big.agg(sumDec6(col("v"))).collect().head.getDecimal(0)
    val bigRef = big.agg(sum(col("v").cast("decimal(20,6)"))).collect().head.getDecimal(0)
    assert(bigFast.compareTo(bigRef) == 0, s"$bigFast vs $bigRef")
    // and back DOWN across the boundary (negative rows after the climb)
    val swing = ((1 to 25).map(_ => (1L, 8e11)) ++ (1 to 12).map(_ => (1L, -8e11)))
      .toDF("g", "v").repartition(4)
    val swingFast = swing.agg(sumDec6(col("v"))).collect().head.getDecimal(0)
    val swingRef = swing.agg(sum(col("v").cast("decimal(20,6)"))).collect().head.getDecimal(0)
    assert(swingFast.compareTo(swingRef) == 0, s"$swingFast vs $swingRef")

    // all-null and empty groups return null like sum
    val nn = Seq((1L, null.asInstanceOf[java.lang.Double])).toDF("g", "v")
      .agg(sumDec6(col("v"))).collect().head
    assert(nn.isNullAt(0))

    // beyond the 9.2e12 domain the conversion FAILS FAST (unscaled value
    // no longer fits a long) instead of corrupting the sum
    val boom = intercept[Exception] {
      Seq((1L, 5e13)).toDF("g", "v").agg(sumDec6(col("v"))).collect()
    }
    def rootChain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(rootChain(boom).exists(_.isInstanceOf[ArithmeticException]),
      boom.toString)
  }

  test("collocations == brute-force margins and Dice on random word soup") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    val words = Vector("aa", "bb", "cc", "dd")
    val docs = (1 to 60).map { i =>
      (i.toLong, (1 to (2 + rnd.nextInt(8))).map(_ => words(rnd.nextInt(4))).mkString(" "))
    }
    val got = TextOps.collocations(docs.toDF("doc_id", "text"), "text",
      minCount = 2L, topK = 1000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val toks = docs.map(_._2.split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = toks.flatMap(t => t.zip(t.tail)).groupBy(identity)
      .view.mapValues(_.size.toLong).filter(_._2 >= 2L).toMap
    val want = bi.map { case ((x, y), c) =>
      val den = uni(x) + uni(y)
      (x, y) -> ((c, math.floor((2e4 * 2 * c + den) / (2.0 * den)) / 1e4))
    }
    assert(got == want)
    assert(got.values.forall { case (_, dice) => dice > 0.0 && dice <= 1.0 })
  }

  test("lmScore == brute-force add-one bigram model on random word soup") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    val words = Vector("aa", "bb", "cc")
    val docs = (1 to 40).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(6))).map(_ => words(rnd.nextInt(3))).mkString(" "))
    }
    val got = TextOps.lmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = uni.size.toLong
    val bi = toks.flatMap(_._2 match { case t => t.zip(t.tail) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = toks.filter(_._2.size >= 2).map { case (id, t) =>
      val lis = t.zip(t.tail).map { case p @ (x, _) =>
        math.floor(math.log((bi(p) + 1).toDouble / (uni(x) + v).toDouble) * 1e4).toLong
      }
      id -> ((lis.sum, lis.size.toLong))
    }.toMap
    assert(got == want)
    // every log-prob is negative: totals must be too
    assert(got.values.forall(_._1 < 0L))
  }

  test("bpeMergesLocal == bpeMerges on random word soup") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    val syll = Vector("ab", "ba", "abc", "aab", "bb", "a", "aaa", "bab")
    val docs = (1 to 60).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(6))).map(_ => syll(rnd.nextInt(syll.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val dist = TextOps.bpeMerges(df, "text", k = 8).collect().map(_.toString).sorted
    val local = TextOps.bpeMergesLocal(df, "text", k = 8).collect().map(_.toString).sorted
    assert(dist.nonEmpty && dist.sameElements(local))
  }

  test("bpeEncode + packSequences: pack cuts land only on whole-token boundaries") {
    val s = spark
    import s.implicits._
    import graft.operators.TextOps
    // random word soup over a tiny alphabet so merges actually fire
    val syll = Vector("ab", "ba", "abc", "aab", "bb", "a", "b", "c")
    val docs = (1 to 80).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(7))).map(_ => syll(rnd.nextInt(syll.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(df, "text", k = 6)
    val mtab = merges.orderBy("merge_rank").select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // brute-force reference encoder: the SAME delimited-string replace
    // both engines execute, token list = split on the delimiter
    def enc(word: String): Seq[String] = {
      val repr0 = " " + word.map(c => s"$c ").mkString
      val reprK = mtab.foldLeft(repr0) { case (r, (x, y)) =>
        r.replace(s" $x $y ", s" $x$y ") }
      reprK.split(" ").toSeq.filter(_.nonEmpty)
    }
    // 1) Spark's per-word encoding == brute force (repr and count)
    val gotWords = TextOps.bpeEncodeWords(df, "text", merges)
      .select("w", "bpe_repr", "n_bpe").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val vocab = docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty).distinct
    vocab.foreach { w =>
      val e = enc(w)
      assert(gotWords(w) == ((s" ${e.mkString(" ")} ", e.size.toLong)), s"word $w")
    }
    // 2) pack in TRUE token space: every cut position is a multiple of
    // the budget in cumulative whole-token counts, so no merge-produced
    // token is ever split across packs — verify against the laid-out
    // token stream itself
    val budget = 7L
    val perDoc = TextOps.bpeEncode(df, "doc_id", "text", merges)
      .withColumn("shard", pmod(col("doc_id"), lit(3L)))
    val packed = TextOps.packSequences(perDoc, "doc_id", "shard", "bpe_tokens", budget)
      .select("doc_id", "shard", "bpe_tokens", "pack_id", "pack_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, n, packId, off) =>
        val stream = docs.find(_._1 == id).get._2
          .split("\\s+").toSeq.filter(_.nonEmpty).flatMap(enc)
        assert(n == stream.size.toLong, s"doc $id token count")
        // the doc's span starts exactly at the cumulative WHOLE-token
        // position: cuts at multiples of budget hit token boundaries
        assert(packId == cum / budget && off == cum % budget, s"doc $id span")
        cum += n
      }
    }
  }

  test("JaroWinkler.compute invariants on random strings (seeded)") {
    def jw(a: String, b: String): Double = graft.functions.JaroWinkler.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))
    val r = new scala.util.Random(4242)
    val alpha = "abcde fgh"
    def randStr(n: Int): String =
      (0 until n).map(_ => alpha(r.nextInt(alpha.length))).mkString
    for (_ <- 1 to 400) {
      val a = randStr(r.nextInt(20))
      val b = randStr(r.nextInt(20))
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range violated: jw($a, $b) = $s")
      assert(math.abs(s - jw(b, a)) < 1e-15, s"asymmetric on ($a, $b)")
      if (a.nonEmpty) assert(jw(a, a) == 1.0, s"identity != 1 for $a")
      // a single trailing append can only be reached from similarity
      // strictly above any unrelated string's — the metric must rank
      // the 1-edit neighbor over a fresh random string of same length
      if (a.length >= 8) {
        val near = a.dropRight(1) + (if (a.last == 'z') 'y' else 'z')
        val far = randStr(a.length)
        if (far != a && jw(a, far) < 0.99)
          assert(jw(a, near) > jw(a, far) - 1e-9,
            s"1-edit neighbor ranked below random: $a / $near / $far")
      }
    }
    // empty-side convention (DuckDB parity): always 0, even both-empty
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0 && jw("abc", "") == 0.0)
  }

  test("PiiScrub is idempotent and total on seeded random + hostile text") {
    import graft.functions.PiiScrub
    val seeded = new scala.util.Random(8675309L)
    val words = Seq("alpha", "beta9", "x", "mail", "2026-08-16", "v1.2.3",
      "a@b.com", "+1-555-200-3000", "4111111111111111", "10.1.2.3",
      "(555) 200-3000", "café", "日本", "#", "..", "+", "(", ")")
    def randText(): String =
      Seq.fill(1 + seeded.nextInt(20))(words(seeded.nextInt(words.length)))
        .mkString(Seq(" ", "  ", ",", ".", "\n")(seeded.nextInt(5)))
    for (_ <- 0 until 400) {
      val s = randText()
      val r1 = PiiScrub.compute(UTF8String.fromString(s))
      val m1 = r1.getUTF8String(0).toString
      // idempotence: the scrubbed text contains nothing left to scrub
      val r2 = PiiScrub.compute(UTF8String.fromString(m1))
      assert(r2.getUTF8String(0).toString == m1, s"not idempotent on: $s -> $m1")
      assert((1 to 4).forall(i => r2.getInt(i) == 0), s"rescrub found PII in: $m1")
      // totality bound: each match shrinks or keeps length (placeholders <= 7 bytes)
      assert(m1.length <= s.length + 7 * (1 to 4).map(r1.getInt).sum + 7)
    }
    // pure-noise bytes (valid UTF-8 strings of random ASCII) never crash
    for (_ <- 0 until 200) {
      val s = new String(Array.fill(seeded.nextInt(64))((32 + seeded.nextInt(95)).toChar))
      PiiScrub.compute(UTF8String.fromString(s))
    }
  }

  test("FixMojibake round-trips seeded mojibake of Latin-1-alphabet text; fixpoint is stable") {
    import graft.functions.FixMojibake
    val seeded = new scala.util.Random(1357911L)
    val accents = "éèàüñçößâêîôû—…“”’™€"
    def randClean(): String =
      Array.fill(3 + seeded.nextInt(30))(
        if (seeded.nextInt(4) == 0) accents(seeded.nextInt(accents.length))
        else (97 + seeded.nextInt(26)).toChar).mkString
    // the exact corruption FixMojibake inverts: utf-8 bytes mis-decoded
    // through SLOPPY cp1252 — Java's strict decoder maps the five
    // undefined bytes (81 8D 8F 90 9D) to U+FFFD, so the harness takes
    // the latin-1 fallback for those itself (independent of the
    // expression's own table)
    def corrupt(s: String): String =
      s.getBytes("UTF-8").map { b =>
        val v = b & 0xff
        if (v < 0x80 || v >= 0xa0) v.toChar
        else if (v == 0x81 || v == 0x8d || v == 0x8f || v == 0x90 || v == 0x9d) v.toChar
        else new String(Array[Byte](v.toByte), "windows-1252").charAt(0)
      }.mkString
    var repaired = 0
    for (_ <- 0 until 300) {
      val clean = randClean()
      val moji = corrupt(clean)
      val r = FixMojibake.compute(UTF8String.fromString(moji))
      val fixed = r.getUTF8String(0).toString
      // the inversion claim only holds when the CLEAN text is not itself
      // mojibake-shaped (e.g. "é——" re-encodes to valid UTF-8 — the
      // inherent ambiguity every repairer shares); such cleans repair
      // one level deeper, which is correct behavior, not a failure
      val cleanAmbiguous =
        FixMojibake.compute(UTF8String.fromString(clean)).getInt(1) > 0
      if (moji != clean && !cleanAmbiguous) {
        assert(fixed == clean, s"repair failed: '$clean' -> '$moji' -> '$fixed'")
        if (r.getInt(1) > 0) repaired += 1
      }
      // fixpoint: a second pass never changes the output
      val r2 = FixMojibake.compute(r.getUTF8String(0))
      assert(r2.getUTF8String(0).toString == fixed && (r2.getInt(1) == 0 || r.getInt(1) == FixMojibake.MaxRounds))
    }
    assert(repaired > 100, s"generator produced too few repair cases: $repaired")
  }

  test("DetectEncoding is total and stable on seeded random bytes") {
    import graft.functions.DetectEncoding
    val seeded = new scala.util.Random(24681012L)
    val labels = Set("empty", "ascii", "utf-8", "latin-1", "utf-16le", "utf-16be", "binary")
    for (_ <- 0 until 500) {
      val n = seeded.nextInt(80)
      val b = new Array[Byte](n)
      seeded.nextBytes(b)
      val l1 = DetectEncoding.compute(b).toString
      assert(labels(l1), s"unknown label $l1")
      // deterministic: same bytes, same verdict
      assert(DetectEncoding.compute(b.clone()).toString == l1)
      // classification invariants on the verdict
      l1 match {
        case "ascii" => assert(b.forall(x => x >= 0 && x != 0))
        case "latin-1" => assert(b.exists(_ < 0) && !b.contains(0.toByte))
        case "binary" => assert(b.contains(0.toByte))
        case _ =>
      }
    }
  }

  test("RobotsRules/RobotsAllowed are total and bounded on seeded random robots text") {
    import graft.functions.{RobotsAllowed, RobotsRules}
    val seeded = new scala.util.Random(4242424L)
    val frags = Seq("User-agent: *", "User-agent: graftbot", "Disallow: /a",
      "Allow: /a/b", "Disallow:", "Sitemap: https://x.example/s.xml",
      "# comment", "", "garbage line", "Disallow: /*.pdf$", "allow: /x",
      "USER-AGENT: other", "Disallow /nocolon", ": empty-key", "a:b")
    for (_ <- 0 until 300) {
      val txt = Seq.fill(seeded.nextInt(25))(frags(seeded.nextInt(frags.length)))
        .mkString("\n")
      val rules = RobotsRules.compute(
        UTF8String.fromString(txt), UTF8String.fromString("graftbot"))
      assert(rules.numElements() <= RobotsRules.MaxRules)
      var i = 0
      while (i < rules.numElements()) {
        assert(rules.getStruct(i, 2).getUTF8String(1).numBytes() > 0)
        i += 1
      }
      // every parsed rule set yields a total verdict for arbitrary paths
      for (p <- Seq("/", "/a/b/c", "", "/x?q=1", "/a.pdf"))
        RobotsAllowed.compute(rules, UTF8String.fromString(p))
    }
  }
}
