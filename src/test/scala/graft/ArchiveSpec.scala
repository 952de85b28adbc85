package graft

import graft.functions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Archive codec cross-validation: every builder's output is read back by
  * the REFERENCE implementation (GNU tar / Info-ZIP / gzip CLI /
  * java.util.zip), and every parser reads archives the reference tools
  * wrote — so the build and parse halves cannot share a bug. Plus the
  * hostile-input contracts (null on structural corruption, per-member
  * flags on payload corruption) and a seeded fuzz sweep.
  */
class ArchiveSpec extends SparkSpec {

  private def arr(xs: Seq[AnyRef]): ArrayData = new GenericArrayData(xs.toArray)
  private def names(xs: String*): ArrayData = arr(xs.map(UTF8String.fromString))
  private def bins(xs: Array[Byte]*): ArrayData = arr(xs)
  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  private def sh(cmd: String*): (Int, String) = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  /** The zstd CLI cross-checks only run where the binary exists — the
    * engine-side round trips (ZstdBytes ↔ UnzstdBytes, checksum and bomb
    * gates) are asserted unconditionally in the other tests either way. */
  private lazy val zstdCli: Boolean =
    try sh("sh", "-c", "command -v zstd")._1 == 0 catch { case _: Exception => false }

  // ---------------------------------------------------------------- tar

  test("tar: GNU tar lists and extracts TarBuild output byte-for-byte") {
    val p1 = "alpha payload".getBytes("UTF-8")
    val p2 = Array.fill[Byte](1000)(7) // spans 2 data blocks, 24-byte pad
    val p3 = Array.emptyByteArray      // zero-size member: header only
    val blob = TarBuild.compute(
      names("7.cls", "7.txt", "empty.bin"), bins(p1, p2, p3))
    assert(blob != null && blob.length == 512 + 512 + 512 + 1024 + 512 + 1024)
    val dir = java.nio.file.Files.createTempDirectory("graft_tar").toFile
    val tarF = new java.io.File(dir, "t.tar")
    java.nio.file.Files.write(tarF.toPath, blob)
    val (rc, listing) = sh("tar", "-tvf", tarF.getAbsolutePath)
    assert(rc == 0, s"tar -tvf failed: $listing")
    assert(listing.contains("7.cls") && listing.contains("7.txt") &&
      listing.contains("empty.bin"), listing)
    val (rc2, _) = sh("tar", "-xf", tarF.getAbsolutePath, "-C", dir.getAbsolutePath)
    assert(rc2 == 0)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(new java.io.File(dir, "7.cls").toPath), p1))
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(new java.io.File(dir, "7.txt").toPath), p2))
    assert(new java.io.File(dir, "empty.bin").length() == 0)
  }

  test("tar: TarEntries parses a GNU-tar-written ustar archive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tar2").toFile
    val sub = new java.io.File(dir, "sub"); sub.mkdirs()
    val aBytes = "first file body".getBytes("UTF-8")
    val bBytes = ("x" * 600).getBytes("UTF-8")
    java.nio.file.Files.write(new java.io.File(dir, "a.txt").toPath, aBytes)
    java.nio.file.Files.write(new java.io.File(sub, "b.txt").toPath, bBytes)
    val tarF = new java.io.File(dir, "out.tar")
    val (rc, out) = sh("tar", "--format=ustar", "-cf", tarF.getAbsolutePath,
      "-C", dir.getAbsolutePath, "a.txt", "sub/b.txt")
    assert(rc == 0, out)
    val blob = java.nio.file.Files.readAllBytes(tarF.toPath)
    val es = TarEntries.compute(blob)
    assert(es != null, "GNU ustar archive must parse")
    val rows = (0 until es.numElements()).map { i =>
      val r = es.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
    assert(rows.map(_._1) == Seq("a.txt", "sub/b.txt"), rows)
    for (((_, off, size), expect) <- rows.zip(Seq(aBytes, bBytes))) {
      val got = java.util.Arrays.copyOfRange(blob, off.toInt, (off + size).toInt)
      assert(java.util.Arrays.equals(got, expect))
    }
  }

  test("tar: hostile inputs return null / empty, never junk rows") {
    val good = TarBuild.compute(names("a.txt"), bins("hello".getBytes))
    // flipped checksum digit → whole archive rejected
    val badSum = good.clone(); badSum(150) = (badSum(150) ^ 1).toByte
    assert(TarEntries.compute(badSum) == null)
    // flipped size field → checksum breaks first (and must)
    val badSize = good.clone(); badSize(130) = '7'
    assert(TarEntries.compute(badSize) == null)
    // truncated mid-payload → null (no partial member emitted)
    assert(TarEntries.compute(good.take(700)) == null)
    // missing end-of-archive trailer → null (chain runs off the end)
    assert(TarEntries.compute(good.take(1024)) == null)
    // bare trailer = valid empty archive
    assert(TarEntries.compute(new Array[Byte](1024)).numElements() == 0)
    // noise and sub-block blobs are not archives
    assert(TarEntries.compute("not a tar at all".getBytes) == null)
    // mismatched member lists refuse to build
    assert(TarBuild.compute(names("a", "b"), bins("x".getBytes)) == null)
    assert(TarBuild.compute(names("x" * 101), bins("y".getBytes)) == null)
  }

  // ---------------------------------------------------------------- zip

  test("zip: unzip CLI and java.util.zip read ZipBuild output") {
    val p1 = "zip payload one".getBytes("UTF-8")
    val p2 = Array.tabulate[Byte](777)(i => (i % 251).toByte)
    val blob = ZipBuild.compute(names("one.txt", "data/two.bin"), bins(p1, p2))
    assert(blob != null)
    val dir = java.nio.file.Files.createTempDirectory("graft_zip").toFile
    val zipF = new java.io.File(dir, "t.zip")
    java.nio.file.Files.write(zipF.toPath, blob)
    val (rc, out) = sh("unzip", "-t", zipF.getAbsolutePath)
    assert(rc == 0 && out.contains("No errors detected"), out)
    val zf = new java.util.zip.ZipFile(zipF)
    try {
      val e1 = zf.getEntry("one.txt")
      val e2 = zf.getEntry("data/two.bin")
      assert(e1 != null && e2 != null)
      assert(java.util.Arrays.equals(zf.getInputStream(e1).readAllBytes(), p1))
      assert(java.util.Arrays.equals(zf.getInputStream(e2).readAllBytes(), p2))
    } finally zf.close()
  }

  test("zip: ZipEntries reads DEFLATED archives from zip CLI and ZipOutputStream") {
    // java ZipOutputStream: deflated members, known payloads
    val p1 = ("compressible " * 50).getBytes("UTF-8")
    val p2 = "tiny".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("big.txt")); zos.write(p1); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("s.txt")); zos.write(p2); zos.closeEntry()
    zos.close()
    val es = ZipEntries.compute(bos.toByteArray)
    assert(es != null && es.numElements() == 2)
    val r0 = es.getStruct(0, 5); val r1 = es.getStruct(1, 5)
    assert(r0.getUTF8String(0).toString == "big.txt" && r0.getLong(2) == p1.length)
    assert(r0.getBoolean(3), "crc must verify on a clean deflated member")
    assert(r0.getUTF8String(4).toString == md5hex(p1))
    assert(r1.getBoolean(3) && r1.getUTF8String(4).toString == md5hex(p2))
    // zip CLI (Info-ZIP): real-world producer, mixed store/deflate choices
    val dir = java.nio.file.Files.createTempDirectory("graft_zip2").toFile
    java.nio.file.Files.write(new java.io.File(dir, "f.txt").toPath, p1)
    val zipF = new java.io.File(dir, "cli.zip")
    val (rc, out) = sh("zip", "-j", zipF.getAbsolutePath,
      new java.io.File(dir, "f.txt").getAbsolutePath)
    assert(rc == 0, out)
    val es2 = ZipEntries.compute(java.nio.file.Files.readAllBytes(zipF.toPath))
    assert(es2 != null && es2.numElements() == 1)
    val c = es2.getStruct(0, 5)
    assert(c.getUTF8String(0).toString == "f.txt" && c.getLong(2) == p1.length &&
      c.getBoolean(3) && c.getUTF8String(4).toString == md5hex(p1))
  }

  test("zip: payload corruption flags ONE member, structural corruption nulls the archive") {
    val p1 = "member one content".getBytes("UTF-8")
    val p2 = "member two content".getBytes("UTF-8")
    val blob = ZipBuild.compute(names("a.txt", "b.txt"), bins(p1, p2))
    // flip a byte INSIDE a.txt's stored payload (offset 30 + name len)
    val bad = blob.clone(); bad(30 + 5 + 3) = (bad(30 + 5 + 3) ^ 0x40).toByte
    val es = ZipEntries.compute(bad)
    assert(es != null && es.numElements() == 2)
    val a = es.getStruct(0, 5); val b = es.getStruct(1, 5)
    assert(!a.getBoolean(3) && a.isNullAt(4), "corrupt member must flag, not vanish")
    assert(b.getBoolean(3) && b.getUTF8String(4).toString == md5hex(p2),
      "sibling member must stay verified")
    // truncate the EOCD → structural null
    assert(ZipEntries.compute(blob.take(blob.length - 10)) == null)
    assert(ZipEntries.compute("PK not really".getBytes) == null)
  }

  // --------------------------------------------------------------- gzip

  test("gzip: CLI round-trips both directions, including FNAME members") {
    val data = ("gzip cross validation body " * 20).getBytes("UTF-8")
    val dir = java.nio.file.Files.createTempDirectory("graft_gz").toFile
    // engine → CLI
    val gzF = new java.io.File(dir, "e.gz")
    java.nio.file.Files.write(gzF.toPath, GzipBytes.compute(data))
    val (rc, out) = sh("sh", "-c", s"gzip -dc ${gzF.getAbsolutePath} | md5sum")
    assert(rc == 0 && out.startsWith(md5hex(data)), out)
    // CLI → engine: `gzip <file>` stores the filename (FNAME flag set),
    // so the decoder's optional-field skip is exercised by a real member
    val plain = new java.io.File(dir, "payload.txt")
    java.nio.file.Files.write(plain.toPath, data)
    val (rc2, out2) = sh("gzip", "-9", plain.getAbsolutePath)
    assert(rc2 == 0, out2)
    val cli = java.nio.file.Files.readAllBytes(new java.io.File(dir, "payload.txt.gz").toPath)
    assert((cli(3) & 8) != 0, "gzip CLI member should carry FNAME")
    assert(java.util.Arrays.equals(GunzipBytes.compute(cli), data))
  }

  test("gzip: trailer verification catches CRC, ISIZE and truncation") {
    val data = "verify me please".getBytes("UTF-8")
    val gz = GzipBytes.compute(data)
    assert(java.util.Arrays.equals(GunzipBytes.compute(gz), data))
    val badCrc = gz.clone(); badCrc(gz.length - 8) = (badCrc(gz.length - 8) ^ 1).toByte
    assert(GunzipBytes.compute(badCrc) == null, "flipped CRC byte must fail")
    val badIsize = gz.clone(); badIsize(gz.length - 1) = (badIsize(gz.length - 1) ^ 1).toByte
    assert(GunzipBytes.compute(badIsize) == null, "flipped ISIZE byte must fail")
    val badBody = gz.clone(); badBody(12) = (badBody(12) ^ 0x10).toByte
    assert(GunzipBytes.compute(badBody) == null, "flipped body byte must fail")
    assert(GunzipBytes.compute(gz.take(gz.length - 3)) == null, "truncated member")
    assert(GunzipBytes.compute("not gzip".getBytes) == null)
  }

  test("gzip: decompression-bomb gate stops past 64 MiB") {
    // 80 MiB of zeros deflates to ~80 KB: a classic small-in/huge-out bomb
    val big = new Array[Byte](80 << 20)
    val gz = GzipBytes.compute(big)
    assert(gz.length < (1 << 20), s"bomb fixture should be tiny, was ${gz.length}")
    assert(GunzipBytes.compute(gz) == null, "output past the cap must fail, not allocate")
  }

  test("gzip: GunzipMembers walks concatenated members like zcat") {
    val parts = Seq("first member", "second member body", "third").map(_.getBytes("UTF-8"))
    val cat = parts.map(GzipBytes.compute).reduce(_ ++ _)
    // engine walk: every member decoded, in order
    val ms = GunzipMembers.compute(cat)
    assert(ms != null && ms.numElements() == 3)
    for ((p, i) <- parts.zipWithIndex)
      assert(java.util.Arrays.equals(ms.getBinary(i), p))
    // zcat agrees the concatenation is one valid multi-member stream
    val dir = java.nio.file.Files.createTempDirectory("graft_gzm").toFile
    val f = new java.io.File(dir, "cat.gz")
    java.nio.file.Files.write(f.toPath, cat)
    val (rc, out) = sh("sh", "-c", s"zcat ${f.getAbsolutePath} | md5sum")
    assert(rc == 0 && out.startsWith(md5hex(parts.reduce(_ ++ _))), out)
    // CLI-produced members (FNAME-bearing) concatenate and walk too
    val a = new java.io.File(dir, "a.txt"); val b = new java.io.File(dir, "b.txt")
    java.nio.file.Files.write(a.toPath, parts(0))
    java.nio.file.Files.write(b.toPath, parts(1))
    assert(sh("gzip", a.getAbsolutePath)._1 == 0)
    assert(sh("gzip", b.getAbsolutePath)._1 == 0)
    val cliCat = java.nio.file.Files.readAllBytes(new java.io.File(dir, "a.txt.gz").toPath) ++
      java.nio.file.Files.readAllBytes(new java.io.File(dir, "b.txt.gz").toPath)
    val ms2 = GunzipMembers.compute(cliCat)
    assert(ms2 != null && ms2.numElements() == 2 &&
      java.util.Arrays.equals(ms2.getBinary(0), parts(0)) &&
      java.util.Arrays.equals(ms2.getBinary(1), parts(1)))
    // one corrupt member quarantines the shard; empty blob = no members
    val bad = cat.clone(); bad(GzipBytes.compute(parts(0)).length + 12) =
      (bad(GzipBytes.compute(parts(0)).length + 12) ^ 0x10).toByte
    assert(GunzipMembers.compute(bad) == null)
    assert(GunzipMembers.compute(cat.take(cat.length - 2)) == null, "truncated tail member")
    assert(GunzipMembers.compute(Array.emptyByteArray).numElements() == 0)
  }

  // --------------------------------------------------------------- warc

  test("warc: record walk frames bodies by Content-Length, not by scanning") {
    def rec(uri: String, body: Array[Byte], typ: String = "response"): Array[Byte] = {
      val hdr = s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n"
      hdr.getBytes("UTF-8") ++ body ++ "\r\n\r\n".getBytes("UTF-8")
    }
    // record 2's body EMBEDS a fake record header: a scanning parser
    // would split it; the Content-Length walk must step straight over
    val trap = "prefix WARC/1.0\r\nContent-Length: 3\r\n\r\n suffix".getBytes("UTF-8")
    val b1 = "plain body".getBytes("UTF-8")
    val b3 = Array.tabulate[Byte](257)(i => i.toByte)
    val blob = rec("https://a.test/1", b1) ++ rec("https://a.test/2", trap) ++
      rec("https://a.test/3", b3, typ = "resource")
    val es = WarcRecords.compute(blob)
    assert(es != null && es.numElements() == 3)
    val rows = (0 until 3).map { i =>
      val r = es.getStruct(i, 4)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString, r.getLong(2), r.getLong(3))
    }
    assert(rows(0)._1 == "response" && rows(0)._2 == "https://a.test/1")
    assert(rows(2)._1 == "resource" && rows(2)._4 == 257L)
    for (((_, _, off, len), body) <- rows.zip(Seq(b1, trap, b3)))
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(blob, off.toInt, (off + len).toInt), body))
    // header names are case-insensitive per ISO 28500
    val weird = ("WARC/1.0\r\nwArC-tYpE: response\r\nCONTENT-LENGTH: 2\r\n\r\nok\r\n\r\n").getBytes
    val es2 = WarcRecords.compute(weird)
    assert(es2 != null && es2.numElements() == 1 &&
      es2.getStruct(0, 4).getUTF8String(0).toString == "response")
  }

  test("warc: malformed records quarantine the whole shard") {
    val good = "WARC/1.0\r\nContent-Length: 4\r\n\r\nbody\r\n\r\n".getBytes
    assert(WarcRecords.compute(good) != null)
    // overrunning Content-Length
    assert(WarcRecords.compute(
      "WARC/1.0\r\nContent-Length: 400\r\n\r\nbody\r\n\r\n".getBytes) == null)
    // missing Content-Length entirely
    assert(WarcRecords.compute(
      "WARC/1.0\r\nWARC-Type: x\r\n\r\nbody\r\n\r\n".getBytes) == null)
    // garbage length value
    assert(WarcRecords.compute(
      "WARC/1.0\r\nContent-Length: many\r\n\r\nbody\r\n\r\n".getBytes) == null)
    // missing record separator after the body
    assert(WarcRecords.compute(
      "WARC/1.0\r\nContent-Length: 4\r\n\r\nbodyXXXX".getBytes) == null)
    // trailing garbage after a valid record
    assert(WarcRecords.compute(good ++ "WARC/9".getBytes) == null)
    // empty shard parses to zero records
    assert(WarcRecords.compute(Array.emptyByteArray).numElements() == 0)
  }

  // --------------------------------------------------------------- fuzz

  // --------------------------------------------------------------- zstd

  test("zstd: CLI round-trips both directions, including unknown-content-size frames") {
    assume(zstdCli, "zstd CLI not installed on this host")
    val data = ("zstd cross validation body " * 20).getBytes("UTF-8")
    val dir = java.nio.file.Files.createTempDirectory("graft_zst").toFile
    // engine → CLI
    val zsF = new java.io.File(dir, "e.zst")
    java.nio.file.Files.write(zsF.toPath, ZstdBytes.compute(data))
    val (rc, out) = sh("sh", "-c", s"zstd -dc ${zsF.getAbsolutePath} | md5sum")
    assert(rc == 0 && out.startsWith(md5hex(data)), out)
    // CLI → engine: a file input carries the content size in the header
    val plain = new java.io.File(dir, "payload.txt")
    java.nio.file.Files.write(plain.toPath, data)
    assert(sh("zstd", "-q", plain.getAbsolutePath)._1 == 0)
    val cli = java.nio.file.Files.readAllBytes(new java.io.File(dir, "payload.txt.zst").toPath)
    assert(java.util.Arrays.equals(UnzstdBytes.compute(cli), data))
    // CLI streaming from stdin omits the content size → exercises the
    // capped-streaming decode branch, not the pre-allocated one
    val (rc2, _) = sh("sh", "-c",
      s"zstd -q -c < ${plain.getAbsolutePath} > ${dir.getAbsolutePath}/stream.zst")
    assert(rc2 == 0)
    val streamed = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "stream.zst").toPath)
    assert(com.github.luben.zstd.Zstd.getFrameContentSize(
      streamed, 0, streamed.length) < 0, "stdin frame should omit content size")
    assert(java.util.Arrays.equals(UnzstdBytes.compute(streamed), data))
  }

  test("zstd: checksum verification catches body, checksum and truncation corruption") {
    val data = "verify me please zstd".getBytes("UTF-8")
    val zs = ZstdBytes.compute(data)
    assert(java.util.Arrays.equals(UnzstdBytes.compute(zs), data))
    // flipped trailing checksum byte (ZstdBytes writes checksum frames)
    val badCk = zs.clone(); badCk(zs.length - 1) = (badCk(zs.length - 1) ^ 1).toByte
    assert(UnzstdBytes.compute(badCk) == null, "flipped checksum byte must fail")
    val badBody = zs.clone(); badBody(zs.length / 2) = (badBody(zs.length / 2) ^ 0x10).toByte
    assert(UnzstdBytes.compute(badBody) == null, "flipped body byte must fail")
    assert(UnzstdBytes.compute(zs.take(zs.length - 3)) == null, "truncated frame")
    assert(UnzstdBytes.compute("not zstd".getBytes) == null)
  }

  test("zstd: declared-size bomb gate refuses allocation past 64 MiB") {
    val big = new Array[Byte](80 << 20)
    val zs = ZstdBytes.compute(big)
    assert(zs.length < (1 << 20), s"bomb fixture should be tiny, was ${zs.length}")
    assert(UnzstdBytes.compute(zs) == null, "declared size past the cap must fail, not allocate")
  }

  test("zstd: UnzstdMembers walks concatenated frames and skips skippable frames") {
    val parts = Seq("first frame", "second frame body", "third").map(_.getBytes("UTF-8"))
    // a skippable frame (magic 0x184D2A50 LE, 4-byte LE length, payload)
    // between data frames — the seekable-zstd layout
    val skip = Array[Byte](0x50, 0x2a, 0x4d, 0x18, 6, 0, 0, 0) ++ "seekme".getBytes
    val cat = ZstdBytes.compute(parts(0)) ++ skip ++
      ZstdBytes.compute(parts(1)) ++ ZstdBytes.compute(parts(2))
    val ms = UnzstdMembers.compute(cat)
    assert(ms != null && ms.numElements() == 3)
    for ((p, i) <- parts.zipWithIndex)
      assert(java.util.Arrays.equals(ms.getBinary(i), p))
    // the zstd CLI agrees the concatenation (incl. skippable) is valid
    assume(zstdCli, "zstd CLI not installed on this host")
    val dir = java.nio.file.Files.createTempDirectory("graft_zstm").toFile
    val f = new java.io.File(dir, "cat.zst")
    java.nio.file.Files.write(f.toPath, cat)
    val (rc, out) = sh("sh", "-c", s"zstd -dc ${f.getAbsolutePath} | md5sum")
    assert(rc == 0 && out.startsWith(md5hex(parts.reduce(_ ++ _))), out)
    // one corrupt frame quarantines the shard; truncation too; empty =
    // none. The flip lands in the first frame's compressed BLOCK (not
    // the header's unused bit, which decoders must ignore): either the
    // block fails to decode or the content checksum catches it
    val bad = cat.clone(); bad(12) = (bad(12) ^ 0x10).toByte
    assert(UnzstdMembers.compute(bad) == null)
    assert(UnzstdMembers.compute(cat.take(cat.length - 2)) == null, "truncated tail frame")
    assert(UnzstdMembers.compute(Array.emptyByteArray).numElements() == 0)
    // a leading skippable frame is legal prefix metadata for the single
    // -frame decoder too
    assert(java.util.Arrays.equals(
      UnzstdBytes.compute(skip ++ ZstdBytes.compute(parts(0))), parts(0)))
  }

  test("archive fuzz: noise, magic-prefixed noise and corrupted archives never throw") {
    val rnd = new scala.util.Random(246813579L)
    val valid: Seq[Array[Byte]] = Seq(
      TarBuild.compute(names("f.txt"), bins("fuzz tar body".getBytes)),
      ZipBuild.compute(names("f.txt"), bins("fuzz zip body".getBytes)),
      GzipBytes.compute("fuzz gzip body".getBytes),
      ZstdBytes.compute("fuzz zstd body".getBytes),
      "WARC/1.0\r\nContent-Length: 4\r\n\r\nbody\r\n\r\n".getBytes)
    val blobs = scala.collection.mutable.ArrayBuffer[Array[Byte]](Array.emptyByteArray)
    for (_ <- 1 to 150) {
      val b = new Array[Byte](rnd.nextInt(1400)); rnd.nextBytes(b); blobs += b
    }
    val magics = Seq("1F8B08", "504B0304", "504B0506", "574152432F312E30",
      "28B52FFD", "502A4D18")
    for (m <- magics; _ <- 1 to 15) {
      val tail = new Array[Byte](rnd.nextInt(600)); rnd.nextBytes(tail)
      blobs += m.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray ++ tail
    }
    for (v <- valid; _ <- 1 to 25) {
      val c = java.util.Arrays.copyOf(v, if (rnd.nextBoolean()) v.length
        else 1 + rnd.nextInt(v.length))
      for (_ <- 0 to rnd.nextInt(8))
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      blobs += c
    }
    blobs.foreach { b =>
      TarEntries.compute(b); ZipEntries.compute(b)
      GunzipBytes.compute(b); WarcRecords.compute(b)
      UnzstdBytes.compute(b); UnzstdMembers.compute(b)
    }
  }

  // ------------------------------------------------------ query surface

  test("archive queries produce sane rows at sf0.001") {
    val tar = run("src_tar_roundtrip").collect()
    assert(tar.length == 1000, s"2 members per doc: ${tar.length}")
    val wds = run("mm_webdataset").collect()
    assert(wds.length == 500 && wds.forall(_.getLong(5) == 2L))
    val zip = run("src_zip_roundtrip").collect()
    assert(zip.length == 1000 && zip.forall(_.getLong(4) == 1L), "all CRCs verify")
    val gz = run("src_gzip_roundtrip").collect()
    val (bad, good) = gz.partition(r => r.getLong(0) % 7 == 0)
    assert(bad.nonEmpty && bad.forall(r => r.getLong(1) == 0L && r.isNullAt(2)))
    assert(good.forall(r => r.getLong(1) == 1L && !r.isNullAt(3)))
    val zst = run("src_zst_roundtrip").collect()
    val (zbad, zgood) = zst.partition(r => r.getLong(0) % 7 == 0)
    assert(zbad.nonEmpty && zbad.forall(r => r.getLong(1) == 0L && r.isNullAt(2)))
    assert(zgood.forall(r => r.getLong(1) == 1L && !r.isNullAt(3)))
    val wdz = run("mm_webdataset_zst").collect()
    assert(wdz.length == 500 && wdz.forall(_.getLong(5) == 2L))
    val warc = run("src_warc_records").collect()
    assert(warc.length == 500 && warc.forall(_.getString(1) == "response"))
    val wgz = run("src_warc_gz_e2e").collect()
    assert(wgz.length == 500 && wgz.forall(_.getString(2) == "response"))
    val wzs = run("src_warc_zst_e2e").collect()
    assert(wzs.length == 500 && wzs.forall(_.getString(2) == "response"))
  }

  test("sink_webdataset: written shard files are readable by system zstd + tar") {
    // run the sink (writes the dataset-keyed scratch dir and
    // round-trips internally)
    val rows = run("sink_webdataset").collect()
    assert(rows.length == 1000, s"2 members per doc: ${rows.length}")
    // every (split, shard) wrote exactly one .tar.zst object on disk
    val dir = new java.io.File(graft.sources.Archive.wdsScratch(sfDir, "wds"))
    val files = dir.listFiles().filter(_.getName.endsWith(".tar.zst"))
    val groups = rows.map(r => (r.getString(0), r.getLong(1))).toSet
    assert(files.length == groups.size, s"${files.length} files vs ${groups.size} groups")
    assert(files.map(_.getName).toSet ==
      groups.map { case (sp, sh) => s"$sp-$sh.tar.zst" })
    // the production consumer's view: system zstd decodes a shard, GNU
    // tar lists and extracts it, extracted bytes hash to the row's md5
    assume(zstdCli, "zstd CLI not installed on this host")
    val f = files.minBy(_.getName)
    val tmp = java.nio.file.Files.createTempDirectory("graft_wds").toFile
    val tarF = new java.io.File(tmp, "s.tar")
    val (rc0, _) = sh("sh", "-c",
      s"zstd -dc ${f.getAbsolutePath} > ${tarF.getAbsolutePath}")
    assert(rc0 == 0)
    val (rc1, listing) = sh("tar", "-tf", tarF.getAbsolutePath)
    assert(rc1 == 0, listing)
    val (sp, sh0) = {
      val m = "([a-z]+)-([0-9]+)\\.tar\\.zst".r.findFirstMatchIn(f.getName).get
      (m.group(1), m.group(2).toLong)
    }
    val want = rows.filter(r => r.getString(0) == sp && r.getLong(1) == sh0)
    assert(listing.split("\n").filter(_.nonEmpty).toSeq.sorted ==
      want.map(_.getString(2)).toSeq.sorted)
    val (rc2, _) = sh("tar", "-xf", tarF.getAbsolutePath, "-C", tmp.getAbsolutePath)
    assert(rc2 == 0)
    want.foreach { r =>
      val bytes = java.nio.file.Files.readAllBytes(
        new java.io.File(tmp, r.getString(2)).toPath)
      assert(bytes.length == r.getLong(4), s"size mismatch for ${r.getString(2)}")
      assert(md5hex(bytes) == r.getString(5), s"md5 mismatch for ${r.getString(2)}")
    }
  }

  test("sink_webdataset_sized: next-fit shards hold the byte-budget bounds") {
    import graft.sources.Archive
    val target = Archive.wdsSizedTarget
    val block = Archive.wdsSizedBlock
    val rows = run("sink_webdataset_sized").collect()
    assert(rows.length == 1000, s"2 members per doc: ${rows.length}")
    // reconstruct each shard's decompressed tar bytes and each doc's
    // contribution from the emitted member sizes (512-block arithmetic)
    def pad(sz: Long) = 512L + ((sz + 511L) / 512L) * 512L
    val docBytes = rows.groupBy(r => (r.getString(0), r.getLong(1),
        r.getString(2).split("\\.")(0).toLong))
      .map { case (_, ms) => ms.map(r => pad(r.getLong(4))).sum }
    val maxDoc = docBytes.max
    assert(maxDoc < target / 2,
      s"fixture docs too large for the budget claims: $maxDoc vs $target")
    val shardBytes = rows.groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case (k, ms) => k -> (1024L + ms.map(r => pad(r.getLong(4))).sum) }
    // next-fit bounds: every shard ≤ target + one max doc; every CLOSED
    // shard (not the last bin of its (split, block) group) ≥ target −
    // one max doc. The last bin per group is the documented waste.
    shardBytes.foreach { case (k, b) =>
      assert(b <= target + maxDoc, s"shard $k overflows: $b")
    }
    val lastPerGroup = shardBytes.keys
      .groupBy { case (sp, sh) => (sp, sh / block) }
      .map { case (_, ks) => ks.maxBy(_._2) }.toSet
    val closed = shardBytes.filterNot { case (k, _) => lastPerGroup(k) }
    assert(closed.nonEmpty, "fixture produced no closed bins — raise corpus or lower target")
    closed.foreach { case (k, b) =>
      assert(b >= target - maxDoc, s"closed shard $k underfull: $b")
    }
    // shard ids stay inside the EMITTING doc's block namespace: shard =
    // grp*block + bin with bin < block, so sh / block must equal the
    // doc's own doc_id / block (r14 ADVICE: sh % block < block was
    // vacuously true for every long)
    rows.foreach { r =>
      val sh = r.getLong(1)
      val docId = r.getString(2).split("\\.")(0).toLong
      assert(sh / block == docId / block,
        s"shard $sh escaped doc $docId's block namespace " +
          s"(expected block ${docId / block}, got ${sh / block})")
    }
  }

  test("webdataset sinks refuse a shard over the in-memory tar ceiling") {
    // the guard computes from payload LENGTHS before any tar bytes are
    // allocated, so crossing the ceiling is a clear raise_error — not a
    // negative-size array allocation mid-task. Exercised with a tiny
    // ceiling (materializing 2 GiB in a unit test is not practical);
    // the arithmetic is the same expression production runs.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Seq((0L, "x" * 64), (1L, "y" * 64))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("train").as("split"),
        lit(0L).as("shard"))
    val scratch = graft.sources.Archive.wdsScratch("spec_tiny", "wds_guard")
    // under the ceiling: builds and round-trips
    val ok = graft.sources.Archive.wdsBuild(s, docs, scratch)
    assert(ok.count() == 4L)
    // over a (mock) ceiling: fails loudly with the guard's message
    val ex = intercept[Exception] {
      graft.sources.Archive.wdsBuild(s, docs, scratch, ceiling = 1024L).count()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("in-memory shard ceiling"))),
      s"guard did not fire: $ex")
  }
}
