package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for ZIP archives — the second shard
  * container after [[TarBuild]]/[[TarEntries]] (datasets ship as zips as
  * often as tars, and unlike tar the format carries per-member CRC32s the
  * reader is expected to verify).
  *
  *  - [[ZipBuild]] writes a REAL archive of STORED members: local file
  *    headers with computed CRC32s, the central directory, and the end-
  *    of-central-directory record. `java.util.zip.ZipFile` and the
  *    `unzip` CLI both read its output (pinned in ArchiveSpec).
  *  - [[ZipEntries]] reads the way a real extractor does: find the EOCD
  *    by scanning the tail window, walk the CENTRAL directory (the
  *    authoritative index — local headers alone can't list a zip), chase
  *    each entry's local-header offset for the payload position, inflate
  *    DEFLATE (method 8) members through `java.util.zip.Inflater`, and
  *    verify every member's CRC32 against the directory's claim. Output
  *    per member: (name, payload offset, size, crc_ok, payload_md5) with
  *    the md5 over the UNCOMPRESSED bytes — the identity a dedup pass
  *    keys on. NULL on structural corruption; `crc_ok=false` (not a
  *    dropped row) on payload corruption, so a quarantine pass can route
  *    bad members while keeping good siblings.
  *
  * Bounds: 65536 members, 64 MiB decompressed per member (the
  * decompression-bomb gate — a 42.zip-style member returns crc_ok=false
  * rather than an allocation). Scale shape: scan-fused per-row
  * projection, zero shuffle; one shard's members bound per-task memory.
  */
case class ZipBuild(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(BinaryType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"zip_build needs (array<string>, array<binary>), got ($l, $r)")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(names: Any, payloads: Any): Any =
    ZipBuild.compute(names.asInstanceOf[ArrayData], payloads.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("zipb")
      s"""
         |byte[] $out = graft.functions.ZipBuild.compute($a, $b);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZipBuild =
    copy(left = l, right = r)
}

object ZipBuild {

  /** Encode one stored-member archive; null on mismatched/null inputs or
    * an archive that would exceed 2 GiB. Called from generated code. */
  def compute(names: ArrayData, payloads: ArrayData): Array[Byte] = {
    val n = names.numElements()
    if (n != payloads.numElements()) return null
    if (n > 0xffff) return null // EOCD counts are u16; zip64 out of contract
    var local = 0L
    var cd = 22L // EOCD
    var i = 0
    while (i < n) {
      if (names.isNullAt(i) || payloads.isNullAt(i)) return null
      val nl = names.getUTF8String(i).numBytes()
      if (nl < 1 || nl > 0xffff) return null
      val sz = payloads.getBinary(i).length.toLong
      if (sz > 0xffffffffL) return null // zip64 out of contract
      local += 30L + nl + sz
      cd += 46L + nl
      i += 1
    }
    if (local + cd > Int.MaxValue - 8) return null
    val out = new Array[Byte]((local + cd).toInt)
    val crcs = new Array[Int](n)
    val offs = new Array[Int](n)
    var pos = 0
    i = 0
    while (i < n) {
      val name = names.getUTF8String(i).getBytes
      val payload = payloads.getBinary(i)
      val crc = new java.util.zip.CRC32
      crc.update(payload)
      crcs(i) = crc.getValue.toInt
      offs(i) = pos
      u32(out, pos, 0x04034b50)            // local file header
      u16(out, pos + 4, 20); u16(out, pos + 6, 0); u16(out, pos + 8, 0) // ver/flags/stored
      u16(out, pos + 10, 0); u16(out, pos + 12, 0x21) // DOS time 0, date 1980-01-01
      u32(out, pos + 14, crcs(i))
      u32(out, pos + 18, payload.length); u32(out, pos + 22, payload.length)
      u16(out, pos + 26, name.length); u16(out, pos + 28, 0)
      System.arraycopy(name, 0, out, pos + 30, name.length)
      System.arraycopy(payload, 0, out, pos + 30 + name.length, payload.length)
      pos += 30 + name.length + payload.length
      i += 1
    }
    val cdStart = pos
    i = 0
    while (i < n) {
      val name = names.getUTF8String(i).getBytes
      val sz = payloads.getBinary(i).length
      u32(out, pos, 0x02014b50)            // central directory header
      u16(out, pos + 4, 20); u16(out, pos + 6, 20); u16(out, pos + 8, 0)
      u16(out, pos + 10, 0)                // stored
      u16(out, pos + 12, 0); u16(out, pos + 14, 0x21)
      u32(out, pos + 16, crcs(i)); u32(out, pos + 20, sz); u32(out, pos + 24, sz)
      u16(out, pos + 28, name.length)      // name len; extra/comment/disk/attrs stay 0
      u32(out, pos + 42, offs(i))          // local header offset
      System.arraycopy(name, 0, out, pos + 46, name.length)
      pos += 46 + name.length
      i += 1
    }
    u32(out, pos, 0x06054b50)              // EOCD
    u16(out, pos + 8, n); u16(out, pos + 10, n)
    u32(out, pos + 12, pos - cdStart); u32(out, pos + 16, cdStart)
    out
  }

  private def u16(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = v.toByte; b(p + 1) = (v >>> 8).toByte
  }
  private def u32(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = v.toByte; b(p + 1) = (v >>> 8).toByte
    b(p + 2) = (v >>> 16).toByte; b(p + 3) = (v >>> 24).toByte
  }
}

/** See [[ZipBuild]]'s scaladoc — this is the read half. */
case class ZipEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ZipEntries.outType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zip_entries needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ZipEntries.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("zipe")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.ZipEntries.compute($c);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ZipEntries =
    copy(child = newChild)
}

object ZipEntries {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("off", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("crc_ok", BooleanType, nullable = false),
    StructField("payload_md5", StringType, nullable = true))), containsNull = false)

  val MaxEntries = 65536
  /** Decompression-bomb gate: members claiming (or inflating to) more
    * than this stop verifying and report crc_ok=false, md5 null. */
  val MaxMemberBytes: Long = 64L << 20

  /** Walk EOCD → central directory → local headers; null on structural
    * corruption, per-member crc_ok=false on payload corruption. Called
    * from generated code. */
  def compute(blob: Array[Byte]): ArrayData = {
    val eocd = findEocd(blob)
    if (eocd < 0) return null
    val count = u16(blob, eocd + 10)
    val cdOff = u32(blob, eocd + 16)
    if (count > MaxEntries || cdOff + 46L > blob.length && count > 0) return null
    val entries = new Array[InternalRow](count)
    var p = cdOff.toInt
    var i = 0
    while (i < count) {
      if (p + 46 > eocd || u32s(blob, p) != 0x02014b50) return null
      val method = u16(blob, p + 10)
      val crc = u32(blob, p + 16)
      val csize = u32(blob, p + 20)
      val usize = u32(blob, p + 24)
      val nameLen = u16(blob, p + 28)
      val extraLen = u16(blob, p + 30)
      val commentLen = u16(blob, p + 32)
      val lho = u32(blob, p + 42)
      if (p + 46 + nameLen > eocd) return null
      val name = new String(blob, p + 46, nameLen, "UTF-8")
      // local header: its OWN name/extra lengths position the payload
      // (extractors must not trust the central copy for these)
      if (lho + 30L > blob.length || u32s(blob, lho.toInt) != 0x04034b50) return null
      val lp = lho.toInt
      val off = lho + 30L + u16(blob, lp + 26) + u16(blob, lp + 28)
      if (off + csize > blob.length) return null
      val (ok, md5) = verify(blob, off.toInt, csize.toInt, usize, method, crc)
      entries(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(name), off, usize,
        ok, if (md5 == null) null else UTF8String.fromString(md5)))
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    new GenericArrayData(entries.asInstanceOf[Array[AnyRef]])
  }

  /** Decompress (method 8) or slice (method 0), then CRC32 + md5 over
    * the uncompressed bytes. (false, null) on unsupported method, bomb
    * gate, inflate error, or CRC mismatch. */
  private def verify(blob: Array[Byte], off: Int, csize: Int, usize: Long,
                     method: Int, crcClaim: Long): (Boolean, String) = {
    if (usize > MaxMemberBytes) return (false, null)
    val data: Array[Byte] = method match {
      case 0 =>
        if (csize != usize) return (false, null)
        java.util.Arrays.copyOfRange(blob, off, off + csize)
      case 8 =>
        val inf = new java.util.zip.Inflater(true) // raw deflate: zip strips the zlib wrapper
        try {
          // nowrap inflaters need one dummy byte past the stream end
          // (java.util.zip.Inflater javadoc; ZipInputStream does the same)
          inf.setInput(java.util.Arrays.copyOfRange(blob, off, off + csize + 1))
          val out = new Array[Byte](usize.toInt)
          var done = 0
          val probe = new Array[Byte](1)
          var ok = false
          var loop = true
          while (loop) {
            if (inf.finished()) { ok = done == out.length; loop = false }
            else if (done < out.length) {
              val k = inf.inflate(out, done, out.length - done)
              done += k
              if (k == 0 && !inf.finished() && inf.needsInput()) loop = false // truncated
            } else {
              // claimed size reached: any further byte means the stream
              // lied about usize (bomb-shaped) — fail the member
              loop = false
              ok = inf.inflate(probe) == 0 && inf.finished()
            }
          }
          if (!ok) return (false, null)
          out
        } catch {
          case _: java.util.zip.DataFormatException => return (false, null)
        } finally inf.end()
      case _ => return (false, null)
    }
    val crc = new java.util.zip.CRC32
    crc.update(data)
    if (crc.getValue != crcClaim) return (false, null)
    val md = java.security.MessageDigest.getInstance("MD5")
    (true, md.digest(data).map("%02x".format(_)).mkString)
  }

  /** EOCD scan: the fixed 22-byte record plus up to a 64 KiB trailing
    * comment — scan backwards over exactly that window. */
  private def findEocd(blob: Array[Byte]): Int = {
    var p = blob.length - 22
    val floor = math.max(0, blob.length - 22 - 0xffff)
    while (p >= floor) {
      if (u32s(blob, p) == 0x06054b50 &&
          p + 22 + u16(blob, p + 20) == blob.length) return p
      p -= 1
    }
    -1
  }

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def u32s(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
}
