package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native Catalyst expressions for gzip members — crawl corpora arrive
  * gzip-compressed at the RECORD level (each WARC record its own member),
  * where Spark's whole-file `.gz` codec support doesn't reach: the
  * decompression has to happen per binary VALUE inside the plan.
  *
  *  - [[GzipBytes]] writes a real RFC 1952 member: 10-byte header with
  *    MTIME pinned to 0 (deterministic output for a given zlib), raw
  *    DEFLATE body, CRC32 + ISIZE trailer. The `gzip` CLI decompresses
  *    its output (pinned in ArchiveSpec).
  *  - [[GunzipBytes]] inflates one member and VERIFIES the trailer: CRC32
  *    and ISIZE both checked, so a flipped payload byte — or a flipped
  *    trailer byte — returns NULL rather than silently surfacing corrupt
  *    text. Output capped at 64 MiB (decompression-bomb gate; a member
  *    claiming or producing more returns NULL). Multi-member
  *    concatenations decode their FIRST member (the per-record framing
  *    this pair exists for keeps one record per member).
  *
  * Scale shape: scan-fused per-row projections, zero shuffle, memory
  * bounded by one member's declared size.
  */
case class GzipBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gzip_bytes needs a binary child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    GzipBytes.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipBytes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GzipBytes =
    copy(child = newChild)
}

object GzipBytes {

  /** Encode one member. Called from generated code. */
  def compute(data: Array[Byte]): Array[Byte] = {
    val def_ = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    val body = try {
      def_.setInput(data)
      def_.finish()
      val buf = new Array[Byte](math.max(64, data.length / 2))
      val out = new java.io.ByteArrayOutputStream(buf.length + 18)
      while (!def_.finished()) {
        val k = def_.deflate(buf)
        out.write(buf, 0, k)
      }
      out.toByteArray
    } finally def_.end()
    val crc = new java.util.zip.CRC32
    crc.update(data)
    val out = new Array[Byte](10 + body.length + 8)
    out(0) = 0x1f; out(1) = 0x8b.toByte; out(2) = 8 // magic + deflate
    // flags/mtime/xfl 0 (deterministic), OS 255 (unknown)
    out(9) = 0xff.toByte
    System.arraycopy(body, 0, out, 10, body.length)
    le32(out, 10 + body.length, crc.getValue)
    le32(out, 14 + body.length, data.length.toLong & 0xffffffffL)
    out
  }

  private def le32(b: Array[Byte], p: Int, v: Long): Unit = {
    b(p) = v.toByte; b(p + 1) = (v >>> 8).toByte
    b(p + 2) = (v >>> 16).toByte; b(p + 3) = (v >>> 24).toByte
  }
}

/** See [[GzipBytes]]'s scaladoc — this is the decode half. */
case class GunzipBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gunzip_bytes needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    GunzipBytes.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("gun")
      s"""
         |byte[] $out = graft.functions.GunzipBytes.compute($c);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GunzipBytes =
    copy(child = newChild)
}

object GunzipBytes {

  /** Decompression-bomb gate (shared bound with [[ZipEntries]]). */
  val MaxBytes: Long = 64L << 20

  /** Decode + verify one member; null on any malformation, bad CRC/ISIZE,
    * or the bomb gate. Called from generated code. */
  def compute(blob: Array[Byte]): Array[Byte] = {
    val m = member(blob, 0)
    if (m == null) null else m._1
  }

  /** Decode + verify ONE member starting at `start`; (data, end offset)
    * or null. The multi-member walk [[GunzipMembers]] shares this body —
    * member boundaries in a concatenation are only discoverable by
    * decompressing, which is how zcat/WARC readers find them too. */
  private[functions] def member(blob: Array[Byte], start: Int): (Array[Byte], Int) = {
    if (start + 18 > blob.length || blob(start) != 0x1f ||
        blob(start + 1) != 0x8b.toByte || blob(start + 2) != 8) return null
    val flg = blob(start + 3) & 0xff
    if ((flg & 0xe0) != 0) return null // reserved bits must be zero
    var p = start + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > blob.length) return null
      p += 2 + ((blob(p) & 0xff) | ((blob(p + 1) & 0xff) << 8))
    }
    if ((flg & 8) != 0) p = skipZ(blob, p)  // FNAME
    if ((flg & 16) != 0) p = skipZ(blob, p) // FCOMMENT
    if ((flg & 2) != 0) p += 2              // FHCRC
    if (p < 0 || p + 8 >= blob.length) return null
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(blob, p, blob.length - p)
      val out = new java.io.ByteArrayOutputStream(math.min(blob.length * 4L, 1L << 16).toInt)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0) {
          if (!inf.finished()) return null // truncated or needs-dict
        } else {
          if (out.size().toLong + k > MaxBytes) return null
          out.write(buf, 0, k)
        }
      }
      val data = out.toByteArray
      // trailer sits immediately after the deflate stream's last byte
      val consumed = inf.getBytesRead
      if (consumed > Int.MaxValue - p) return null
      val tp = p + consumed.toInt
      if (tp + 8 > blob.length) return null
      val crc = new java.util.zip.CRC32
      crc.update(data)
      if (le32(blob, tp) != crc.getValue) return null
      if (le32(blob, tp + 4) != (data.length.toLong & 0xffffffffL)) return null
      (data, tp + 8)
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** Skip a NUL-terminated optional field; negative sentinel on overrun. */
  private def skipZ(blob: Array[Byte], from: Int): Int = {
    if (from < 0) return -1
    var p = from
    while (p < blob.length && blob(p) != 0) p += 1
    if (p >= blob.length) -1 else p + 1
  }

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
}

/** Native Catalyst expression: CONCATENATED gzip members → one binary
  * element per member, decompressed and trailer-verified — the
  * `.warc.gz` layout CommonCrawl actually publishes (each WARC record
  * its own gzip member, members back-to-back in one object, so a reader
  * can seek to any member and inflate one record). Member boundaries
  * are only discoverable by decompressing — exactly what zcat does —
  * via the shared [[GunzipBytes.member]] body, so every member gets the
  * same CRC32+ISIZE verification. NULL on any bad member (one corrupt
  * record quarantines the shard — the caller can fall back to
  * per-member salvage by slicing). Bounds: 65536 members, 64 MiB per
  * member, 256 MiB decompressed per shard.
  *
  * Scale shape: scan-fused per-row projection, zero shuffle; the
  * explode that follows is bounded by one shard's record count.
  */
case class GunzipMembers(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(BinaryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gunzip_members needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    GunzipMembers.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("gzm")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.GunzipMembers.compute($c);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GunzipMembers =
    copy(child = newChild)
}

object GunzipMembers {

  val MaxMembers = 65536
  val MaxTotalBytes: Long = 256L << 20

  /** Decode every member in the concatenation; empty array for an empty
    * blob, null on any malformed member or a cap breach. Called from
    * generated code. */
  def compute(blob: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    var pos = 0
    var total = 0L
    while (pos < blob.length) {
      if (out.size() >= MaxMembers) return null
      val m = GunzipBytes.member(blob, pos)
      if (m == null) return null
      total += m._1.length
      if (total > MaxTotalBytes) return null
      out.add(m._1)
      pos = m._2
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(Array.empty[AnyRef]))
  }
}
