package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for POSIX ustar archives — the container
  * format every WebDataset-style multimodal training shard ships in
  * (thousands of `{key}.{ext}` members per tar, samples assembled by
  * grouping members on `key`). Two halves:
  *
  *  - [[TarBuild]] writes a REAL ustar archive from parallel name/payload
  *    arrays: full 512-byte headers (octal size/mode/mtime fields, the
  *    space-seeded checksum, `ustar\0` magic) + 512-padded payloads + the
  *    two-zero-block trailer. GNU `tar -tvf` lists its output (pinned in
  *    ArchiveSpec), so the builder is validated against the reference
  *    implementation, not just this file's own parser.
  *  - [[TarEntries]] walks an archive's header chain: checksum-verified
  *    512-byte headers, octal size parse, POSIX `prefix` joining, regular
  *    files emitted as (name, payload offset, size) structs. The walk
  *    reads ONLY headers — a multi-GB member is stepped over by
  *    arithmetic, never scanned — and hostile payloads (bad checksum,
  *    truncated member, unterminated chain) return NULL rather than
  *    emitting garbage rows.
  *
  * Scale shape: both are scan-fused per-row projections (zero shuffle);
  * at 100 TB the ingest is `spark.read.format("binaryFile")` over the
  * shard store → `tar_entries` → one bounded explode per shard, i.e.
  * embarrassingly parallel with per-task memory bounded by one shard.
  * Reference tie: container-agnostic object-store ingest
  * (packages/app/bundles/custom/aws/s3/s3-connector.ts:1) — the reference
  * streams whole objects; the shard-member walk is the Spark-native shape
  * of the same ingest at training-data scale.
  */
case class TarBuild(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(BinaryType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"tar_build needs (array<string>, array<binary>), got ($l, $r)")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(names: Any, payloads: Any): Any =
    TarBuild.compute(names.asInstanceOf[ArrayData], payloads.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("tarb")
      s"""
         |byte[] $out = graft.functions.TarBuild.compute($a, $b);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): TarBuild =
    copy(left = l, right = r)
}

object TarBuild {

  /** Encode one archive; null if the member lists are mismatched, a name
    * is null/overlong, or a payload is null. Called from generated code. */
  def compute(names: ArrayData, payloads: ArrayData): Array[Byte] = {
    val n = names.numElements()
    if (n != payloads.numElements()) return null
    var total = 1024L // trailer
    var i = 0
    while (i < n) {
      if (names.isNullAt(i) || payloads.isNullAt(i)) return null
      val name = names.getUTF8String(i)
      if (name.numBytes() < 1 || name.numBytes() > 100) return null
      val sz = payloads.getBinary(i).length.toLong
      total += 512L + ((sz + 511L) / 512L) * 512L
      if (total > Int.MaxValue - 8) return null
      i += 1
    }
    val out = new Array[Byte](total.toInt)
    var pos = 0
    i = 0
    while (i < n) {
      val nameB = names.getUTF8String(i).getBytes
      val payload = payloads.getBinary(i)
      writeHeader(out, pos, nameB, payload.length)
      System.arraycopy(payload, 0, out, pos + 512, payload.length)
      pos += 512 + ((payload.length + 511) / 512) * 512
      i += 1
    }
    out // trailing 1024 bytes stay zero — the end-of-archive marker
  }

  /** One 512-byte ustar header at `pos`: NUL-padded name, octal numeric
    * fields, the checksum computed with its own field as 8 spaces (the
    * spec's seeding rule), typeflag '0', `ustar\0` + "00" version. */
  private def writeHeader(out: Array[Byte], pos: Int, name: Array[Byte], size: Int): Unit = {
    System.arraycopy(name, 0, out, pos, name.length)
    octal(out, pos + 100, 7, 420 /* 0644 */)      // mode
    octal(out, pos + 108, 7, 0)                   // uid
    octal(out, pos + 116, 7, 0)                   // gid
    octal(out, pos + 124, 11, size)               // size
    octal(out, pos + 136, 11, 0)                  // mtime (epoch: deterministic)
    java.util.Arrays.fill(out, pos + 148, pos + 156, ' '.toByte) // chksum seed
    out(pos + 156) = '0'                          // typeflag: regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, out, pos + 257, 5)
    out(pos + 263) = '0'; out(pos + 264) = '0'    // version
    var sum = 0L
    var j = pos
    while (j < pos + 512) { sum += out(j) & 0xff; j += 1 }
    octal(out, pos + 148, 6, sum)                 // 6 digits + NUL (+ trailing space)
    out(pos + 155) = ' '
  }

  /** `digits`-wide zero-padded octal + NUL terminator. */
  private def octal(out: Array[Byte], pos: Int, digits: Int, v: Long): Unit = {
    var x = v
    var j = pos + digits - 1
    while (j >= pos) { out(j) = ('0' + (x & 7L)).toByte; x >>= 3; j -= 1 }
    out(pos + digits) = 0
  }
}

/** See [[TarBuild]]'s scaladoc — this is the parse half. */
case class TarEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TarEntries.outType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tar_entries needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TarEntries.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("tare")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.TarEntries.compute($c);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TarEntries =
    copy(child = newChild)
}

object TarEntries {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("off", LongType, nullable = false),
    StructField("size", LongType, nullable = false))), containsNull = false)

  /** Member-count backstop far above any real shard (WebDataset shards
    * run ~10k members); a forged chain of empty members stops here. */
  val MaxEntries = 65536

  /** Walk the header chain; null on any malformed header (the whole
    * archive is suspect once one checksum fails), empty array for an
    * archive with no regular-file members. Called from generated code. */
  def compute(blob: Array[Byte]): ArrayData = {
    val entries = new java.util.ArrayList[InternalRow]()
    var pos = 0L
    var n = 0
    while (pos + 512 <= blob.length) {
      val p = pos.toInt
      if (isZeroBlock(blob, p)) return new GenericArrayData(entries.toArray(Array.empty[AnyRef]))
      // checksum first: sum all 512 bytes with the checksum field itself
      // read as 8 spaces, compared against the field's octal value
      val declared = octal(blob, p + 148, 8)
      if (declared < 0) return null
      var sum = 0L
      var j = p
      while (j < p + 512) {
        sum += (if (j - p >= 148 && j - p < 156) ' '.toInt else blob(j) & 0xff)
        j += 1
      }
      if (sum != declared) return null
      val size = octal(blob, p + 124, 12)
      if (size < 0) return null
      val next = pos + 512L + ((size + 511L) / 512L) * 512L
      if (next > blob.length) return null // truncated member
      val tf = blob(p + 156)
      if (tf == '0' || tf == 0) {
        if (n >= MaxEntries) return null
        entries.add(new GenericInternalRow(Array[Any](
          UTF8String.fromString(memberName(blob, p)), pos + 512L, size)))
        n += 1
      }
      pos = next
    }
    // a well-formed archive ends in zero blocks; running off the end
    // means the chain is truncated or the blob is not a tar at all
    null
  }

  private def isZeroBlock(blob: Array[Byte], p: Int): Boolean = {
    var j = p
    while (j < p + 512) { if (blob(j) != 0) return false; j += 1 }
    true
  }

  /** NUL-terminated name field, joined under the POSIX `prefix` field
    * when one is present (ustar's long-path split). */
  private def memberName(blob: Array[Byte], p: Int): String = {
    val name = asciiZ(blob, p, 100)
    val isUstar = blob(p + 257) == 'u' && blob(p + 258) == 's' &&
      blob(p + 259) == 't' && blob(p + 260) == 'a' && blob(p + 261) == 'r'
    val prefix = if (isUstar) asciiZ(blob, p + 345, 155) else ""
    if (prefix.isEmpty) name else prefix + "/" + name
  }

  private def asciiZ(blob: Array[Byte], p: Int, max: Int): String = {
    var n = 0
    while (n < max && blob(p + n) != 0) n += 1
    new String(blob, p, n, "UTF-8")
  }

  /** Octal numeric field: leading spaces tolerated, digits, terminated by
    * NUL or space (both appear in the wild); -1 on anything else. GNU
    * base-256 (high bit set) is rejected — members past 8 GiB are outside
    * this parser's contract and fail safe. */
  private def octal(blob: Array[Byte], p: Int, width: Int): Long = {
    var i = p
    val end = p + width
    while (i < end && blob(i) == ' ') i += 1
    var v = 0L
    var any = false
    while (i < end && blob(i) >= '0' && blob(i) <= '7') {
      v = (v << 3) | (blob(i) - '0').toLong
      if (v < 0) return -1
      any = true
      i += 1
    }
    while (i < end && (blob(i) == 0 || blob(i) == ' ')) i += 1
    if (!any || i != end && blob(i) != 0) return -1
    v
  }
}
