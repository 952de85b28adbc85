package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: WARC (ISO 28500) record walk — the
  * container web crawls actually ship in. A WARC file is a concatenation
  * of records, each `WARC/1.0\r\n` + header lines + `\r\n` + a body of
  * exactly `Content-Length` bytes + `\r\n\r\n`; the ONLY way to find
  * record N+1 is to parse record N's Content-Length and step over the
  * body by arithmetic (bodies are binary and can contain anything,
  * including `WARC/1.0` look-alikes — scanning for magic is wrong, and
  * the walk never reads body bytes).
  *
  * Output: one (type, uri, off, len) struct per record — `off`/`len`
  * frame the body so the caller slices or hashes it straight off the
  * blob column. Header names are case-insensitive per the spec. NULL on
  * any malformed record (bad version line, unterminated headers,
  * missing/garbage Content-Length, body overrunning the blob): a crawl
  * shard with a corrupt record is quarantined whole rather than
  * half-parsed. Records capped at 65536 per shard.
  *
  * Scale shape: scan-fused per-row projection, zero shuffle; per-task
  * memory bounded by one shard's header text.
  */
case class WarcRecords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WarcRecords.outType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"warc_records needs a binary child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WarcRecords.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("warc")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.WarcRecords.compute($c);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("rec_type", StringType, nullable = true),
    StructField("uri", StringType, nullable = true),
    StructField("off", LongType, nullable = false),
    StructField("len", LongType, nullable = false))), containsNull = false)

  val MaxRecords = 65536
  /** Header-block bound: real WARC headers run a few hundred bytes; a
    * "record" whose headers exceed this is hostile, not huge. */
  val MaxHeaderBytes = 65536

  /** Walk the record chain; null on malformation, empty array only for
    * an empty blob. Called from generated code. */
  def compute(blob: Array[Byte]): ArrayData = {
    val entries = new java.util.ArrayList[InternalRow]()
    var pos = 0L
    while (pos < blob.length) {
      if (entries.size() >= MaxRecords) return null
      val p = pos.toInt
      // version line
      if (!startsWith(blob, p, "WARC/1.") || p + 9 > blob.length ||
          blob(p + 7) < '0' || blob(p + 7) > '9' ||
          blob(p + 8) != '\r' || p + 9 >= blob.length || blob(p + 9) != '\n')
        return null
      var hp = p + 10
      var recType: String = null
      var uri: String = null
      var clen = -1L
      var open = true
      while (open) {
        if (hp - p > MaxHeaderBytes || hp + 1 >= blob.length) return null
        if (blob(hp) == '\r' && blob(hp + 1) == '\n') { hp += 2; open = false }
        else {
          val eol = findCrlf(blob, hp)
          if (eol < 0 || eol - p > MaxHeaderBytes) return null
          val colon = indexOf(blob, hp, eol, ':')
          if (colon < 0) return null
          val key = new String(blob, hp, colon - hp, "UTF-8").trim.toLowerCase
          val value = new String(blob, colon + 1, eol - colon - 1, "UTF-8").trim
          key match {
            case "warc-type" => recType = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              clen = try value.toLong catch { case _: NumberFormatException => return null }
            case _ => ()
          }
          hp = eol + 2
        }
      }
      if (clen < 0) return null // Content-Length is mandatory
      val bodyOff = hp.toLong
      val end = bodyOff + clen + 4 // body + \r\n\r\n record separator
      if (end > blob.length) return null
      if (blob((bodyOff + clen).toInt) != '\r' || blob((bodyOff + clen + 1).toInt) != '\n' ||
          blob((bodyOff + clen + 2).toInt) != '\r' || blob((bodyOff + clen + 3).toInt) != '\n')
        return null
      entries.add(new GenericInternalRow(Array[Any](
        if (recType == null) null else UTF8String.fromString(recType),
        if (uri == null) null else UTF8String.fromString(uri),
        bodyOff, clen)))
      pos = end
    }
    new GenericArrayData(entries.toArray(Array.empty[AnyRef]))
  }

  private def startsWith(blob: Array[Byte], p: Int, s: String): Boolean = {
    if (p + s.length > blob.length) return false
    var i = 0
    while (i < s.length) {
      if (blob(p + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def findCrlf(blob: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < blob.length) {
      if (blob(i) == '\r' && blob(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private def indexOf(blob: Array[Byte], from: Int, to: Int, c: Char): Int = {
    var i = from
    while (i < to) {
      if (blob(i) == c.toByte) return i
      i += 1
    }
    -1
  }
}
