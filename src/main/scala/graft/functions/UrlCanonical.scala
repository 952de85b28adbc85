package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: raw URL string → RFC 3986-normalized
  * canonical form — the crawl-pipeline dedup key. Two syntactically
  * different URLs that fetch the same resource must canonicalize to the
  * SAME string, without over-collapsing URLs that genuinely differ
  * (scheme changes and non-default ports survive).
  *
  * Normalizations applied (RFC 3986 §6.2.2 syntax-based, plus the
  * standard crawl-side extensions):
  *   - scheme and host lowercased (§6.2.2.1);
  *   - default port dropped (http:80 / https:443), other ports kept;
  *   - percent-encodings of UNRESERVED bytes (ALPHA / DIGIT / - . _ ~)
  *     decoded, all remaining escapes uppercased `%2f`→`%2F` (§6.2.2.2);
  *   - dot-segments removed AFTER decoding (`/a/./b/../c` → `/a/c`,
  *     `%2E%2E` decodes to `..` first — the §6.2.2 ordering), empty
  *     path → `/`;
  *   - fragment dropped (never sent to the server);
  *   - query parameters: empty params dropped, tracking params dropped
  *     (`utm_*` prefix and the fixed set gclid / fbclid / msclkid /
  *     sessionid / phpsessid / jsessionid / sid), survivors sorted by
  *     (key, value) so parameter order cannot split a dedup group.
  *
  * Unparseable inputs (no `://`, empty or non-alpha scheme, empty host,
  * non-numeric port, malformed percent escape) return NULL — "no
  * canonical form" — mirroring the percept family's undecodable
  * contract. Scale shape: scan-fused per-row projection, zero shuffle,
  * zero allocation beyond the output builder.
  *
  * Reference tie: the reference ETL ingests arbitrary external objects
  * (packages/app/bundles/custom/aws/s3/s3-connector.ts:1) keyed by
  * caller-supplied names; URL-keyed web corpora are the training-data
  * analog, and canonicalization-before-dedup is the standard first
  * stage of every crawl pipeline.
  */
case class UrlCanonical(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_canonical needs a string child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UrlCanonical.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("canon")
      s"""
         |UTF8String $out = graft.functions.UrlCanonical.compute($c);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UrlCanonical =
    copy(child = newChild)
}

object UrlCanonical {

  /** Exact-match tracking keys (compared after lowercasing); `utm_` is
    * a prefix rule. A fixed, documented set — a production deployment
    * would make this a parameter, but the CANONICAL set must be stable
    * or historic dedup keys silently diverge. */
  private val TrackingKeys: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("gclid", "fbclid", "msclkid", "sessionid", "phpsessid",
      "jsessionid", "sid").foreach(s.add)
    s
  }

  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Percent-normalize one component: decode unreserved escapes,
    * uppercase the rest. Null (→ whole URL null) on a malformed escape. */
  private def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length) return null
        val h = hexVal(s.charAt(i + 1)); val l = hexVal(s.charAt(i + 2))
        if (h < 0 || l < 0) return null
        val b = (h << 4) | l
        if (isUnreserved(b)) out.append(b.toChar)
        else {
          out.append('%')
          out.append(java.lang.Character.toUpperCase(s.charAt(i + 1)))
          out.append(java.lang.Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over a decoded absolute path. */
  private def removeDotSegments(path: String): String = {
    val segs = new java.util.ArrayList[String]()
    var trailingSlash = path.endsWith("/")
    var i = 1 // path always starts with '/'
    while (i <= path.length) {
      val j = path.indexOf('/', i)
      val end = if (j < 0) path.length else j
      val seg = path.substring(i, end)
      if (seg == ".") trailingSlash = true
      else if (seg == "..") {
        if (!segs.isEmpty) segs.remove(segs.size - 1)
        trailingSlash = true
      } else if (seg.nonEmpty) { segs.add(seg); trailingSlash = j >= 0 }
      i = end + 1
    }
    val out = new java.lang.StringBuilder("/")
    var k = 0
    while (k < segs.size) {
      out.append(segs.get(k))
      if (k < segs.size - 1 || trailingSlash) out.append('/')
      k += 1
    }
    out.toString
  }

  /** Full canonicalization; null = no canonical form. Called from
    * generated code. */
  def compute(raw: UTF8String): UTF8String = {
    val url = raw.toString
    val sep = url.indexOf("://")
    if (sep <= 0) return null
    var i = 0
    while (i < sep) { // scheme: ALPHA only (RFC allows +-. after first;
      val c = url.charAt(i) // the canonical corpus never uses them)
      if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) return null
      i += 1
    }
    val scheme = url.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(sep + 3)
    // authority ends at the first of / ? #
    var aEnd = rest.length
    var p = 0
    while (p < aEnd) {
      val c = rest.charAt(p)
      if (c == '/' || c == '?' || c == '#') aEnd = p else p += 1
    }
    var auth = rest.substring(0, aEnd)
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    if (at >= 0) auth = auth.substring(at + 1)
    val colon = auth.indexOf(':')
    var host = if (colon >= 0) auth.substring(0, colon) else auth
    if (host.isEmpty) return null
    host = host.toLowerCase(java.util.Locale.ROOT)
    var port = ""
    if (colon >= 0) {
      val ps = auth.substring(colon + 1)
      if (ps.isEmpty || !ps.forall(c => c >= '0' && c <= '9')) return null
      val pn = try ps.toInt catch { case _: NumberFormatException => return null }
      val default = (scheme == "http" && pn == 80) || (scheme == "https" && pn == 443)
      if (!default) port = ":" + pn
    }
    // split the remainder into path / query, drop any fragment
    var tail = rest.substring(aEnd)
    val hash = tail.indexOf('#')
    if (hash >= 0) tail = tail.substring(0, hash)
    val qm = tail.indexOf('?')
    val rawPath = if (qm >= 0) tail.substring(0, qm) else tail
    val rawQuery = if (qm >= 0) tail.substring(qm + 1) else ""
    val decodedPath = pctNormalize(if (rawPath.isEmpty) "/" else rawPath)
    if (decodedPath == null) return null
    val path = removeDotSegments(decodedPath)
    // query: split on &, drop empties and tracking keys, sort survivors
    val kept = new java.util.ArrayList[String]()
    var q = 0
    while (q <= rawQuery.length) {
      val amp = rawQuery.indexOf('&', q)
      val end = if (amp < 0) rawQuery.length else amp
      if (end > q) {
        val param = pctNormalize(rawQuery.substring(q, end))
        if (param == null) return null
        val eq = param.indexOf('=')
        val key = (if (eq < 0) param else param.substring(0, eq))
          .toLowerCase(java.util.Locale.ROOT)
        if (!key.startsWith("utm_") && !TrackingKeys.contains(key))
          kept.add(param)
      }
      if (amp < 0) q = rawQuery.length + 1 else q = amp + 1
    }
    java.util.Collections.sort(kept)
    val out = new java.lang.StringBuilder(url.length)
    out.append(scheme).append("://").append(userinfo).append(host)
      .append(port).append(path)
    if (!kept.isEmpty) {
      out.append('?')
      var k = 0
      while (k < kept.size) {
        if (k > 0) out.append('&')
        out.append(kept.get(k))
        k += 1
      }
    }
    UTF8String.fromString(out.toString)
  }
}
