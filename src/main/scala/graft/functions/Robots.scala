package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: robots.txt parse (RFC 9309) for one
  * crawler identity — the politeness gate every crawl-ingest pipeline
  * applies BEFORE a URL is fetched or admitted to a corpus.
  *
  * `robots_rules(txt, agent)` → the ordered `(allow, pattern)` rule list
  * that governs `agent`:
  *
  *  - lines split on LF (CR stripped), `#` comments removed, fields are
  *    `key: value` with a case-insensitive key;
  *  - consecutive `User-agent` lines form one group's agent set; the
  *    first RULE line (`Allow`/`Disallow`) closes the set, and a later
  *    `User-agent` line starts a NEW group (RFC 9309 §2.2.1 grouping).
  *    Non-rule records (`Sitemap`, unknown keys) are NEUTRAL — §2.2.4
  *    says other records must not interfere with group parsing, so a
  *    UA run split by a `Crawl-delay` line still forms one group;
  *  - group selection: all groups naming `agent` (case-insensitive
  *    product-token equality) if any EXIST, else all `*` groups — the
  *    RFC's most-specific-match collapsed to the exact/wildcard split,
  *    since graft crawls under a single product token. Existence, not
  *    rule-list emptiness, decides: `User-agent: bot` + `Disallow:`
  *    (the allow-everything idiom) REPLACES the `*` group with an
  *    empty rule list rather than falling back to it;
  *  - `Allow`/`Disallow` values are kept in file order; an EMPTY
  *    Disallow value is the RFC's "allow everything" idiom and yields
  *    no rule; unknown keys are ignored (the RFC demands tolerance).
  *
  * NULL only for NULL input. A site with no matching group returns an
  * empty list — "no rules, crawl everything" — distinct from NULL
  * ("no robots.txt fetched"), which callers default to allow.
  *
  * Hostile bounds: rules cap at [[RobotsRules.MaxRules]], patterns at
  * [[RobotsRules.MaxPatternBytes]] bytes (overlong values are dropped,
  * not truncated — a truncated prefix would match MORE than the site
  * asked to block). Scale shape: scan-fused, runs once per ROBOTS FILE
  * (site grain), never per URL.
  */
case class RobotsRules(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = RobotsRules.outType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_rules needs (string, string), got ($l, $r)")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(txt: Any, agent: Any): Any =
    RobotsRules.compute(txt.asInstanceOf[UTF8String], agent.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) => {
      val out = ctx.freshName("rules")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.RobotsRules.compute($t, $a);
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RobotsRules =
    copy(left = l, right = r)
}

object RobotsRules {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("pattern", StringType, nullable = false))), containsNull = false)

  val MaxRules = 1024
  val MaxPatternBytes = 2048

  /** Never null for non-null inputs. Called from generated code. */
  def compute(txt: UTF8String, agent: UTF8String): ArrayData = {
    val want = agent.toString.toLowerCase
    val lines = txt.toString.split('\n')
    // pass state: group agent set accumulates over consecutive UA lines;
    // the first rule line seals it
    val exact = new java.util.ArrayList[AnyRef]()
    val star = new java.util.ArrayList[AnyRef]()
    var groupHasExact = false
    var groupHasStar = false
    var sawExactGroup = false // a group naming `want` EXISTS (even rule-less)
    var inAgentRun = false
    var i = 0
    while (i < lines.length) {
      var line = lines(i)
      val hash = line.indexOf('#')
      if (hash >= 0) line = line.substring(0, hash)
      line = line.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!inAgentRun) { // a UA line after rules starts a new group
                groupHasExact = false; groupHasStar = false; inAgentRun = true
              }
              val v = value.toLowerCase
              if (v == "*") groupHasStar = true
              else if (v == want) { groupHasExact = true; sawExactGroup = true }
            case "allow" | "disallow" =>
              inAgentRun = false
              val allow = key == "allow"
              // empty Disallow = "allow everything": no rule; empty
              // Allow matches nothing under longest-match: also no rule
              if (value.nonEmpty &&
                  value.getBytes("UTF-8").length <= MaxPatternBytes) {
                val row = new GenericInternalRow(Array[Any](
                  allow, UTF8String.fromString(value)))
                if (groupHasExact && exact.size < MaxRules) exact.add(row)
                if (groupHasStar && star.size < MaxRules) star.add(row)
              }
            // non-rule records (sitemap, crawl-delay, unknown keys) are
            // NEUTRAL to grouping (RFC 9309 §2.2.4): they neither seal
            // the agent run nor start a group
            case _ =>
          }
        }
      }
      i += 1
    }
    // a PRESENT exact-agent group replaces `*` even when its rule list
    // is empty (the `Disallow:` allow-everything idiom) — select on
    // group EXISTENCE, never on rule-list emptiness
    val chosen = if (sawExactGroup) exact else star
    new GenericArrayData(chosen.toArray(Array.empty[AnyRef]))
  }
}

/** Native Catalyst expression: `Sitemap:` discovery from robots.txt.
  * Sitemap lines are NON-group records (RFC 9309 §2.2.2 "other
  * records"): they apply regardless of user-agent and may appear
  * anywhere in the file, so this walk is agent-free and group-blind.
  * Values are kept verbatim in file order (they are absolute URLs by
  * spec — canonicalization is the caller's next step), capped at
  * [[RobotsRules.MaxRules]] entries and [[RobotsRules.MaxPatternBytes]]
  * bytes each. NULL only for NULL input; a file with no Sitemap lines
  * yields an empty list.
  */
case class RobotsSitemaps(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_sitemaps needs a string child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(txt: Any): Any =
    RobotsSitemaps.compute(txt.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.RobotsSitemaps.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): RobotsSitemaps =
    copy(child = newChild)
}

object RobotsSitemaps {
  /** Never null for non-null input. Called from generated code. */
  def compute(txt: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    val lines = txt.toString.split('\n')
    var i = 0
    while (i < lines.length && out.size < RobotsRules.MaxRules) {
      var line = lines(i)
      val hash = line.indexOf('#')
      if (hash >= 0) line = line.substring(0, hash)
      line = line.trim
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim.toLowerCase == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty && v.getBytes("UTF-8").length <= RobotsRules.MaxPatternBytes)
          out.add(UTF8String.fromString(v))
      }
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }
}

/** Native Catalyst expression: RFC 9309 rule matching for one URL path.
  *
  * `robots_allowed(rules, path)` → true iff `path` (the URL's path +
  * query) survives the rule list `robots_rules` produced:
  *
  *  - a rule matches when its pattern matches a PREFIX of the path,
  *    with `*` spanning any byte run and a TRAILING `$` anchoring the
  *    match to the full path (mid-pattern `$` is literal);
  *  - the most specific match decides — specificity is pattern byte
  *    length (the published Google semantics for the RFC's
  *    "most specific rule"); an allow/disallow TIE at equal length
  *    resolves to allow;
  *  - no matching rule → allowed (crawl-by-default).
  *
  * NULL rules (no robots.txt) → NULL; callers coalesce to true. Scale
  * shape: per-row loop over a site's (small, capped) rule list after
  * the rules were parsed ONCE at site grain — the 100 TB join shape is
  * broadcast(sites) ⋈ urls with this expression fused into the probe
  * side projection.
  */
case class RobotsAllowed(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(s: StructType, _), StringType)
        if s.length == 2 && s(0).dataType == BooleanType &&
           s(1).dataType == StringType => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_allowed needs (array<struct<allow:boolean,pattern:string>>, string), got ($l, $r)")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(rules: Any, path: Any): Any =
    RobotsAllowed.compute(rules.asInstanceOf[ArrayData], path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, p) => {
      s"${ev.value} = graft.functions.RobotsAllowed.compute($r, $p);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RobotsAllowed =
    copy(left = l, right = r)
}

object RobotsAllowed {

  /** Wildcard prefix match: does `pat` match a prefix of `path`
    * (or, with a trailing `$`, all of it)? Iterative `*` backtracking —
    * linear in practice, worst-case O(n·m) on adversarial patterns
    * bounded by [[RobotsRules.MaxPatternBytes]]. */
  def patternMatches(pat: Array[Byte], path: Array[Byte]): Boolean = {
    var pEnd = pat.length
    val anchored = pEnd > 0 && pat(pEnd - 1) == '$'
    if (anchored) pEnd -= 1
    // empty unanchored pattern is a prefix of everything; the scan loop
    // below only detects prefix exhaustion AFTER a consume, so short-
    // circuit here (an anchored "$" still requires the empty path)
    if (pEnd == 0 && !anchored) return true
    var pi = 0      // pattern index
    var si = 0      // path index
    var starPi = -1 // pattern index after the last '*'
    var starSi = -1 // path index that '*' is currently consuming to
    while (si < path.length) {
      if (pi < pEnd && pat(pi) == '*') { starPi = pi + 1; starSi = si; pi += 1 }
      else if (pi < pEnd && pat(pi) == path(si)) { pi += 1; si += 1 }
      else if (starPi >= 0) { starSi += 1; si = starSi; pi = starPi }
      else return false
      // unanchored: pattern exhausted on a prefix = match
      if (pi == pEnd && !anchored) return true
    }
    // path exhausted: remaining pattern must be only '*'s
    while (pi < pEnd && pat(pi) == '*') pi += 1
    pi == pEnd
  }

  /** Called from generated code. */
  def compute(rules: ArrayData, path: UTF8String): Boolean = {
    val p = path.getBytes
    var bestLen = -1
    var bestAllow = true
    var i = 0
    val n = rules.numElements()
    while (i < n) {
      val row = rules.getStruct(i, 2)
      val allow = row.getBoolean(0)
      val pat = row.getUTF8String(1).getBytes
      if (patternMatches(pat, p)) {
        if (pat.length > bestLen) { bestLen = pat.length; bestAllow = allow }
        else if (pat.length == bestLen && allow) bestAllow = true // tie -> allow
      }
      i += 1
    }
    bestAllow
  }
}
