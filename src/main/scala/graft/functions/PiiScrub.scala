package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: typed PII detection + redaction in ONE
  * byte walk — the standard pre-training scrub pass (C4/Dolma-style),
  * upgraded from the blanket-regex `text_pii_mask` to typed, VALIDATED
  * matches: only text that verifiably IS an email / phone / IPv4 /
  * payment-card number is replaced, so order ids, timestamps and other
  * digit runs survive untouched.
  *
  * Output struct: `masked` (the input with each match replaced by
  * `<EMAIL>` / `<PHONE>` / `<IP>` / `<CARD>`) plus per-type match
  * counts.
  *
  * Token grammar (all patterns are pure ASCII, so the walk is
  * byte-oriented and UTF-8 continuation bytes can never alias into a
  * match; a non-ASCII byte is treated as a NON-boundary, i.e. PII must
  * be delimited by ASCII punctuation/whitespace or the string edges):
  *
  *  - EMAIL: `local@domain` at a word boundary — local is
  *    `[A-Za-z0-9._%+-]+`; domain is 2+ dot-separated labels of
  *    `[A-Za-z0-9-]`, each starting alphanumeric, the final label
  *    alphabetic with length >= 2 (a real TLD); the char after the
  *    domain must not extend it.
  *  - NUMBER TOKEN: starts at a boundary with a digit, `+digit`, or
  *    `(digit`; extends over digits, bridging runs of at most TWO
  *    separator bytes (`- . space ( ) /`) ONLY when a digit follows
  *    (so a trailing sentence period is never consumed). The whole
  *    token is then classified once — a failed candidate is copied
  *    verbatim and never re-scanned from the middle:
  *      1. CARD:  13..19 digits, no `+` prefix, Luhn checksum valid.
  *         Plain, spaced and dashed groupings all collapse to one
  *         token (`4111 1111 1111 1111` is ONE card).
  *      2. IPV4:  digits-and-dots only, exactly 4 groups of 1-3
  *         digits, every octet <= 255 (so `10.9.299.1` is NOT an IP).
  *      3. PHONE: 10..15 digits WITH at least one separator or a `+`
  *         prefix (E.164 max length). A bare digit run is never a
  *         phone — that rule is what keeps ids/epochs in the clear.
  *
  * Deliberate, documented over-trigger: a bare 13-19 digit run that
  * happens to pass Luhn masks as CARD (the accepted ~10% FP rate of
  * every Luhn-gated scrubber); everything else fails closed.
  *
  * Scale shape: scan-fused per-row projection, zero shuffle, one output
  * buffer per row; placeholders are at most 7 bytes so the output never
  * exceeds input length + 7 per match.
  */
case class PiiScrub(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PiiScrub.outType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_scrub needs a string child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PiiScrub.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("pii")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $out =
         |  graft.functions.PiiScrub.compute($c);
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}

object PiiScrub {

  val outType: DataType = StructType(Seq(
    StructField("masked", StringType, nullable = false),
    StructField("emails", IntegerType, nullable = false),
    StructField("phones", IntegerType, nullable = false),
    StructField("ips", IntegerType, nullable = false),
    StructField("cards", IntegerType, nullable = false)))

  private val Email = "<EMAIL>".getBytes
  private val Phone = "<PHONE>".getBytes
  private val Ip = "<IP>".getBytes
  private val Card = "<CARD>".getBytes

  /** Longest classifiable token: 19 card digits in 4-5 groups with
    * double separators never exceeds this; longer digit masses are
    * copied verbatim (they cannot be any PII type). */
  private val MaxDigits = 24

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def isAlnum(b: Byte): Boolean = isDigit(b) || isAlpha(b)
  /** ASCII non-alnum = boundary; bytes >= 0x80 are NOT boundaries. */
  @inline private def isBoundary(b: Byte): Boolean = b >= 0 && !isAlnum(b)
  @inline private def isLocal(b: Byte): Boolean =
    isAlnum(b) || b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  @inline private def isSep(b: Byte): Boolean =
    b == '-' || b == '.' || b == ' ' || b == '(' || b == ')' || b == '/'

  /** Luhn checksum over `digits[0, n)` (most significant first, check
    * digit included). */
  def luhnOk(digits: Array[Byte], n: Int): Boolean = {
    if (n < 2) return false
    var sum = 0
    var j = 0
    while (j < n) {
      val d = digits(j) - '0'
      // position from the right (1-based): n - j; double the even ones
      if ((n - j) % 2 == 0) { val t = d * 2; sum += (if (t > 9) t - 9 else t) }
      else sum += d
      j += 1
    }
    sum % 10 == 0
  }

  /** End (exclusive) of an email starting at `i`, or -1. `i` must sit
    * at a word boundary with `b(i)` in the local-part set.
    *
    * The domain accepts the LONGEST PREFIX whose final label is a valid
    * TLD (alphabetic, len >= 2, >= 2 labels up to there) — the greedy-
    * with-backtracking semantics of the standard email regex. This is
    * also what makes the scrubber IDEMPOTENT: "a@b.com.10.1.2.3" must
    * match "a@b.com" regardless of whether the trailing dotted digits
    * are later masked, so a neighbor's replacement can never flip an
    * email verdict on a re-scan (property-pinned in PropertySpec). */
  private def tryEmail(b: Array[Byte], n: Int, i: Int): Int = {
    var j = i
    while (j < n && isLocal(b(j))) j += 1
    if (j == i || j >= n || b(j) != '@') return -1
    var k = j + 1
    var labels = 0
    var bestEnd = -1 // end of the last label that closes a valid email
    var ok = true
    while (ok) {
      if (k >= n || !isAlnum(b(k))) { ok = false }
      else {
        val start = k
        var alpha = true
        while (k < n && (isAlnum(b(k)) || b(k) == '-')) {
          if (!isAlpha(b(k))) alpha = false
          k += 1
        }
        labels += 1
        if (labels >= 2 && alpha && k - start >= 2) bestEnd = k
        // consume the dot only when another label follows
        if (k + 1 < n && b(k) == '.' && isAlnum(b(k + 1))) k += 1
        else ok = false
      }
    }
    bestEnd
  }

  /** Scanned number token. `end` excludes any unconsumed trailer. */
  private final class NumTok {
    var end = 0
    var nDigits = 0
    var plus = false
    var sep = false
    var paren = false
    var ipShape = true   // digits and single dots only
    var groups = 1
    var groupVal = 0
    var groupLen = 0
    var ipOk = true      // every octet <= 255, 1-3 digits
    val digits = new Array[Byte](MaxDigits)
    var overflow = false
  }

  private def scanNumber(b: Array[Byte], n: Int, i: Int): NumTok = {
    val t = new NumTok
    var j = i
    if (b(j) == '+') { t.plus = true; t.ipShape = false; j += 1 }
    if (j < n && b(j) == '(') { t.paren = true; t.sep = true; t.ipShape = false; j += 1 }
    t.end = j
    var run = 0 // digits since the last bridge: gates space bridging
    var scanning = true
    while (scanning) {
      if (j < n && isDigit(b(j))) {
        if (t.nDigits < MaxDigits) t.digits(t.nDigits) = b(j) else t.overflow = true
        t.nDigits += 1
        run += 1
        t.groupVal = t.groupVal * 10 + (b(j) - '0')
        t.groupLen += 1
        if (t.groupLen > 3 || t.groupVal > 255) t.ipOk = false
        j += 1
        t.end = j
      } else {
        // bridge at most two separator bytes iff a digit follows; a
        // bridge CONTAINING A SPACE additionally requires the group
        // just scanned to be 3-6 digits (card 4-4-4-4 / amex 4-6-5 /
        // spaced-phone groupings) — otherwise "16 12" would weld a
        // date onto a time and mask "2026-08-16 12" as a phone
        var k = j
        var s = 0
        var spaced = false
        while (k < n && s < 2 && isSep(b(k))) {
          if (b(k) == ' ') spaced = true
          k += 1; s += 1
        }
        if (s > 0 && k < n && isDigit(b(k)) && (!spaced || (run >= 3 && run <= 6))) {
          t.sep = true
          if (s == 1 && b(j) == '.') { t.groups += 1; t.groupVal = 0; t.groupLen = 0 }
          else t.ipShape = false
          j = k
          run = 0
        } else scanning = false
      }
    }
    // absorb a closing paren directly after the last digit: "(555)"
    if (t.paren && t.end < n && b(t.end) == ')') t.end += 1
    t
  }

  /** Never null for non-null input. Called from generated code. */
  def compute(text: UTF8String): GenericInternalRow = {
    val b = text.getBytes
    val n = b.length
    val out = new java.io.ByteArrayOutputStream(n + 16)
    var emails = 0; var phones = 0; var ips = 0; var cards = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      val boundary = i == 0 || isBoundary(b(i - 1))
      var consumed = false
      if (boundary && isLocal(c)) {
        val e = tryEmail(b, n, i)
        if (e > 0) {
          out.write(Email, 0, Email.length)
          emails += 1; i = e; consumed = true
        }
      }
      if (!consumed && boundary &&
          (isDigit(c) ||
           ((c == '+' || c == '(') && i + 1 < n && isDigit(b(i + 1))))) {
        val t = scanNumber(b, n, i)
        // end boundary: an alnum right after the token voids it
        val bounded = t.end >= n || !isAlnum(b(t.end))
        var cls = 0
        if (bounded && !t.overflow) {
          if (t.nDigits >= 13 && t.nDigits <= 19 && !t.plus &&
              luhnOk(t.digits, t.nDigits)) cls = 4
          else if (t.ipShape && t.groups == 4 && t.ipOk && t.groupLen >= 1) cls = 3
          else if (t.nDigits >= 10 && t.nDigits <= 15 && (t.sep || t.plus)) cls = 2
        }
        cls match {
          case 4 => out.write(Card, 0, Card.length); cards += 1
          case 3 => out.write(Ip, 0, Ip.length); ips += 1
          case 2 => out.write(Phone, 0, Phone.length); phones += 1
          case _ => out.write(b, i, t.end - i)
        }
        i = t.end; consumed = true
      }
      if (!consumed) { out.write(c); i += 1 }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(out.toByteArray), emails, phones, ips, cards))
  }
}

/** Native Catalyst expression: Luhn checksum validation of a candidate
  * payment-card string. Spaces and dashes are ignored; any other
  * non-digit, or a digit count outside 2..[[PiiScrub.MaxDigits]], yields
  * NULL ("not a card-shaped string"), not false — mirroring the decode
  * family's undecodable contract. True iff the Luhn sum over the digits
  * (check digit included) is 0 mod 10.
  */
case class LuhnValid(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"luhn_valid needs a string child, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    LuhnValid.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("luhn")
      s"""
         |Boolean $out = graft.functions.LuhnValid.compute($c);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out.booleanValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LuhnValid =
    copy(child = newChild)
}

object LuhnValid {
  /** Boxed so generated code can express the NULL contract. */
  def compute(s: UTF8String): java.lang.Boolean = {
    val b = s.getBytes
    val digits = new Array[Byte](32)
    var n = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= '0' && c <= '9') {
        if (n >= 32) return null
        digits(n) = c; n += 1
      } else if (c != ' ' && c != '-') return null
      i += 1
    }
    if (n < 2 || n > 24) return null
    java.lang.Boolean.valueOf(PiiScrub.luhnOk(digits, n))
  }
}
