package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: apply a frozen BPE merge table to a word,
  * emitting the delimited symbol representation (" sym1 sym2 ... ").
  *
  * Why: the previous encode shape baked the k-merge table into k CHAINED
  * literal `replace`s in one projection. That is exactly right at small k
  * (whole-stage codegen, zero state), but a real tokenizer ships ~50k
  * merges — a 50k-deep expression tree exceeds Janino's 64 KB method
  * limit (CodegenFallback → interpreted per-word k·len scanning) if
  * planning survives at all. This expression is the k-INDEPENDENT encode:
  * the merge table is carried once as reference data (a pair→rank hash
  * map + rank→pair arrays, built per JVM), and each word is encoded
  * event-driven — a doubly-linked symbol list plus a min-heap of the
  * ranks PRESENT in the word; each popped rank runs one left-to-right
  * merge pass. Work per word is O(len) per distinct rank present
  * (≤ len ranks), regardless of table size k.
  *
  * Semantics are BYTE-IDENTICAL to the chained-replace form — including
  * its one subtlety: a delimited-string replace consumes the space
  * BEFORE the following symbol, so in a run like " a a a a " the second
  * occurrence (whose leading space was consumed) is skipped by that
  * rank's single pass and never revisited (→ " aa a a ", then later
  * ranks may pick it up). The trainer ([[graft.operators.TextOps]]
  * bpeMerges/bpeMergesLocal) applies merges with exactly the same
  * string-replace pass, so table and encode stay mutually consistent,
  * and the DuckDB oracle replays the identical replace chain. The
  * per-rank pass reproduces it with a resume-after-match block flag;
  * ranks pop in increasing order, and a pair adjacency formed after its
  * own rank's pass is never merged (only ranks > current are pushed) —
  * just as the chain never re-runs an earlier replace. BpeApplySpec pins
  * byte-equality against the literal chain at k >= 2000 on a trained
  * table.
  *
  * Scale shape: the table is bounded tokenizer metadata (~50k rows, ~1 MB)
  * — the same class as k-means centroids — shipped to executors inside
  * the serialized plan, NOT a per-row join side. The projection stays
  * whole-stage-codegen (one static call), so the vocabulary-grain encode
  * remains a pure scan-fused map at any corpus size.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)],
                    textbook: Boolean = false)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_apply needs a string child, got ${child.dataType}")

  @transient private lazy val table: BpeApply.Table = BpeApply.buildTable(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeApply.encode(input.asInstanceOf[UTF8String], table, textbook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeApply.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeApply.encode($c, $ref, $textbook)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

object BpeApply {

  /** pair→SORTED-RANKS lookup (keyed "lhs rhs" — unambiguous: symbols
    * come from tokenized words, which never contain spaces) plus the
    * rank→pair reverse arrays the per-rank scan needs. A trained table
    * CAN legitimately contain the same pair at two ranks — the chain's
    * consumed-space skip leaves occurrences behind, the trainer counts
    * them again, and the pair can win a later round — and the chain
    * then runs a SECOND replace pass for it, so the lookup must keep
    * every rank, not just the first. Built once per JVM and shipped to
    * executors via the codegen reference array. */
  final class Table(val ranks: java.util.HashMap[String, Array[Int]],
                    val lhs: Array[String], val rhs: Array[String])
    extends Serializable

  def buildTable(merges: Seq[(String, String)]): Table = {
    val m = new java.util.HashMap[String, java.util.ArrayList[Int]](merges.size * 2)
    val lhs = new Array[String](merges.size)
    val rhs = new Array[String](merges.size)
    var r = 0
    merges.foreach { case (x, y) =>
      m.computeIfAbsent(x + " " + y, _ => new java.util.ArrayList[Int]()).add(r)
      lhs(r) = x
      rhs(r) = y
      r += 1
    }
    val packed = new java.util.HashMap[String, Array[Int]](m.size * 2)
    m.forEach { (k, v) =>
      val a = new Array[Int](v.size)
      var i = 0
      while (i < a.length) { a(i) = v.get(i); i += 1 } // insertion order = ascending
      packed.put(k, a)
    }
    new Table(packed, lhs, rhs)
  }

  /** Smallest rank of pair (x, y) strictly greater than `after`, or -1.
    * `after = -1` gives the pair's first rank. */
  private def nextRankAfter(t: Table, x: String, y: String, after: Int): Int = {
    val a = t.ranks.get(x + " " + y)
    if (a == null) -1
    else {
      var i = 0
      while (i < a.length && a(i) <= after) i += 1 // arrays are tiny (≈1)
      if (i < a.length) a(i) else -1
    }
  }

  /** Encode one word: rank-priority merging over a linked symbol list.
    * Called from generated code. Output byte-matches the chained-replace
    * repr: leading space, one space after every symbol.
    *
    * `textbook = false` (default) reproduces the delimited-replace chain
    * EXACTLY, including its consumed-space skip (" a a a a " merges with
    * stride 3). `textbook = true` is canonical BPE — the published
    * GPT-2/HF semantics: each rank's pass merges every leftmost-
    * non-overlapping occurrence with NO skip (" a a a a " → " aa aa "),
    * which is provably identical to the one-merge-at-a-time
    * lowest-rank-leftmost loop every real tokenizer runs (a pair formed
    * by a merge always involves the merged symbol, whose own merges rank
    * strictly later — so finishing rank r's sweep before rank r+1 never
    * reorders anything). BpeApplySpec pins this against a PUBLIC GPT-2
    * merge-table excerpt with hand-derived canonical encodings.
    */
  def encode(w: UTF8String, t: Table, textbook: Boolean): UTF8String = {
    val s = w.toString
    // initial symbols: one per code point (the "(.)" split of the chain)
    var n = 0
    var ci = 0
    while (ci < s.length) { ci += Character.charCount(s.codePointAt(ci)); n += 1 }
    if (n == 0) return UTF8String.fromString(" ")
    val sym = new Array[String](n)
    ci = 0
    var k = 0
    while (ci < s.length) {
      val cc = Character.charCount(s.codePointAt(ci))
      sym(k) = s.substring(ci, ci + cc)
      ci += cc
      k += 1
    }
    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    val alive = new Array[Boolean](n)
    var i = 0
    while (i < n) { next(i) = i + 1; prev(i) = i - 1; alive(i) = true; i += 1 }

    // Min-heap of CANDIDATE RANKS present in the word (duplicates fine;
    // stale entries skipped via lastRank). Popping a rank runs one full
    // left-to-right pass for that pair over the current symbol list —
    // exactly one string-replace pass of the chain, including its
    // resume-after-match semantics: a match consumes the delimiter space
    // BEFORE the following symbol, so that symbol cannot START a match
    // in the same pass (" a a a a " merges at 0 but skips the occurrence
    // at 2 → " aa a a ", as replace does). Ranks pop in increasing
    // order, so passes sequence identically to the chain; a pair formed
    // AFTER its own rank's pass is never merged (the chain's replace for
    // that rank already ran) — enforced by pushing only ranks > current
    // and skipping pops <= lastRank. Work per word: O(len) per DISTINCT
    // rank present (<= len ranks), independent of table size k.
    var heap = new Array[Int](math.max(16, n))
    var hs = 0
    def push(v: Int): Unit = {
      if (hs == heap.length) heap = java.util.Arrays.copyOf(heap, hs * 2)
      heap(hs) = v
      var c = hs
      hs += 1
      while (c > 0 && heap((c - 1) / 2) > heap(c)) {
        val p = (c - 1) / 2
        val tmp = heap(p); heap(p) = heap(c); heap(c) = tmp
        c = p
      }
    }
    def pop(): Int = {
      val top = heap(0)
      hs -= 1
      heap(0) = heap(hs)
      var c = 0
      var go = true
      while (go) {
        val l = 2 * c + 1
        val r = l + 1
        var m = c
        if (l < hs && heap(l) < heap(m)) m = l
        if (r < hs && heap(r) < heap(m)) m = r
        if (m == c) go = false
        else { val tmp = heap(m); heap(m) = heap(c); heap(c) = tmp; c = m }
      }
      top
    }

    i = 0
    while (i < n - 1) {
      val r = nextRankAfter(t, sym(i), sym(i + 1), -1)
      if (r >= 0) push(r)
      i += 1
    }

    var lastRank = -1
    while (hs > 0) {
      val r = pop()
      if (r > lastRank) {
        lastRank = r
        val x = t.lhs(r)
        val y = t.rhs(r)
        // one replace pass: slot 0 never dies (merges absorb rightward)
        var li = 0
        var blocked = false
        while (li < n) {
          val ri = next(li)
          if (!blocked && ri < n && sym(li) == x && sym(ri) == y) {
            sym(li) = sym(li) + sym(ri)
            alive(ri) = false
            next(li) = next(ri)
            if (next(ri) < n) prev(next(ri)) = li
            val p = prev(li)
            if (p >= 0) {
              val rp = nextRankAfter(t, sym(p), sym(li), r)
              if (rp >= 0) push(rp)
            }
            val q = next(li)
            if (q < n) {
              val rq = nextRankAfter(t, sym(li), sym(q), r)
              if (rq >= 0) push(rq)
            }
            // chain mode: the consumed delimiter space blocks the next
            // symbol from STARTING a match this pass. Textbook mode has
            // no such skip — every leftmost-non-overlapping occurrence
            // merges in the same sweep.
            blocked = !textbook
            li = next(li)
          } else {
            // an occurrence of (x, y) that survives THIS pass (blocked
            // by a consumed space, exactly like the chain's replace) is
            // picked up by the pair's next DUPLICATE rank, if any —
            // the chain runs a second full pass there
            if (ri < n && sym(li) == x && sym(ri) == y) {
              val rd = nextRankAfter(t, x, y, r)
              if (rd >= 0) push(rd)
            }
            blocked = false
            li = if (ri < n) ri else n
          }
        }
      }
    }

    val sb = new java.lang.StringBuilder(s.length * 2 + 2)
    sb.append(' ')
    i = 0
    while (i < n) {
      if (alive(i)) { sb.append(sym(i)); sb.append(' ') }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
