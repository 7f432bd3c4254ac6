package graft.streaming

import scala.collection.mutable.ArrayBuffer

/** Incremental leftmost-first regex match COUNTING with bounded state
  * — the streaming engine behind
  * [[EventStream.streamingSequencePattern]].
  *
  * Problem: the batch twin ([[graft.operators.Sessionize
  * .sequencePattern]]) counts non-overlapping `Matcher.find()` matches
  * over a user's whole journey string. A streaming twin that keeps the
  * journey in keyed state grows O(events) per user and re-runs the
  * regex over the full history every micro-batch — quadratic total
  * work, unbounded state (the round-13 scale flag). This engine keeps
  * O(|NFA|) state per user instead and consumes each character exactly
  * once.
  *
  * Design: a priority-ordered Pike VM (Thompson NFA simulation, the
  * RE2 construction — Pike 1987, Cox 2009 "Regular Expression Matching:
  * the Virtual Machine Approach") over the PORTABLE regex subset the
  * oracle contract already pins (literals, classes, `.`, `|`, greedy /
  * lazy `* + ? {m,n}` — no backrefs, no anchors, no empty-matching
  * pattern). Thread priority order = (start position asc, backtrack
  * order) reproduces java.util.regex / RE2 leftmost-first `find()`
  * semantics exactly on this subset, so the streaming twin, the batch
  * twin (Java regex) and the DuckDB oracle (RE2) all agree.
  *
  * Incremental non-overlapping counting — the part plain Pike VMs
  * don't do — rests on three invariants proved in the scaladoc of
  * [[PikeEngine.feed]]:
  *
  *  1. '''Every accept kills all lower-priority threads.''' A match
  *     ends at the current position `pos`; every live thread started
  *     at some position `< pos` (it has consumed ≥ 1 char), so every
  *     lower-priority thread overlaps the candidate match and dies
  *     whether the candidate commits or is later superseded (a
  *     superseding match starts no later and ends no earlier). The
  *     frontier therefore truncates to the strictly-higher-priority
  *     prefix — at most one accept fires per position.
  *  2. '''Superseding drops a queue suffix.''' Accepted-but-
  *     uncommitted matches (a higher-priority thread is still running
  *     and could yet produce an earlier-starting match) form a queue
  *     of chained non-overlapping spans. When thread T accepts, it
  *     supersedes exactly the queued entries with start ≥ T.start — a
  *     suffix, because queue starts are ascending.
  *  3. '''The queue compresses into ≤ |threads|+1 buckets.''' The only
  *     suffix-drop boundaries ever exercised are live-thread start
  *     positions, so entries between consecutive live starts can be
  *     collapsed to (key = largest live start ≤ entry.start, count,
  *     last end). State is O(|NFA states|) regardless of journey
  *     length or match count.
  *
  * A match commits (becomes immutable history) once the highest-
  * priority live thread starts at/after the queue tail's end — no live
  * thread can then produce an earlier-starting match. Emission uses
  * settled + queued (queued matches resolve as real matches at
  * end-of-input because their competitors fail there), which equals
  * the batch `find()` count over the prefix consumed so far.
  *
  * ==Why there is no streaming SPAN-extraction twin==
  *
  * The batch extraction operator (`events_pattern_extract`) also
  * emits the matched runs. A streaming twin with bounded state is
  * IMPOSSIBLE on this engine's contract, for two independent reasons,
  * each with a concrete witness (spec-demonstrated):
  *
  *  1. '''Pending spans are unbounded in count.''' Emitting each
  *     match's span (even as offsets) requires the pending queue
  *     UNCOMPRESSED: on `ab*c|b` over `a` + `b`^n, every `b` queues a
  *     pending single-char match that the still-live `ab*c` thread
  *     could supersede — n unresolved spans, while the count protocol
  *     holds ONE bucket (invariant 3 exists precisely because it
  *     forgets the spans; the spec measures qCounts growing linearly
  *     under O(1) buckets).
  *  2. '''One span's text is unbounded in length.''' Emitting the run
  *     TEXT requires buffering every char since the earliest live
  *     thread's start: on `v[ce]*p` over `v` + `c`^n the candidate
  *     spans the whole history — you cannot emit a string you did not
  *     keep, so state is Ω(history) regardless of queue design.
  *
  * Count/position emission stays O(automaton) exactly because it
  * forgets both. Callers needing runs: extract batch-side over the
  * journeys the stream already delivers (the batch twin), or accept
  * an explicit truncation contract (cap pending spans and run
  * length), which no longer equals `find()` and is therefore not
  * built here.
  */
object PikeRegex {

  /** One VM instruction. `Chr` consumes a char iff it matches the
    * class (flat (lo,hi) range pairs, XOR `neg`); `Split` forks with
    * `a` the HIGHER-priority branch (greedy = loop-first); `Accept`
    * ends a match. Serializable: the compiled program ships in the
    * task closure.
    */
  sealed trait Inst extends Serializable
  final case class Chr(neg: Boolean, ranges: Array[Char], next: Int) extends Inst
  final case class Split(a: Int, b: Int) extends Inst
  final case class Jmp(next: Int) extends Inst
  case object Accept extends Inst

  final class Program(val insts: Array[Inst]) extends Serializable {
    def size: Int = insts.length
  }

  // ------------------------------------------------------------------
  // parser — recursive descent over the portable subset
  // ------------------------------------------------------------------

  private sealed trait Re
  private final case class Lit(neg: Boolean, ranges: Array[Char]) extends Re
  private final case class Cat(xs: List[Re]) extends Re
  private final case class Alt(a: Re, b: Re) extends Re
  /** max = -1 means unbounded. */
  private final case class Rep(r: Re, min: Int, max: Int, greedy: Boolean) extends Re

  /** RE2's counted-repetition cap: {m,n} bounds above this are
    * rejected at parse (the compiler emits O(n) instruction copies).
    */
  val MaxRep = 1000

  private final class Parser(s: String) {
    private var i = 0
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"PikeRegex: $msg at index $i in '$s'")
    private def more: Boolean = i < s.length
    private def cur: Char = s.charAt(i)

    def parse(): Re = {
      val r = alt()
      if (more) err(s"unexpected '${cur}'")
      r
    }

    private def alt(): Re = {
      var a = cat()
      while (more && cur == '|') { i += 1; a = Alt(a, cat()) }
      a
    }

    private def cat(): Re = {
      val xs = ArrayBuffer.empty[Re]
      while (more && cur != '|' && cur != ')') xs += rep()
      Cat(xs.toList)
    }

    private def rep(): Re = {
      var a = atom()
      var quantified = false
      while (more && (cur == '*' || cur == '+' || cur == '?' || cur == '{')) {
        if (quantified) err("double quantifier (group the inner one)")
        quantified = true
        val (min, max) = cur match {
          case '*' => i += 1; (0, -1)
          case '+' => i += 1; (1, -1)
          case '?' => i += 1; (0, 1)
          case '{' =>
            i += 1
            val m = int()
            val mx =
              if (more && cur == ',') {
                i += 1
                if (more && cur == '}') -1 else int()
              } else m
            if (!more || cur != '}') err("unterminated {m,n}")
            i += 1
            if (mx != -1 && mx < m) err("{m,n} with n < m")
            // compilation emits up to n instruction copies of the
            // body — an unvalidated bound like {2000000000} is a
            // driver OOM, not a pattern. RE2 caps at 1000; match it.
            if (m > MaxRep || mx > MaxRep)
              err(s"repetition bound exceeds $MaxRep")
            (m, mx)
        }
        val greedy = if (more && cur == '?') { i += 1; false } else true
        a = Rep(a, min, max, greedy)
      }
      a
    }

    private def int(): Int = {
      val st = i
      while (more && cur.isDigit) i += 1
      if (i == st) err("expected integer")
      // an over-Int bound must surface as the parser's own error with
      // position context, not a raw NumberFormatException
      try s.substring(st, i).toInt
      catch { case _: NumberFormatException => err("integer out of range") }
    }

    private def atom(): Re = {
      if (!more) err("expected atom")
      cur match {
        case '(' =>
          i += 1
          if (more && cur == '?') {
            if (i + 1 < s.length && s.charAt(i + 1) == ':') i += 2
            else err("only (?:...) groups supported")
          }
          val r = alt()
          if (!more || cur != ')') err("unterminated group")
          i += 1
          r
        case '[' => charClass()
        case '.' =>
          i += 1
          // java.util.regex '.' (no DOTALL): any char except line
          // terminators
          Lit(neg = true, Array('\n', '\n', '\r', '\r',
            '\u0085', '\u0085', '\u2028', '\u2029'))
        case '\\' => escape(inClass = false)
        case c if "*+?{)|".indexOf(c.toInt) >= 0 => err(s"dangling '$c'")
        case c => i += 1; Lit(neg = false, Array(c, c))
      }
    }

    private val digitRanges = Array('0', '9')
    private val wordRanges = Array('a', 'z', 'A', 'Z', '0', '9', '_', '_')
    private val spaceRanges =
      Array(' ', ' ', '\t', '\t', '\n', '\n', '\u000B', '\u000B',
        '\f', '\f', '\r', '\r')

    private def escape(inClass: Boolean): Lit = {
      i += 1 // consume '\'
      if (!more) err("dangling escape")
      val c = cur; i += 1
      c match {
        case 'd' => Lit(neg = false, digitRanges)
        case 'D' => Lit(neg = true, digitRanges)
        case 'w' => Lit(neg = false, wordRanges)
        case 'W' => Lit(neg = true, wordRanges)
        case 's' => Lit(neg = false, spaceRanges)
        case 'S' => Lit(neg = true, spaceRanges)
        case 'n' => Lit(neg = false, Array('\n', '\n'))
        case 't' => Lit(neg = false, Array('\t', '\t'))
        case 'r' => Lit(neg = false, Array('\r', '\r'))
        case 'f' => Lit(neg = false, Array('\f', '\f'))
        case x if !x.isLetterOrDigit =>
          Lit(neg = false, Array(x, x)) // escaped metachar → literal
        case x => err(s"unsupported escape \\$x")
      }
    }

    // Two grammar corners verified against BOTH twin engines (round
    // 15, direct runs of java.util.regex 17 and DuckDB/RE2): a bare
    // ']' as the FIRST class member ("[]a]" = {']','a'}) and a '-'
    // after a spliced shorthand ("[\d-x]" = \d ∪ {'-','x'}) are
    // ACCEPTED by java and RE2 with exactly the union semantics this
    // parser produces — so they stay accepted here (rejecting them
    // would shrink the subset below what the batch twin and the
    // oracle run). PikeRegexSpec pins the agreement case by case.
    private def charClass(): Re = {
      i += 1 // consume '['
      val neg = more && cur == '^'
      if (neg) i += 1
      val ranges = ArrayBuffer.empty[Char]
      var first = true
      while (more && (cur != ']' || first)) {
        first = false
        val lo: Either[Char, Lit] =
          if (cur == '\\') {
            val e = escape(inClass = true)
            if (e.ranges.length == 2 && !e.neg && e.ranges(0) == e.ranges(1))
              Left(e.ranges(0))
            else Right(e)
          } else { val c = cur; i += 1; Left(c) }
        lo match {
          case Right(cls) =>
            // \d etc. inside a class: splice its ranges (only
            // non-negated shorthand supported inside [...])
            if (cls.neg) err("negated shorthand inside class")
            ranges ++= cls.ranges
          case Left(c) =>
            if (more && cur == '-' && i + 1 < s.length &&
                s.charAt(i + 1) != ']') {
              i += 1
              val hi = if (cur == '\\') {
                val e = escape(inClass = true)
                if (e.neg || e.ranges.length != 2 ||
                  e.ranges(0) != e.ranges(1)) err("bad range bound")
                e.ranges(0)
              } else { val h = cur; i += 1; h }
              if (hi < c) err("inverted range")
              ranges += c += hi
            } else ranges += c += c
        }
      }
      if (!more) err("unterminated class")
      i += 1 // consume ']'
      if (ranges.isEmpty) err("empty class")
      Lit(neg, ranges.toArray)
    }
  }

  // ------------------------------------------------------------------
  // compiler — Thompson construction with prioritized splits
  // ------------------------------------------------------------------

  def compile(pattern: String): Program = {
    val ast = new Parser(pattern).parse()
    val buf = ArrayBuffer.empty[Inst]

    def emit(re: Re): Unit = re match {
      case Lit(neg, ranges) => buf += Chr(neg, ranges, buf.length + 1)
      case Cat(xs) => xs.foreach(emit)
      case Alt(a, b) =>
        val sp = buf.length; buf += null
        emit(a)
        val jm = buf.length; buf += null
        val bStart = buf.length
        emit(b)
        buf(sp) = Split(sp + 1, bStart) // first alternative preferred
        buf(jm) = Jmp(buf.length)
      case Rep(r, 0, -1, g) => // star
        val sp = buf.length; buf += null
        emit(r)
        buf += Jmp(sp)
        val out = buf.length
        buf(sp) = if (g) Split(sp + 1, out) else Split(out, sp + 1)
      case Rep(r, 1, -1, g) => // plus
        val body = buf.length
        emit(r)
        val sp = buf.length; buf += null
        buf(sp) = if (g) Split(body, sp + 1) else Split(sp + 1, body)
      case Rep(r, min, -1, g) => // {m,}: m-1 copies then plus
        (1 until min).foreach(_ => emit(r))
        emit(Rep(r, 1, -1, g))
      case Rep(r, min, max, g) => // {m,n}: m copies + nested optionals
        (0 until min).foreach(_ => emit(r))
        // nested (r (r (…)?)?)? — greedy prefers taking the next copy,
        // exactly the backtracking preference order of java {m,n}
        val sps = ArrayBuffer.empty[Int]
        (0 until max - min).foreach { _ =>
          sps += buf.length; buf += null
          emit(r)
        }
        val out = buf.length
        sps.foreach(sp =>
          buf(sp) = if (g) Split(sp + 1, out) else Split(out, sp + 1))
    }

    emit(ast)
    buf += Accept
    val insts = buf.toArray

    // reject empty-matching patterns: Accept reachable from pc 0 via
    // epsilon alone would make find() loop on zero-width matches — the
    // oracle contract (and this engine's "every accept kills all lower
    // threads" invariant) requires matches of ≥ 1 char
    val seen = new java.util.BitSet(insts.length)
    def eps(pc: Int): Boolean = {
      if (seen.get(pc)) return false
      seen.set(pc)
      insts(pc) match {
        case Split(a, b) => eps(a) || eps(b)
        case Jmp(n) => eps(n)
        case Accept => true
        case _: Chr => false
      }
    }
    require(!eps(0),
      s"PikeRegex: pattern '$pattern' matches the empty string")
    new Program(insts)
  }
}

/** Schema-version registry for the keyed streaming states.
  *
  * Why: a keyed-state case class change silently invalidates every
  * running checkpoint — the r13→r14 PikeState change surfaced only as
  * a confusing Spark state-schema error at restore (documented gotcha).
  * Every state case class now CARRIES its schema version; restores
  * call [[checked]] which either passes the state through (current
  * version), applies a registered migration (none yet — this is the
  * hook), or fails LOUDLY with an actionable message instead of
  * letting a stale-shape state corrupt the operator.
  *
  * Spark's own state-store schema check catches FIELD-SHAPE drift
  * (added/removed/retyped columns) before this code runs; the carried
  * version additionally catches SEMANTIC drift — same fields, new
  * meaning (e.g. a re-based position counter) — which no structural
  * check can see.
  */
object KeyedState {
  /** Current keyed-state schema version. v1 = the round-14 shapes
    * (no version field); v2 adds the carried version itself.
    */
  val Ver = 2

  /** Validate-or-migrate a restored state. Returns the state when its
    * carried version is current; future migrations hook in here;
    * anything unmigratable throws with restore guidance.
    */
  def checked[T](st: T, ver: Int, op: String): T =
    if (ver == Ver) st
    else if (ver > Ver) throw new IllegalStateException(
      s"$op: restored keyed state carries schema v$ver, newer than " +
        s"this engine's v$Ver — running an old engine against a new " +
        "checkpoint; upgrade the job or restore an older checkpoint")
    else throw new IllegalStateException(
      s"$op: restored keyed state carries schema v$ver but this " +
        s"engine expects v$Ver and no migration is registered for " +
        "that step — restart from a fresh checkpoint (state is " +
        "rebuilt from the source) or add the migration to " +
        "KeyedState.checked")
}

/** Serializable per-key engine state — the keyed streaming state.
  *
  * `pcs`/`starts`: the live thread frontier in priority order (starts
  * are non-decreasing; priority = start asc, then backtrack order).
  * `qKeys`/`qCounts`/`qEnds`: the pending-match queue compressed into
  * buckets (see [[PikeRegex]] invariant 3). `settled`: committed match
  * count. `pos`: chars consumed so far (= n_events). `ver`: carried
  * schema version ([[KeyedState]]).
  *
  * Size bound: |pcs| ≤ program size (threads dedupe by pc), buckets ≤
  * |pcs| + 1 — independent of journey length (spec-asserted).
  */
final case class PikeState(
    pcs: Array[Int], starts: Array[Long],
    qKeys: Array[Long], qCounts: Array[Long], qEnds: Array[Long],
    settled: Long, pos: Long, ver: Int = KeyedState.Ver)

/** Keyed state of the MULTI-pattern streaming matcher: one engine
  * state per pattern, fed the same decoded chars.
  */
final case class MultiPikeState(states: Array[PikeState],
    ver: Int = KeyedState.Ver)

/** Keyed state of [[EventStream.streamingQuotaSample]]: the stratum's
  * cap smallest (salted-md5, id) pairs, kept sorted, plus the running
  * row count. O(cap) regardless of stream length.
  */
final case class QuotaState(hashes: Array[String], ids: Array[Long],
    seen: Long, ver: Int = KeyedState.Ver)

/** Keyed state of [[EventStream.streamingWeightedSample]]: one
  * shard's top-k rows by A-ES rank key, plus the running row count.
  * O(k) per shard regardless of stream length.
  */
final case class WSampleState(keys: Array[Double], ids: Array[Long],
    ws: Array[Long], seen: Long, ver: Int = KeyedState.Ver)

object PikeEngine {
  import PikeRegex._

  val initial: PikeState = PikeState(Array.empty, Array.empty,
    Array.empty, Array.empty, Array.empty, 0L, 0L)

  /** Non-overlapping leftmost-first match count over everything fed so
    * far, as java `while (m.find()) n += 1` would report on the full
    * prefix string. Queued matches count: at end-of-input their
    * higher-priority competitors fail (they are not at Accept — accept
    * threads are resolved eagerly at feed end), so java's backtracking
    * falls back to exactly the queued spans.
    */
  def matchCount(st: PikeState): Long = st.settled + st.qCounts.sum

  /** Feed one chunk of characters; returns the successor state.
    * Per-char work is O(program size); state never references the
    * consumed characters again.
    */
  def feed(prog: Program, st: PikeState, chunk: CharSequence): PikeState = {
    val insts = prog.insts
    val n = insts.length

    // working copies (priority order maintained throughout)
    var pcs = ArrayBuffer.empty[Int] ++= st.pcs
    var starts = ArrayBuffer.empty[Long] ++= st.starts
    val qKeys = ArrayBuffer.empty[Long] ++= st.qKeys
    val qCounts = ArrayBuffer.empty[Long] ++= st.qCounts
    val qEnds = ArrayBuffer.empty[Long] ++= st.qEnds
    var settled = st.settled
    var pos = st.pos

    val seen = new java.util.BitSet(n)

    // epsilon-closure add: resolves Split/Jmp, stores Chr/Accept pcs;
    // priority order = DFS visiting Split.a before Split.b; `seen`
    // dedupes across the whole frontier (the higher-priority thread at
    // the same pc subsumes — identical future behavior, preferred
    // start)
    def add(tp: ArrayBuffer[Int], ts: ArrayBuffer[Long], pc: Int,
        s: Long): Unit = {
      if (seen.get(pc)) return
      seen.set(pc)
      insts(pc) match {
        case Split(a, b) => add(tp, ts, a, s); add(tp, ts, b, s)
        case Jmp(nx) => add(tp, ts, nx, s)
        case _ => tp += pc; ts += s
      }
    }

    def qTotal: Long = { var t = 0L; var k = 0
      while (k < qCounts.length) { t += qCounts(k); k += 1 }; t }
    def qLastEnd: Long = if (qEnds.isEmpty) 0L else qEnds.last

    // process the (single possible) accept ending at `pos`: invariant 1
    // — the first Accept in priority order wins, everything after it
    // dies (all live starts < pos = match end ⇒ all lower-priority
    // threads overlap)
    def processAccepts(): Unit = {
      var found = -1
      var k = 0
      while (k < pcs.length && found < 0) {
        if (insts(pcs(k)) == Accept) found = k
        k += 1
      }
      if (found >= 0) {
        val s = starts(found)
        // invariant 2: supersede queued matches starting at/after s
        // (bucket key ≥ s ⟺ entry start ≥ s)
        while (qKeys.nonEmpty && qKeys.last >= s) {
          qKeys.remove(qKeys.length - 1)
          qCounts.remove(qCounts.length - 1)
          qEnds.remove(qEnds.length - 1)
        }
        // truncate frontier to the strictly-higher-priority prefix
        pcs = pcs.take(found)
        starts = starts.take(found)
        // rebuild `seen` for the surviving frontier
        seen.clear()
        var j = 0
        while (j < pcs.length) { seen.set(pcs(j)); j += 1 }
        if (pcs.isEmpty) {
          // nothing can supersede: commit the whole queue + this match
          settled += qTotal + 1
          qKeys.clear(); qCounts.clear(); qEnds.clear()
        } else {
          // enqueue under the largest surviving start (invariant 3);
          // fold in any buckets keyed above it (their threads are dead)
          val newKey = starts(starts.length - 1)
          var cnt = 1L
          while (qKeys.nonEmpty && qKeys.last > newKey) {
            cnt += qCounts.remove(qCounts.length - 1)
            qKeys.remove(qKeys.length - 1)
            qEnds.remove(qEnds.length - 1)
          }
          if (qKeys.nonEmpty && qKeys.last == newKey) {
            qCounts(qCounts.length - 1) += cnt
            qEnds(qEnds.length - 1) = pos
          } else { qKeys += newKey; qCounts += cnt; qEnds += pos }
        }
      }
    }

    // commit the queue once no live thread can start a match before
    // the queue tail's end (live starts are ascending: check starts(0))
    def commitIfSettled(): Unit =
      if (qKeys.nonEmpty && (pcs.isEmpty || starts(0) >= qLastEnd)) {
        settled += qTotal
        qKeys.clear(); qCounts.clear(); qEnds.clear()
      }

    // invariant-3 repair after thread deaths: bucket boundaries only
    // need to distinguish LIVE thread starts (drops happen at a live
    // accepter's start; later injections always land above every
    // bucket key, so a lost separation never comes back). Merge
    // adjacent buckets whose keys no live start separates — keeps
    // buckets ≤ |threads| + 1 even when the threads that keyed them
    // died by char-fail rather than by an accept.
    def compactBuckets(): Unit = {
      if (qKeys.length <= 1) return
      // effective key = largest live start ≤ key (−∞ when none);
      // starts is ascending, buckets keys ascending → one sweep
      def eff(k: Long): Long = {
        var lo = 0; var hi = starts.length - 1; var best = Long.MinValue
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (starts(mid) <= k) { best = starts(mid); lo = mid + 1 }
          else hi = mid - 1
        }
        best
      }
      var i = 1
      while (i < qKeys.length) {
        if (eff(qKeys(i)) == eff(qKeys(i - 1))) {
          qCounts(i - 1) += qCounts(i)
          qEnds(i - 1) = qEnds(i)
          qKeys.remove(i); qCounts.remove(i); qEnds.remove(i)
        } else i += 1
      }
    }

    var i = 0
    while (i < chunk.length) {
      val c = chunk.charAt(i)
      processAccepts()
      commitIfSettled()
      // inject a potential match starting at pos (lowest priority —
      // leftmost preference is exactly this ordering)
      add(pcs, starts, 0, pos)
      // step: consume c
      val np = ArrayBuffer.empty[Int]
      val ns = ArrayBuffer.empty[Long]
      seen.clear()
      var k = 0
      while (k < pcs.length) {
        insts(pcs(k)) match {
          case Chr(neg, ranges, nx) =>
            var hit = false
            var r = 0
            while (!hit && r < ranges.length) {
              if (c >= ranges(r) && c <= ranges(r + 1)) hit = true
              r += 2
            }
            if (hit != neg) add(np, ns, nx, starts(k))
          case _ => // Accept cannot appear here (resolved above)
        }
        k += 1
      }
      pcs = np; starts = ns
      // amortized bucket repair: only when deaths inflated the count
      if (qKeys.length > pcs.length + 1) compactBuckets()
      pos += 1
      i += 1
    }
    // resolve any accept ending exactly at the chunk boundary so the
    // stored state never carries Accept threads (matchCount relies on
    // this) and `seen` is irrelevant across feeds
    processAccepts()
    commitIfSettled()
    compactBuckets()

    PikeState(pcs.toArray, starts.toArray, qKeys.toArray,
      qCounts.toArray, qEnds.toArray, settled, pos)
  }
}
