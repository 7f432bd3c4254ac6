package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM spec for the incremental Pike VM: java.util.regex parity
  * at every chunk boundary (the streaming contract), bounded state
  * under adversarial inputs, and compile-time rejections.
  */
class PikeRegexSpec extends AnyFunSuite {

  private def javaCount(pattern: String, s: String): Long = {
    val m = java.util.regex.Pattern.compile(pattern).matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  /** Feed `s` in the given chunk sizes, asserting java-find parity at
    * every boundary (= every possible micro-batch edge) and the state
    * bound along the way. Returns the final state.
    */
  private def feedAndCheck(pattern: String, s: String,
      chunks: Seq[Int]): PikeState = {
    val prog = PikeRegex.compile(pattern)
    var st = PikeEngine.initial
    var off = 0
    val cuts = chunks.iterator
    while (off < s.length) {
      val len = math.min(if (cuts.hasNext) math.max(1, cuts.next()) else
        s.length - off, s.length - off)
      st = PikeEngine.feed(prog, st, s.substring(off, off + len))
      off += len
      val prefix = s.substring(0, off)
      assert(PikeEngine.matchCount(st) === javaCount(pattern, prefix),
        s"pattern '$pattern' prefix '${prefix.take(80)}' (len $off)")
      assert(st.pos === off)
      // bounded state: threads dedupe by pc; queue buckets keyed by
      // live-thread starts
      assert(st.pcs.length <= prog.size,
        s"thread frontier ${st.pcs.length} > program ${prog.size}")
      assert(st.qKeys.length <= st.pcs.length + 1,
        s"queue buckets ${st.qKeys.length} > threads+1")
    }
    st
  }

  private val patterns = Seq(
    "v[ce]*p",        // the driver gate's pattern
    "vc*p",           // boundary-spanning spec pattern
    "ab*c|b",         // greedy overrun superseding a queued match
    "b+",             // greedy run must not split at chunk edges
    "a.c",
    "(vc)+p",
    "v(c|e)+?p",      // lazy quantifier
    "a{2,4}b",
    "c{3}",
    "v[^p]*p",
    "(ab|a)(b|c)",    // alternation priority (leftmost-first, not longest)
    "s(vc*p)*s",
    "\\w\\d?[ce]")

  test("java find() parity on random journeys at every chunk boundary") {
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "vcepsab d1".toCharArray
    for (pat <- patterns; trial <- 1 to 40) {
      val len = 1 + rnd.nextInt(120)
      val s = Array.fill(len)(alphabet(rnd.nextInt(alphabet.length)))
        .mkString
      val chunks = Seq.fill(1 + rnd.nextInt(12))(1 + rnd.nextInt(9))
      feedAndCheck(pat, s, chunks)
      val _ = trial
    }
  }

  test("adversarial runs: single-char chunks equal whole-string feed") {
    // worst case for the commit protocol: every boundary lands inside
    // a potential match
    for (pat <- Seq("v[ce]*p", "ab*c|b", "b+", "(ab|a)(b|c)")) {
      val s = "vabbbccbbepvcvccpabcbbabbb" * 8
      feedAndCheck(pat, s, Seq.fill(s.length)(1))
    }
  }

  test("state stays O(automaton), independent of journey length") {
    // 1) greedy-overrun adversary: 'a' + 200k 'b' with ab*c|b — the
    //    naive design queues one pending match per 'b'; the bucket
    //    compression must keep it at one bucket
    val prog = PikeRegex.compile("ab*c|b")
    var st = PikeEngine.feed(prog, PikeEngine.initial, "a")
    val chunk = "b" * 1000
    (1 to 200).foreach { _ => st = PikeEngine.feed(prog, st, chunk) }
    assert(st.pos === 200001L)
    assert(st.pcs.length <= prog.size)
    assert(st.qKeys.length <= st.pcs.length + 1)
    // resolution: 'c' arrives → the greedy ab*c supersedes all 200k
    // queued b-matches with ONE match
    val done = PikeEngine.feed(prog, st, "c")
    assert(PikeEngine.matchCount(done) === 1L)
    // 2) same prefix but 'd' kills the greedy thread → all queued
    //    b-matches commit
    val dead = PikeEngine.feed(prog, st, "d")
    assert(PikeEngine.matchCount(dead) === 200000L)
    assert(dead.qKeys.isEmpty) // committed, not queued
    // 3) open [ce]* run on the gate pattern: state must not grow with
    //    the run
    val gp = PikeRegex.compile("v[ce]*p")
    var gs = PikeEngine.feed(gp, PikeEngine.initial, "v")
    (1 to 200).foreach { _ => gs = PikeEngine.feed(gp, gs, "c" * 1000) }
    assert(gs.pcs.length <= gp.size && gs.qKeys.length <= 1)
    assert(PikeEngine.matchCount(
      PikeEngine.feed(gp, gs, "p")) === 1L)
  }

  test("per-batch cost is flat as history grows (no history re-scan)") {
    // the round-13 design re-ran the regex over the whole journey per
    // batch (quadratic in total); the automaton touches each char once.
    // Wall-clock flatness is swept in ScaleSmoke; here we assert the
    // structural guarantee: feeding a chunk advances pos by exactly the
    // chunk length with state arrays bounded, after 10^6 chars of
    // history
    val prog = PikeRegex.compile("v[ce]*p")
    var st = PikeEngine.initial
    val big = "vcecep" * 200
    (1 to 1000).foreach(_ => st = PikeEngine.feed(prog, st, big))
    assert(st.pos === 1200000L)
    assert(st.pcs.length <= prog.size)
    assert(PikeEngine.matchCount(st) === 200000L)
  }

  test("fuzz: randomly GENERATED subset patterns match java semantics") {
    // the fixed pattern list pins known shapes; this generates novel
    // ones from the subset grammar — nested groups, lazy quantifiers,
    // classes with ranges/negation, {m,n} — and cross-checks the
    // count against java.util.regex at random chunk boundaries
    val rnd = new scala.util.Random(0xF00DL)
    val alphabet = "abcde"
    def atom(depth: Int): String = rnd.nextInt(8) match {
      case 0 | 1 | 2 => alphabet(rnd.nextInt(alphabet.length)).toString
      case 3 => "."
      case 4 =>
        val neg = if (rnd.nextBoolean()) "^" else ""
        val n = 1 + rnd.nextInt(3)
        val items = Seq.fill(n)(rnd.nextInt(3) match {
          case 0 => alphabet(rnd.nextInt(alphabet.length)).toString
          case 1 => "a-c"
          case _ => "d-e"
        })
        s"[$neg${items.mkString}]"
      case 5 if depth < 2 => s"(${alt(depth + 1)})"
      case 6 if depth < 2 => s"(?:${alt(depth + 1)})"
      case _ => alphabet(rnd.nextInt(alphabet.length)).toString
    }
    def rep(depth: Int): String = {
      val a = atom(depth)
      val q = rnd.nextInt(8) match {
        case 0 => "*"
        case 1 => "+"
        case 2 => "?"
        case 3 => s"{${1 + rnd.nextInt(2)},${2 + rnd.nextInt(3)}}"
        case 4 => s"{${1 + rnd.nextInt(3)}}"
        case _ => ""
      }
      val lazyQ =
        if (q.nonEmpty && q != "?" && rnd.nextInt(4) == 0) "?" else ""
      a + q + lazyQ
    }
    def cat(depth: Int): String =
      Seq.fill(1 + rnd.nextInt(3))(rep(depth)).mkString
    def alt(depth: Int): String =
      Seq.fill(1 + rnd.nextInt(2))(cat(depth)).mkString("|")
    var tried = 0
    var run = 0
    while (run < 150 && tried < 600) {
      tried += 1
      val pat = alt(0)
      val ok =
        try { PikeRegex.compile(pat); true }
        catch { case _: IllegalArgumentException => false } // empty-match etc.
      if (ok) {
        run += 1
        (1 to 4).foreach { _ =>
          val len = 1 + rnd.nextInt(60)
          val s = Array.fill(len)(
            alphabet(rnd.nextInt(alphabet.length))).mkString
          val chunks = Seq.fill(1 + rnd.nextInt(6))(1 + rnd.nextInt(7))
          feedAndCheck(pat, s, chunks)
        }
      }
    }
    assert(run >= 100, s"only $run runnable patterns out of $tried")
  }

  test("compile rejects what the contract excludes") {
    intercept[IllegalArgumentException](PikeRegex.compile("a*")) // empty match
    intercept[IllegalArgumentException](PikeRegex.compile("a|"))
    intercept[IllegalArgumentException](PikeRegex.compile("(a"))
    intercept[IllegalArgumentException](PikeRegex.compile("a{3,1}"))
    intercept[IllegalArgumentException](PikeRegex.compile("a\\1")) // backref
    intercept[IllegalArgumentException](PikeRegex.compile("*a"))
    intercept[IllegalArgumentException](PikeRegex.compile("[z-a]"))
    intercept[IllegalArgumentException](PikeRegex.compile(""))
  }

  test("escapes and classes match java semantics") {
    feedAndCheck("\\d+x", "12x9 34xx7x", Seq(3, 2, 4))
    feedAndCheck("a\\.b", "a.bxaxb a.b", Seq(4, 4))
    feedAndCheck("[a-c-]+z", "ab-cz a-z xz", Seq(5, 5))
    feedAndCheck("[\\d]{2}", "1234567", Seq(1, 1, 1, 1, 1, 1, 1))
  }

  test("class grammar corners: ']' first member and shorthand-dash " +
      "match java (and RE2) union semantics") {
    // both engines verified directly (round 15): "[]a]" is the class
    // {']', 'a'} and "[\d-x]" is \d ∪ {'-', 'x'} in java 17 AND
    // DuckDB/RE2 — the parser must keep accepting them with exactly
    // that reading, not reject them as ADVICE once assumed
    feedAndCheck("[]a]+", "]a] b]a", Seq(2, 3, 2))
    feedAndCheck("[^]a]+", "]xy]azz", Seq(3, 4))
    feedAndCheck("[\\d-x]+", "12-x m9", Seq(1, 2, 4))
    feedAndCheck("[\\d-]+", "1-2 3", Seq(2, 3))
  }

  test("span extraction is impossible under the state bound: the " +
      "witnesses from the scaladoc, measured") {
    // witness 1: pending-span COUNT grows linearly while the bucket
    // state stays O(1) — emitting per-match spans would need the
    // queue uncompressed, i.e. O(n) state
    val prog = PikeRegex.compile("ab*c|b")
    var st = PikeEngine.initial
    val counts = Seq(200, 400, 800).map { n =>
      st = PikeEngine.initial
      st = PikeEngine.feed(prog, st, "a" + "b" * n)
      // all n pending b-matches compress into one bucket under the
      // live ab*c thread's start
      assert(st.qKeys.length <= st.pcs.length + 1,
        s"bucket bound broken: ${st.qKeys.length} vs ${st.pcs.length}")
      st.qCounts.sum
    }
    assert(counts === Seq(200, 400, 800),
      "pending matches (= spans an extractor must hold) grow with input")
    // witness 2: one candidate's span covers the whole history — run
    // TEXT emission would need the full journey buffered. Java agrees
    // the final match is history-sized once the 'p' arrives.
    val m = java.util.regex.Pattern.compile("v[ce]*p")
      .matcher("v" + "c" * 5000 + "p")
    assert(m.find() && m.group().length == 5002)
    val prog2 = PikeRegex.compile("v[ce]*p")
    var st2 = PikeEngine.initial
    st2 = PikeEngine.feed(prog2, st2, "v" + "c" * 5000)
    // the engine holds O(automaton) state while the in-flight
    // candidate already spans 5001 chars it never stored
    assert(st2.pcs.length <= prog2.size &&
      st2.qKeys.length <= st2.pcs.length + 1)
    st2 = PikeEngine.feed(prog2, st2, "p")
    assert(PikeEngine.matchCount(st2) === 1L)
  }

  test("counted-repetition bounds are capped and over-Int is the " +
      "parser's own error") {
    // {m,n} compiles to O(n) instruction copies — unvalidated bounds
    // are a driver OOM. RE2 caps at 1000; so does this parser.
    PikeRegex.compile("a{2,1000}") // at the cap: fine
    val e1 = intercept[IllegalArgumentException](
      PikeRegex.compile("a{1001}"))
    assert(e1.getMessage.contains("repetition bound"))
    val e2 = intercept[IllegalArgumentException](
      PikeRegex.compile("a{2000000000}"))
    assert(e2.getMessage.contains("repetition bound"))
    // over Int.MaxValue: parser error with position context, never a
    // raw NumberFormatException
    val e3 = intercept[IllegalArgumentException](
      PikeRegex.compile("a{99999999999}"))
    assert(e3.getMessage.contains("integer out of range"))
  }
}
