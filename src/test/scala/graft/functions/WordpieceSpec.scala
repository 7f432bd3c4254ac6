package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Greedy longest-match WordPiece (expressions.WordpieceTokenize via
  * TextAnalysis.wordpiecePieces) against the published algorithm's
  * behaviors: longest-match priority, continuation marking, the
  * no-backtracking UNK collapse, and codegen/eval parity.
  */
class WordpieceSpec extends AnyFunSuite with SparkTestBase {

  // The BERT paper's canonical example vocab shape.
  private val vocab = Seq(
    "un", "aff", "able", "runn", "run", "##ning", "##ing", "##able",
    "##aff", "##ab", "##le", "hug", "##s", "b", "##u", "##g")

  private def pieces(word: String, v: Seq[String] = vocab): Seq[String] = {
    import spark.implicits._
    Seq(word).toDF("w")
      .select(TextAnalysis.wordpiecePieces(col("w"), v).as("p"))
      .as[Seq[String]].head()
  }

  test("longest match wins at every position") {
    // "runn" beats "run" at the start; "##ing" then completes.
    assert(pieces("running") === Seq("runn", "##ing"))
    // "un" + "##aff" (beats ##ab? no — ##aff is longer... both probe
    // from longest) + "##able"
    assert(pieces("unaffable") === Seq("un", "##aff", "##able"))
  }

  test("continuation pieces keep their ## marker and round-trip") {
    val p = pieces("hugs")
    assert(p === Seq("hug", "##s"))
    assert(p.map(_.stripPrefix("##")).mkString === "hugs")
  }

  test("greedy failure collapses the whole word to [UNK], no backtracking") {
    // Greedy takes "runn", then "able" has no continuation path
    // ("##able" matches! so pick a true failure): "runx" — after
    // "runn"? no, "runx": greedy start "run" (runn doesn't prefix),
    // then "##x" missing → UNK even though nothing could save it.
    assert(pieces("runx") === Seq("[UNK]"))
    // A word where backtracking WOULD succeed but greedy fails:
    // vocab {ab, abc, ##d, ##cd}: "abcd" → greedy "abc" + "##d" works;
    // {abc, ab, ##cd}: greedy "abc" then "##d" missing → UNK, though
    // "ab"+"##cd" segments it. Pins the no-backtracking contract.
    assert(pieces("abcd", Seq("abc", "ab", "##cd")) === Seq("[UNK]"))
  }

  test("unknown leading character → UNK; empty string → empty array") {
    assert(pieces("zzz") === Seq("[UNK]"))
    assert(pieces("") === Seq.empty)
  }

  test("single-piece whole-word match") {
    assert(pieces("run") === Seq("run"))
  }

  test("null word → null pieces") {
    import spark.implicits._
    val out = Seq[Option[String]](None).toDF("w")
      .select(TextAnalysis.wordpiecePieces(col("w"), vocab).as("p"))
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("codegen and interpreted eval agree on a word batch") {
    import spark.implicits._
    val words = Seq("running", "unaffable", "hugs", "run", "bug",
      "runx", "", "bu", "hug")
    val df = words.toDF("w")
      .select(col("w"), TextAnalysis.wordpiecePieces(col("w"), vocab).as("p"))
    val fromPlan = df.as[(String, Seq[String])].collect().toMap
    val expr = graft.expressions.WordpieceTokenize(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), vocab)
    words.foreach { w =>
      val direct = expr.tokenizeWord(
        org.apache.spark.unsafe.types.UTF8String.fromString(w))
      val got = (0 until direct.numElements())
        .map(i => direct.getUTF8String(i).toString)
      assert(got === fromPlan(w), s"word $w")
    }
  }

  test("property: non-UNK segmentations round-trip; continuations are ##-marked") {
    val rnd = new scala.util.Random(42)
    def randWord(n: Int, alphabet: String) =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    // vocab over {a,b,c} but words over {a,b,c,d}: any word containing
    // 'd' must UNK, everything else must round-trip
    def randWordFull(n: Int) = randWord(n, "abcd")
    val vocabPieces = (1 to 30).map(_ => randWord(rnd.nextInt(3) + 1, "abc"))
      .distinct.filter(_.nonEmpty)
    val v = vocabPieces ++ vocabPieces.map("##" + _)
    val expr = graft.expressions.WordpieceTokenize(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), v)
    var unks = 0
    (1 to 500).foreach { _ =>
      val w = randWordFull(rnd.nextInt(12))
      val arr = expr.tokenizeWord(
        org.apache.spark.unsafe.types.UTF8String.fromString(w))
      val pieces = (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString)
      if (pieces == Seq("[UNK]")) unks += 1
      else {
        assert(pieces.map(_.stripPrefix("##")).mkString === w,
          s"word $w -> $pieces")
        if (pieces.length > 1) {
          assert(!pieces.head.startsWith("##"))
          assert(pieces.tail.forall(_.startsWith("##")), s"$w -> $pieces")
        }
      }
    }
    // the random vocab genuinely exercises both outcomes
    assert(unks > 0 && unks < 500)
  }

  test("gate vocab: closed form = 1 whole-word piece or letters with ##ing collapse") {
    // Mirrors the txt_wordpiece oracle's arithmetic on hand-checked words.
    val letters = ('a' to 'z').map(_.toString)
    val whole = Seq("the", "and", "ing", "that")
    val v = whole ++ letters ++ letters.map("##" + _) :+ "##ing"
    assert(pieces("the", v) === Seq("the"))
    // "theory": longest start = "the", tail "ory" → ##o ##r ##y
    assert(pieces("theory", v).length === 4)
    // "singing": s + ##ing + ##ing (mid-word greedy 'ing' hits)
    assert(pieces("singing", v) === Seq("s", "##ing", "##ing"))
    // "ingest": whole word "ing" prefixes, tail e-s-t
    assert(pieces("ingest", v) === Seq("ing", "##e", "##s", "##t"))
    // "kings": k + ##ing + ##s — leftmost non-overlap from pos 1
    assert(pieces("kings", v) === Seq("k", "##ing", "##s"))
  }
}
