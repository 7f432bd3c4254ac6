package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.expressions.StringSimilarity

class StringSimilaritySpec extends AnyFunSuite with SparkTestBase {

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinkler(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("jaroWinkler kernel matches DuckDB-pinned constants") {
    // every expected value below was produced by DuckDB's
    // jaro_winkler_similarity during the differential pinning run
    val eps = 1e-12
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < eps)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < eps)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < eps)
    assert(math.abs(jw("PENNSYLVANIA", "PENNCISYLVANIA")
      - 0.9214285714285715) < eps)
    // boost threshold is strict >0.7 and prefix-capped at 4
    assert(math.abs(jw("abcdefghij", "abcdefghxy") - 0.92) < eps)
    assert(math.abs(jw("abcdexxxxx", "abcdeyyyyy")
      - 0.6666666666666666) < eps) // below threshold: NO boost
    // edge semantics: empty → 0 (both-empty too), window-0 swap → 0
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("ab", "ba") === 0.0)
    assert(jw("a", "a") === 1.0)
    // byte-level (NOT code-point) matching on multi-byte UTF-8 —
    // DuckDB gives the same 0.849206… for the underlying jaro and
    // this jw on the ñ pair
    assert(math.abs(jw("ñoño", "ñoñó") - 0.9095238095238095) < eps)
  }

  test("jaro_winkler Column: codegen and interpreted agree, null-safe") {
    import spark.implicits._
    val df = Seq(
      ("MARTHA", "MARHTA"), ("CRATE", "TRACE"), ("", ""),
      ("ñoño", "ñoñó"), ("same", "same"))
      .toDF("a", "b")
    val out = df.select(FuzzyJoin.jaroWinkler(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0))
    val expected = Array(jw("MARTHA", "MARHTA"), jw("CRATE", "TRACE"),
      0.0, jw("ñoño", "ñoñó"), 1.0)
    out.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12)
    }
    val nulls = Seq((Some("x"), None: Option[String]), (None, Some("y")))
      .toDF("a", "b")
      .select(FuzzyJoin.jaroWinkler(col("a"), col("b")).as("s"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("jaroWinklerPairs: length-ratio prune loses no qualifying pair") {
    import spark.implicits._
    val names = Seq("jonathan", "jonathon", "jon", "jonatan",
      "katherine", "katharine", "kate", "xx")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name")
    val got = FuzzyJoin.jaroWinklerPairs(df, "id", "name", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force on the kernel directly
    val want = (for {
      (a, i) <- names.zipWithIndex
      (b, j) <- names.zipWithIndex if i < j
      if jw(a, b) >= 0.9
    } yield (i.toLong, j.toLong)).toSet
    assert(got === want)
    assert(want.contains((0L, 1L))) // jonathan/jonathon really qualifies
  }
}
