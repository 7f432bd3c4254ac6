package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class FuzzyJoinSpec extends AnyFunSuite with SparkTestBase {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "martha"), (2L, "marhta"),   // transposition = ed 2
      (3L, "marta"),                    // 1 deletion from martha
      (4L, "smith"), (5L, "smyth"),     // 1 substitution
      (6L, "smithe"),                   // 1 insertion on smith
      (7L, "jones"),                    // isolated
      (8L, ""), (9L, "a"),              // degenerate lengths
      (10L, "jonse")                    // ed-2 from jones (swap)
    ).toDF("id", "s")
  }

  /** Quadratic ground truth computed with Spark's own levenshtein. */
  private def bruteForce(maxDist: Int): Set[(Long, Long, Long)] = {
    val df = fixture
    val l = df.select(col("id").as("id_a"), col("s").as("sa"))
    val r = df.select(col("id").as("id_b"), col("s").as("sb"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).cast("bigint").as("dist"))
      .filter(col("dist") <= maxDist)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
  }

  test("editDistancePairs matches brute force at d=1 and d=2") {
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistancePairs(fixture, "id", "s", d)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(got === bruteForce(d), s"mismatch at maxDist=$d")
    }
  }

  test("deletion neighborhood: size and membership") {
    import spark.implicits._
    val row = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionNeighborhood(col("s"), 1).as("v"))
      .head.getSeq[String](0).toSet
    assert(row === Set("abc", "bc", "ac", "ab"))
    val d2 = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionNeighborhood(col("s"), 2).as("v"))
      .head.getSeq[String](0).toSet
    assert(d2 === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    // empty string survives the sequence(1,0)-counts-down trap
    val empty = Seq("").toDF("s")
      .select(FuzzyJoin.deletionNeighborhood(col("s"), 2).as("v"))
      .head.getSeq[String](0).toSet
    assert(empty === Set(""))
  }

  test("two-sided join finds cross-table matches only") {
    import spark.implicits._
    val left = Seq((1L, "alpha"), (2L, "beta")).toDF("lid", "ls")
    val right = Seq((10L, "alpha"), (11L, "alpfa"), (12L, "gamma"))
      .toDF("rid", "rs")
    val got = FuzzyJoin.editDistanceJoin(
      left, "lid", "ls", right, "rid", "rs", maxDist = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got === Set((1L, 10L, 0L), (1L, 11L, 1L)))
  }

  test("null strings pair with nothing") {
    import spark.implicits._
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("x")))
      .toDF("id", "s")
    val got = FuzzyJoin.editDistancePairs(df, "id", "s", 1)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 3L)))
  }
}
