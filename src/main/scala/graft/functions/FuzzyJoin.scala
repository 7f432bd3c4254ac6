package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) join without a cross join — the record-
  * linkage / entity-resolution primitive (fuzzy key match between a
  * migrated table and its source, near-identical name detection).
  *
  * Candidate generation is the FastSS deletion-neighborhood scheme:
  * ed(s, t) ≤ d  ⟹  D_d(s) ∩ D_d(t) ≠ ∅, where D_d(x) is the set of
  * strings reachable from x by deleting at most d characters. Each
  * side explodes its neighborhood into an inverted index
  * (variant → id), candidates come from the variant equi-join, and an
  * exact `levenshtein` verify on the candidates kills the false
  * positives the implication direction allows. Same
  * candidates-then-exact-verify shape as the LSH dedup and trigram
  * operators.
  *
  * Scale: |D_1| = L+1 and |D_2| ≈ L²/2 variants per string of length
  * L, so the index explode multiplies rows by that factor — keep
  * `maxDist` ≤ 2 (enforced) and strings key-length (names, codes, not
  * documents). The index carries ONLY (variant, id); the original
  * strings re-join onto the deduplicated candidate pairs, so each
  * string crosses the wire once per candidate, not once per variant.
  * Hot variants (shared prefixes across many rows) make skewed join
  * keys; the candidate equi-join is AQE-skew-splittable, and the
  * distinct() collapse happens before the string re-join so verify
  * work is per-pair, not per-shared-variant.
  */
object FuzzyJoin {

  /** 1-deletion expansion of a single string (the string itself is NOT
    * included): one variant per character position.
    */
  private def deleteOne(s: Column): Column =
    transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))

  /** D_d(s): all strings reachable by deleting AT MOST `d` characters
    * (includes s itself), distinct. Empty/short strings shrink toward
    * "" and stop — `sequence(1, 0)` would count DOWN in Spark, so the
    * empty case is guarded explicitly.
    */
  def deletionNeighborhood(s: Column, d: Int): Column = {
    require(d >= 1 && d <= 2, s"maxDist must be 1 or 2, got $d")
    val d1 = when(length(s) === 0, array(s))
      .otherwise(array_union(array(s), deleteOne(s)))
    if (d == 1) d1
    else array_distinct(flatten(transform(d1, v =>
      when(length(v) === 0, array(v))
        .otherwise(array_union(array(v), deleteOne(v))))))
  }

  /** All unordered pairs within edit distance `maxDist` (1 or 2).
    * Output: (id_a, id_b, dist) with id_a < id_b, dist the exact
    * Levenshtein distance. Null strings pair with nothing.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    val strs = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
    val index = strs.select(col("__id"),
      explode(deletionNeighborhood(col("__s"), maxDist)).as("__v"))
    val cands = index.select(col("__v"), col("__id").as("id_a"))
      .join(index.select(col("__v"), col("__id").as("id_b")), Seq("__v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cands
      .join(strs.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(strs.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb")).cast("bigint").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Two-sided fuzzy equi-join: rows of `left` matched to rows of
    * `right` within edit distance `maxDist`. Output: (left_id,
    * right_id, dist). Identical ids on both sides are allowed (the
    * sides are independent keyspaces).
    */
  /** Jaro-Winkler similarity (codegen expression; byte-level, DuckDB-
    * exact — see expressions.StringSimilarity for pinned semantics).
    */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftglue.Glue
    Glue.column(graft.expressions.JaroWinkler(
      Glue.expression(a), Glue.expression(b)))
  }

  /** All unordered pairs with jaroWinkler ≥ `minSim`. Candidate
    * pruning is the sound LENGTH-RATIO bound: with l1 ≤ l2,
    * jaro ≤ (2 + l1/l2)/3 and jw ≤ 0.6·jaro + 0.4 (prefix ≤ 4, scale
    * 0.1), so jw ≥ θ forces l1/l2 ≥ 5θ − 4. The self-join's band
    * predicate carries that bound; pairs outside it never evaluate
    * the kernel. For θ ≤ 0.8 the bound is vacuous and this IS a
    * quadratic verify — cap or block the input (this is the
    * record-linkage verify stage, not a corpus-scale scan; candidate
    * generation for corpora belongs to the trigram/FastSS indexes).
    */
  def jaroWinklerPairs(df: DataFrame, idCol: String, strCol: String,
      minSim: Double): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, "minSim must be in (0, 1]")
    val ratio = math.max(5.0 * minSim - 4.0, 0.0)
    val a = df.select(col(idCol).as("id_a"), col(strCol).as("__sa"),
      length(col(strCol)).as("__la"))
    val b = df.select(col(idCol).as("id_b"), col(strCol).as("__sb"),
      length(col(strCol)).as("__lb"))
    a.join(b,
        col("id_a") < col("id_b") &&
          least(col("__la"), col("__lb")).cast("double") >=
            lit(ratio) * greatest(col("__la"), col("__lb")))
      .withColumn("sim", jaroWinkler(col("__sa"), col("__sb")))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  def editDistanceJoin(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int): DataFrame = {
    val l = left.filter(col(leftStr).isNotNull)
      .select(col(leftId).as("left_id"), col(leftStr).as("__sl"))
    val r = right.filter(col(rightStr).isNotNull)
      .select(col(rightId).as("right_id"), col(rightStr).as("__sr"))
    val li = l.select(col("left_id"),
      explode(deletionNeighborhood(col("__sl"), maxDist)).as("__v"))
    val ri = r.select(col("right_id"),
      explode(deletionNeighborhood(col("__sr"), maxDist)).as("__v"))
    li.join(ri, Seq("__v"))
      .select(col("left_id"), col("right_id"))
      .distinct()
      .join(l, "left_id")
      .join(r, "right_id")
      .select(col("left_id"), col("right_id"),
        levenshtein(col("__sl"), col("__sr")).cast("bigint").as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
