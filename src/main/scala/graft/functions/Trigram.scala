package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** pg_trgm-style trigram similarity — the PostgreSQL `similarity()` /
  * `%` operator family the reference's target ecosystem leans on for
  * fuzzy string matching, re-expressed Spark-first.
  *
  * Semantics follow pg_trgm: lowercase, non-alphanumerics split words,
  * each word padded with two leading and one trailing space, trigrams
  * unioned per string, similarity = |∩| / |∪| of the two distinct
  * trigram sets.
  *
  * Scale shape for the pair search: NEVER a cross join — trigrams
  * explode to an inverted index, candidate pairs come from an
  * equi-join on the trigram, and the Jaccard needs no re-intersection:
  * shared counts come from the join aggregation and
  * |∪| = |a| + |b| − shared. Ultra-common trigrams make hot join keys;
  * `maxDf` drops them from the index (both sides, so candidate
  * generation stays symmetric) the way search engines drop stopwords —
  * pairs sharing ONLY dropped trigrams are missed, which is the
  * standard recall trade; surviving candidates are re-scored from the
  * FULL trigram sets, so reported sims are exact either way.
  */
object Trigram {

  /** Distinct padded-word trigram set of a string column. */
  def trigrams(s: Column): Column = {
    val words = filter(
      split(regexp_replace(lower(s), "[^a-z0-9]+", " "), " "),
      w => length(w) > 0)
    // materialize padded words first: an inline concat inside the
    // shingle lambda would re-evaluate per trigram (lambda discipline)
    val padded = transform(words, w => concat(lit("  "), w, lit(" ")))
    array_distinct(flatten(transform(padded, p =>
      transform(sequence(lit(1), length(p) - 2), i => p.substr(i, lit(3))))))
  }

  /** pg_trgm similarity() of two string columns (0 when either side
    * has no trigrams, like pg_trgm).
    */
  def similarity(a: Column, b: Column): Column = {
    val ta = trigrams(a); val tb = trigrams(b)
    val inter = size(array_intersect(ta, tb)).cast("double")
    val union = size(ta) + size(tb) - size(array_intersect(ta, tb))
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** All pairs with trigram similarity ≥ threshold, via the inverted
    * index (id, trigram) equi-join — the `%` join at corpus scale.
    * Output: (id_a, id_b, sim) with id_a < id_b, sim floor-quantized
    * to 4 decimals.
    */
  def similarPairs(df: DataFrame, idCol: String, strCol: String,
      threshold: Double, maxDf: Option[Long] = None): DataFrame = {
    require(threshold > 0, "threshold must be > 0 (pairs must share a trigram)")
    val sets = df.select(col(idCol).as("__id"),
      trigrams(col(strCol)).as("__tg"))
    val index = {
      val full = sets.select(col("__id"), explode(col("__tg")).as("__t"))
      maxDf match {
        case Some(cap) =>
          // drop ultra-common trigrams from the index: partial-agg'd
          // df count, broadcast back as a semi-filter
          val rare = full.groupBy(col("__t"))
            .agg(count(lit(1)).as("__df"))
            .filter(col("__df") <= cap)
            .select(col("__t"))
          full.join(broadcast(rare), Seq("__t"))
        case None => full
      }
    }
    val l = index.select(col("__t"), col("__id").as("id_a"))
    val r = index.select(col("__t"), col("__id").as("id_b"))
    val cands = l.join(r, Seq("__t"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // exact re-score from the FULL trigram sets (candidates only), so
    // sims are identical with or without the maxDf index cap
    val inter = size(array_intersect(col("__ta"), col("__tb"))).cast("double")
    // the minus stays on the FIRST line: a leading "- expr" on its own
    // line parses as a separate unary statement and silently drops the
    // subtraction (caught by the brute-force parity spec)
    val union = size(col("__ta")) + size(col("__tb")) -
      size(array_intersect(col("__ta"), col("__tb")))
    cands
      .join(sets.select(col("__id").as("id_a"), col("__tg").as("__ta")), "id_a")
      .join(sets.select(col("__id").as("id_b"), col("__tg").as("__tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (floor(when(union === 0, lit(0.0)).otherwise(inter / union)
          * 10000) / 10000).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
