package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** All pairs with trigram similarity ≥ threshold, via a
    * prefix-filtered inverted index (AllPairs/PPJoin-style, Bayardo et
    * al. WWW'07) — the `%` join at corpus scale, EXACT despite the
    * pruning. Output: (id_a, id_b, sim) with id_a < id_b, sim
    * floor-quantized to 4 decimals.
    *
    * Why a plain inverted index is not enough: corpora with a shared
    * surface pattern (TPC-H `Customer#000…`, URL prefixes, boilerplate)
    * put every row under the same hot trigrams, and the candidate
    * equi-join degenerates to all-pairs. The two classic EXACT filters
    * fix that:
    *  - prefix filter: J(a,b) ≥ t ⟹ |a∩b| ≥ ⌈t·|a|⌉, so a pair must
    *    share at least one of the first `|x| − ⌈t·|x|⌉ + 1` trigrams
    *    of EACH side under any single global trigram order. Ordering
    *    by ascending document frequency makes those prefix trigrams
    *    the rarest ones — hot trigrams land outside every prefix and
    *    never generate candidates.
    *  - length filter: J(a,b) ≥ t ⟹ t·|a| ≤ |b| (and symmetrically),
    *    applied on the candidate join.
    * Surviving candidates are re-scored from the FULL trigram sets, so
    * reported sims are exact; the filters only shrink the candidate
    * set, never the result (the brute-force parity spec asserts this).
    */
  def similarPairs(df: DataFrame, idCol: String, strCol: String,
      threshold: Double, maxDf: Option[Long] = None): DataFrame = {
    require(threshold > 0, "threshold must be > 0 (pairs must share a trigram)")
    val sets = df.select(col(idCol).as("__id"),
      trigrams(col(strCol)).as("__tg"))
    val full = sets.select(col("__id"), size(col("__tg")).as("__sz"),
      explode(col("__tg")).as("__t"))
    // global trigram df — the prefix order key. Trigram vocabulary is
    // bounded (≤ ~50k over [a-z0-9 ]³), so the df table broadcasts at
    // any corpus size.
    val dfTab = full.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val kept = maxDf match {
      // optional recall-trading stopword cap, as before (df-capped
      // trigrams leave the index entirely)
      case Some(cap) => full.join(
        broadcast(dfTab.filter(col("__df") <= cap)), Seq("__t"))
      case None => full.join(broadcast(dfTab), Seq("__t"))
    }
    // prefix slice: keep the `sz − ⌈t·sz⌉ + 1` globally-rarest trigrams
    // of each set. The 1e-9 nudge makes double ceil match mathematical
    // ceil when t·sz is integral (12.000000000000002 must ceil to 12,
    // not 13 — a too-short prefix would break exactness; the nudge can
    // only lengthen the prefix, which is always safe).
    val rankW = Window.partitionBy(col("__id"))
      .orderBy(col("__df").asc, col("__t").asc)
    val prefix = kept
      .withColumn("__rnk", row_number().over(rankW))
      .filter(col("__rnk") <=
        col("__sz") - ceil(lit(threshold) * col("__sz") - lit(1e-9)) + 1)
    val l = prefix.select(col("__t"), col("__id").as("id_a"),
      col("__sz").as("__sza"))
    val r = prefix.select(col("__t"), col("__id").as("id_b"),
      col("__sz").as("__szb"))
    val cands = l.join(r, Seq("__t"))
      .filter(col("id_a") < col("id_b") &&
        col("__szb") >= lit(threshold) * col("__sza") - lit(1e-9) &&
        col("__sza") >= lit(threshold) * col("__szb") - lit(1e-9))
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
