package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bin bucketing.
  *
  * Spark plans a bare `p.ts BETWEEN i.lo AND i.hi` join (with or
  * without equi keys) as an equi-join whose range predicate is a
  * post-join filter over every key-colliding pair — or, keyless, as a
  * broadcast-nested-loop. Both are quadratic in the collision group.
  * Binning makes the range part of the JOIN KEY: intervals explode to
  * the bins they cover, points map to their single bin, and the join
  * is a pure equi-join on (keys…, bin) with the exact BETWEEN as a
  * residual filter on candidates only.
  *
  * At 100 TB: one shuffle of each side on (keys, bin); interval
  * duplication is len/binWidth + 1 rows, so pick binWidth near the
  * typical interval length (duplication ≈2×) — cost scales linearly,
  * never with the square of rows-per-key.
  */
object RangeJoin {

  /** Exact floor division — (x - pmod(x,w)) / w — correct for negative
    * x. Column `/` is double division (53-bit mantissa loses ns-epoch
    * magnitudes), so the quotient goes through DECIMAL: exact, and the
    * subtraction guarantees an integral result.
    */
  private def binOf(c: Column, w: Long): Column = {
    val d = c.cast("decimal(38,0)")
    ((d - pmod(d, lit(w))) / lit(w)).cast("long")
  }

  /** Inner-join `points` to every interval containing them.
    * Column names of the two inputs must be disjoint (alias upstream);
    * output = point columns ++ interval columns.
    *
    * @param pointCol  integral column on `points`
    * @param startCol/endCol inclusive integral bounds on `intervals`
    * @param binWidth  bin size, same unit as the columns
    * @param equiKeys  additional equality keys present on BOTH sides
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String, binWidth: Long,
      equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- equiKeys
    require(overlap.isEmpty,
      s"non-key column names must be disjoint, clash: $overlap")

    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startCol), binWidth),
        binOf(col(endCol), binWidth))))
    val pt = points.withColumn("__bin", binOf(col(pointCol), binWidth))

    val joinKeys = equiKeys :+ "__bin"
    pt.join(iv, joinKeys, "inner")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .select((points.columns ++ intervals.columns.filterNot(equiKeys.contains))
        .toIndexedSeq.map(col): _*)
  }
}
