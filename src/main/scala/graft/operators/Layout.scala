package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale: Z-order (Morton)
  * interleaving so a multi-dimensional range predicate prunes files by
  * min/max statistics on ONE stored sort key.
  *
  * Why it matters at 100 TB: parquet readers skip row groups whose
  * column min/max exclude the predicate. A table sorted by `a` alone
  * prunes only `a`-predicates; sorted by interleave(a, b, …) every
  * partition covers a small HYPERCUBE of the key space, so range
  * predicates on ANY of the interleaved dimensions skip most files.
  * The z-value is plain codegen'd integer arithmetic (shift/and/sum) —
  * a map-only projection; the one shuffle is the range repartition any
  * layout rewrite needs.
  */
object Layout {

  /** Morton z-value: bit-interleave of `bits` low bits of each column
    * (bit j of column i lands at position j·N + i). Inputs must be
    * non-negative after caller-side normalization — typically
    * `pmod(col, 2^bits)` for ids or a width-bucketed rank for
    * continuous values; bits·N must fit a signed long.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    val n = cols.size
    require(bits * n <= 63, s"$n cols × $bits bits exceeds a signed long")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftright(c.cast("long"), j).bitwiseAND(lit(1L)) *
      lit(1L << (j * n + i))
    terms.reduce(_ + _)
  }

  /** Rewrite a DataFrame into z-clustered partitions: range-partition
    * by the z-value of `cols`' low `bits` bits, sort within partitions,
    * drop the helper column. Writing the result gives every file a
    * tight hypercube of (min, max) ranges on every clustered dimension
    * — the layout a downstream multi-dim range scan prunes against.
    */
  def zOrderBy(df: DataFrame, cols: Seq[Column], bits: Int,
      numPartitions: Int): DataFrame = {
    require(!df.columns.contains("__zval"),
      "input column '__zval' collides with the zOrderBy working column")
    df.withColumn("__zval", zValue(cols, bits))
      .repartitionByRange(numPartitions, col("__zval"))
      .sortWithinPartitions(col("__zval"))
      .drop("__zval")
  }
}
