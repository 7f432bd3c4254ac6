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

  /** Per-file min/max column statistics — the data-skipping index a
    * lakehouse scan prunes against (parquet row-group stats, Delta/
    * Iceberg file stats, zone maps). One partial-agg'd groupBy on the
    * file id; the stats table is files-sized, not rows-sized, so the
    * planner consults it without touching data.
    *
    * `statCols` each yield `min_<c>` / `max_<c>`; `n_rows` rides along
    * (it prices the skip decision).
    */
  def minMaxStats(df: DataFrame, fileCol: Column,
      statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "minMaxStats needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(fileCol.as("file_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Can a file be skipped for `lo <= c AND c <= hi`? True iff the
    * file's [min, max] envelope misses the predicate range entirely —
    * the standard zone-map test. Plain expression over the stats
    * table; apply with `stats.withColumn("pruned", canPrune(...))`.
    * A file whose stats are NULL (all-null column) never prunes —
    * NULL-safe via coalesce(false).
    */
  def canPrune(statCol: String, lo: Column, hi: Column): Column =
    coalesce(col(s"max_$statCol") < lo || col(s"min_$statCol") > hi,
      lit(false))

  /** Compaction (bin-packing) plan for the small-file problem: within
    * each table partition, assign files in `orderCol` order to output
    * bins of ~`targetSize` bytes via start-offset binning
    * (bin = floor(exclusive-prefix-sum / target)). Deterministic —
    * no greedy tie-breaks — and the window is PARTITIONED by the
    * table partition, so planning 10M files across 10k partitions
    * parallelizes; only a degenerate single-partition table
    * serializes. The plan is files-sized; executing it is a
    * per-bin coalesce-rewrite the caller schedules.
    */
  def compactionPlan(files: DataFrame, partCols: Seq[String],
      orderCol: String, sizeCol: String, targetSize: Long): DataFrame = {
    require(targetSize > 0, "targetSize must be positive")
    require(!files.columns.contains("__start"),
      "input column '__start' collides with the compactionPlan working column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
    files
      .withColumn("__start",
        sum(col(sizeCol)).over(w) - col(sizeCol))
      .withColumn("bin", floor(col("__start") / targetSize))
      .drop("__start")
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
