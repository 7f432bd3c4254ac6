package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Constraint validation as distributed queries — the Spark-native
  * expression of the reference's constraint records (SURVEY §2.A A22/A23,
  * §2.D): rather than trusting the target DB to reject bad rows after an
  * expensive load, validate up front as scans/joins.
  */
object Validation {

  /** A22: foreign-key validation = left-anti join child→parent.
    * Orphans are rows whose FK has no matching parent key. At scale the
    * parent side of a dimension FK is usually broadcastable — pass
    * `broadcastParent = true` to hint it and avoid a shuffle of the
    * (huge) child side.
    */
  def fkOrphans(child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String],
      broadcastParent: Boolean = false): DataFrame = {
    // Anti-join semantics are insensitive to duplicate parent keys, so
    // distinct() is purely a shuffle-volume reduction: worth one
    // map-side-combined Exchange when the parent will itself be
    // shuffled, pure waste when it is broadcast (the HashedRelation
    // dedups keys as it builds).
    val proj = parent.selectExpr(parentKeys: _*)
    val p = if (broadcastParent) broadcast(proj) else proj.distinct()
    val cond = childKeys.zip(parentKeys)
      .map { case (c, pk) => child(c) === p(pk) }.reduce(_ && _)
    child.join(p, cond, "left_anti")
  }

  /** A23: CHECK-constraint validation — rows violating the translated
    * predicate. NULL predicate results do NOT violate a SQL CHECK, so
    * only `false` rows are returned.
    */
  def checkViolations(df: DataFrame, predicate: Column): DataFrame =
    df.filter(!coalesce(predicate, lit(true)))

  def checkViolations(df: DataFrame, predicateSql: String): DataFrame =
    checkViolations(df, expr(predicateSql))

  /** A8/pl:3048–3063: next sequence value after a load —
    * `setval(max(col) [+ step])`; min() for negative-step sequences.
    */
  def sequenceSetval(df: DataFrame, colName: String,
      step: Long = 1L): DataFrame = {
    val agg = if (step < 0) min(col(colName)) else max(col(colName))
    df.agg(agg.cast("long").as("setval"))
  }

  /** PK uniqueness validation (enforcement of A6/A19 records): keys
    * appearing more than once. Map-side partial aggregation makes this
    * one shuffle of (key → count) pairs, not of whole rows.
    */
  def pkDuplicates(df: DataFrame, pkCols: Seq[String]): DataFrame =
    df.groupBy(pkCols.map(col): _*).agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** NOT NULL validation (A4 records): per-column null counts in one
    * pass over the data (single aggregate, no per-column jobs).
    */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("total_rows"),
      cols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")): _*)
}
