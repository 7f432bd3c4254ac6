package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** Backward as-of join: attach to every probe row the payload of the
  * most recent build row at-or-before it (per key), the time-series
  * join Spark has no native operator for.
  *
  * Plan shape at 100 TB: the two inputs are UNIONed with a side tag and
  * processed by ONE window pass — a single shuffle on the equi key,
  * linear scan within each key partition (the union is the "sorted
  * merge" of the classic streaming implementation, re-expressed
  * declaratively). The alternative — equi-join on key with a θ filter
  * `probe.ts >= build.ts` then a per-probe max — materializes
  * |probe|×|builds-per-key| intermediate rows and explodes on skewed
  * keys; this never builds a join node at all.
  *
  * Semantics: inclusive (`build.ts <= probe.ts`), matching DuckDB's
  * `ASOF JOIN ON probe.ts >= build.ts` and the common market-data
  * definition. Probes with no prior build keep NULL payloads (left
  * join). Ties between build rows at the same timestamp break toward
  * the greatest `tieCol` value, deterministically.
  */
object AsofJoin {

  /** @param probe       left side; keeps all its columns
    * @param build       right side; all non-key columns become payload
    * @param keyCols     equi keys, same names on both sides
    * @param tsCol       ordering column, same name on both sides
    *                    (any orderable type; integral µs recommended)
    * @param tieCol      build column ordering equal-timestamp builds
    *                    (greatest wins); typically the build row id
    * @param prefix      prepended to payload column names in the output
    */
  def backward(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, prefix: String = "asof_"): DataFrame = {
    val payloadCols = build.columns.filterNot(keyCols.contains).toIndexedSeq
    require(payloadCols.contains(tsCol) || keyCols.contains(tsCol),
      s"build side must carry $tsCol")
    val probeOther =
      probe.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
        .toIndexedSeq

    val payloadStruct = struct(payloadCols.map(col): _*)
    val payloadType = StructType(payloadCols.map(c => build.schema(c)))

    // union schema: keys ++ __ts ++ __build ++ __tie ++ __b ++ probeOther
    val buildSide = build.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__build"),
        // native type, NOT a string cast: a lexicographic tie-break
        // would rank numeric id 9 above 10 ('10' < '9')
        col(tieCol).as("__tie"),
        payloadStruct.as("__b")) ++
      probeOther.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val probeSide = probe.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__build"),
        lit(null).cast(build.schema(tieCol).dataType).as("__tie"),
        lit(null).cast(payloadType).as("__b")) ++
      probeOther.map(col): _*)

    // builds sort BEFORE probes at equal __ts (__build desc) → inclusive
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__build").desc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("__b"), ignoreNulls = true).over(w).as("__c")

    val out: Seq[Column] =
      probe.columns.toIndexedSeq.map {
        case c if c == tsCol => col("__ts").as(tsCol)
        case c               => col(c)
      } ++ payloadCols.map(c => col(s"__c.$c").as(s"$prefix$c"))

    buildSide.union(probeSide)
      .select(col("*"), carried)
      .filter(col("__build") === 0)
      .select(out: _*)
  }
}
