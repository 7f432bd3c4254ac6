package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** As-of join: attach to every probe row the payload of the nearest
  * build row (per key) — backward (most recent at-or-before), forward
  * (earliest at-or-after), or nearest (closer of the two) — the
  * time-series join Spark has no native operator for.
  *
  * Plan shape at 100 TB: the two inputs are UNIONed with a side tag and
  * processed by ONE window pass — a single shuffle on the equi key,
  * linear scan within each key partition (the union is the "sorted
  * merge" of the classic streaming implementation, re-expressed
  * declaratively). `nearest` adds a second window FRAME over the same
  * hash partitioning — still one Exchange, two sorts, never a join.
  * The alternative — equi-join on key with a θ filter then a per-probe
  * extreme — materializes |probe|×|builds-per-key| intermediate rows
  * and explodes on skewed keys; this never builds a join node at all.
  *
  * Semantics: inclusive on both directions (`build.ts <= probe.ts`
  * backward, `build.ts >= probe.ts` forward), matching DuckDB's
  * `ASOF JOIN ON probe.ts >= build.ts` / `<=` and the common
  * market-data definition. Probes with no matching build keep NULL
  * payloads (left join). Ties between build rows at the same
  * timestamp break deterministically: backward toward the GREATEST
  * `tieCol` (the latest build wins), forward toward the SMALLEST
  * (the earliest build wins). `nearest` breaks equal distances toward
  * the backward match.
  */
object AsofJoin {

  /** @param probe       left side; keeps all its columns
    * @param build       right side; all non-key columns become payload
    * @param keyCols     equi keys, same names on both sides
    * @param tsCol       ordering column, same name on both sides
    *                    (any orderable type; integral µs recommended)
    * @param tieCol      build column ordering equal-timestamp builds;
    *                    typically the build row id
    * @param prefix      prepended to payload column names in the output
    */
  def backward(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, prefix: String = "asof_"): DataFrame =
    joined(probe, build, keyCols, tsCol, tieCol, prefix, Direction.Backward)

  /** Forward as-of: earliest build at-or-after each probe row. */
  def forward(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, prefix: String = "asof_"): DataFrame =
    joined(probe, build, keyCols, tsCol, tieCol, prefix, Direction.Forward)

  /** Nearest as-of: whichever of the backward/forward matches is
    * closer in `tsCol`; equal distances resolve to the backward match.
    * Requires `tsCol` to support `abs(probe.ts - build.ts)` (numeric —
    * use epoch micros for timestamps).
    */
  def nearest(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, prefix: String = "asof_"): DataFrame =
    joined(probe, build, keyCols, tsCol, tieCol, prefix, Direction.Nearest)

  private object Direction extends Enumeration {
    val Backward, Forward, Nearest = Value
  }

  private def joined(probe: DataFrame, build: DataFrame,
      keyCols: Seq[String], tsCol: String, tieCol: String, prefix: String,
      dir: Direction.Value): DataFrame = {
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

    // backward: builds sort BEFORE probes at equal __ts (__build desc)
    // → the trailing frame includes same-ts builds (inclusive); the
    // LAST build in frame is the latest, ties → greatest __tie.
    val wBack = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__build").desc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val backCarry = last(col("__b"), ignoreNulls = true).over(wBack)
    // forward: builds sort AFTER probes at equal __ts (__build asc)
    // → the leading frame includes same-ts builds; the FIRST build in
    // frame is the earliest, ties → smallest __tie.
    val wFwd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__build").asc, col("__tie").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val fwdCarry = first(col("__b"), ignoreNulls = true).over(wFwd)

    val carried: Column = dir match {
      case Direction.Backward => backCarry
      case Direction.Forward  => fwdCarry
      case Direction.Nearest  =>
        // closer side wins; ties (equal distance, incl. the same-ts
        // build both frames see) go backward. Missing side → other.
        val b = backCarry; val f = fwdCarry
        val bd = col("__ts") - b.getField(tsCol)
        val fd = f.getField(tsCol) - col("__ts")
        when(b.isNull, f).when(f.isNull, b)
          .when(fd < bd, f).otherwise(b)
    }

    val out: Seq[Column] =
      probe.columns.toIndexedSeq.map {
        case c if c == tsCol => col("__ts").as(tsCol)
        case c               => col(c)
      } ++ payloadCols.map(c => col(s"__c.$c").as(s"$prefix$c"))

    buildSide.union(probeSide)
      .select(col("*"), carried.as("__c"))
      .filter(col("__build") === 0)
      .select(out: _*)
  }
}
