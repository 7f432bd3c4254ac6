package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of aggregate state — the anti-rescan
  * pattern for 100 TB stores: keep a per-key state table of
  * decomposable aggregates (count, decimal sum, min, max), and fold
  * each new delta batch into it WITHOUT touching historical data.
  * `combine(state, aggregate(delta)) == aggregate(full)` holds exactly
  * because every kept statistic is associative and the sums are
  * decimal (order-independent).
  *
  * This is the batch core of a materialized-view refresh and of the
  * reference's "feed the change periodically" incremental story,
  * turned from rescan-everything into delta-only work: the only
  * full-data pass ever run is the one that built the initial state.
  *
  * CDC compaction (`latestByKey`) rides along: collapsing an upsert
  * stream to its newest version per key is the same
  * partial-aggregable argmax shape.
  */
object Incremental {

  /** Aggregate `df` into per-key state: (key, n_rows, sum_<v>,
    * min_<v>, max_<v>) for each value column. One partial-agg'd
    * shuffle on the key.
    */
  def aggState(df: DataFrame, keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must not be empty")
    val aggs = count(lit(1)).as("n_rows") +: valueCols.flatMap(v => Seq(
      sum(col(v).cast("decimal(18,4)")).as(s"sum_$v"),
      min(col(v)).as(s"min_$v"),
      max(col(v)).as(s"max_$v")))
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a delta batch's state into the existing state: full-outer
    * join on the key (a key may be new, quiet, or updated), then
    * per-statistic combine — counts/sums add, mins/maxes fold. The
    * state table is keys-sized, not data-sized, so the join cost is
    * independent of history.
    */
  def combine(state: DataFrame, deltaState: DataFrame, keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    val s = state.alias("s"); val d = deltaState.alias("d")
    def both(c: String, f: (Column, Column) => Column): Column = {
      val (a, b) = (col(s"s.$c"), col(s"d.$c"))
      when(a.isNull, b).when(b.isNull, a).otherwise(f(a, b)).as(c)
    }
    val combined = both("n_rows", _ + _) +: valueCols.flatMap(v => Seq(
      both(s"sum_$v", _ + _),
      both(s"min_$v", least(_, _)),
      both(s"max_$v", greatest(_, _))))
    s.join(d, col(s"s.$keyCol") === col(s"d.$keyCol"), "full_outer")
      .select(coalesce(col(s"s.$keyCol"), col(s"d.$keyCol")).as(keyCol)
        +: combined: _*)
  }

  /** CDC/upsert compaction: the newest version of every key, chosen
    * by (orderCol, tieCol) — a partial-aggregated `max(struct(...))`
    * argmax, NOT a per-key window (a hot key would pin a window to
    * one task; the struct max combines map-side). Carries the listed
    * `payloadCols` of the winning row.
    */
  /** Delta of an inner equi-join under INSERT-ONLY deltas:
    * Δ(A ⋈ B) = ΔA ⋈ B₀  ∪  A₀ ⋈ ΔB  ∪  ΔA ⋈ ΔB — the
    * materialized-join twin of aggState/combine. Append the returned
    * rows to the stored A₀ ⋈ B₀ and the result equals joining the
    * full new inputs (spec-proven; the gate's oracle recomputes the
    * full join).
    *
    * 100 TB shape: the two big-side terms each join a SMALL delta
    * against a full historical side — the delta is broadcast, so the
    * historical table is scanned (prunable by partition/zone-map on
    * the join key) but NEVER reshuffled; the ΔA ⋈ ΔB term is
    * delta-sized on both sides. Contrast with re-running the view:
    * a full shuffle of both historical inputs per refresh. Deletes/
    * updates need keyed retraction (latestByKey compaction upstream);
    * this operator is the append-stream fast path.
    */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must not be empty")
    aDelta.hint("broadcast").join(bOld, keys)
      .unionByName(aOld.join(bDelta.hint("broadcast"), keys))
      .unionByName(aDelta.join(bDelta.hint("broadcast"), keys))
  }

  def latestByKey(df: DataFrame, keyCol: String, orderCol: String,
      tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val fields = col(orderCol).as("__o") +: col(tieCol).as("__t") +:
      payloadCols.map(c => col(c).as(s"__p_$c"))
    df.groupBy(col(keyCol))
      .agg(max(struct(fields: _*)).as("__w"))
      .select(col(keyCol) +: col("__w.__o").as(orderCol) +:
        col("__w.__t").as(tieCol) +:
        payloadCols.map(c => col(s"__w.__p_$c").as(c)): _*)
  }
}
