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

  /** Incremental maintenance of a materialized inner equi-join under
    * MIXED insert/update/delete CDC deltas — the retraction-capable
    * extension of [[joinDelta]], matching `latestByKey`'s CDC
    * semantics: each side's delta is a COMPACTED change batch (one row
    * per side-key, e.g. via latestByKey) carrying `opCol` = "delete"
    * for tombstones and an upserted payload otherwise.
    *
    * Maintenance identity (key-based, not signed-multiset): with
    * touched(Δ) = every side-key present in the delta (upsert OR
    * delete),
    *
    *   J₁ =   J₀ ⋉̸ touched(ΔA) ⋉̸ touched(ΔB)      (drop stale rows)
    *        ∪ ΔA⁺ ⋈ (B₀ ⋉̸ touched(ΔB))            (re-derive touched-A)
    *        ∪ (A₀ ⋉̸ touched(ΔA)) ⋈ ΔB⁺            (re-derive touched-B)
    *        ∪ ΔA⁺ ⋈ ΔB⁺                            (both touched)
    *
    * equals the full rejoin of the CDC-applied sides (spec-proven; the
    * gate's oracle recomputes the full join). An update retracts its
    * old join rows via the anti-join and re-derives from the new
    * payload — no tombstone bookkeeping in the stored view.
    *
    * 100 TB shape: J₀, A₀ and B₀ are only ever SCANNED — the touched
    * key sets and upsert batches are delta-sized and broadcast, so the
    * anti-joins and the two re-derive joins are map-side; the stored
    * join and both historical inputs are never reshuffled. Contrast
    * with a full refresh: shuffling both inputs per batch.
    */
  def joinDeltaCdc(jOld: DataFrame, aOld: DataFrame, bOld: DataFrame,
      aCdc: DataFrame, bCdc: DataFrame, joinKeys: Seq[String],
      aKey: String, bKey: String, opCol: String = "op"): DataFrame = {
    require(joinKeys.nonEmpty, "joinKeys must not be empty")
    val aTouched = aCdc.select(col(aKey)).distinct()
    val bTouched = bCdc.select(col(bKey)).distinct()
    val aUp = aCdc.filter(col(opCol) =!= "delete").drop(opCol)
    val bUp = bCdc.filter(col(opCol) =!= "delete").drop(opCol)
    val aSurvivors = aOld.join(aTouched.hint("broadcast"), Seq(aKey), "left_anti")
    val bSurvivors = bOld.join(bTouched.hint("broadcast"), Seq(bKey), "left_anti")
    val kept = jOld
      .join(aTouched.hint("broadcast"), Seq(aKey), "left_anti")
      .join(bTouched.hint("broadcast"), Seq(bKey), "left_anti")
    kept
      .unionByName(aUp.hint("broadcast").join(bSurvivors, joinKeys))
      .unionByName(aSurvivors.join(bUp.hint("broadcast"), joinKeys))
      .unionByName(aUp.hint("broadcast").join(bUp, joinKeys))
  }

  /** Incremental maintenance of the per-key aggregate state under
    * MIXED insert/update/delete row-level CDC — the aggregation twin
    * of [[joinDeltaCdc]]. Deletes break pure state folding (min/max
    * are not subtractable), so maintenance is key-scoped rebuild:
    *
    *  - touched keys = keys appearing in the delta ∪ the OLD keys of
    *    updated/deleted rows (an update can move a row between keys;
    *    found by a broadcast semi-join of the history on the delta's
    *    row ids — a scan, prunable, never a shuffle of history);
    *  - untouched keys keep their state rows verbatim (anti-join);
    *  - touched keys re-aggregate from their CDC-applied rows only:
    *    history restricted to touched keys (broadcast semi-join)
    *    minus touched row ids, plus the upserted rows.
    *
    * Cost scales with the delta's key footprint, not with history:
    * the rebuild aggregates only the touched keys' rows. Exactness is
    * total — including min/max — because touched keys recompute from
    * scratch; this is the classic key-scoped-recompute answer to
    * non-subtractable aggregates in incremental view maintenance.
    *
    * `cdc` carries (opCol, rowIdCol, keyCol, value columns) with one
    * row per rowId (compact upstream via [[latestByKey]]); opCol =
    * "delete" marks tombstones.
    */
  def aggStateCdc(dataOld: DataFrame, state: DataFrame, cdc: DataFrame,
      keyCol: String, rowIdCol: String, valueCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    val touchedRows = cdc.select(col(rowIdCol)).distinct()
    val oldKeysOfTouched = dataOld
      .join(touchedRows.hint("broadcast"), Seq(rowIdCol), "left_semi")
      .select(col(keyCol))
    val touchedKeys = cdc.select(col(keyCol))
      .unionByName(oldKeysOfTouched).distinct()
    val upserts = cdc.filter(col(opCol) =!= "delete").drop(opCol)
    val rebuiltRows = dataOld
      .join(touchedKeys.hint("broadcast"), Seq(keyCol), "left_semi")
      .join(touchedRows.hint("broadcast"), Seq(rowIdCol), "left_anti")
      .unionByName(upserts.select(dataOld.columns.toIndexedSeq.map(col): _*))
    val rebuiltState = aggState(rebuiltRows, keyCol, valueCols)
    state.join(touchedKeys.hint("broadcast"), Seq(keyCol), "left_anti")
      .unionByName(rebuiltState)
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
