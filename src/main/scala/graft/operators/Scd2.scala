package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — the warehouse-ETL
  * op the reference's target toolchain ships as Kettle's "Dimension
  * lookup/update" step (the reference generates Kettle pipelines;
  * this is the Spark-native version of the step its users reach for
  * next). Given the dimension's current state and a fresh source
  * snapshot, emit the new dimension: changed rows close their old
  * version and open a new one, new keys insert, vanished keys close.
  *
  * Scale shape: exactly the DiffSync C15 pattern — ONE full-outer
  * equi-join on the business key between the CURRENT version slice
  * and the snapshot (sort-merge, AQE-skew-splittable), history rows
  * pass through untouched by union. No windows, no per-key state:
  * version chaining needs only the is_current slice because SCD2
  * never rewrites closed versions.
  */
object Scd2 {

  /** Apply `snapshot` to `dim` as of `ts`.
    *
    * `dim` columns: `pk`, `compareCols…`, `valid_from`, `valid_to`,
    * `is_current`; `snapshot` columns: `pk`, `compareCols…`. Returns
    * the full new dimension with the same columns.
    *
    *  - value change → old version closed (`valid_to = ts`,
    *    `is_current = false`) + new open version (`valid_from = ts`);
    *  - new key → open version inserted;
    *  - key absent from the snapshot → version closed (a disappearance
    *    IS observable here, unlike the reference's re-sync — same
    *    semantics as DiffSync's DELETE classification);
    *  - unchanged → row passes through untouched.
    *
    * Comparison is null-safe (`<=>`) per column.
    */
  def apply2(dim: DataFrame, snapshot: DataFrame, pk: String,
      compareCols: Seq[String], ts: Column): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must not be empty")
    val meta = Seq("valid_from", "valid_to", "is_current")
    require(meta.forall(dim.columns.contains),
      s"dim must carry ${meta.mkString(", ")}")
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val snap = snapshot.select((col(pk).as("__spk") +:
      compareCols.map(c => col(c).as(s"__s_$c"))): _*)
    val joined = current.join(snap, col(pk) === col("__spk"), "full_outer")
    val same = compareCols.map(c => col(c) <=> col(s"__s_$c"))
      .reduce(_ && _)
    val dimCols = dim.columns.map(col).toSeq

    // unchanged current rows (key on both sides, values equal)
    val unchanged = joined
      .filter(col(pk).isNotNull && col("__spk").isNotNull && same)
      .select(dimCols: _*)
    // closed versions: value changed, or key vanished from the snapshot
    val closed = joined
      .filter(col(pk).isNotNull && (col("__spk").isNull || !same))
      .select(dim.columns.map {
        case "valid_to" => ts.as("valid_to")
        case "is_current" => lit(false).as("is_current")
        case c => col(c)
      }.toSeq: _*)
    // opened versions: changed values or brand-new key — from snapshot
    val opened = joined
      .filter(col("__spk").isNotNull && (col(pk).isNull || !same))
      .select(dim.columns.map {
        case `pk` => col("__spk").as(pk)
        case "valid_from" => ts.as("valid_from")
        case "valid_to" => lit(null).cast(dim.schema("valid_to").dataType)
          .as("valid_to")
        case "is_current" => lit(true).as("is_current")
        case c if compareCols.contains(c) => col(s"__s_$c").as(c)
        case c => col(c)
      }.toSeq: _*)
    history.unionByName(unchanged).unionByName(closed).unionByName(opened)
  }

  /** Apply a CLASSIFIED CDC batch to the dimension — the incremental
    * twin of [[apply2]] for streams: `changes` carries (pk,
    * compareCols…, `flagCol` ∈ new/changed/deleted — DiffSync's
    * vocabulary) and, unlike a snapshot, a key ABSENT from the batch
    * is untouched (absence in a delta means "no news", not
    * "vanished"; disappearance must arrive as an explicit deleted
    * tombstone). Upserts whose values null-safely equal the current
    * version are no-ops — idempotent under CDC redelivery. Folding
    * the batches of a classified diff through this equals one
    * [[apply2]] of the full snapshot (each key changes once; the
    * stream_scd2_apply gate pins it against apply2's own oracle).
    *
    * CONTRACT: at most ONE change row per key per call (the
    * classified-diff shape). A raw CDC feed carrying several changes
    * to one key in one batch must first collapse to the last change
    * per key — [[collapseCdc]] does exactly that given the feed's
    * sequence column; an uncollapsed batch would close/open the same
    * key once per change row.
    */
  def applyCdc(dim: DataFrame, changes: DataFrame, pk: String,
      compareCols: Seq[String], flagCol: String, ts: Column): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must not be empty")
    val meta = Seq("valid_from", "valid_to", "is_current")
    require(meta.forall(dim.columns.contains),
      s"dim must carry ${meta.mkString(", ")}")
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val ch = changes.select((col(pk).as("__spk") +:
      col(flagCol).as("__flag") +:
      compareCols.map(c => col(c).as(s"__s_$c"))): _*)
    val joined = current.join(ch, col(pk) === col("__spk"), "full_outer")
    val same = compareCols.map(c => col(c) <=> col(s"__s_$c"))
      .reduce(_ && _)
    val del = col("__flag") === "deleted"
    val dimCols = dim.columns.map(col).toSeq
    // untouched (no change row for the key) + no-op upserts
    val untouched = joined
      .filter(col(pk).isNotNull &&
        (col("__spk").isNull || (!del && same)))
      .select(dimCols: _*)
    // closed: explicit delete, or a value-changing upsert
    val closed = joined
      .filter(col(pk).isNotNull && col("__spk").isNotNull &&
        (del || !same))
      .select(dim.columns.map {
        case "valid_to" => ts.as("valid_to")
        case "is_current" => lit(false).as("is_current")
        case c => col(c)
      }.toSeq: _*)
    // opened: value-changing upsert or brand-new key (never deletes)
    val opened = joined
      .filter(col("__spk").isNotNull && !del &&
        (col(pk).isNull || !same))
      .select(dim.columns.map {
        case `pk` => col("__spk").as(pk)
        case "valid_from" => ts.as("valid_from")
        case "valid_to" => lit(null).cast(dim.schema("valid_to").dataType)
          .as("valid_to")
        case "is_current" => lit(true).as("is_current")
        case c if compareCols.contains(c) => col(s"__s_$c").as(c)
        case c => col(c)
      }.toSeq: _*)
    history.unionByName(untouched).unionByName(closed).unionByName(opened)
  }

  /** Collapse a RAW CDC feed to the last change per key — the
    * pre-processing that makes [[applyCdc]]'s one-change-per-key
    * contract enforceable by construction on a real CDC stream (which
    * can carry insert → update → delete of one key inside one batch).
    * SCD2 records STATES, not events: intermediate changes that never
    * survived to the batch boundary are invisible to a snapshot-based
    * dimension, so keeping only the final change per key is exactly
    * the snapshot semantics applyCdc folds to.
    *
    * Scale shape: one `max(struct(seq, cols…))` aggregate on the key
    * (struct max plans as SortAggregate) — the partial_max combines
    * map-side, so a hot key's thousand updates collapse locally
    * before the shuffle moves one row per key per map task (the
    * keepBestPerCluster argmax shape; a window row_number would
    * shuffle EVERY change row then sort the lot).
    *
    * `seqCol` orders the feed (LSN / offset / commit ts). Ties on seq
    * break deterministically by the remaining columns' values in
    * `changes` column order (struct ordering, nulls first) — feeds
    * with a unique sequence never hit the tie-break. Output: one row
    * per key, original column order preserved.
    */
  def collapseCdc(changes: DataFrame, pk: String,
      seqCol: String): DataFrame = {
    require(changes.columns.contains(seqCol),
      s"changes must carry sequence column $seqCol")
    val others = changes.columns.filterNot(_ == pk).toSeq
    val ordered = seqCol +: others.filterNot(_ == seqCol)
    changes.groupBy(col(pk))
      .agg(max(struct(ordered.map(col): _*)).as("__last"))
      .select(changes.columns.map {
        case `pk` => col(pk)
        case c => col("__last").getField(c).as(c)
      }.toSeq: _*)
  }

  /** Point-in-time (temporal) lookup against an SCD2 dimension: each
    * fact row joins the dimension version whose
    * `[valid_from, valid_to)` interval contains the fact's timestamp
    * (open-ended current versions have `valid_to IS NULL`). The
    * as-of-history query every warehouse runs against the dimension
    * `apply2` maintains.
    *
    * 100 TB shape: the join key is the EQUALITY on `pk` — Catalyst
    * plans a hash/SMJ join clustered on pk with the interval predicate
    * as the join's residual filter, so the shuffle moves each fact
    * once, NOT once per version (a pure theta/range join would
    * cross every fact with every version). Version counts per key are
    * small by construction; the residual filter kills all but one.
    * Output carries every fact column plus the dimension's non-pk
    * columns (valid_from doubles as the version tag).
    */
  def lookup(dim: DataFrame, facts: DataFrame, pk: String,
      tsCol: String): DataFrame = {
    val d = dim.alias("__d")
    val f = facts.alias("__f")
    val cond = col(s"__f.$pk") === col(s"__d.$pk") &&
      col(s"__f.$tsCol") >= col("__d.valid_from") &&
      (col("__d.valid_to").isNull ||
        col(s"__f.$tsCol") < col("__d.valid_to"))
    val dimCols = dim.columns.filter(_ != pk).map(c => col(s"__d.$c"))
    f.join(d, cond).select(col("__f.*") +: dimCols.toSeq: _*)
  }
}
