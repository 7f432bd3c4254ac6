package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization of an event stream — the batch twin of the
  * streaming windowed aggregation (streaming/EventStream.scala): events
  * of one user separated by more than `gapUs` microseconds start a new
  * session.
  *
  * Plan shape at 100 TB: ONE shuffle on the user key. The two window
  * passes (lag → boundary flag, running sum → session index) and the
  * final per-session aggregation all require clustering by user_id, and
  * Catalyst satisfies the groupBy(user_id, session_idx) distribution
  * with the window's existing HashPartitioning(user_id) — no second
  * Exchange (asserted in SessionizeSpec). Timestamps stay integral
  * microseconds end-to-end, so session arithmetic is exact and
  * engine-portable.
  */
object Sessionize {

  /** Assign per-user session indexes (1-based, in time order) to each
    * event. `tsUs` must be an integral microseconds-since-epoch column.
    */
  def assign(events: DataFrame, userCol: String, idCol: String,
      tsUs: Column, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(tsUs, col(idCol))
    val prev = lag(tsUs, 1).over(w)
    val isNew = when(prev.isNull || tsUs - prev > gapUs, 1).otherwise(0)
    events
      .withColumn("__ts_us", tsUs)
      .withColumn("__is_new", isNew)
      .withColumn("session_idx",
        sum(col("__is_new")).over(
          Window.partitionBy(col(userCol)).orderBy(col("__ts_us"), col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__is_new")
  }

  /** Ordered funnel analysis: for each user, the earliest time each
    * step was reached IN ORDER (step i counts only at-or-after step
    * i−1's time) — the product-analytics conversion query, and the
    * batch shape of streaming pattern detection. Returns one row per
    * user who reached step 1: (user, step1_us … stepN_us, max_step);
    * unreached steps are null.
    *
    * Plan: one partial-agg'd min per step, chained by equi-joins on
    * the user key — every join and aggregation clusters on the SAME
    * key, so AQE reuses the partitioning and each step adds no new
    * full-data shuffle (the step filters cut the event stream before
    * its first shuffle). No windows, no per-user state: at 100 TB the
    * per-step frames are tiny relative to raw events.
    */
  def funnel(events: DataFrame, userCol: String, tsUs: Column,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol), tsUs.as("__ts"),
      col(typeCol).as("__type"))
    var acc = ev.filter(col("__type") === steps.head)
      .groupBy(col(userCol)).agg(min(col("__ts")).as("step1_us"))
    steps.tail.zipWithIndex.foreach { case (st, idx) =>
      val i = idx + 2
      val next = ev.filter(col("__type") === st)
        .join(acc.select(col(userCol), col(s"step${i - 1}_us")),
          Seq(userCol))
        .filter(col("__ts") >= col(s"step${i - 1}_us"))
        .groupBy(col(userCol)).agg(min(col("__ts")).as(s"step${i}_us"))
      acc = acc.join(next, Seq(userCol), "left")
    }
    // ascending wrap so the HIGHEST reached step is the outermost
    // condition: when(stepN, N).otherwise(when(stepN-1, ...) ...)
    val maxStep = (2 to steps.length).foldLeft(lit(1L): Column) {
      (els, i) =>
        when(col(s"step${i}_us").isNotNull, lit(i.toLong)).otherwise(els)
    }
    acc.withColumn("max_step", maxStep)
  }

  /** Per-session rollup: event count, first/last timestamp (µs), exact
    * decimal sum of `valueCol` surfaced as double.
    */
  def rollup(events: DataFrame, userCol: String, idCol: String,
      tsUs: Column, gapUs: Long, valueCol: String): DataFrame =
    assign(events, userCol, idCol, tsUs, gapUs)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__ts_us")).as("start_us"),
        max(col("__ts_us")).as("end_us"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double")
          .as("sum_value"))

  /** Cohort retention matrix: users are grouped into cohorts by the
    * period (default weekly) of their FIRST event; each (cohort,
    * period-offset) cell counts the distinct cohort members active in
    * that later period, plus the cohort size and retention rate.
    * Periods are integral `floor(days-since-epoch / periodDays)`
    * buckets — pure integer arithmetic, engine-portable (no timezone
    * or ISO-week semantics to disagree on).
    *
    * Plan shape at 100 TB: the first-event min and the activity
    * distinct both cluster on the user key — ONE full-data shuffle on
    * user_id feeds the partial-agg'd min, the join back, and the
    * (cohort, offset, user) distinct (partial-aggregated, so a user
    * active 1 000× in a week contributes one row to the exchange).
    * Everything after the distinct is cohort-count-sized (thousands of
    * cells, not billions of events), and the cohort-size lookup is a
    * broadcast self-join on that tiny frame. No windows, no
    * full-matrix crossjoin.
    */
  /** First-order behavioral transition matrix: for every user, each
    * event's type paired with the NEXT event's type (lag-1 over the
    * per-user timeline), aggregated to (from_type, to_type) counts
    * and row-normalized probabilities — the Markov-chain complement
    * of [[funnel]] (funnel checks ONE prescribed order; this measures
    * every observed order). Each user's last event has no successor
    * and drops out.
    *
    * Shape: one window partitioned by user (bounded by a user's
    * events), then a types²-sized partial-agg'd groupBy; the per-from
    * totals join back on the tiny matrix frame. Probabilities are
    * exact count ratios floor-quantized to 4 decimals.
    */
  def transitionMatrix(events: DataFrame, userCol: String,
      typeCol: String, tsCol: Column, idCol: String): DataFrame = {
    val pairs = events
      .select(col(userCol), col(typeCol).as("from_type"), tsCol.as("__ts"),
        col(idCol).as("__id"))
      .withColumn("to_type", lead(col("from_type"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(userCol)).orderBy(col("__ts"), col("__id"))))
      .filter(col("to_type").isNotNull)
    val cells = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tot"))
    cells.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (floor(col("n").cast("double") / col("__tot").cast("double")
          * 10000) / 10000).as("p"))
  }

  /** Top length-`n` event paths: every user's consecutive event-type
    * n-gram (lead windows over the per-user timeline), counted
    * globally and top-k'd — "what do users actually DO in sequence",
    * the path-mining complement of [[transitionMatrix]] (n = 2) and
    * [[funnel]] (one prescribed path). Paths ending inside another
    * user never form (the window partitions by user).
    *
    * Shape: per-user window (bounded by a user's events) → map-side
    * concat → types^n-bounded partial-agg'd count → TakeOrdered k.
    */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: Column, idCol: String, n: Int = 3, k: Int = 10): DataFrame = {
    require(n >= 2 && k >= 1, "need n >= 2 and k >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("__ts"), col("__id"))
    val base = events.select(col(userCol), col(typeCol).as("__t0"),
      tsCol.as("__ts"), col(idCol).as("__id"))
    val withSteps = (1 until n).foldLeft(base) { (df, i) =>
      df.withColumn(s"__t$i", lead(col("__t0"), i).over(w))
    }
    withSteps
      .filter((1 until n).map(i => col(s"__t$i").isNotNull)
        .reduce(_ && _))
      .select(concat_ws(" > ",
        (0 until n).map(i => col(s"__t$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path").asc)
      .limit(k)
  }

  /** MATCH_RECOGNIZE-lite sequence-pattern matching: encode each
    * user's time-ordered event types as a JOURNEY STRING (one
    * caller-mapped char per event) and count non-overlapping regex
    * matches of `pattern` against it — "how many times did this user
    * run view→click⁺→purchase", the free-form complement of the
    * fixed-order [[funnel]] and the fixed-length [[topPaths]]. Full
    * SQL-window MATCH_RECOGNIZE is a per-row NFA; the journey-string
    * form gets the same expressiveness for event-TYPE patterns from
    * one regexp over an aggregated string — codegen'd, no state
    * machine, and oracle-replayable (leftmost non-overlapping match
    * semantics agree across engines for the portable regex subset:
    * literals, classes, +, *, ?, alternation — no backrefs).
    *
    * Scale shape: ONE partial-agg'd groupBy on the user — the
    * collect_list merges map-side and the journey is bounded by a
    * user's OWN event count (the sessionize boundedness contract:
    * per-entity sequences fit memory; corpus size doesn't matter).
    * array_sort on (ts, tie, char) structs makes the encoding
    * deterministic under any partitioning; the regex runs once per
    * user, not per event.
    *
    * Output: (user, n_events, n_matches) for users with ≥ 1 match.
    */
  def sequencePattern(events: DataFrame, userCol: String,
      charCol: Column, tsCol: Column, tieCol: String,
      pattern: String): DataFrame =
    events
      .select(col(userCol),
        struct(tsCol.as("t"), col(tieCol).as("i"), charCol.as("c"))
          .as("__e"))
      .groupBy(col(userCol))
      .agg(array_join(transform(array_sort(collect_list(col("__e"))),
        x => x.getField("c")), "").as("__journey"))
      .select(col(userCol), length(col("__journey")).as("n_events"),
        // the pattern rides as a foldable literal, not spliced into
        // SQL text — a quote or backslash in it can't break parsing
        size(regexp_extract_all(col("__journey"), lit(pattern), lit(0)))
          .as("n_matches"))
      .filter(col("n_matches") > 0)

  /** [[sequencePattern]]'s EXTRACTION sibling: same journey encoding
    * and leftmost non-overlapping semantics, but emit the matched RUNS
    * themselves (space-joined, in journey order) next to the count —
    * "show me each user's view→click⁺→purchase journeys", not just how
    * many. Same single partial-agg'd groupBy; the regex still runs
    * once per user and the output stays one row per matching user
    * (matches are bounded by the user's own event count — the
    * sessionize boundedness contract).
    */
  def sequencePatternExtract(events: DataFrame, userCol: String,
      charCol: Column, tsCol: Column, tieCol: String,
      pattern: String): DataFrame =
    events
      .select(col(userCol),
        struct(tsCol.as("t"), col(tieCol).as("i"), charCol.as("c"))
          .as("__e"))
      .groupBy(col(userCol))
      .agg(array_join(transform(array_sort(collect_list(col("__e"))),
        x => x.getField("c")), "").as("__journey"))
      .select(col(userCol), length(col("__journey")).as("n_events"),
        regexp_extract_all(col("__journey"), lit(pattern), lit(0))
          .as("__runs"))
      .select(col(userCol), col("n_events"),
        size(col("__runs")).as("n_matches"),
        array_join(col("__runs"), " ").as("runs"))
      .filter(col("n_matches") > 0)

  def cohortRetention(events: DataFrame, userCol: String, tsCol: Column,
      periodDays: Int = 7): DataFrame = {
    require(periodDays > 0, "periodDays must be > 0")
    val per = floor(
      datediff(to_date(tsCol), lit("1970-01-01").cast("date"))
        / periodDays).cast("int")
    val e = events.select(col(userCol).as("__u"), per.as("__per"))
    val firsts = e.groupBy(col("__u")).agg(min(col("__per")).as("__cohort"))
    val active = e.join(firsts, "__u")
      .select(col("__cohort"),
        (col("__per") - col("__cohort")).as("period_offset"), col("__u"))
      .distinct()
    val cells = active.groupBy(col("__cohort"), col("period_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cells.filter(col("period_offset") === 0)
      .select(col("__cohort"), col("n_active").as("n_cohort"))
    cells.join(broadcast(sizes), "__cohort")
      .select(
        col("__cohort").as("cohort_period"),
        col("period_offset"),
        col("n_active"),
        col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort"))
          .as("retention_rate"))
  }
}
