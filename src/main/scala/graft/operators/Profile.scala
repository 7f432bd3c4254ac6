package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column data profiling for migration validation — the "did every
  * column arrive intact" check the reference leaves to eyeballing row
  * counts (kettle_report.pl throughput lines are all it offers). One
  * profile per side of a copy, one tiny join to compare.
  *
  * Plan shape: ONE scan, one single-row aggregate (map-side partials;
  * the shuffle carries one partial row per partition), then a constant
  * explode to long form. With `exact = true` the per-column DISTINCT
  * counts add an Expand (×cols row multiplication before the partial
  * agg) — fine to ~tens of columns; at 100 TB × wide schemas use
  * `exact = false` for one-pass HLL (approx_count_distinct) with no
  * Expand.
  *
  * min/max are surfaced as canonical strings so profiles of the same
  * data are comparable across engines and type systems: floating point
  * through DECIMAL(18,4) (no double-formatting ambiguity), timestamps
  * as 'yyyy-MM-dd HH:mm:ss', everything else via plain cast.
  */
object Profile {

  private def canon(c: Column, dt: DataType): Column = dt match {
    // DECIMAL(18,4) canonicalization overflows for |x| >= 1e14, NaN and
    // Infinity — under ANSI it throws, and with a plain cast two NULL
    // min_s values would "match" under <=> in compare(). try_cast +
    // string fallback keeps extreme values distinguishable.
    case DoubleType | FloatType =>
      coalesce(c.try_cast(DecimalType(18, 4)).cast("string"),
        c.cast("string"))
    case TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  /** Long-form profile: one row per column —
    * (col_name, n_rows, n_nonnull, n_distinct, min_s, max_s).
    */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__nn_${f.name}"),
        (if (exact) count_distinct(c) else approx_count_distinct(c))
          .as(s"__nd_${f.name}"),
        canon(min(c), f.dataType).as(s"__mn_${f.name}"),
        canon(max(c), f.dataType).as(s"__mx_${f.name}"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nn_${f.name}").as("n_nonnull"),
        col(s"__nd_${f.name}").as("n_distinct"),
        col(s"__mn_${f.name}").as("min_s"),
        col(s"__mx_${f.name}").as("max_s"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Column-count threshold above which the auto variants abandon
    * exact distinct counts: Expand multiplies every scanned row by the
    * column count BEFORE the partial aggregation, so a 500-column
    * schema turns a 100 TB scan into 50 PB of aggregation input. Past
    * this width the one-pass HLL sketch (no Expand, ~1.6 KB state per
    * column) is the only sane plan.
    */
  val DefaultExactMaxCols = 64

  /** `profile` with the exact/HLL choice made from the schema width —
    * wide migration audits degrade to sketched distinct counts instead
    * of exploding the plan.
    */
  def profileAuto(df: DataFrame,
      exactMaxCols: Int = DefaultExactMaxCols): DataFrame =
    profile(df, exact = df.schema.size <= exactMaxCols)

  /** `compare` with the same width-based exact/HLL switch (applied to
    * both sides, so the distinct-count columns stay comparable).
    */
  def compareAuto(source: DataFrame, target: DataFrame,
      exactMaxCols: Int = DefaultExactMaxCols): DataFrame =
    compare(source, target, exact =
      source.schema.size <= exactMaxCols && target.schema.size <= exactMaxCols)

  /** Equi-width histogram of a numeric column — the distribution view
    * a migration audit adds on top of min/max (a copy that shifted
    * values inside the same range passes min/max but not this).
    *
    * One 1-row min/max aggregate broadcast back, then a map-side
    * bucket projection and one partial-agg'd groupBy on ≤ nBuckets
    * keys — two scans, no wide shuffle. The top edge folds into the
    * last bucket (least(…, n−1)); a constant column degenerates to
    * one bucket; nulls are excluded (they're profile()'s n_nonnull
    * business).
    */
  /** Per-group z-score outlier flags — the migration-audit anomaly
    * check (a copied column whose distribution shifted) and the
    * curation outlier filter, in one shape.
    *
    * Moments are computed from EXACT decimal sums (n, Σx, Σx²) so the
    * group variance is the textbook (Σx² − (Σx)²/n)/(n−1) evaluated
    * identically in any engine — a double Welford accumulation would
    * be partition-order dependent and engine-specific. The groupBy is
    * partial-agg'd (three numbers per group per partition through the
    * shuffle); stats join back broadcast-or-shuffled at AQE's
    * discretion. Output: one row per input row with the quantized
    * z-score and the |z| > `threshold` flag; single-row groups get
    * z = 0 (no sample variance).
    */
  def zscoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
      threshold: Double = 2.5): DataFrame = {
    // decimal(18,4): the repo-wide portable cast (ties at scale 4
    // don't round on this data); its square decimal(37,8) stays under
    // both engines' 38-digit cap
    val x = col(valueCol).cast("decimal(18,4)")
    val stats = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(x).as("__s"),
        sum(x * x).as("__s2"))
      .select(col(groupCol), col("__n"),
        (col("__s").cast("double") / col("__n")).as("__mean"),
        when(col("__n") > 1,
          (col("__s2").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") /
              col("__n")) / (col("__n") - 1))
          .otherwise(lit(0.0)).as("__var"))
    val z = when(col("__var") > 0,
      (col(valueCol).cast("double") - col("__mean")) / sqrt(col("__var")))
      .otherwise(lit(0.0))
    df.filter(col(valueCol).isNotNull)
      .join(stats, Seq(groupCol))
      .withColumn("zscore", floor(z * 10000) / 10000)
      .withColumn("is_outlier", abs(col("zscore")) > threshold)
      .drop("__n", "__mean", "__var")
  }

  /** Per-source corpus "data cards" — the one-row-per-source summary a
    * training-data report leads with: volume, mean length, dominant
    * language, and the exact-duplicate rate (docs whose normalized
    * fingerprint appears more than once ANYWHERE in the corpus —
    * cross-source duplication counts against both sources).
    *
    * Shapes: counts/means partial-aggregate per source; the dominant
    * language is a per-source row_number over the (source, lang)
    * count table (sources × langs rows — report-sized, not
    * corpus-sized); dup detection is one groupBy on the 16-byte
    * fingerprint joined back as a boolean.
    */
  def sourceCards(docs: DataFrame, srcCol: String, idCol: String,
      textCol: String, langCol: String, charsCol: String): DataFrame = {
    val fp = graft.functions.TextAnalysis.fingerprint(col(textCol))
    val withFp = docs.select(col(srcCol), col(idCol), col(langCol),
      col(charsCol), fp.as("__fp"))
    val dupFps = withFp.groupBy(col("__fp"))
      .agg(count(lit(1)).as("__nfp")).filter(col("__nfp") > 1)
      .select(col("__fp"))
    val flagged = withFp.join(dupFps.withColumn("__dup", lit(1L)),
        Seq("__fp"), "left")
      .select(col(srcCol), col(langCol), col(charsCol),
        coalesce(col("__dup"), lit(0L)).as("__dup"))
    val base = flagged.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(charsCol).cast("long")).as("__chars"),
        sum(col("__dup")).as("dup_docs"))
    val langCounts = flagged.groupBy(col(srcCol), col(langCol))
      .agg(count(lit(1)).as("__lc"))
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol))
      .orderBy(col("__lc").desc, col(langCol).asc)
    val topLang = langCounts
      .withColumn("__rn", row_number().over(wSrc))
      .filter(col("__rn") === 1)
      .select(col(srcCol), col(langCol).as("top_lang"),
        col("__lc").as("top_lang_docs"))
    base.join(topLang, Seq(srcCol))
      .select(col(srcCol), col("n_docs"),
        graft.functions.TextAnalysis.q4(
          col("__chars").cast("double") / col("n_docs").cast("double"))
          .as("mean_chars"),
        col("top_lang"), col("top_lang_docs"), col("dup_docs"),
        graft.functions.TextAnalysis.q4(
          col("dup_docs").cast("double") / col("n_docs").cast("double"))
          .as("dup_rate"))
  }

  /** Per-group Pearson correlation from the same exact-decimal moment
    * machinery as [[zscoreOutliers]]: (n, Σx, Σy, Σxy, Σx², Σy²)
    * accumulate as decimals (partial-agg'd, partition-order
    * independent), and only the final covariance/variance/sqrt
    * arithmetic runs in doubles — one fixed IEEE expression sequence
    * any engine reproduces bit-for-bit from the same exact sums.
    * Degenerate groups (either variance 0, or n < 2) report NULL.
    * Six numbers per group per partition through the shuffle.
    */
  def correlation(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,4)")
    val y = col(yCol).cast("decimal(18,4)")
    def d(c: Column) = c.cast("double")
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"), sum(x * y).as("__sxy"),
        sum(x * x).as("__sx2"), sum(y * y).as("__sy2"))
      .select(col(groupCol), col("n"),
        (d(col("__sxy")) - d(col("__sx")) * d(col("__sy")) / col("n"))
          .as("__cov"),
        (d(col("__sx2")) - d(col("__sx")) * d(col("__sx")) / col("n"))
          .as("__vx"),
        (d(col("__sy2")) - d(col("__sy")) * d(col("__sy")) / col("n"))
          .as("__vy"))
      .select(col(groupCol), col("n"),
        when(col("n") > 1 && col("__vx") > 0 && col("__vy") > 0,
          floor(col("__cov") / sqrt(col("__vx") * col("__vy")) * 10000)
            / 10000)
          .otherwise(lit(null).cast("double")).as("corr"))
  }

  /** Two-sample Kolmogorov–Smirnov distance — the distribution-drift
    * audit for a migrated/synced column: D = max over observed values
    * of |F̂_src − F̂_tgt| (empirical CDFs evaluated at every distinct
    * value, the exact discrete KS statistic). Catches shape changes
    * (truncation, unit drift, default-fill) that mean/variance audits
    * miss. Counts are exact integers; only the final two divisions and
    * the |·| max run in doubles, identically in any engine.
    *
    * The cumulative window is ordered over DISTINCT values with no
    * partition key — audit/slice-scale contract (same as the exact
    * median in [[madOutliers]]): at corpus scale, bucket values first
    * and accept bucket-resolution D.
    */
  def ksDrift(src: DataFrame, tgt: DataFrame, valueCol: String): DataFrame = {
    val both = src.select(col(valueCol).as("__v"), lit(1L).as("__s"),
        lit(0L).as("__t"))
      .unionByName(tgt.select(col(valueCol).as("__v"), lit(0L).as("__s"),
        lit(1L).as("__t")))
      .filter(col("__v").isNotNull)
    val totals = both.agg(sum(col("__s")).as("n_src"),
      sum(col("__t")).as("n_tgt"))
    val perValue = both.groupBy(col("__v"))
      .agg(sum(col("__s")).as("__cs"), sum(col("__t")).as("__ct"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perValue
      .select(col("__v"), sum(col("__cs")).over(w).as("__fs"),
        sum(col("__ct")).over(w).as("__ft"))
      .crossJoin(broadcast(totals))
      .select(col("n_src"), col("n_tgt"),
        abs(col("__fs").cast("double") / col("n_src").cast("double") -
          col("__ft").cast("double") / col("n_tgt").cast("double"))
          .as("__d"))
      .groupBy(col("n_src"), col("n_tgt"))
      .agg((floor(max(col("__d")) * 10000) / 10000).as("ks"))
  }

  /** Corpus-scale variant of [[ksDrift]]: values pre-bucket into
    * `buckets` equal-width bins over the COMBINED min/max (a 1-row
    * broadcast), so the cumulative pass runs over at most `buckets`
    * rows instead of every distinct value — the unpartitioned window
    * becomes a report-sized detail. D is computed at bucket
    * resolution: a LOWER bound of the exact statistic that converges
    * as buckets grow (bucket edges only ever merge CDF evaluation
    * points). Bin arithmetic is a fixed double expression any engine
    * replays.
    */
  def ksDriftBucketed(src: DataFrame, tgt: DataFrame, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 1, "need at least 2 buckets")
    val both = src.select(col(valueCol).cast("double").as("__v"),
        lit(1L).as("__s"), lit(0L).as("__t"))
      .unionByName(tgt.select(col(valueCol).cast("double").as("__v"),
        lit(0L).as("__s"), lit(1L).as("__t")))
      .filter(col("__v").isNotNull)
    val bounds = both.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val binned = both.crossJoin(broadcast(bounds))
      .select(
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(lit(buckets - 1).cast("long"),
            floor((col("__v") - col("__lo")) / (col("__hi") - col("__lo"))
              * buckets).cast("long"))).as("__bin"),
        col("__s"), col("__t"))
    val perBin = binned.groupBy(col("__bin"))
      .agg(sum(col("__s")).as("__cs"), sum(col("__t")).as("__ct"))
    val totals = binned.agg(sum(col("__s")).as("n_src"),
      sum(col("__t")).as("n_tgt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perBin
      .select(col("__bin"), sum(col("__cs")).over(w).as("__fs"),
        sum(col("__ct")).over(w).as("__ft"))
      .crossJoin(broadcast(totals))
      .select(col("n_src"), col("n_tgt"),
        abs(col("__fs").cast("double") / col("n_src").cast("double") -
          col("__ft").cast("double") / col("n_tgt").cast("double"))
          .as("__d"))
      .groupBy(col("n_src"), col("n_tgt"))
      .agg((floor(max(col("__d")) * 10000) / 10000).as("ks_bucketed"))
  }

  /** Benford leading-digit audit — the forensic screen for fabricated
    * or unit-mangled numeric columns: naturally-grown magnitudes
    * follow P(d) = log₁₀(1 + 1/d); a flat or spiked digit histogram
    * flags synthetic fills, truncation, or currency-unit mistakes the
    * row diff can't see. The leading digit extracts via BIGINT →
    * string (exact decimal formatting in any engine — float log10 of
    * exact powers is an off-by-one trap), shares and expectations are
    * floor-quantized doubles from exact counts.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val iv = floor(abs(col(valueCol).cast("double"))).cast("bigint")
    val digits = df.filter(col(valueCol).isNotNull && iv >= 1)
      .select(substring(iv.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("__tot"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        (floor(col("n").cast("double") / col("__tot").cast("double")
          * 10000) / 10000).as("obs_share"),
        (floor(log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          / log(lit(10.0)) * 10000) / 10000).as("exp_share"))
      .withColumn("dev",
        floor(abs(col("obs_share") - col("exp_share")) * 10000) / 10000)
  }

  /** Group-mean imputation — the data-repair step after a migration
    * audit finds a column with holes: NULLs fill with their group's
    * mean computed from EXACT decimal sums (deterministic across
    * engines/partitionings; the filled value is floor-quantized to 4
    * decimals so replay is exact), non-null values pass through
    * untouched, and `was_imputed` keeps the repair auditable. Groups
    * that are entirely NULL stay NULL (no global fallback — that is a
    * policy decision, not a default).
    */
  def imputeGroupMean(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("decimal(18,4)")
    val means = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(x).as("__s"))
      .select(col(groupCol),
        graft.functions.TextAnalysis.q4(
          col("__s").cast("double") / col("__n")).as("__mean"))
    df.join(means, Seq(groupCol), "left")
      .withColumn("was_imputed",
        col(valueCol).isNull && col("__mean").isNotNull)
      .withColumn(valueCol + "_filled",
        coalesce(col(valueCol).cast("double"), col("__mean")))
      .drop("__mean")
  }

  /** Population stability index over the same equal-width binning as
    * [[ksDriftBucketed]] — the monitoring-standard drift score
    * (PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ); rule of thumb: <0.1 stable,
    * >0.25 shifted). Laplace-smoothed bin shares (+1 per bin) keep
    * empty bins finite, and ALL `buckets` bins enter the sum — bins
    * empty on both sides still contribute when n_src ≠ n_tgt, per
    * the standard all-bins definition. Each bin term floor-quantizes
    * to 9 decimals
    * and sums as DECIMAL — the BM25-oracle convention that makes a
    * ln()-bearing score order-independent and engine-replayable.
    */
  def psiDrift(src: DataFrame, tgt: DataFrame, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 1, "need at least 2 buckets")
    val both = src.select(col(valueCol).cast("double").as("__v"),
        lit(1L).as("__s"), lit(0L).as("__t"))
      .unionByName(tgt.select(col(valueCol).cast("double").as("__v"),
        lit(0L).as("__s"), lit(1L).as("__t")))
      .filter(col("__v").isNotNull)
    val bounds = both.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val binned = both.crossJoin(broadcast(bounds))
      .select(
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(lit(buckets - 1).cast("long"),
            floor((col("__v") - col("__lo")) / (col("__hi") - col("__lo"))
              * buckets).cast("long"))).as("__bin"),
        col("__s"), col("__t"))
    val perBin = binned.groupBy(col("__bin"))
      .agg(sum(col("__s")).as("__cs"), sum(col("__t")).as("__ct"))
    val totals = binned.agg(sum(col("__s")).as("n_src"),
      sum(col("__t")).as("n_tgt"))
    // Materialize ALL `buckets` bin ids (sequence off the 1-row totals
    // frame) and zero-fill bins empty on both sides: the smoothing
    // denominators assume every bin exists, so a doubly-empty bin
    // still carries a nonzero (p−q)·ln(p/q) term whenever
    // n_src ≠ n_tgt — omitting it deviates from the standard
    // all-bins PSI definition.
    val allBins = totals.select(col("n_src"), col("n_tgt"),
      explode(sequence(lit(0L), lit((buckets - 1).toLong))).as("__bin"))
    val filled = allBins.join(broadcast(perBin), Seq("__bin"), "left")
      .select(col("n_src"), col("n_tgt"),
        coalesce(col("__cs"), lit(0L)).as("__cs"),
        coalesce(col("__ct"), lit(0L)).as("__ct"))
    val p = (col("__cs") + 1).cast("double") /
      (col("n_src") + buckets).cast("double")
    val q = (col("__ct") + 1).cast("double") /
      (col("n_tgt") + buckets).cast("double")
    filled
      .select(col("n_src"), col("n_tgt"),
        (floor((p - q) * log(p / q) * 1e9) / 1e9)
          .cast("decimal(28,9)").as("__term"))
      .groupBy(col("n_src"), col("n_tgt"))
      .agg((floor(sum(col("__term")).cast("double") * 10000) / 10000)
        .as("psi"))
  }

  /** Robust (median/MAD) outlier detection — the heavy-tail-safe twin
    * of `zscoreOutliers`: one planted 1000× value dilates a stddev
    * enough to hide real outliers, but moves the median not at all.
    * Flags |modified z| = |0.6745·(x − med)/MAD| > threshold
    * (Iglewicz-Hoaglin convention); MAD = 0 (over half the group
    * identical) flags nothing.
    *
    * The exact median is a full-value-multiset aggregate — NOT
    * partial-aggregable, so this is the audit/slice-scale path (same
    * contract as the exact half of quantileAudit); at corpus scale
    * swap `median` for `percentile_approx` and keep the identical
    * downstream arithmetic. Two group-sized broadcast join-backs, no
    * per-row window. `mad_z` is floored at 4 decimals like `zscore` —
    * the two divisions are the only engine-sensitive ulps.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      threshold: Double = 3.5): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
    val v = col(valueCol).cast("double")
    val med = base.groupBy(col(groupCol))
      .agg(median(v).as("__med"))
    val withMed = base.join(broadcast(med), Seq(groupCol))
    val mad = withMed.groupBy(col(groupCol))
      .agg(median(abs(v - col("__med"))).as("__mad"))
    val z = when(col("__mad") > 0,
      lit(0.6745) * (v - col("__med")) / col("__mad"))
      .otherwise(lit(0.0))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("mad_z", floor(z * 10000) / 10000)
      .withColumn("is_outlier", abs(col("mad_z")) > threshold)
      .drop("__med", "__mad")
  }

  def histogram(df: DataFrame, colName: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val v = col(colName).cast("double")
    val mm = df.filter(v.isNotNull)
      .agg(min(v).as("__mn"), max(v).as("__mx"))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(mm))
      .select(
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(
            floor((v - col("__mn")) / ((col("__mx") - col("__mn")) / nBuckets)),
            lit(nBuckets - 1))).cast("int").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** HLL sketch audit: per-group exact distinct count next to the
    * approx_count_distinct estimate, with an `ok` flag asserting the
    * estimate honors its error contract (|approx − exact| ≤ tol·exact).
    * This is the pre-flight a 100 TB profile run does on a small slice
    * before trusting the sketch-only path (`profileAuto` past the
    * Expand width cap): the exact side is the expensive one — run the
    * audit at sample scale, then ship sketches alone.
    *
    * One groupBy computes both counts (exact distinct adds the Expand;
    * that is the point of auditing on a slice).
    */
  def sketchDistinctAudit(df: DataFrame, groupCol: String,
      valueCol: String, rsd: Double = 0.02,
      tol: Double = 0.06): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count_distinct(col(valueCol)).as("n_exact"),
        approx_count_distinct(col(valueCol), rsd).as("__apx"))
      .select(col(groupCol), col("n_exact"),
        (abs(col("__apx") - col("n_exact")).cast("double") <=
          lit(tol) * col("n_exact")).as("ok"))

  /** Mergeable distinct-count state: one Datasketches HLL sketch per
    * group, materialized as a binary column — the 100 TB pattern for
    * incremental / partition-wise distinct counting: sketch each
    * ingest batch (or file, or partition) once, persist the
    * group-keyed sketch table, and answer "distinct so far" forever
    * after by unioning states instead of re-scanning history. HLL
    * union is register-wise max, so a unioned estimate is a function
    * of the item SET only — identical no matter how the data was
    * split into batches (asserted by the c28 gate against a second,
    * different partitioning). Caveat: a direct single-pass sketch
    * estimates via HIP, which unions cannot preserve — so compare
    * unioned estimates with unioned estimates, never with a
    * direct-agg estimate (they differ once past sparse mode).
    */
  def distinctSketch(df: DataFrame, groupCol: String, valueCol: String,
      lgk: Int = 14): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgk)).as("sketch"))

  /** Union two group-keyed sketch tables (missing groups pass
    * through — `hll_union_agg` of a single sketch is that sketch). */
  def mergeDistinctSketches(a: DataFrame, b: DataFrame,
      groupCol: String): DataFrame =
    a.unionByName(b).groupBy(col(groupCol))
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))

  def estimateDistinct(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.select(col(groupCol),
      hll_sketch_estimate(col("sketch")).as("n_est"))

  /** Quantile sketch audit: for each requested percentile p, check the
    * approx_percentile (Greenwald-Khanna style, 1/accuracy rank error)
    * value against its contract — the fraction of rows ≤ the estimate
    * must land in [p − tol, p + tol]. Rank error is the guarantee the
    * sketch actually makes (value error is unbounded on skewed data),
    * so that is what the audit measures.
    *
    * Two passes: a single-row sketch aggregate (mergeable partials —
    * this is the 100 TB-cheap half), then one conditional-count pass
    * over the data for the audit (the half you drop once trust is
    * established). The sketch row is broadcast; no wide shuffle.
    */
  def quantileAudit(df: DataFrame, valueCol: String, ps: Seq[Double],
      accuracy: Int = 100, tol: Double = 0.02): DataFrame = {
    require(ps.nonEmpty, "ps must not be empty")
    val psArr = array(ps.map(lit): _*)
    val sk = df.agg(
      percentile_approx(col(valueCol), psArr, lit(accuracy)).as("__vs"))
    val perP = sk.select(posexplode(col("__vs")).as(Seq("__i", "__v")))
      .select(element_at(psArr, col("__i") + 1).as("p"), col("__v"))
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(perP))
      .groupBy(col("p"))
      .agg((sum(when(col(valueCol) <= col("__v"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("__frac"))
      .select(col("p"),
        (abs(col("__frac") - col("p")) <= lit(tol)).as("ok"))
  }

  /** Heavy-hitters sketch audit: the frequent-items sketch
    * (`approx_top_k`, mergeable partials — the 100 TB-cheap half) is
    * checked against exact counts for every UNAMBIGUOUS heavy hitter:
    * items whose exact count is strictly above the k-th largest count.
    * Any correct top-k list must contain exactly these items (ties AT
    * the boundary are legitimately unordered, so they are excluded —
    * the audit row set is deterministic regardless of how either
    * engine breaks ties). `in_sketch` asserts membership; `est_ok`
    * asserts the sketch's estimate is within tol of exact (exact when
    * maxItemsTracked covers the domain).
    *
    * Plan: one partial-agg'd exact groupBy (the expensive audit half),
    * one single-row sketch aggregate over the same scan, a broadcast
    * k-th-count threshold, and a broadcast join of the ≤k sketch rows
    * — no extra wide shuffle beyond the exact count's own.
    */
  def topKAudit(df: DataFrame, valueCol: String, k: Int,
      maxItemsTracked: Int = 65536, tol: Double = 0.0): DataFrame = {
    require(k > 0 && maxItemsTracked >= k, "need k > 0, tracked >= k")
    val exact = df.groupBy(col(valueCol).as("item"))
      .agg(count(lit(1)).as("n_exact"))
    // k-th largest exact count: TakeOrdered(k) then min — never a full
    // sort; rows-on-driver is k
    val kth = exact.orderBy(col("n_exact").desc).limit(k)
      .agg(min(col("n_exact")).as("__kth"))
    val apx = df
      .agg(expr(s"approx_top_k($valueCol, $k, $maxItemsTracked)")
        .as("__tk"))
      .select(explode(col("__tk")).as("__e"))
      .select(col("__e.item").as("item"),
        col("__e.count").cast("long").as("__est"))
    exact
      .join(broadcast(kth))
      .filter(col("n_exact") > col("__kth"))
      .join(broadcast(apx), Seq("item"), "left")
      .select(col("item"), col("n_exact"),
        col("__est").isNotNull.as("in_sketch"),
        (col("__est").isNotNull &&
          abs(col("__est") - col("n_exact")).cast("double") <=
            lit(tol) * col("n_exact")).as("est_ok"))
  }

  /** Migration audit: profiles of source and target, full-outer joined
    * per column, with a per-column verdict. `cols_match = true` means
    * every metric agrees — the column copied intact.
    */
  def compare(source: DataFrame, target: DataFrame,
      exact: Boolean = true): DataFrame = {
    val s = profile(source, exact).alias("s")
    val t = profile(target, exact).alias("t")
    val metrics = Seq("n_rows", "n_nonnull", "n_distinct", "min_s", "max_s")
    val allMatch = metrics.map(m => col(s"s.$m") <=> col(s"t.$m"))
      .reduce(_ && _)
    s.join(t, col("s.col_name") === col("t.col_name"), "full_outer")
      .select(
        coalesce(col("s.col_name"), col("t.col_name")).as("col_name") +:
        (metrics.flatMap(m =>
          Seq(col(s"s.$m").as(s"src_$m"), col(s"t.$m").as(s"tgt_$m"))) :+
        allMatch.as("cols_match")): _*)
  }

  /** Token-frequency drift "top movers" between two corpus snapshots —
    * the monitoring question behind every recrawl/refresh: WHICH
    * vocabulary moved, not just how much (PSI/KS give the scalar).
    * Laplace-smoothed share log-ratio per token over the UNION
    * vocabulary,
    * `ln(((cnt_src+1)·(n_tgt+V)) / ((cnt_tgt+1)·(n_src+V)))`, carried
    * as INTEGER nano-units (the engine-exact discipline), top-k by
    * |ratio| with (|ratio| desc, token asc) determinism. Positive =
    * token fell out of the new snapshot; negative = it surged in.
    *
    * Plan: one partial-agg'd wordcount per side, a full outer join on
    * the token (both sides span the vocabulary — shuffle join), two
    * 1-row aggregates broadcast, TakeOrdered top-k. No driver state.
    */
  def tokenDriftMovers(src: DataFrame, tgt: DataFrame, textCol: String,
      k: Int = 20): DataFrame =
    scoreDriftCounts(tokenCounts(src, textCol), tokenCounts(tgt, textCol), k)

  /** Pearson χ² homogeneity drift over the union token vocabulary —
    * the frequentist complement of [[tokenDriftMovers]]' log-ratio
    * ranking: per token, how far the (src, tgt) count split deviates
    * from the pooled expectation, top-k by the statistic. Unlike the
    * log-ratio (which needs Laplace smoothing and over-ranks rare
    * tokens), χ² weights deviations by expected mass, so the movers
    * are the tokens whose drift is statistically LOUD, not merely
    * proportionally large.
    *
    * Cross-engine float honesty (standing rule 7): NO transcendentals
    * — every double derives from exact integer counts through single
    * correctly-rounded IEEE ops in a pinned order ((o−e)²/e terms,
    * src term + tgt term, ×1e9, floor), so the nano-quantized
    * statistic is bit-identical in any IEEE engine mirroring the
    * order. Plan: two wordcounts, ONE full-outer shuffle-merge join
    * on the token, 1-row totals broadcast back — the
    * scoreDriftCounts shape.
    */
  def chi2TokenDrift(src: DataFrame, tgt: DataFrame, textCol: String,
      k: Int = 25): DataFrame = {
    val joined = tokenCounts(src, textCol)
      .withColumnRenamed("cnt", "cnt_src")
      .hint("shuffle_merge")
      .join(tokenCounts(tgt, textCol).withColumnRenamed("cnt", "cnt_tgt")
        .hint("shuffle_merge"), Seq("token"), "full")
      .na.fill(0L, Seq("cnt_src", "cnt_tgt"))
    val tot = joined.agg(sum(col("cnt_src")).as("__A"),
      sum(col("cnt_tgt")).as("__B"))
    val grand = (col("__A") + col("__B")).cast("double")
    val rowt = (col("cnt_src") + col("cnt_tgt")).cast("double")
    val eA = rowt * col("__A").cast("double") / grand
    val eB = rowt * col("__B").cast("double") / grand
    val dA = col("cnt_src").cast("double") - eA
    val dB = col("cnt_tgt").cast("double") - eB
    // degenerate guard: an empty side makes its expectation 0 for
    // every token and (0−0)²/0 = NaN; the χ² convention (and the
    // oracle's mirrored CASE) is a 0 contribution — the limit of
    // d²/e as the side's mass → 0 with o = 0
    val termA = when(eA > 0d, dA * dA / eA).otherwise(lit(0d))
    val termB = when(eB > 0d, dB * dB / eB).otherwise(lit(0d))
    joined.crossJoin(broadcast(tot))
      .withColumn("chi2_nano",
        floor((termA + termB) * 1e9).cast("long"))
      .orderBy(col("chi2_nano").desc, col("token").asc)
      .limit(k)
      .select(col("token"), col("cnt_src"), col("cnt_tgt"),
        col("chi2_nano"))
  }

  /** The wordcount half of [[tokenDriftMovers]] — (token, cnt). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    import graft.functions.TextAnalysis.tokens
    df.select(explode(tokens(lower(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
  }

  /** The scoring half of [[tokenDriftMovers]], over pre-aggregated
    * (token, cnt) frames — also the seam the STREAMING drift monitor
    * plugs into: the live side's counts come from streaming state
    * ([[graft.streaming.EventStream.streamingTokenCounts]]) while the
    * reference side is a stored artifact.
    */
  def scoreDriftCounts(src: DataFrame, tgt: DataFrame, k: Int)
      : DataFrame = {
    val joined = src.withColumnRenamed("cnt", "cnt_src")
      .hint("shuffle_merge")
      .join(tgt.withColumnRenamed("cnt", "cnt_tgt")
        .hint("shuffle_merge"), Seq("token"), "full")
      .na.fill(0L, Seq("cnt_src", "cnt_tgt"))
    val tot = joined.agg(sum(col("cnt_src")).as("__ns"),
      sum(col("cnt_tgt")).as("__nt"), count(lit(1)).as("__v"))
    joined.crossJoin(broadcast(tot))
      .withColumn("__nanos", floor(
        log(((col("cnt_src") + lit(1.0)) *
            (col("__nt") + col("__v")).cast("double")) /
          ((col("cnt_tgt") + lit(1.0)) *
            (col("__ns") + col("__v")).cast("double"))) * 1e9))
      .withColumn("log_ratio", col("__nanos").cast("double") / 1e9)
      .orderBy(abs(col("__nanos")).desc, col("token").asc)
      .limit(k)
      .select(col("token"), col("cnt_src"), col("cnt_tgt"),
        col("log_ratio"))
  }
}
