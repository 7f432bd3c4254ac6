package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-filling fixed-width time-series resample.
  *
  * Classic warehouse-ETL shape (the reference's Kettle jobs lean on a
  * calendar dimension for the same thing): bucket events to a fixed
  * grid, then densify — every (key, bucket) slot in the observed range
  * exists in the output, empty slots carry zero counts and a
  * forward-filled "last seen" value.
  *
  * Scale shape (100 TB): the only full-data shuffle is the (key,
  * bucket) aggregate with map-side partial aggregation. The spine is
  * generated from PER-KEY bounds (a groupBy over the already-
  * aggregated table, not the raw rows), so its size is Σ_key (key's
  * own bucket span) — a single long-lived key cannot force every
  * sparse key's grid to span the full time range, which with global
  * bounds would explode the spine to |keys| × |total buckets| rows.
  * Densification joins aggregate-vs-spine, never touching raw rows
  * again. The forward-fill window partitions on the key: state per
  * partition is one running value, no buffering.
  */
object Resample {

  /** Resample `df` onto a `binUs`-wide grid of `tsUs` per `key`.
    *
    * Output: (key, bucket_us, n_events, sum_value, last_sum_value)
    * for every bucket between each key's OWN first and last
    * observation; empty buckets have n_events=0/sum_value=0.0 and
    * last_sum_value forward-fills the most recent non-empty bucket's
    * sum (each key's first spine bucket is observed by construction,
    * so last_sum_value is never null).
    *
    * Sums go through DECIMAL(18,4) so results are exact and
    * engine-portable.
    */
  def resample(df: DataFrame, key: String, tsUs: Column, binUs: Long,
      value: String): DataFrame = {
    require(binUs > 0, s"binUs must be positive, got $binUs")
    // ts - (ts mod bin): exact long arithmetic (double division would
    // drift at epoch-us magnitudes)
    val tsL = tsUs.cast("long")
    val binned = df.select(col(key),
      (tsL - pmod(tsL, lit(binUs))).as("bucket_us"),
      col(value).cast("decimal(18,4)").as("v"))

    val agg = binned.groupBy(col(key), col("bucket_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("sum_value"))

    // per-key bounds over the ALREADY-AGGREGATED table (small: one row
    // per observed slot) -> exploded grid. sequence() is bounded by
    // each key's own span, so the spine is O(Σ per-key buckets) even
    // when one long-lived key coexists with millions of short-lived
    // ones.
    val spine = agg.groupBy(col(key))
      .agg(min(col("bucket_us")).as("lo"), max(col("bucket_us")).as("hi"))
      .select(col(key),
        explode(sequence(col("lo"), col("hi"), lit(binUs)))
          .as("bucket_us"))

    val filled = spine.join(agg, Seq(key, "bucket_us"), "left")
      .select(col(key), col("bucket_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))

    val w = Window.partitionBy(col(key)).orderBy(col("bucket_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled.withColumn("last_sum_value",
      last(when(col("n_events") > 0, col("sum_value")),
        ignoreNulls = true).over(w))
  }

  /** `resample` plus linear interpolation: empty buckets get the
    * straight line between the surrounding observed buckets
    * (`interp_value`); before the first / after the last observation
    * the nearest observed value extends flat. Observed buckets carry
    * their own sum unchanged.
    *
    * Both direction passes are windows over the SAME (key, bucket)
    * sort, so Catalyst plans one shuffle and two Window nodes back to
    * back — the backward pass costs no extra exchange. Interpolated
    * values are floor-quantized (q4 convention) since the slope
    * arithmetic is double.
    */
  def interpolated(df: DataFrame, key: String, tsUs: Column, binUs: Long,
      value: String): DataFrame = {
    val base = resample(df, key, tsUs, binUs, value)
    val obsV = when(col("n_events") > 0, col("sum_value"))
    val obsB = when(col("n_events") > 0, col("bucket_us"))
    val wb = Window.partitionBy(col(key)).orderBy(col("bucket_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key)).orderBy(col("bucket_us"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevV = last(obsV, ignoreNulls = true).over(wb)
    val prevB = last(obsB, ignoreNulls = true).over(wb)
    val nextV = first(obsV, ignoreNulls = true).over(wf)
    val nextB = first(obsB, ignoreNulls = true).over(wf)
    val interp = when(col("n_events") > 0, col("sum_value"))
      .when(prevV.isNull, nextV)
      .when(nextV.isNull, prevV)
      .otherwise(prevV + (nextV - prevV) *
        ((col("bucket_us") - prevB) / (nextB - prevB)))
    base.withColumn("interp_value",
      floor(interp * 10000) / 10000)
  }
}
