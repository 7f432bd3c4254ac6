package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one tenant/customer owning half the fact table).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) handles most cases at runtime by splitting oversized
  * partitions. Salting is the plan-level fallback when AQE can't help —
  * e.g. the skewed side feeds an aggregation, or the join is
  * broadcast-ineligible and a single key exceeds one executor:
  *
  * the big side's key gains a deterministic salt in [0, buckets), the
  * small side is replicated once per salt value, and the join runs on
  * (key, salt) — the hot key now spreads over `buckets` partitions.
  * Cost: small side × buckets rows (choose buckets ≈ skew factor, not
  * thousands).
  */
object Skew {

  private val SaltCol = "__salt__"

  /** Deterministic salt from non-key columns (stable across retries —
    * a random salt would break retry idempotency at scale).
    */
  def salt(of: Column, buckets: Int): Column =
    pmod(xxhash64(of), lit(buckets)).cast("int")

  /** Skew-safe equi-join: `big` salted by a hash of `saltSource`
    * (pick a high-cardinality column, e.g. the fact PK), `small`
    * replicated `buckets`×.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltSource: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltedBig = big.withColumn(SaltCol, salt(col(saltSource), buckets))
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Skew-safe aggregation: two-phase — partial aggregate on
    * (keys, salt), then final aggregate on keys. Use for aggregates
    * that compose (sum/count/min/max); the partial shuffle spreads a
    * hot key over `buckets` reducers.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltSource: String, buckets: Int): DataFrame = {
    val partial = df
      .withColumn(SaltCol, salt(col(saltSource), buckets))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }
}
