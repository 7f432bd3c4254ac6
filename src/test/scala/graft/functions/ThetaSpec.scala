package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class ThetaSpec extends AnyFunSuite with SparkTestBase {

  test("theta sketches: set algebra on mergeable state, split-invariant") {
    import spark.implicits._
    // A = [0, 6000), B = [4000, 10000): |A∩B| = 2000, |A\B| = 4000 —
    // past k = 4096, so estimation mode is live on the unions
    val rows = (0 until 6000).map(i => ("a", i.toLong)) ++
      (4000 until 10000).map(i => ("b", i.toLong))
    val df = rows.toDF("seg", "v").repartition(8) // partial-state merges
    val sk = df.groupBy("seg")
      .agg(Theta.thetaSketchAgg(col("v")).as("sk"))
    val pair = sk.filter(col("seg") === "a").select(col("sk").as("ska"))
      .crossJoin(sk.filter(col("seg") === "b").select(col("sk").as("skb")))
      .select(Theta.thetaEstimate(col("ska")).as("ea"),
        Theta.thetaEstimate(col("skb")).as("eb"),
        Theta.thetaUnionEstimate(col("ska"), col("skb")).as("eu"),
        Theta.thetaIntersectEstimate(col("ska"), col("skb")).as("ei"),
        Theta.thetaDiffEstimate(col("ska"), col("skb")).as("ed"))
      .collect().head
    def within(est: Long, exact: Long, tolOf: Long): Unit =
      assert(math.abs(est - exact) <= 0.06 * tolOf + 1,
        s"estimate $est vs exact $exact")
    within(pair.getLong(0), 6000, 6000)
    within(pair.getLong(1), 6000, 6000)
    within(pair.getLong(2), 10000, 10000)
    within(pair.getLong(3), 2000, 6000)
    within(pair.getLong(4), 4000, 6000)
    // merge invariance is EXACT for theta (state = k smallest hashes,
    // a pure function of the item set): any partitioning of the same
    // rows yields byte-identical estimates
    val est1 = Theta.thetaEstimate(col("sk"))
    val one = df.repartition(1).groupBy("seg")
      .agg(Theta.thetaSketchAgg(col("v")).as("sk"))
      .select(col("seg"), est1.as("e")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val many = df.repartition(13).groupBy("seg")
      .agg(Theta.thetaSketchAgg(col("v")).as("sk"))
      .select(col("seg"), est1.as("e")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one === many)
  }

  test("theta estimation mode: tolerance holds past the purge threshold") {
    import spark.implicits._
    // 20k distinct values — well past the union gadget's ~7.6k purge
    // point, where exact split-invariance is no longer guaranteed
    // (merge-order-dependent θ); the contract that DOES hold there is
    // the published error bound, asserted here at 3σ
    val df = (0 until 20000).map(i => ("g", i.toLong)).toDF("g", "v")
      .repartition(16)
    val est = df.groupBy("g").agg(Theta.thetaSketchAgg(col("v")).as("sk"))
      .select(Theta.thetaEstimate(col("sk"))).collect().head.getLong(0)
    // RSE ≈ 1/√k = 1/64 at k = 4096 → 3σ ≈ 4.7%
    assert(math.abs(est - 20000L) <= 0.047 * 20000, s"estimate $est")
  }

  test("sketch state survives a parquet round-trip (theta and HLL)") {
    import spark.implicits._
    import graft.operators.Profile
    val df = (0 until 5000).map(i => ("g" + i % 2, (i % 3000).toLong))
      .toDF("g", "v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sketch-rt").toString
    // theta: persisted state unions with a fresh delta sketch
    val theta = df.groupBy("g").agg(Theta.thetaSketchAgg(col("v")).as("sk"))
    theta.write.mode("overwrite").parquet(s"$dir/theta")
    val thetaBack = spark.read.parquet(s"$dir/theta")
    val live = theta.select(col("g"), Theta.thetaEstimate(col("sk")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stored = thetaBack
      .select(col("g"), Theta.thetaEstimate(col("sk")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(live === stored)
    // HLL: stored state participates in a union exactly like live state
    val hll = Profile.distinctSketch(df, "g", "v")
    hll.write.mode("overwrite").parquet(s"$dir/hll")
    val hllBack = spark.read.parquet(s"$dir/hll")
    val delta = Profile.distinctSketch(
      (5000 until 6000).map(i => ("g" + i % 2, (i % 3500).toLong))
        .toDF("g", "v"), "g", "v")
    def unioned(state: org.apache.spark.sql.DataFrame) =
      Profile.estimateDistinct(
        Profile.mergeDistinctSketches(state, delta, "g"), "g")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unioned(hll) === unioned(hllBack))
  }
}
