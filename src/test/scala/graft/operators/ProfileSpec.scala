package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ProfileSpec extends AnyFunSuite with SparkTestBase {

  test("profile: counts, nulls, distinct, canonical min/max strings") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(2.5)),
      (2L, None, Some(1.25)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(2.5))
    ).toDF("id", "s", "v")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 4 &&
      p("id").getLong(3) == 4)
    assert(p("id").getString(4) == "1" && p("id").getString(5) == "4")
    assert(p("s").getLong(2) == 3 && p("s").getLong(3) == 2)
    assert(p("s").getString(4) == "a" && p("s").getString(5) == "b")
    // doubles canonicalize through DECIMAL(18,4)
    assert(p("v").getLong(2) == 3 && p("v").getLong(3) == 2)
    assert(p("v").getString(4) == "1.2500" && p("v").getString(5) == "2.5000")
  }

  test("profile: approx path returns a sane HLL estimate without Expand") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i, i % 100)).toDF("id", "g")
    val plan = Profile.profile(df, exact = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    val exactPlan = Profile.profile(df, exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand")) // documents the trade-off
    val nd = Profile.profile(df, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(nd("g") - 100) <= 10)   // ±10% at HLL default sd
    assert(math.abs(nd("id") - 5000) <= 500)
  }

  test("profileAuto: 500-column schema engages HLL (no Expand), narrow stays exact") {
    import spark.implicits._
    val wide = spark.range(200).select(
      (0 until 500).map(i => (col("id") * (i + 1) % 37).as(s"c$i")): _*)
    val auto = Profile.profileAuto(wide)
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "500-column auto profile must not Expand")
    assert(plan.contains("approx_count_distinct") || plan.contains("HyperLogLog"),
      s"expected the HLL sketch in:\n$plan")
    // the wide profile actually RUNS: one row per column, sane counts
    val rows = auto.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getLong(1) == 200L))
    // a narrow schema keeps the exact-distinct Expand path
    val narrow = (1L to 100L).map(i => (i, i % 5)).toDF("id", "g")
    val narrowPlan = Profile.profileAuto(narrow)
      .queryExecution.executedPlan.toString
    assert(narrowPlan.contains("Expand"))
    // compareAuto on the wide schema: intact copy → every column matches
    val cmp = Profile.compareAuto(wide, wide).collect()
    assert(cmp.length == 500 && cmp.forall(_.getBoolean(11)))
  }

  test("extreme doubles stay distinguishable (no DECIMAL(18,4) overflow)") {
    import spark.implicits._
    // |x| >= 1e14, NaN, Infinity all overflow DECIMAL(18,4) to NULL —
    // two sides with different extremes must NOT report cols_match
    val src = Seq((1L, 1.0e15), (2L, 2.0)).toDF("pk", "v")
    val tgt = Seq((1L, 7.0e17), (2L, 2.0)).toDF("pk", "v")
    val byCol = Profile.compare(src, tgt).collect()
      .map(r => r.getString(0) -> r.getBoolean(r.fieldIndex("cols_match")))
      .toMap
    assert(!byCol("v"), "different extreme maxima must flag")
    val inf = Seq((1L, Double.PositiveInfinity)).toDF("pk", "v")
    val pInf = Profile.profile(inf).collect()
      .map(r => r.getString(0) -> r.getString(5)).toMap
    assert(pInf("v") == "Infinity") // not NULL
  }

  test("compare: intact columns pass, perturbed column and row drift flag") {
    import spark.implicits._
    val src = (1L to 1000L).map(i => (i, i % 50, i * 1.5)).toDF("pk", "g", "v")
    val tgt = src.filter(col("pk") =!= 1000L) // one row lost in transit
      .withColumn("v", when(col("pk") === 5L, lit(9999.0)).otherwise(col("v")))
    val byCol = Profile.compare(src, tgt).collect()
      .map(r => r.getString(0) -> r.getBoolean(r.fieldIndex("cols_match")))
      .toMap
    assert(!byCol("pk")) // n_rows/max differ
    assert(!byCol("v"))  // perturbed value
    assert(!byCol("g"))  // row loss changes counts even if distinct set same
    val same = Profile.compare(src, src).collect()
    assert(same.forall(_.getBoolean(same.head.fieldIndex("cols_match"))))
  }

  test("sketchDistinctAudit: HLL inside contract on real cardinalities, zero-tol flags") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => (i % 4, i % 1000 + (i % 4) * 10000))
      .toDF("g", "v")
    val ok = Profile.sketchDistinctAudit(df, "g", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(ok.length === 4)
    // i ≡ g (mod 4) ⟹ i % 1000 hits exactly the 250 residues ≡ g (mod 4)
    assert(ok.forall(_._2 === 250L)) // exact side is exact
    assert(ok.forall(_._3), s"HLL outside 6% of exact: ${ok.toSeq}")
    // tol = 0 must flag any estimate that isn't spot-on — proves the
    // flag actually compares (HLL at rsd 0.02 is almost never exact
    // at cardinality 250)
    val strict = Profile.sketchDistinctAudit(df, "g", "v", tol = 0.0)
      .collect().map(_.getBoolean(2))
    assert(strict.exists(!_))
  }

  test("quantileAudit: estimates honor rank error; impossible tol flags") {
    import spark.implicits._
    // skewed data (the case where VALUE error explodes but rank error
    // must hold): 99% small values, 1% huge
    val df = ((1 to 9900).map(_.toDouble) ++
      (1 to 100).map(_ * 1e6)).toDF("v")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val audit = Profile.quantileAudit(df, "v", ps).collect()
      .map(r => r.getDouble(0) -> r.getBoolean(1)).toMap
    assert(audit.keySet === ps.toSet)
    assert(audit.values.forall(identity), s"rank contract broken: $audit")
    // a zero-tolerance audit cannot pass everywhere on 10k rows
    // (fraction ≤ estimate is a multiple of 1/10000, never exactly p
    // for all four ps)
    val strict = Profile.quantileAudit(df, "v", ps, tol = 0.0)
      .collect().map(_.getBoolean(1))
    assert(strict.exists(!_))
  }

  test("madOutliers: robust to masking, MAD-0 groups flag nothing") {
    import spark.implicits._
    // 1..50 plus a moderate (100) and an extreme (1e6) outlier: the
    // extreme dilates the stddev so zscore MISSES the moderate one —
    // the median/MAD path must catch both
    val vals = (1 to 50).map(_.toDouble) ++ Seq(100.0, 1e6)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }
      .toDF("grp", "id", "v")
    val mad = Profile.madOutliers(df, "grp", "v").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_outlier"))
      .toMap
    assert(mad(50L) && mad(51L), "MAD must flag moderate AND extreme")
    assert((0 to 49).forall(i => !mad(i.toLong)))
    val z = Profile.zscoreOutliers(df, "grp", "v").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_outlier"))
      .toMap
    assert(!z(50L), "stddev path is masked by the extreme value")
    // >half the group identical → MAD = 0 → nothing flags
    val const = (Seq.fill(9)(5.0) ++ Seq(7.0)).zipWithIndex
      .map { case (v, i) => ("c", i.toLong, v) }.toDF("grp", "id", "v")
    assert(Profile.madOutliers(const, "grp", "v").collect()
      .forall(!_.getAs[Boolean]("is_outlier")))
  }

  test("topKAudit: strict hitters only, boundary ties excluded, exact ests") {
    import spark.implicits._
    // counts: a=5, b=4, c=3, d=3, e=1 → k=4: kth count = 3 (tied c,d)
    val df = (Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(3)("d") ++ Seq("e")).toDF("v")
    val out = Profile.topKAudit(df, "v", k = 4).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toMap
    // c and d tie AT the boundary → excluded; e below → excluded
    assert(out.keySet === Set("a", "b"))
    assert(out("a") === ((5L, true, true)))
    assert(out("b") === ((4L, true, true)))
    // k covering the whole domain: every item is above the (absent)
    // k-th cut only when counts are strictly separated — with k=5 the
    // kth count is 1 (e), strict hitters are a,b and the tied c,d pair
    // now sits above it
    val all = Profile.topKAudit(df, "v", k = 5).collect()
      .map(_.getString(0)).toSet
    assert(all === Set("a", "b", "c", "d"))
  }

  test("histogram: equi-width buckets, top edge folded, nulls excluded") {
    import spark.implicits._
    // values 0..99 → 10 buckets of exactly 10; value 100 (the max)
    // folds into bucket 9; a null contributes nowhere
    val df = ((0 to 100).map(i => Some(i.toDouble)) :+ None).toDF("v")
    val h = Profile.histogram(df, "v", 10).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h.keySet === (0 to 9).toSet)
    assert((0 to 8).forall(b => h(b) === 10L))
    assert(h(9) === 11L) // 90..99 plus the folded max
    // constant column degenerates to a single bucket 0
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val hc = Profile.histogram(const, "v", 10).collect()
    assert(hc.length === 1 && hc.head.getInt(0) === 0 &&
      hc.head.getLong(1) === 3L)
  }

  test("distinct sketches: union is split-invariant, accurate, group-safe") {
    import spark.implicits._
    // 30k rows; g alternates with i so each group sees the 5k values
    // of its parity class — deep into HLL estimation mode, where the
    // union-vs-direct trap is live
    val df = (0 until 30000).map(i => (s"g${i % 2}", i % 10000))
      .toDF("g", "v")
    def unionEst(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      Profile.estimateDistinct(
        Profile.mergeDistinctSketches(
          Profile.distinctSketch(a, "g", "v"),
          Profile.distinctSketch(b, "g", "v"), "g"), "g")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySeven = unionEst(df.filter(col("v") % 7 === 0),
      df.filter(col("v") % 7 =!= 0))
    val byThree = unionEst(df.filter(col("v") % 3 === 0),
      df.filter(col("v") % 3 =!= 0))
    // identical estimates no matter how the data was batched
    assert(bySeven === byThree)
    // and within HLL tolerance of the truth
    bySeven.values.foreach(est =>
      assert(math.abs(est - 5000L) <= 300, s"estimate $est"))
    // a group present on one side only passes through the union
    val lop = unionEst(df.filter(col("g") === "g0"),
      df.filter(col("g") === "g1"))
    assert(lop.keySet === Set("g0", "g1"))
    // the HIP trap (direct sketches estimate via HIP, unions via the
    // composite estimator — they CAN differ, as the sf0.1 gate build
    // showed) means direct estimates may not equal unioned ones; the
    // direct path must still be accurate on its own
    val direct = Profile.estimateDistinct(
        Profile.distinctSketch(df, "g", "v"), "g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.values.foreach(est =>
      assert(math.abs(est - 5000L) <= 300, s"direct estimate $est"))
  }

  test("tokenDriftMovers: surge and drop rank first, stable vocab last") {
    import spark.implicits._
    val src = Seq((1L, "alpha alpha alpha beta beta gamma"),
      (2L, "alpha beta gamma")).toDF("id", "text")
    val tgt = Seq((3L, "beta beta gamma delta delta delta"),
      (4L, "beta gamma delta")).toDF("id", "text")
    val out = Profile.tokenDriftMovers(src, tgt, "text", k = 4).collect()
    val byTok = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // alpha: 4 -> 0 (dropped, positive ratio); delta: 0 -> 4 (surged,
    // negative); both must outrank beta/gamma
    assert(byTok.contains("alpha") && byTok.contains("delta"))
    assert(byTok("alpha")._3 > 0 && byTok("delta")._3 < 0)
    assert(byTok("alpha")._1 === 4L && byTok("alpha")._2 === 0L)
    val order = out.map(_.getString(0)).toSeq
    assert(order.indexOf("alpha") < order.indexOf("gamma"))
    assert(order.indexOf("delta") < order.indexOf("gamma"))
    // NOT a tie: floor is toward −∞, so the negative (surging) mover
    // carries one extra nano of magnitude than its mirror-image drop
    // (|floor(−x·1e9)| = |floor(x·1e9)|+1 off grid) — delta outranks
    // alpha by exactly that nano
    assert(order.indexOf("delta") < order.indexOf("alpha"))
  }

  test("chi2TokenDrift: degenerate empty side yields 0, not NaN") {
    import spark.implicits._
    val src = Seq((1L, "alpha beta beta")).toDF("id", "text")
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    // empty tgt: every token's tgt expectation is 0 — the guard makes
    // the contribution 0 instead of (0−0)²/0 = NaN, and the src term
    // is also 0 (observed == expected when one side holds all mass),
    // so the statistic is exactly 0 for every token
    val out = Profile.chi2TokenDrift(src, empty, "text", k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out.keySet === Set("alpha", "beta"))
    assert(out.values.forall(_ === 0L))
    // non-degenerate sanity unchanged: a real split still scores > 0
    val tgt = Seq((2L, "beta beta beta beta gamma")).toDF("id", "text")
    val real = Profile.chi2TokenDrift(src, tgt, "text", k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(real("alpha") > 0L && real("gamma") > 0L)
  }
}
