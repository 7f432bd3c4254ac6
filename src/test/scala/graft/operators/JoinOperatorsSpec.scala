package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class JoinOperatorsSpec extends AnyFunSuite with SparkTestBase {

  // ---- AsofJoin ----

  test("asof backward: most recent at-or-before build per key, left semantics") {
    import spark.implicits._
    val probe = Seq((1L, 1L, 100L), (2L, 1L, 250L), (3L, 2L, 50L),
        (4L, 3L, 10L))
      .toDF("event_id", "k", "ts")
    val build = Seq((10L, 1L, 100L, "a"), (11L, 1L, 200L, "b"),
        (12L, 2L, 60L, "c"))
      .toDF("bid", "k", "ts", "payload")
    val out = AsofJoin.backward(probe, build, Seq("k"), "ts", "bid")
      .orderBy("event_id").collect()
    // probe@100 matches build@100 (inclusive)
    assert(out(0).getAs[Long]("asof_bid") == 10L)
    assert(out(0).getAs[String]("asof_payload") == "a")
    // probe@250 takes the latest prior (200, not 100)
    assert(out(1).getAs[Long]("asof_bid") == 11L)
    // key 2: build@60 is AFTER probe@50 → no match
    assert(out(2).isNullAt(out(2).fieldIndex("asof_bid")))
    // key 3 has no builds at all → null payload
    assert(out(3).isNullAt(out(3).fieldIndex("asof_bid")))
    // probe columns preserved
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("asof backward: equal-ts build ties break to greatest tieCol") {
    import spark.implicits._
    val probe = Seq((1L, 1L, 100L)).toDF("event_id", "k", "ts")
    val build = Seq((7L, 1L, 100L, "lo"), (9L, 1L, 100L, "hi"))
      .toDF("bid", "k", "ts", "payload")
    val out = AsofJoin.backward(probe, build, Seq("k"), "ts", "bid").collect()
    assert(out(0).getAs[Long]("asof_bid") == 9L)
    assert(out(0).getAs[String]("asof_payload") == "hi")
  }

  test("asof backward: tie-break is typed, not lexicographic (9 vs 10)") {
    import spark.implicits._
    // a string cast would rank '9' > '10'; the typed compare must pick 10
    val probe = Seq((1L, 1L, 100L)).toDF("event_id", "k", "ts")
    val build = Seq((9L, 1L, 100L, "nine"), (10L, 1L, 100L, "ten"))
      .toDF("bid", "k", "ts", "payload")
    val out = AsofJoin.backward(probe, build, Seq("k"), "ts", "bid").collect()
    assert(out(0).getAs[Long]("asof_bid") == 10L)
    assert(out(0).getAs[String]("asof_payload") == "ten")
  }

  test("asof backward equals the join-then-argmax reference implementation") {
    import spark.implicits._
    // deterministic pseudo-random fixture, multiple keys, shared ts
    val probe = (1L to 200L)
      .map(i => (i, i % 7, (i * 37) % 500)).toDF("event_id", "k", "ts")
    val build = (1L to 80L)
      .map(i => (1000L + i, i % 7, (i * 91) % 500, i * 1.5))
      .toDF("bid", "k", "ts", "v")
    val fast = AsofJoin.backward(probe, build, Seq("k"), "ts", "bid")
      .select("event_id", "asof_bid")
    // reference: θ-join + per-probe argmax on (build ts, bid)
    val ref = probe.alias("p")
      .join(build.alias("b"),
        col("p.k") === col("b.k") && col("b.ts") <= col("p.ts"), "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(max_by(col("b.bid"),
        struct(col("b.ts"), col("b.bid"))).as("asof_bid"))
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }

  test("asof backward plans exactly one exchange (no join node)") {
    import spark.implicits._
    val probe = Seq((1L, 1L, 100L)).toDF("event_id", "k", "ts")
    val build = Seq((7L, 1L, 90L, "x")).toDF("bid", "k", "ts", "payload")
    val plan = AsofJoin.backward(probe, build, Seq("k"), "ts", "bid")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 Exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"expected no join node:\n$plan")
  }

  test("asof forward: earliest at-or-after build; ties to smallest tieCol") {
    import spark.implicits._
    val probe = Seq((1L, 1L, 100L), (2L, 1L, 250L), (3L, 2L, 70L),
        (4L, 3L, 10L))
      .toDF("event_id", "k", "ts")
    val build = Seq((10L, 1L, 100L, "a"), (11L, 1L, 200L, "b"),
        (12L, 2L, 60L, "c"))
      .toDF("bid", "k", "ts", "payload")
    val out = AsofJoin.forward(probe, build, Seq("k"), "ts", "bid")
      .orderBy("event_id").collect()
    // probe@100 matches build@100 (inclusive), not the later 200
    assert(out(0).getAs[Long]("asof_bid") == 10L)
    // probe@250 has no later build → null
    assert(out(1).isNullAt(out(1).fieldIndex("asof_bid")))
    // key 2: build@60 is BEFORE probe@70 → no forward match
    assert(out(2).isNullAt(out(2).fieldIndex("asof_bid")))
    assert(out(3).isNullAt(out(3).fieldIndex("asof_bid")))
    // forward equal-ts ties break to the SMALLEST tie value
    val tie = AsofJoin.forward(
      Seq((1L, 1L, 100L)).toDF("event_id", "k", "ts"),
      Seq((9L, 1L, 100L, "hi"), (7L, 1L, 100L, "lo"))
        .toDF("bid", "k", "ts", "payload"),
      Seq("k"), "ts", "bid").collect()
    assert(tie(0).getAs[Long]("asof_bid") == 7L)
  }

  test("asof forward equals the join-then-argmin reference implementation") {
    import spark.implicits._
    val probe = (1L to 200L)
      .map(i => (i, i % 7, (i * 37) % 500)).toDF("event_id", "k", "ts")
    val build = (1L to 80L)
      .map(i => (1000L + i, i % 7, (i * 91) % 500, i * 1.5))
      .toDF("bid", "k", "ts", "v")
    val fast = AsofJoin.forward(probe, build, Seq("k"), "ts", "bid")
      .select("event_id", "asof_bid")
    // reference: θ-join + per-probe argmin on (build ts, bid)
    val ref = probe.alias("p")
      .join(build.alias("b"),
        col("p.k") === col("b.k") && col("b.ts") >= col("p.ts"), "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(min_by(col("b.bid"),
        struct(col("b.ts"), col("b.bid"))).as("asof_bid"))
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }

  test("asof nearest: closer side wins, equal distance goes backward") {
    import spark.implicits._
    val probe = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 2L, 50L),
        (4L, 3L, 10L), (5L, 4L, 10L))
      .toDF("event_id", "k", "ts")
    val build = Seq(
      (10L, 1L, 90L, "back10"), (11L, 1L, 105L, "fwd5"),
      (12L, 1L, 195L, "back5"), (13L, 1L, 205L, "fwd5b"),
      (14L, 2L, 40L, "backonly"), (15L, 4L, 99L, "fwdonly"))
      .toDF("bid", "k", "ts", "payload")
    val out = AsofJoin.nearest(probe, build, Seq("k"), "ts", "bid")
      .orderBy("event_id").collect()
    assert(out(0).getAs[Long]("asof_bid") == 11L)  // fwd dist 5 < back 10
    assert(out(1).getAs[Long]("asof_bid") == 12L)  // tie dist 5 → backward
    assert(out(2).getAs[Long]("asof_bid") == 14L)  // only backward exists
    assert(out(3).isNullAt(out(3).fieldIndex("asof_bid")))  // no builds
    assert(out(4).getAs[Long]("asof_bid") == 15L)  // only forward exists
  }

  test("asof forward/nearest plan one exchange, no join node") {
    import spark.implicits._
    val probe = Seq((1L, 1L, 100L)).toDF("event_id", "k", "ts")
    val build = Seq((7L, 1L, 90L, "x")).toDF("bid", "k", "ts", "payload")
    for (mk <- Seq(AsofJoin.forward _, AsofJoin.nearest _)) {
      val plan = mk(probe, build, Seq("k"), "ts", "bid", "asof_")
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected 1 Exchange, got $exchanges:\n$plan")
      assert(!plan.contains("Join"), s"expected no join node:\n$plan")
    }
  }

  // ---- RangeJoin ----

  test("range join: boundaries inclusive, bin-spanning intervals, negatives") {
    import spark.implicits._
    val points = Seq((1L, -15L), (2L, 0L), (3L, 10L), (4L, 25L), (5L, 99L))
      .toDF("pid", "p")
    val intervals = Seq((100L, -20L, 0L), (101L, 5L, 27L), (102L, 26L, 90L))
      .toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
        binWidth = 10L)
      .select("pid", "iid").orderBy("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // p=-15 ∈ [-20,0]; p=0 ∈ [-20,0] (inclusive hi); p=10 ∈ [5,27];
    // p=25 ∈ [5,27]; p=99 ∉ anything; [26,90] catches nothing here
    assert(out.toSeq == Seq((1L, 100L), (2L, 100L), (3L, 101L), (4L, 101L)))
  }

  test("range join equals naive BETWEEN join, with and without equi keys") {
    import spark.implicits._
    val points = (1L to 300L).map(i => (i, i % 4, (i * 13) % 1000))
      .toDF("pid", "g", "p")
    val intervals = (1L to 40L)
      .map(i => (500L + i, i % 4, (i * 53) % 900, (i * 53) % 900 + i * 7))
      .toDF("iid", "g2", "lo", "hi")
    // keyed: g == g2 via renamed equi col
    val keyed = RangeJoin.pointInInterval(points,
        intervals.withColumnRenamed("g2", "g"), "p", "lo", "hi",
        binWidth = 64L, equiKeys = Seq("g"))
      .select("pid", "iid")
    val keyedRef = points.join(intervals,
        col("g") === col("g2") && col("p").between(col("lo"), col("hi")))
      .select("pid", "iid")
    assert(keyed.exceptAll(keyedRef).isEmpty && keyedRef.exceptAll(keyed).isEmpty)
    // keyless
    val flat = RangeJoin.pointInInterval(points.drop("g"),
        intervals.drop("g2"), "p", "lo", "hi", binWidth = 64L)
      .select("pid", "iid")
    val flatRef = points.join(intervals, col("p").between(col("lo"), col("hi")))
      .select("pid", "iid")
    assert(flat.exceptAll(flatRef).isEmpty && flatRef.exceptAll(flat).isEmpty)
  }

  test("range join rejects clashing non-key column names") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("id", "p")
    val intervals = Seq((2L, 0L, 9L)).toDF("id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("id"))
  }

  // ---- digestDiff ----

  test("digestDiff equals direct diff minus identical; skips clean buckets") {
    import spark.implicits._
    val src = (1L to 2000L).map(i => (i, i % 97, s"v$i"))
      .toDF("pk", "a", "b")
    // localized changes: 3 updates, 2 deletes, 2 inserts
    val tgt = src
      .filter(col("pk") =!= 1998L && col("pk") =!= 1999L) // missing → new
      .withColumn("b", when(col("pk").isin(5L, 6L, 7L), lit("CHANGED"))
        .otherwise(col("b")))
      .union(Seq((3001L, 0L, "x"), (3002L, 0L, "y")).toDF("pk", "a", "b"))
    val direct = DiffSync.diff(src, tgt, Seq("pk"))
      .filter(col(DiffSync.FlagCol) =!= "identical")
      .select("pk", DiffSync.FlagCol)
    val pruned = DiffSync.digestDiff(src, tgt, Seq("pk"), nBuckets = 256)
      .select("pk", DiffSync.FlagCol)
    assert(pruned.exceptAll(direct).isEmpty && direct.exceptAll(pruned).isEmpty)
    assert(direct.count() == 7)
    // 7 touched PKs land in ≤7 of 256 buckets — pruning is real
    val dirty = DiffSync.dirtyBuckets(src, tgt, Seq("pk"), 256).count()
    assert(dirty >= 1 && dirty <= 7, s"dirty=$dirty")
  }

  test("digest sees a value moved between two nullable columns") {
    import spark.implicits._
    // xxhash64 skips null children, so without null-position tagging
    // (pk, 'x', NULL) and (pk, NULL, 'x') produce identical digests and
    // the shift is invisible to both the count and the XOR
    val src = Seq((1L, Option("x"), Option.empty[String]),
        (2L, Option("a"), Option("b"))).toDF("pk", "c1", "c2")
    val tgt = Seq((1L, Option.empty[String], Option("x")),
        (2L, Option("a"), Option("b"))).toDF("pk", "c1", "c2")
    assert(DiffSync.dirtyBuckets(src, tgt, Seq("pk"), 64).count() == 1)
    val out = DiffSync.digestDiff(src, tgt, Seq("pk"), 64)
      .select("pk", DiffSync.FlagCol).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "changed")))
  }

  test("digestDiff on identical inputs returns nothing, zero dirty buckets") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("pk", "v")
    assert(DiffSync.dirtyBuckets(df, df, Seq("pk"), 64).isEmpty)
    assert(DiffSync.digestDiff(df, df, Seq("pk"), 64).isEmpty)
  }
}
