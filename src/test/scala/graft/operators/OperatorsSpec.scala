package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class OperatorsSpec extends AnyFunSuite with SparkTestBase {

  private def sf = "/root/testdata/sf0.001"

  test("C5: NUL scrub removes U+0000 from string columns only") {
    import spark.implicits._
    val df = Seq((1, "a\u0000b", 2.5), (2, "clean", 3.5))
      .toDF("id", "s", "v")
    val out = CopyPipeline.scrubNulBytes(df).collect()
    assert(out.map(_.getString(1)).toSet === Set("ab", "clean"))
    assert(out.map(_.getDouble(2)).toSet === Set(2.5, 3.5))
  }

  test("B4: read-side normalization per source type") {
    import spark.implicits._
    val df = Seq(("ABC-DEF", "<x>hello</x>", "<2ch")).toDF("u", "x1", "x2")
    val out = df.select(
      CopyPipeline.readSideExpr("u", "uniqueidentifier"),
      CopyPipeline.readSideExpr("x1", "xml"),
      CopyPipeline.readSideExpr("x2", "xml")).collect()(0)
    assert(out.getString(0) === "abc-def")
    assert(out.getString(1) === "<x>hello</x>")
    assert(out.isNullAt(2)) // effectively-empty xml → NULL (pl:452)
  }

  test("C3: modulo buckets partition completely and disjointly") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val n = orders.count()
    val bucketed = orders.withColumn("b",
      CopyPipeline.moduloBucket("o_orderkey", 8))
    assert(bucketed.groupBy("b").count().agg(sum("count")).head.getLong(0) === n)
    assert(bucketed.select("b").distinct().count() === 8)
  }

  test("C15: diff classification covers all four states") {
    import spark.implicits._
    val src = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val tgt = Seq((2, "b"), (3, "CHANGED"), (4, "d")).toDF("id", "v")
    val d = DiffSync.diff(src, tgt, Seq("id"))
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(d === Map(1 -> "new", 2 -> "identical", 3 -> "changed",
      4 -> "deleted"))
  }

  test("C16: applying the diff reproduces the source") {
    import spark.implicits._
    val src = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val tgt = Seq((2, "x"), (4, "d")).toDF("id", "v")
    val applied = DiffSync.applyDiff(DiffSync.diff(src, tgt, Seq("id")))
    assert(applied.exceptAll(src).isEmpty && src.exceptAll(applied).isEmpty)
  }

  test("C15: diff handles NULL values null-safely") {
    import spark.implicits._
    val src = Seq((1, Option.empty[String]), (2, Some("b")))
      .toDF("id", "v")
    val tgt = Seq((1, Option.empty[String]), (2, Option.empty[String]))
      .toDF("id", "v")
    val d = DiffSync.diff(src, tgt, Seq("id"))
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(d === Map(1 -> "identical", 2 -> "changed"))
  }

  test("salted join/agg equal their unsalted twins on skewed keys") {
    import spark.implicits._
    // 90% of rows share one key — the classic skew shape
    val big = (1L to 2000L).map(i =>
      (if (i <= 1800) 1L else i, i, i * 1.5)).toDF("k", "row_id", "v")
    val dim = Seq((1L, "hot"), (1900L, "cold"), (3000L, "absent"))
      .toDF("k", "label")
    val plain = big.join(dim, Seq("k")).select(col("row_id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(big, dim, Seq("k"),
      saltSource = "row_id", buckets = 8)
      .select(col("row_id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain && plain.size === 1801)
    val agg = Skew.saltedSumCount(big, Seq("k"), "v",
      saltSource = "row_id", buckets = 8)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(agg(1L)._2 === 1800L)
    assert(math.abs(agg(1L)._1 - (1L to 1800L).map(_ * 1.5).sum) < 1e-6)
  }

  test("saltedSumCount plans two aggregate phases over the salted key") {
    import spark.implicits._
    val big = (1L to 100L).map(i => (1L, i, i * 1.0)).toDF("k", "row_id", "v")
    val df = Skew.saltedSumCount(big, Seq("k"), "v",
      saltSource = "row_id", buckets = 8)
    val plan = df.queryExecution.optimizedPlan.toString
    // phase 1 groups on (k, __salt__), phase 2 on k — the hot key is
    // spread over `buckets` reducers before the final combine
    assert(plan.contains("__salt__"), plan)
    assert("Aggregate \\[".r.findAllIn(plan).length == 2, plan)
    val phys = df.queryExecution.executedPlan.toString
    // the salted partial shuffles on (k, __salt__), not on k alone
    assert(phys.contains("__salt__"), phys)
  }

  test("C16: upsert SQL shape") {
    assert(DiffSync.upsertSql("t", Seq("id"), Seq("a", "b")) ===
      "INSERT INTO t (id, a, b) VALUES (?, ?, ?) " +
        "ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")
    assert(DiffSync.upsertSql("t", Seq("id"), Nil).endsWith("DO NOTHING"))
  }

  test("B5: canonicalization aligns uuid case") {
    import spark.implicits._
    val df = Seq(("A-B-C")).toDF("u")
    val out = DiffSync.canonicalize(df, Map("u" -> "uniqueidentifier"))
    assert(out.head.getString(0) === "a-b-c")
  }

  test("A22: FK orphan detection via anti join") {
    import spark.implicits._
    val child = Seq((1, 10), (2, 99)).toDF("id", "fk")
    val parent = Seq(10, 20).toDF("pk")
    val orphans = Validation.fkOrphans(child, Seq("fk"), parent, Seq("pk"),
      broadcastParent = true).collect()
    assert(orphans.map(_.getInt(0)).toSeq === Seq(2))
  }

  test("A23: CHECK violations treat NULL predicate as pass") {
    import spark.implicits._
    val df = Seq(Some(5), Some(-1), None).toDF("v")
    val bad = Validation.checkViolations(df, col("v") >= 0)
    assert(bad.count() === 1)
  }

  test("PK duplicate and null-count validators") {
    import spark.implicits._
    val df = Seq((1, Some("a")), (1, None), (2, Some("c")))
      .toDF("id", "v")
    assert(Validation.pkDuplicates(df, Seq("id")).head.getLong(1) === 2)
    val nc = Validation.nullCounts(df, Seq("v")).head
    assert(nc.getLong(0) === 3 && nc.getLong(1) === 1)
  }
}
