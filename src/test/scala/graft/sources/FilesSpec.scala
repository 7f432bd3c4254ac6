package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase
import java.nio.file.{Files => JFiles}

class FilesSpec extends AnyFunSuite with SparkTestBase {

  private def tmpDir(prefix: String) =
    JFiles.createTempDirectory(prefix).toFile

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
  }

  test("csv read quarantines malformed rows instead of dropping or dying") {
    val dir = tmpDir("graft_csv")
    try {
      val p = new java.io.File(dir, "in.csv")
      JFiles.writeString(p.toPath,
        "id,qty\n1,10\nnot-a-long,20\n3,30\n")
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("qty", LongType)))
      val (clean, bad) = Files.quarantine(
        Files.csv(spark, p.getAbsolutePath, schema))
      val cleanRows = clean.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(cleanRows.toSet === Set((1L, 10L), (3L, 30L)))
      // reference a data column alongside the corrupt one — a
      // corrupt-only projection is rejected on raw file scans
      val badRows = bad.select(col("id"), col(Files.CorruptCol)).collect()
        .map(_.getString(1))
      assert(badRows.length === 1 && badRows.head.startsWith("not-a-long"))
    } finally rm(dir)
  }

  test("jsonl read captures unparseable lines whole") {
    val dir = tmpDir("graft_jsonl")
    try {
      val p = new java.io.File(dir, "in.jsonl")
      JFiles.writeString(p.toPath,
        """{"id":1,"name":"a"}
          |this is not json
          |{"id":2,"name":"b"}
          |""".stripMargin)
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))
      val (clean, bad) = Files.quarantine(
        Files.jsonl(spark, p.getAbsolutePath, schema))
      assert(clean.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
      assert(bad.select(col("id"), col(Files.CorruptCol)).collect()
        .length === 1)
    } finally rm(dir)
  }

  test("partitioned write prunes directories on a filtered scan") {
    import spark.implicits._
    val dir = tmpDir("graft_part")
    try {
      val df = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0),
        (3L, "2024-01-02", 3.0)).toDF("id", "dt", "v")
      Writers.writePartitioned(df, dir.getAbsolutePath, Seq("dt"))
      val scan = spark.read.parquet(dir.getAbsolutePath)
        .filter(col("dt") === "2024-01-02")
      assert(scan.count() === 2)
      val formatted = scan.queryExecution.executedPlan.toString
      // the partition predicate must reach the scan as a partition
      // filter (directory pruning), not a post-scan row filter
      assert(formatted.contains("PartitionFilters: [isnotnull(dt"),
        s"no partition pruning in:\n$formatted")
    } finally rm(dir)
  }

  test("z-ordered write round-trips and produces the requested file count") {
    import spark.implicits._
    val dir = tmpDir("graft_zw")
    try {
      val grid = spark.range(256).select(
        (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
      Writers.writeZOrdered(grid, dir.getAbsolutePath,
        Seq(col("x"), col("y")), bits = 4, numFiles = 4)
      val back = spark.read.parquet(dir.getAbsolutePath)
      assert(back.count() === 256)
      val files = Option(dir.listFiles).get
        .count(f => f.getName.endsWith(".parquet"))
      assert(files === 4)
    } finally rm(dir)
  }
}
