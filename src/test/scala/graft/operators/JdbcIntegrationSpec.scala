package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Tables
import java.sql.DriverManager

/** End-to-end JDBC integration against embedded Derby (ships with
  * Spark): real INSERT/UPDATE/DELETE round-trips for the copy sink and
  * the diff/sync apply writer — the paths a parquet-only test can't
  * exercise.
  */
class JdbcIntegrationSpec extends AnyFunSuite with SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  test("JdbcSink.write appends batched rows into a real JDBC table") {
    withConn(_.createStatement().executeUpdate(
      "CREATE TABLE copy_t (id BIGINT NOT NULL PRIMARY KEY, v DOUBLE)"))
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i * 1.5)).toDF("id", "v")
    JdbcSink.write(df, JdbcSink.Spec(url, "copy_t", "", "",
      numPartitions = 2, truncate = false, relaxDurability = false,
      rewriteBatchedInserts = false))
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "copy_t").load()
    assert(back.count() === 100)
    assert(back.agg(sum("v")).head.getDouble(0) === (1 to 100).map(_ * 1.5).sum)
  }

  test("C16: applyToJdbc syncs a real target to the source state") {
    withConn { c =>
      c.createStatement().executeUpdate(
        "CREATE TABLE sync_t (id BIGINT NOT NULL PRIMARY KEY, v DOUBLE)")
      val ps = c.prepareStatement("INSERT INTO sync_t VALUES (?, ?)")
      // target starts with: 2 (stale value), 3 (identical), 4 (to delete)
      Seq((2L, 99.0), (3L, 3.0), (4L, 4.0)).foreach { case (id, v) =>
        ps.setLong(1, id); ps.setDouble(2, v); ps.executeUpdate()
      }
      ps.close()
    }
    import spark.implicits._
    // source state: 1 (new), 2 (changed), 3 (identical)
    val src = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v")
    val tgt = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "sync_t").load()
      .select(col("ID").as("id"), col("V").as("v"))
    val diffed = DiffSync.diff(src, tgt, Seq("id"))
    DiffSync.applyToJdbc(diffed, Seq("id"),
      DiffSync.SyncTarget(url, "sync_t", "", "", dialect = "generic"))
    val after = withConn { c =>
      val rs = c.createStatement()
        .executeQuery("SELECT id, v FROM sync_t ORDER BY id")
      val buf = scala.collection.mutable.Buffer[(Long, Double)]()
      while (rs.next()) buf += ((rs.getLong(1), rs.getDouble(2)))
      buf.toSeq
    }
    assert(after === Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("plannedRead: LOB+int-PK table reads range-partitioned with -pi slices") {
    withConn { c =>
      c.createStatement().executeUpdate(
        "CREATE TABLE lob_t (id BIGINT NOT NULL PRIMARY KEY, payload VARCHAR(100))")
      val ps = c.prepareStatement("INSERT INTO lob_t VALUES (?, ?)")
      (1L to 200L).foreach { i =>
        ps.setLong(1, i); ps.setString(2, s"blob$i"); ps.executeUpdate()
      }
      ps.close()
    }
    import graft.catalog._
    import org.apache.spark.sql.types._
    val lobTable = TableDef("lob_t", "app",
      cols = Vector(
        ColumnDef("id", 1, SqlType("bigint"), "bigint", LongType, notNull = true),
        ColumnDef("payload", 2, SqlType("varbinary", isMax = true), "bytea",
          BinaryType)),
      constraints = Vector(PrimaryKey(Some("pk_lob"), Seq("id"))),
      hasLobs = true)
    val job = graft.convert.ConfFile.toJob(Map("pi" -> "4", "sd" -> "x"))
    val boundsOf = (_: TableDef, pk: String) => withConn { c =>
      val rs = c.createStatement()
        .executeQuery(s"SELECT MIN($pk), MAX($pk) FROM lob_t")
      rs.next(); Some((rs.getLong(1), rs.getLong(2)))
    }
    val spec = Tables.JdbcSpec(url, "lob_t", "", "")
    val df = MigrationRunner.plannedRead(spark, job, lobTable, boundsOf,
      specOverride = Some(spec))
    assert(df.rdd.getNumPartitions === 4, "expected -pi range partitions")
    assert(df.count() === 200L)
    // a PK-less table reads as one stream regardless of -pi
    val noPk = lobTable.copy(constraints = Vector.empty)
    val one = MigrationRunner.plannedRead(spark, job, noPk, boundsOf,
      specOverride = Some(spec))
    assert(one.rdd.getNumPartitions === 1)
  }

  test("P12: writeJdbcIgnoringErrors survives constraint-violating rows") {
    withConn(_.createStatement().executeUpdate(
      "CREATE TABLE err_t (id BIGINT NOT NULL PRIMARY KEY, v DOUBLE)"))
    withConn { c =>
      c.createStatement().executeUpdate(
        "INSERT INTO err_t VALUES (5, 5.0)") // pre-existing → dup key later
    }
    import spark.implicits._
    val df = Seq((1L, 1.0), (5L, 99.0), (6L, 6.0)).toDF("id", "v")
      .coalesce(1)
    val rejected = JdbcSink.writeJdbcIgnoringErrors(df,
      JdbcSink.Spec(url, "err_t", "", "", relaxDurability = false,
        rewriteBatchedInserts = false, batchSize = 10),
      "INSERT INTO err_t (id, v) VALUES (?, ?)")
    assert(rejected === 1L) // only the duplicate key row
    val n = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM err_t")
      rs.next(); rs.getLong(1)
    }
    assert(n === 3L) // 1, 5(original), 6
  }
}
