package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import java.nio.file.{Files, Path}
import scala.sys.process._

/** The C16 postgresql-dialect apply path against REAL PostgreSQL 15.
  *
  * The container has PG but no PostgreSQL JDBC driver (zero egress, and
  * only Derby ships in /opt/spark/jars), so the JDBC TRANSPORT half of
  * [[DiffSync.applyToJdbc]] stays Derby-tested (JdbcIntegrationSpec —
  * generic dialect, batch→row degradation). What Derby can NOT test is
  * the postgresql dialect's actual statement text — `INSERT … ON
  * CONFLICT (pk) DO UPDATE SET c = EXCLUDED.c` — which until this spec
  * had never met a real PG parser/executor. Here the EXACT statements
  * `applyToJdbc` prepares ([[DiffSync.upsertSql]] verbatim, `?`
  * placeholders mapped to `$n` exactly as the PG JDBC driver does on
  * the wire) replay through psql PREPARE/EXECUTE against a throwaway
  * PG cluster, driving a seeded target to ZERO diffs vs the source,
  * and re-replaying proves the DO UPDATE arm is idempotent.
  *
  * Cluster boot mirrors PgReplaySpec (unix socket only, `nobody`
  * user, ON_ERROR_STOP=1); missing binaries → the suite CANCELS,
  * never false-passes.
  */
class PgUpsertSpec extends AnyFunSuite with SparkTestBase
    with BeforeAndAfterAll {

  private val port = 54399
  private var base: Path = _
  private var ready = false
  private var startupError = "not started"

  private def sh(cmd: String): (Int, String) = {
    val buf = new StringBuilder
    val logger = ProcessLogger(l => buf.append(l).append('\n'),
      l => buf.append(l).append('\n'))
    val code = Seq("bash", "-c", cmd).!(logger)
    (code, buf.toString)
  }

  private def asNobody(cmd: String): (Int, String) =
    sh(s"cd / && su nobody -s /bin/bash -c ${shellQuote(cmd)}")

  private def shellQuote(s: String): String =
    "'" + s.replace("'", "'\\''") + "'"

  private def psql(db: String, extra: String): (Int, String) =
    sh(s"psql -h $base -p $port -U graft -v ON_ERROR_STOP=1 $db $extra")

  private def psqlScript(db: String, script: String): (Int, String) = {
    val f = Files.createTempFile(base, "script", ".sql")
    Files.write(f, script.getBytes("UTF-8"))
    sh(s"chmod 644 $f")
    psql(db, s"-f $f")
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    val haveBins = sh("command -v initdb && command -v pg_ctl && " +
      "command -v psql && command -v su")._1 == 0
    if (!haveBins) { startupError = "PG binaries not installed"; return }
    base = Files.createTempDirectory("graft_pgupsert")
    sh(s"chmod 777 $base")
    val (initCode, initOut) = asNobody(
      s"initdb -D $base/data -A trust -U graft --no-sync")
    if (initCode != 0) { startupError = s"initdb failed:\n$initOut"; return }
    val (startCode, startOut) = asNobody(
      s"pg_ctl -D $base/data -l $base/server.log -w " +
        s"-o '-k $base -p $port -c listen_addresses= -F' start")
    if (startCode != 0) { startupError = s"pg_ctl failed:\n$startOut"; return }
    val (pingCode, pingOut) = psql("postgres", "-c 'SELECT 1'")
    if (pingCode != 0) { startupError = s"psql ping failed:\n$pingOut"; return }
    ready = true
  }

  override def afterAll(): Unit = {
    if (base != null) {
      asNobody(s"pg_ctl -D $base/data -m immediate stop")
      sh(s"rm -rf $base")
    }
    super.afterAll()
  }

  private def requireReady(): Unit =
    if (!ready) cancel(s"PostgreSQL unavailable: $startupError")

  /** `?` placeholders → `$1..$n` — the exact mapping the PG JDBC
    * driver performs on the wire, so the PREPAREd text is what the
    * server would see from applyToJdbc.
    */
  private def dollarize(sql: String): String = {
    var n = 0
    sql.foldLeft(new StringBuilder) { (sb, c) =>
      if (c == '?') { n += 1; sb.append("$" + n) } else sb.append(c)
    }.toString
  }

  private def lit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case other => other.toString
  }

  test("C16 postgresql dialect: ON CONFLICT upsert drives real PG to zero diffs") {
    requireReady()
    import spark.implicits._
    val pkCols = Seq("id")
    val valueCols = Seq("v", "name")
    // seed target: 2 stale (DO UPDATE arm), 3 identical, 4 doomed
    val (cCode, cOut) = psqlScript("postgres",
      """CREATE TABLE sync_t (
        |  id BIGINT PRIMARY KEY, v DOUBLE PRECISION, name TEXT);
        |INSERT INTO sync_t VALUES
        |  (2, 99.0, 'stale'), (3, 3.5, 'three'), (4, 4.0, 'gone');
        |""".stripMargin)
    assert(cCode === 0, cOut)
    val src = Seq((1L, 1.5, "one"), (2L, 2.5, "two"), (3L, 3.5, "three"))
      .toDF("id", "v", "name")
    val tgt = Seq((2L, 99.0, "stale"), (3L, 3.5, "three"), (4L, 4.0, "gone"))
      .toDF("id", "v", "name")
    val diffed = DiffSync.diff(src, tgt, pkCols).collect()
    // the statement text applyToJdbc prepares, verbatim
    val ups = dollarize(DiffSync.upsertSql("sync_t", pkCols, valueCols))
    val del = dollarize("DELETE FROM sync_t WHERE " +
      pkCols.map(c => s"$c = ?").mkString(" AND "))
    val stmts = new StringBuilder
    stmts.append(s"PREPARE ups AS $ups;\n")
    stmts.append(s"PREPARE del AS $del;\n")
    diffed.foreach { row =>
      row.getAs[String](DiffSync.FlagCol) match {
        case "new" | "changed" =>
          val args = (pkCols ++ valueCols)
            .map(c => lit(row.getAs[Any](c))).mkString(", ")
          stmts.append(s"EXECUTE ups($args);\n")
        case "deleted" =>
          val args = pkCols.map(c => lit(row.getAs[Any](c))).mkString(", ")
          stmts.append(s"EXECUTE del($args);\n")
        case _ => // identical: no statement — same as the writer
      }
    }
    val (aCode, aOut) = psqlScript("postgres", stmts.toString)
    assert(aCode === 0, s"apply script failed:\n$aOut\n${stmts}")
    // read back through COPY CSV and diff against the source: ZERO
    def readBack(): Seq[(Long, Double, String)] = {
      val (rc, out) = psql("postgres",
        "-c \"COPY (SELECT id, v, name FROM sync_t ORDER BY id) " +
          "TO STDOUT WITH CSV\"")
      assert(rc === 0, out)
      out.linesIterator.filter(_.nonEmpty).map { l =>
        val Array(i, v, n) = l.split(",", 3)
        (i.toLong, v.toDouble, n)
      }.toSeq
    }
    val after = readBack()
    assert(after === Seq((1L, 1.5, "one"), (2L, 2.5, "two"),
      (3L, 3.5, "three")))
    val zero = DiffSync.diff(src, after.toDF("id", "v", "name"), pkCols)
      .filter(col(DiffSync.FlagCol) =!= "identical").count()
    assert(zero === 0L)
    // idempotency: re-running the same upserts must change nothing
    // (every insert now takes the DO UPDATE arm with equal values)
    val (rCode, rOut) = psqlScript("postgres", stmts.toString)
    assert(rCode === 0, rOut)
    assert(readBack() === after)
  }

  test("C16 postgresql dialect: pk-only table takes the DO NOTHING arm") {
    requireReady()
    val (cCode, cOut) = psqlScript("postgres",
      "CREATE TABLE keys_t (id BIGINT PRIMARY KEY);" +
        "INSERT INTO keys_t VALUES (1), (2);")
    assert(cCode === 0, cOut)
    val ups = dollarize(DiffSync.upsertSql("keys_t", Seq("id"), Seq.empty))
    assert(ups.contains("DO NOTHING"))
    val (aCode, aOut) = psqlScript("postgres",
      s"PREPARE kup AS $ups;\n" +
        "EXECUTE kup(2);\nEXECUTE kup(3);\n")
    assert(aCode === 0, aOut)
    val (rc, out) = psql("postgres",
      "-c \"COPY (SELECT id FROM keys_t ORDER BY id) TO STDOUT WITH CSV\"")
    assert(rc === 0, out)
    assert(out.linesIterator.filter(_.nonEmpty).map(_.toLong).toSeq ===
      Seq(1L, 2L, 3L))
  }
}
