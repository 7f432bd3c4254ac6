package graft.emit

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.parser.TsqlParser
import graft.convert._
import java.nio.file.{Files, Path, Paths}
import scala.sys.process._

/** The reference's strongest oracle, replayed for REAL: PostgreSQL
  * must accept every emitted before/after/unsure script for the full
  * regression corpus under the option matrix
  * (t/test_db_creation.t:1–16, regression/reg.pl:10–53). A throwaway
  * PG cluster runs for the duration of the suite — initdb + unix
  * socket only (no TCP), server running as `nobody` because PG
  * refuses to run as root.
  *
  * STRICTER than the reference harness: psql runs with
  * ON_ERROR_STOP=1, so any SQL-level error fails the gate — the
  * reference's reg.pl only caught connection-level psql failures
  * (psql exits 0 on SQL errors without ON_ERROR_STOP).
  *
  * If the PG binaries are absent (or the cluster cannot start in this
  * environment), every test here CANCELS rather than passes — the
  * golden-file specs in PgDdlEmitterSpec remain the fallback check.
  */
class PgReplaySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val regDir = Paths.get("/root/reference/regression")
  private val port = 54398

  private var base: Path = _
  private var ready = false
  private var startupError = "not started"

  private def sh(cmd: String): (Int, String) = {
    val buf = new StringBuilder
    val logger = ProcessLogger(l => buf.append(l).append('\n'),
      l => buf.append(l).append('\n'))
    // stdin from /dev/null: none of these commands read it, and an
    // inherited sbt stdin pipe under concurrent load was one SIGPIPE
    // suspect (the exit-141 flake this suite used to show)
    val code = Seq("bash", "-c", s"exec </dev/null; $cmd").!(logger)
    (code, buf.toString)
  }

  /** Run a command as the unprivileged `nobody` user (PG refuses
    * root); cd to / first so su doesn't warn about an unreadable cwd.
    */
  private def asNobody(cmd: String): (Int, String) =
    sh(s"cd / && su nobody -s /bin/bash -c ${shellQuote(cmd)}")

  private def shellQuote(s: String): String =
    "'" + s.replace("'", "'\\''") + "'"

  private def psql(db: String, extra: String): (Int, String) =
    sh(s"psql -h $base -p $port -U graft -v ON_ERROR_STOP=1 $db $extra")

  override def beforeAll(): Unit = {
    val haveBins = sh("command -v initdb && command -v pg_ctl && " +
      "command -v psql && command -v su")._1 == 0
    if (!haveBins) { startupError = "PG binaries not installed"; return }
    base = Files.createTempDirectory("graft_pgreplay")
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
  }

  // same corpus × option matrix as OptionMatrixSpec (the reference's
  // reg.pl option set); every combination must produce scripts a real
  // PostgreSQL accepts in before → after → unsure order on a fresh DB
  private val corpus = Seq("reg_tests.sql", "issue_59.sql", "issues.sql",
    "issue_112.sql", "basic_test/views.sql")

  private val configs: Seq[(String, Config)] = Seq(
    "default" -> Config(),
    "-i" -> Config(caseInsensitive = true),
    "-num" -> Config(convertNumericToInt = true),
    "-keep_identifier_case" -> Config(identifierCase = IdentifierCase.Keep),
    "-camel_to_snake" -> Config(identifierCase = IdentifierCase.CamelToSnake),
    "-validate_constraints=after" -> Config(validateConstraints = "after"),
    "-drop_rowversion" -> Config(dropRowversion = true),
    "-use_identity_column=0" -> Config(useIdentityColumn = false),
    "-i -num -camel_to_snake" -> Config(caseInsensitive = true,
      convertNumericToInt = true,
      identifierCase = IdentifierCase.CamelToSnake),
    "-nr" -> Config(relabelDbo = false)
  )

  private var dbCounter = 0

  for ((optName, conf) <- configs; file <- corpus) {
    test(s"PostgreSQL replays $file with $optName") {
      assume(Files.exists(regDir.resolve(file)), s"no reference corpus")
      assume(ready, s"PG cluster unavailable: $startupError")
      val cat = new TsqlParser(conf).parseFile(regDir.resolve(file))
      val out = new PgDdlEmitter(conf).emit(cat)
      val dir = Files.createTempDirectory("graft_pgr_it")
      try {
        Files.writeString(dir.resolve("before.sql"), out.before)
        Files.writeString(dir.resolve("after.sql"), out.after)
        Files.writeString(dir.resolve("unsure.sql"), out.unsure)
        // Exit 141 = SIGPIPE: a signal-level flake of the psql pipe
        // under concurrent sbt load, never a SQL verdict — retry the
        // WHOLE replay on a fresh database (a killed psql may have
        // half-applied its script, so retrying the script alone would
        // false-fail on duplicate objects). Any other non-zero exit is
        // the oracle speaking and asserts immediately.
        var attempt = 0
        var flaked = true
        while (flaked) {
          flaked = false
          attempt += 1
          dbCounter += 1
          val db = s"reg_$dbCounter"
          val (cCode, cOut) = psql("postgres", s"-c 'CREATE DATABASE $db'")
          if (cCode == 141 && attempt <= 3) flaked = true
          else assert(cCode == 0, s"createdb failed:\n$cOut")
          if (!flaked) try {
            val it = Seq("before.sql", "after.sql", "unsure.sql").iterator
            while (!flaked && it.hasNext) {
              val script = it.next()
              val (code, o) = psql(db, s"-f ${dir.resolve(script)}")
              if (code == 141 && attempt <= 3) flaked = true
              else assert(code == 0,
                s"$script rejected by PostgreSQL ($file / $optName):\n" +
                  o.linesIterator.filter(l =>
                    l.contains("ERROR") || l.contains("STATEMENT") ||
                      l.contains("psql:")).mkString("\n"))
            }
          } finally psql("postgres", s"-c 'DROP DATABASE $db'")
        }
      } finally sh(s"rm -rf $dir")
    }
  }
}
