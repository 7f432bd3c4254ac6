package graft.emit

import org.scalatest.funsuite.AnyFunSuite
import graft.parser.TsqlParser
import graft.convert._
import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import javax.xml.parsers.DocumentBuilderFactory

/** Kettle artifact emission — parity with the reference's
  * t/test_convert.t kettle runs (every regression dump × option combo
  * with `-k`, dummy connection params) plus structural checks on the
  * generated step graphs (sqlserver2pgsql.pl:923–1352).
  */
class KettleEmitterSpec extends AnyFunSuite {

  private val corpus = Seq("reg_tests.sql", "issue_59.sql", "issues.sql",
    "issue_112.sql", "basic_test/views.sql")

  private val sqlServerParams = Map("sd" -> "1", "sh" -> "1", "sp" -> "1",
    "su" -> "1", "sw" -> "1")
  private val pgParams = Map("pd" -> "1", "ph" -> "1", "pp" -> "1",
    "pu" -> "1", "pw" -> "2")

  private val configs: Seq[(String, Config)] = Seq(
    "default" -> Config(),
    "-keep_identifier_case" -> Config(identifierCase = IdentifierCase.Keep),
    "-camel_to_snake" -> Config(identifierCase = IdentifierCase.CamelToSnake),
    "-ignore_errors" -> Config(ignoreErrors = true),
    "-use_pk_if_possible=*" -> Config(usePkIfPossible = "*"),
    "-pi 4 -po 2" -> Config(parallelismIn = 4, parallelismOut = 2)
  )

  private def parseXml(name: String, xml: String): org.w3c.dom.Document = {
    val dbf = DocumentBuilderFactory.newInstance()
    try dbf.newDocumentBuilder().parse(
      new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
    catch {
      case e: org.xml.sax.SAXParseException =>
        fail(s"$name is not well-formed XML at line ${e.getLineNumber}: " +
          e.getMessage)
    }
  }

  private def emitAll(file: String, conf: Config): Map[String, String] = {
    val p = Paths.get("/root/reference/regression").resolve(file)
    assume(Files.exists(p))
    val cat = new TsqlParser(conf).parseFile(p)
    new KettleEmitter(conf, sqlServerParams, pgParams).emit(cat, "/tmp/kettle")
  }

  for ((optName, conf) <- configs; file <- corpus) {
    test(s"kettle artifacts for $file with $optName are well-formed XML") {
      val files = emitAll(file, conf)
      assert(files.contains("migration.kjb"))
      assert(files.contains("incremental.kjb"))
      files.foreach { case (name, xml) => parseXml(name, xml) }
    }
  }

  test("one .ktr per table, incremental only for PK tables, job wiring") {
    val conf = Config()
    val p = Paths.get("/root/reference/regression/reg_tests.sql")
    assume(Files.exists(p))
    val cat = new TsqlParser(conf).parseFile(p)
    val files = new KettleEmitter(conf, sqlServerParams, pgParams)
      .emit(cat, "/tmp/kettle")
    val tables = cat.allTables
    assert(tables.nonEmpty)
    tables.foreach { case (sn, t) =>
      assert(files.contains(s"$sn-${t.name}.ktr"), s"missing ktr for ${t.name}")
      val hasPk = t.pk.exists(_.cols.nonEmpty)
      assert(files.contains(s"incremental-$sn-${t.name}.ktr") == hasPk,
        s"incremental presence wrong for ${t.name} (pk=$hasPk)")
    }
    // migration job: one TRANS entry per table + START + 2 SQL scripts,
    // hops chain them sequentially between the scripts
    val kjb = files("migration.kjb")
    val doc = parseXml("migration.kjb", kjb)
    val entries = doc.getElementsByTagName("entry")
    assert(entries.getLength == tables.size + 3)
    val hops = doc.getElementsByTagName("hop")
    assert(hops.getLength == tables.size + 2)
    assert(kjb.contains("DISABLE TRIGGER ALL;"))
    assert(kjb.contains("ENABLE TRIGGER ALL;"))
    // incremental job points at incremental-*.ktr exactly for PK tables
    val inc = files("incremental.kjb")
    tables.foreach { case (sn, t) =>
      val expectIncremental = t.pk.exists(_.cols.nonEmpty)
      val ref = s"incremental-$sn-${t.name}.ktr"
      assert(inc.contains(ref) == expectIncremental,
        s"incremental.kjb reference wrong for ${t.name}")
    }
  }

  test("full-copy ktr: truncate -> blocked NOLOCK input -> scrub -> output") {
    val conf = Config(parallelismOut = 3)
    val files = emitAll("reg_tests.sql", conf)
    val ktr = files.collectFirst {
      case (n, x) if n.endsWith(".ktr") && !n.startsWith("incremental-") => x
    }.get
    assert(ktr.contains("truncate table "))
    assert(ktr.contains("WITH(NOLOCK)"))
    assert(ktr.contains("<type>BlockUntilStepsFinish</type>"))
    assert(ktr.contains("<type>UserDefinedJavaClass</type>"))
    // NUL scrub survives in the embedded transform source
    assert(ktr.contains("""replace("\0", "")"""))
    assert(ktr.contains("<use_batch>Y</use_batch>"))
    assert(ktr.contains("<copies>3</copies>"))
  }

  test("-ignore_errors flips output to ignore + non-batch (pl:1034-1037)") {
    val files = emitAll("reg_tests.sql", Config(ignoreErrors = true))
    val ktr = files.collectFirst {
      case (n, x) if n.endsWith(".ktr") && !n.startsWith("incremental-") => x
    }.get
    assert(ktr.contains("<ignore_errors>Y</ignore_errors>"))
    assert(ktr.contains("<use_batch>N</use_batch>"))
  }

  test("LOB + single int PK table slices input on the PK modulo") {
    val conf = Config(parallelismIn = 4)
    val p = Paths.get("/root/reference/regression/reg_tests.sql")
    assume(Files.exists(p))
    val cat = new TsqlParser(conf).parseFile(p)
    val lobTables = cat.allTables.filter { case (_, t) =>
      t.hasLobs && t.pk.exists(pk => pk.cols.size == 1 &&
        t.colByName(pk.cols.head).exists(
          _.sqlType.name.toLowerCase.endsWith("int")))
    }
    assume(lobTables.nonEmpty, "corpus has no LOB+int-PK table")
    val files = new KettleEmitter(conf, sqlServerParams, pgParams)
      .emit(cat, "/tmp/kettle")
    lobTables.foreach { case (sn, t) =>
      val ktr = files(s"$sn-${t.name}.ktr")
      assert(ktr.contains(
        "% ${Internal.Step.Unique.Count} = ${Internal.Step.Unique.Number}"),
        s"${t.name}: no modulo slice")
      assert(ktr.contains("<copies>4</copies>"), s"${t.name}: input copies")
    }
    // and non-LOB tables must NOT slice
    cat.allTables.find { case (_, t) => !t.hasLobs }.foreach { case (sn, t) =>
      assert(!files(s"$sn-${t.name}.ktr").contains("Internal.Step.Unique"))
    }
  }

  test("incremental ktr: sortable PK pushes ORDER BY, otherwise SortRows") {
    val p = Paths.get("/root/reference/regression/reg_tests.sql")
    assume(Files.exists(p))
    // without -use_pk_if_possible nothing may push the sort down
    val confNo = Config()
    val catNo = new TsqlParser(confNo).parseFile(p)
    val filesNo = new KettleEmitter(confNo, sqlServerParams, pgParams)
      .emit(catNo, "/tmp/kettle")
    filesNo.collect { case (n, x) if n.startsWith("incremental-") => (n, x) }
      .foreach { case (n, x) =>
        assert(x.contains("<type>SortRows</type>"), s"$n: expected SortRows")
        assert(!x.contains("ORDER BY"), s"$n: unexpected pushed sort")
      }
    // with -use_pk_if_possible=* the sort-safe PK tables push ORDER BY
    val confYes = Config(usePkIfPossible = "*")
    val catYes = new TsqlParser(confYes).parseFile(p)
    val filesYes = new KettleEmitter(confYes, sqlServerParams, pgParams)
      .emit(catYes, "/tmp/kettle")
    val sortSafe = catYes.allTables.filter { case (_, t) =>
      t.pk.exists(_.cols.nonEmpty) && Identifiers.isPkSortOrderSafe(t)
    }
    assume(sortSafe.nonEmpty, "corpus has no sort-safe PK table")
    sortSafe.foreach { case (sn, t) =>
      val x = filesYes(s"incremental-$sn-${t.name}.ktr")
      assert(x.contains("ORDER BY"), s"${t.name}: sort not pushed")
      assert(!x.contains("<type>SortRows</type>"),
        s"${t.name}: SortRows despite pushed sort")
      assert(x.contains("<type>MergeRows</type>"))
      assert(x.contains("<type>SynchronizeAfterMerge</type>"))
    }
  }

  test("incremental sortable-PK decision: golden structural diff " +
      "(int PK → DB-side ORDER BY, text PK → SortRows; pl:968–981)") {
    // a collation-safe single-int-PK table must select the DB-side
    // ORDER BY template (no SortRows/SortedMerge steps at all); a
    // text-PK table must sort engine-side — the golden fixtures pin
    // the full step graph of both variants, diffed structurally
    // (step name/type/SQL + hop edges), not textually
    val dump = Files.createTempFile("graft_kgold", ".sql")
    Files.writeString(dump,
      """CREATE TABLE [dbo].[tint](
        |	[id] [int] NOT NULL,
        |	[val] [varchar](50) NULL,
        | CONSTRAINT [PK_tint] PRIMARY KEY CLUSTERED
        |(
        |	[id] ASC
        |)
        |)
        |GO
        |CREATE TABLE [dbo].[ttext](
        |	[code] [varchar](20) NOT NULL,
        |	[val] [int] NULL,
        | CONSTRAINT [PK_ttext] PRIMARY KEY CLUSTERED
        |(
        |	[code] ASC
        |)
        |)
        |GO
        |""".stripMargin)
    try {
      val conf = Config(usePkIfPossible = "*")
      val cat = new TsqlParser(conf).parseFile(dump)
      val files = new KettleEmitter(conf, sqlServerParams, pgParams)
        .emit(cat, "/tmp/kettle")

      def structure(x: String): (Seq[(String, String, String)],
          Seq[(String, String)]) = {
        val root = scala.xml.XML.loadString(x)
        val steps = (root \\ "step").map { s =>
          ((s \ "name").text, (s \ "type").text,
            (s \ "sql").text.split("\\s+").mkString(" ").trim)
        }
        val hops = (root \\ "hop").map { h =>
          ((h \ "from").text, (h \ "to").text)
        }
        (steps, hops)
      }
      for (name <- Seq("incremental-public-tint.ktr",
          "incremental-public-ttext.ktr")) {
        val goldenPath = Paths.get("src/test/resources/golden").resolve(name)
        val (gSteps, gHops) = structure(Files.readString(goldenPath))
        val (eSteps, eHops) = structure(files(name))
        assert(eSteps === gSteps, s"$name: step graph drifted from golden")
        assert(eHops === gHops, s"$name: hop graph drifted from golden")
      }
      // and the behavioral core, independent of the fixture bytes:
      val tint = files("incremental-public-tint.ktr")
      assert(tint.contains("ORDER BY id") &&
        !tint.contains("<type>SortRows</type>") &&
        !tint.contains("<type>SortedMerge</type>"))
      val ttext = files("incremental-public-ttext.ktr")
      assert(!ttext.contains("ORDER BY") &&
        ttext.contains("<type>SortRows</type>") &&
        ttext.contains("<type>SortedMerge</type>"))
    } finally Files.delete(dump)
  }

  test("connection options: ssl + stringtype attributes appear when set") {
    val conf = Config(stringtypeUnspecified = true)
    val p = Paths.get("/root/reference/regression/issue_59.sql")
    assume(Files.exists(p))
    val cat = new TsqlParser(conf).parseFile(p)
    val files = new KettleEmitter(conf,
      sqlServerParams + ("sforce_ssl" -> "1"),
      pgParams + ("pforce_ssl" -> "1")).emit(cat, "/tmp/kettle")
    val ktr = files.values.head
    assert(ktr.contains("EXTRA_OPTION_POSTGRESQL.ssl"))
    assert(ktr.contains("EXTRA_OPTION_MSSQL.ssl"))
    assert(ktr.contains("EXTRA_OPTION_POSTGRESQL.stringtype"))
    val plain = new KettleEmitter(Config(), sqlServerParams, pgParams)
      .emit(cat, "/tmp/kettle").values.head
    assert(!plain.contains("EXTRA_OPTION_POSTGRESQL.ssl"))
    assert(!plain.contains("stringtype"))
  }

  test("uuid/date/tstz columns get conversion wrappers in both SELECTs") {
    val conf = Config()
    val ddl =
      """CREATE TABLE [dbo].[conv_probe](
        |	[id] [int] NOT NULL,
        |	[guid] [uniqueidentifier] NULL,
        |	[d] [date] NULL,
        | CONSTRAINT [pk_conv] PRIMARY KEY NONCLUSTERED
        |(
        |	[id] ASC
        |) ON [PRIMARY]
        |) ON [PRIMARY]
        |GO
        |""".stripMargin
    val tmp = Files.createTempFile("kettle_conv", ".sql")
    try {
      Files.writeString(tmp, ddl)
      val cat = new TsqlParser(conf).parseFile(tmp)
      val files = new KettleEmitter(conf, sqlServerParams, pgParams)
        .emit(cat, "/tmp/kettle")
      val ktr = files("public-conv_probe.ktr")
      assert(ktr.contains("lower([guid]) AS guid"))
      assert(ktr.contains("convert(varchar(50), [d], 120) AS d"))
      val inc = files("incremental-public-conv_probe.ktr")
      assert(inc.contains("lower(cast(guid as varchar)) AS guid"))
      assert(inc.contains("to_char(d, 'YYYY-MM-DD') AS d"))
    } finally Files.deleteIfExists(tmp)
  }
}
