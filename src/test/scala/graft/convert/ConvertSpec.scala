package graft.convert

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.types._
import graft.catalog._

class ConvertSpec extends AnyFunSuite {

  /** Minimal property runner (scalatestplus bridge is not on the
    * offline classpath): sample the generator deterministically.
    */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (1 to 100).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("B1: static type map highlights") {
    def pg(t: SqlType, c: Config = Config()) = TypeMapper.convert(t, c).pgType
    assert(pg(SqlType("tinyint")) === "smallint")
    assert(pg(SqlType("nvarchar", arg1 = Some(255))) === "varchar(255)")
    assert(pg(SqlType("nvarchar", isMax = true)) === "varchar")
    assert(pg(SqlType("bit")) === "boolean")
    assert(pg(SqlType("timestamp")) === "bytea") // rowversion, not a time!
    assert(pg(SqlType("datetimeoffset")) === "timestamp with time zone")
    assert(pg(SqlType("uniqueidentifier")) === "uuid")
    assert(pg(SqlType("sysname")) === "varchar(128)")
    assert(pg(SqlType("money")) === "numeric")
    assert(pg(SqlType("sql_variant")) === "text")
  }

  test("B1: spark type mapping") {
    def sp(t: SqlType) = TypeMapper.convert(t).sparkType
    assert(sp(SqlType("int")) === IntegerType)
    assert(sp(SqlType("bigint")) === LongType)
    assert(sp(SqlType("datetime")) === TimestampNTZType)
    assert(sp(SqlType("datetimeoffset")) === TimestampType)
    assert(sp(SqlType("varbinary", isMax = true)) === BinaryType)
    assert(sp(SqlType("numeric", arg1 = Some(21), arg2 = Some(7))) ===
      DecimalType(21, 7))
  }

  test("B2: numeric(p,0) narrowing under -num") {
    val c = Config(convertNumericToInt = true)
    def pg(p: Int, s: Int) =
      TypeMapper.convert(SqlType("numeric", arg1 = Some(p), arg2 = Some(s)), c).pgType
    assert(pg(4, 0) === "smallint")
    assert(pg(9, 0) === "integer")
    assert(pg(18, 0) === "bigint")
    assert(pg(19, 0) === "numeric(19,0)") // too wide to narrow
    assert(pg(10, 2) === "numeric(10,2)") // nonzero scale never narrows
    // without -num nothing narrows
    assert(TypeMapper.convert(
      SqlType("numeric", arg1 = Some(4), arg2 = Some(0))).pgType === "numeric(4,0)")
  }

  test("B1: citext mode generates length CHECKs") {
    val c = Config(caseInsensitive = true)
    val conv = TypeMapper.convert(SqlType("varchar", arg1 = Some(50)), c)
    assert(conv.pgType === "citext")
    assert(conv.requiresCitext)
    assert(conv.generatedCheck === Some("char_length(%s) <= 50"))
  }

  test("B1: varbinary(n) generates octet_length CHECK") {
    val conv = TypeMapper.convert(SqlType("varbinary", arg1 = Some(64)))
    assert(conv.pgType === "bytea")
    assert(conv.generatedCheck === Some("octet_length(%s) <= 64"))
  }

  test("B8: default normalization") {
    assert(TypeMapper.normalizeDefault("((0))", isBit = true) === ("false", false))
    assert(TypeMapper.normalizeDefault("((1))", isBit = true) === ("true", false))
    assert(TypeMapper.normalizeDefault("((42))", isBit = false) === ("42", false))
    assert(TypeMapper.normalizeDefault("(N'hello')", isBit = false) === ("'hello'", false))
    assert(TypeMapper.normalizeDefault("(NULL)", isBit = false) === ("NULL", false))
    val (v, unsure) = TypeMapper.normalizeDefault("(getdate())", isBit = false)
    assert(unsure && v === "CURRENT_TIMESTAMP")
  }

  test("B6: scalar function rewrites") {
    def rw(s: String) = ExprRewriter.rewrite(s)
    assert(rw("ISNULL(a, 0)") === "COALESCE(a, 0)")
    assert(rw("getdate()") === "CURRENT_TIMESTAMP")
    assert(rw("user_name()") === "CURRENT_USER")
    assert(rw("SPACE(5)") === "REPEAT(' ',5)")
    assert(rw("charindex('x', col)") === "POSITION('x' IN col)")
    assert(rw("datepart(year, d)") === "date_part('year', d)")
    assert(rw("DATEADD(day, 2, d)") === "(d + (2) * INTERVAL '1 day')")
    assert(rw("CONVERT(INT, x)") === "CAST(x AS INT)")
    // the cast TARGET type maps through B1 — PostgreSQL has no
    // nvarchar; real-PG replay rejected the untranslated form
    assert(rw("CONVERT(NVARCHAR(15), x)") === "CAST(x AS varchar(15))")
    assert(rw("CONVERT(varchar(50), x, 120)") === "CAST(x AS varchar(50))")
    assert(rw("CAST(x AS NVARCHAR(15))") === "CAST(x AS varchar(15))")
    assert(rw("CAST(x AS datetime)") === "CAST(x AS timestamp)")
    assert(ExprRewriter.rewrite("CAST(x AS ntext)", ExprRewriter.Sparksql)
      === "CAST(x AS string)")
    // literals are masked: function rewrites cannot corrupt them, and
    // the T-SQL N'…' prefix drops
    assert(rw("a + 'isnull(' + N'x'") === "a + 'isnull(' + 'x'")
  }

  test("B6: nested calls rewrite inside-out") {
    assert(ExprRewriter.rewrite("ISNULL(CONVERT(INT, x), DATEADD(dd, 1, d))")
      === "COALESCE(CAST(x AS INT), (d + (1) * INTERVAL '1 day'))")
  }

  test("B6: unsupported arities terminate (no infinite re-match)") {
    // 3-arg CHARINDEX is legal T-SQL; the fallback re-emits the name,
    // which must not re-match forever.
    assert(ExprRewriter.rewrite("CHARINDEX('a', col, 2) > 0")
      === "CHARINDEX('a', col, 2) > 0")
    assert(ExprRewriter.rewrite("DATEPART(year)") === "DATEPART(year)")
    assert(ExprRewriter.rewrite("DATEADD(day, 1)") === "DATEADD(day, 1)")
    // and a later rewritable call after an unsupported one still fires
    assert(ExprRewriter.rewrite("CHARINDEX(a, b, 1) + CHARINDEX(a, b)")
      === "CHARINDEX(a, b, 1) + POSITION(a IN b)")
  }

  test("B6: dialect threads into nested rewrites") {
    assert(ExprRewriter.rewrite("CONVERT(VARCHAR(36), NEWID())",
      ExprRewriter.Sparksql) === "CAST(uuid() AS varchar(36))")
    assert(ExprRewriter.rewrite("CONVERT(VARCHAR(36), NEWID())")
      === "CAST(gen_random_uuid() AS varchar(36))")
  }

  test("B7: bracketed identifiers renamed by policy") {
    assert(ExprRewriter.rewrite("[MyCol] > (10)", rename = _.toLowerCase)
      === "mycol > (10)")
  }

  test("B7: numeric/hex literal tails are not identifiers") {
    // a quoting rename (the -keep_identifier_case shape) must not
    // quote the alphabetic tail of 1E9 / 0xFF into 1"E9" / 0"xFF"
    def q(s: String) = "\"" + s + "\""
    assert(ExprRewriter.rewrite("x > 1E9", rename = q) === q("x") + " > 1E9")
    assert(ExprRewriter.rewrite("Mask & 0xFF", rename = q)
      === q("Mask") + " & 0xFF")
    assert(ExprRewriter.rewrite("a + 12abc", rename = q)
      === q("a") + " + 12abc")
  }

  test("B7: '#'-prefixed temp-table references pass through verbatim") {
    // temp tables live in skipped procedure bodies and are never
    // renamed DDL-side — renaming just the tail of '#MyTemp' would
    // produce a dangling half-renamed reference, so the boundary
    // guard deliberately blocks a bare word that starts after '#'/'$'
    def q(s: String) = "\"" + s + "\""
    assert(ExprRewriter.rewrite("#MyTemp.Col > 1", rename = q)
      === "#MyTemp." + q("Col") + " > 1")
    assert(ExprRewriter.rewrite("SELECT a FROM #tmp", rename = q)
      === "SELECT " + q("a") + " FROM #tmp")
  }

  test("B7: call detection skips any whitespace before the paren") {
    // SUM\n(x) in a multi-line view body is still a call — the name
    // must not be renamed/quoted
    def q(s: String) = "\"" + s + "\""
    assert(ExprRewriter.rewrite("SUM\n(Amount)", rename = q)
      === "SUM\n(" + q("Amount") + ")")
    assert(ExprRewriter.rewrite("SUM\t(Amount)", rename = q)
      === "SUM\t(" + q("Amount") + ")")
  }

  test("string concat rewriting (view bodies)") {
    assert(ExprRewriter.rewriteConcat("a + '|' + b") === "a || '|' || b")
    assert(ExprRewriter.rewriteConcat("c1 + c2") === "c1 + c2") // numeric stays
  }

  test("B9: camelToSnake") {
    assert(Identifiers.camelToSnake("DealerCode") === "dealer_code")
    assert(Identifiers.camelToSnake("IBANCode") === "iban_code")
    assert(Identifiers.camelToSnake("already_snake") === "already_snake")
  }

  test("B9: format quotes reserved words and non-plain identifiers") {
    val c = Config()
    assert(Identifiers.format("Simple", c)._1 === "simple")
    assert(Identifiers.format("user", c)._1 === "\"user\"")
    assert(Identifiers.format("weird name", c)._1 === "\"weird name\"")
    assert(Identifiers.format("Keep", Config(identifierCase =
      IdentifierCase.Keep))._1 === "\"Keep\"")
  }

  test("B9: >63 byte identifiers warn") {
    val (_, w) = Identifiers.format("x" * 70, Config())
    assert(w.nonEmpty)
  }

  test("B10/B11: sort dir split and constraint name validity") {
    assert(Identifiers.splitSortDir("col ASC") === ("col", None))
    assert(Identifiers.splitSortDir("col DESC") === ("col", Some("DESC")))
    assert(Identifiers.constraintNameValid("ok"))
    assert(!Identifiers.constraintNameValid("x" * 64))
  }

  test("B12: PK sort-safety by column types") {
    def tbl(types: String*) = TableDef("t", "dbo",
      cols = types.zipWithIndex.map { case (tp, i) =>
        ColumnDef(s"c$i", i, SqlType(tp), "x", IntegerType)
      }.toVector,
      constraints = Vector(PrimaryKey(None,
        types.indices.map(i => s"c$i"))))
    assert(Identifiers.isPkSortOrderSafe(tbl("int", "datetime")))
    assert(!Identifiers.isPkSortOrderSafe(tbl("int", "varchar")))
    assert(!Identifiers.isPkSortOrderSafe(TableDef("t", "dbo"))) // no PK
  }

  test("B13: name conflict resolution renames domains and indexes") {
    val cat = Catalog(schemas = Map("public" -> SchemaDef("public",
      tables = Map(
        "foo" -> TableDef("foo", "dbo",
          cols = Vector(ColumnDef("c", 1, SqlType("bar"), "bar", StringType)),
          indexes = Map("foo" -> IndexDef("foo"))),
        "bar" -> TableDef("bar", "dbo")),
      domains = Map("bar" -> "varchar(10)"))))
    val out = Identifiers.resolveNameConflicts(cat)
    val sd = out.schemas("public")
    assert(sd.domains.contains("bar2pgd"))
    assert(!sd.domains.contains("bar"))
    // referring column rewritten
    assert(sd.tables("foo").cols.head.pgType === "bar2pgd")
    // index "foo" collides with table foo → renamed
    assert(sd.tables("foo").indexes.keySet === Set("foo2pgi1"))
  }

  test("B14: schema relabeling") {
    assert(Config().relabel("dbo") === "public")
    assert(Config(relabelDbo = false).relabel("dbo") === "dbo")
    assert(Config(relabelSchemas = Map("etl" -> "staging")).relabel("etl")
      === "staging")
  }

  test("property: rewrite is idempotent on already-converted expressions") {
    val gen = Gen.oneOf(
      "COALESCE(a, 0)", "CURRENT_TIMESTAMP", "REPEAT(' ',3)",
      "date_part('year', d)", "CAST(x AS INT)", "a || b")
    forAll(gen) { s =>
      assert(ExprRewriter.rewrite(s) === s)
    }
  }

  test("property: rewrite terminates on arbitrary function-call soup") {
    // the round-1 hang class: fallback branches re-emitting the source
    // function name must never re-match forever. Generate nested call
    // soup from the rewriter's own vocabulary with random arities.
    val names = Seq("CHARINDEX", "DATEPART", "DATEADD", "CONVERT",
      "ISNULL", "LEN", "SPACE", "charindex", "convert")
    val leafGen = Gen.oneOf(Gen.identifier, Gen.choose(0, 999).map(_.toString),
      Gen.alphaStr.map(s => s"'${s.take(8)}'"))
    def callGen(depth: Int): Gen[String] =
      if (depth == 0) leafGen
      else for {
        name <- Gen.oneOf(names)
        n <- Gen.choose(0, 4)
        args <- Gen.listOfN(n, Gen.frequency(
          3 -> leafGen, 1 -> callGen(depth - 1)))
      } yield s"$name(${args.mkString(", ")})"
    forAll(callGen(3)) { expr =>
      // must return (quickly) for both dialects; result is irrelevant
      ExprRewriter.rewrite(expr)
      ExprRewriter.rewrite(expr, ExprRewriter.Sparksql)
    }
  }

  test("property: camelToSnake is idempotent") {
    forAll(Gen.identifier) { s =>
      val once = Identifiers.camelToSnake(s)
      assert(Identifiers.camelToSnake(once) === once)
    }
  }
}
