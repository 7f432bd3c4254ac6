package graft.tools

import graft.parser._
import graft.convert._
import graft.emit.PgDdlEmitter
import java.nio.file.{Files, Paths}

/** CLI: parse a SQL Server DDL dump and write the three PostgreSQL DDL
  * scripts + column-map lineage file — the reference's `-b/-a/-u`
  * surface (sqlserver2pgsql.pl:2580–3171).
  *
  * Usage: runMain graft.tools.EmitDdl <dump.sql> <outdir> [options]
  */
object EmitDdl {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: EmitDdl <dump.sql> <outdir> [options]")
      sys.exit(2)
    }
    val Array(file, outDir) = args.take(2)
    val conf = args.drop(2).foldLeft(Config()) {
      case (c, "-i") => c.copy(caseInsensitive = true)
      case (c, "-num") => c.copy(convertNumericToInt = true)
      case (c, "-camel_to_snake") =>
        c.copy(identifierCase = IdentifierCase.CamelToSnake)
      case (c, "-keep_identifier_case") =>
        c.copy(identifierCase = IdentifierCase.Keep)
      case (c, "-drop_rowversion") => c.copy(dropRowversion = true)
      case (c, "-use_identity_column=0") => c.copy(useIdentityColumn = false)
      case (c, "-validate_constraints=after") =>
        c.copy(validateConstraints = "after")
      case (c, "-nr") => c.copy(relabelDbo = false)
      case (c, other) =>
        System.err.println(s"unknown option $other"); sys.exit(2); c
    }
    val cat =
      try new TsqlParser(conf).parseFile(Paths.get(file))
      catch {
        case e: ParseException =>
          System.err.println(s"parse error: ${e.getMessage}")
          sys.exit(1); return
      }
    val out = new PgDdlEmitter(conf).emit(cat)
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("before.sql"), out.before)
    Files.writeString(dir.resolve("after.sql"), out.after)
    Files.writeString(dir.resolve("unsure.sql"), out.unsure)
    Files.writeString(dir.resolve("col_map.txt"), out.colMap)
    out.warnings.foreach(w => System.err.println(s"WARNING: $w"))
    println(s"wrote before.sql (${out.before.linesIterator.size} lines), " +
      s"after.sql (${out.after.linesIterator.size}), " +
      s"unsure.sql (${out.unsure.linesIterator.size}), col_map.txt")
  }
}
