package graft.tools

import graft.convert.{ConfFile, Config}
import graft.emit.PgDdlEmitter
import graft.parser.{ParseException, TsqlParser}
import java.nio.file.{Files, Paths}

/** The single CLI binding the reference's full option surface
  * (sqlserver2pgsql.pl:3272–3351): `-conf <file>` + the whole short
  * option matrix, CLI winning over conf, then parse → convert → emit
  * before/after/unsure (+ col map).
  *
  * The `kettle directory` parameter triggers KettleEmitter: per-table
  * `.ktr` transformations + `migration.kjb`/`incremental.kjb`
  * (pl:923–1352), matching the reference's entry-point-2/3 file
  * outputs. The Spark operators (graft.operators.*) execute the same
  * dataflow natively from the same Config (parallelism, ignore
  * errors, sort size) — the artifacts serve users with an existing
  * PDI scheduler.
  */
object Main {

  private val usage =
    """usage: graft.tools.Main [-conf <conf_file>] -f <dump> -b <before> -a <after> -u <unsure>
      |  [-k <kettle_output_dir>]
      |  [-i] [-num] [-nr] [-keep_identifier_case | -camel_to_snake]
      |  [-drop_rowversion] [-use_identity_column] [-relabel_schemas 'a=>b;c=>d']
      |  [-validate_constraints yes|after|no] [-skip_citext_length_check]
      |  [-col_map_file <f> [-col_map_file_header] [-col_map_file_delimiter <d>]]
      |  [-pi N] [-po N] [-sort_size N] [-ignore_errors] [-use_pk_if_possible '*'|t1,t2]
      |  [-sd db -sh host -si inst -sp port -su user -sw pass]
      |  [-pd db -ph host -pp port -pu user -pw pass]
      |  [-sforce_ssl] [-pforce_ssl] [-stringtype_unspecified]""".stripMargin

  def main(args: Array[String]): Unit = {
    if (args.exists(a => a == "-h" || a == "--h" || a == "-help")) {
      println(usage); sys.exit(0)
    }
    val job =
      try buildJob(args.toSeq)
      catch {
        case e: ConfFile.ConfException =>
          System.err.println(e.msg); System.err.println(usage); sys.exit(2)
          return
      }
    val dump = job.dumpFile.getOrElse {
      System.err.println("Missing -f (sql server dump filename)")
      System.err.println(usage); sys.exit(2); return
    }
    if (job.beforeFile.isEmpty || job.afterFile.isEmpty || job.unsureFile.isEmpty) {
      System.err.println("Missing -b/-a/-u output files")
      System.err.println(usage); sys.exit(2); return
    }
    val cat =
      try new TsqlParser(job.config).parseFile(Paths.get(dump))
      catch {
        case e: ParseException =>
          System.err.println(s"parse error: ${e.getMessage}"); sys.exit(1)
          return
      }
    job.kettleDir.foreach { dir =>
      val emitter = new graft.emit.KettleEmitter(job.config,
        job.sqlServer, job.postgres)
      val written = emitter.writeTo(Paths.get(dir), cat)
      cat.allTables.collect {
        case (sn, t) if t.pk.forall(_.cols.isEmpty) =>
          // parity with pl:1164: PK-less tables fall back to full copy
          System.err.println(
            s"$sn/${t.name} has no PK. Cannot create an incremental transformation")
      }
      System.err.println(s"kettle: ${written.size} files written to $dir " +
        "(artifacts only — data movement also runs natively on Spark " +
        "via graft.operators)")
    }
    val out = new PgDdlEmitter(job.config).emit(cat)
    def write(path: String, content: String): Unit = {
      val p = Paths.get(path)
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.writeString(p, content)
    }
    write(job.beforeFile.get, out.before)
    write(job.afterFile.get, out.after)
    write(job.unsureFile.get, out.unsure)
    job.colMapFile.foreach { f =>
      val body = out.colMap.replace("\t", job.colMapDelimiter)
      val header = if (job.colMapHeader)
        Seq("source", "destination").mkString(job.colMapDelimiter) + "\n"
      else ""
      write(f, header + body)
    }
    out.warnings.foreach(w => System.err.println(s"WARNING: $w"))
    println(s"converted $dump: ${cat.allTables.size} tables, " +
      s"${cat.schemas.valuesIterator.map(_.views.size).sum} views -> " +
      s"${job.beforeFile.get}, ${job.afterFile.get}, ${job.unsureFile.get}")
  }

  /** CLI + optional conf file → Job (CLI wins; pl:3341–3344 parses the
    * conf only after GetOptions has set the CLI vars). Embeddable —
    * never exits the JVM; -h short-circuits in main() only.
    */
  def buildJob(args: Seq[String]): ConfFile.Job = {
    val cli = ConfFile.parseCli(args)
    val confEntries = cli.collectFirst { case ("conf", f) => f } match {
      case Some(f) =>
        ConfFile.parseConfLines(
          scala.jdk.CollectionConverters.ListHasAsScala(
            Files.readAllLines(Paths.get(f))).asScala.toSeq)
      case None => Seq.empty
    }
    ConfFile.toJob(ConfFile.merge(
      cli.filterNot(_._1 == "conf") ++ confEntries))
  }
}
