package graft.emit

import graft.catalog._
import graft.convert._

/** DDL emission — the reference's `generate_schema`
  * (sqlserver2pgsql.pl:2580–3171): three scripts with a confidence tier
  * each, in dependency order.
  *
  *  - `before.sql`: extensions, schemas, composite types, domains, tables
  *    (+ generated citext/bytea CHECKs) — run before data load.
  *  - `after.sql`: sequences/identity, PKs, UNIQUEs, indexes, FKs,
  *    defaults, setval, comments — run after load (P7: constraint-free
  *    fast load is a structural optimization we keep).
  *  - `unsure.sql`: views in declaration order, expression defaults,
  *    partial/disabled indexes, CHECK constraints — anything whose
  *    translated SQL is not guaranteed to parse/behave identically.
  *
  * Each file is wrapped in `\set ON_ERROR_STOP` + BEGIN/COMMIT
  * (pl:2593–2601).
  */
final class PgDdlEmitter(conf: Config = Config()) {
  import PgDdlEmitter.Output

  private def fmt(s: String): String = Identifiers.format(s, conf)._1
  private def qual(schema: String, name: String): String =
    s"${fmt(schema)}.${fmt(name)}"

  def emit(cat0: Catalog): Output = {
    val cat = Identifiers.resolveNameConflicts(cat0)
    val warnings = Vector.newBuilder[String]
    warnings ++= cat.warnings
    val before = new StringBuilder
    val after = new StringBuilder
    val unsure = new StringBuilder
    val colMap = new StringBuilder

    def header(sb: StringBuilder): Unit = {
      sb ++= "\\set ON_ERROR_STOP\n"
      sb ++= "\\set ECHO all\n"
      sb ++= "BEGIN;\n"
    }
    header(before); header(after); header(unsure)

    // extensions (pl:2612–2625)
    if (cat.requiresCitext) before ++= "CREATE EXTENSION IF NOT EXISTS citext;\n"
    if (cat.requiresPostgis) before ++= "CREATE EXTENSION IF NOT EXISTS postgis;\n"

    // B3: implicit varchar→type casts for text-based loads (pl:243–255,
    // 1285–1301): 'C' types get a CREATE CAST … WITH INOUT AS IMPLICIT
    // around the load, 'S' (xml) a pg_cast castcontext tweak. Spark's
    // typed JDBC writes don't need these (P14); psql/COPY replays do.
    cat.casts.toSeq.sortBy(_._1).foreach { case (tpe, kind) =>
      kind match {
        case 'C' =>
          before ++= s"DROP CAST IF EXISTS (varchar as $tpe);\n"
          before ++= s"CREATE CAST (varchar as $tpe) WITH INOUT AS IMPLICIT;\n"
          after ++= s"DROP CAST (varchar as $tpe);\n"
        case _ => // 'S'
          before ++= "UPDATE pg_cast SET castcontext='i' WHERE " +
            s"castsource='character varying'::regtype AND casttarget='$tpe'::regtype;\n"
          after ++= "UPDATE pg_cast SET castcontext='e' WHERE " +
            s"castsource='character varying'::regtype AND casttarget='$tpe'::regtype;\n"
      }
    }

    // psql variables from :setvar (pl:2643–2646)
    cat.variables.toSeq.sortBy(_._1).foreach { case (k, v) =>
      unsure ++= s"\\set $k '$v'\n"
    }

    val schemas = cat.schemas.toSeq.sortBy(_._1)

    // CREATE SCHEMA (pl:2632–2640); public exists already
    schemas.foreach { case (sn, _) =>
      if (sn != "public") before ++= s"CREATE SCHEMA ${fmt(sn)};\n"
    }

    // composite types from table types (pl:2656–2660)
    schemas.foreach { case (sn, sd) =>
      sd.tableTypes.toSeq.sortBy(_._1).foreach { case (tn, cols) =>
        val body = cols.map { case (c, t) => s"${fmt(c)} $t" }.mkString(", ")
        before ++= s"CREATE TYPE ${qual(sn, tn)} AS ($body);\n"
      }
      // domains (pl:2667–2671)
      sd.domains.toSeq.sortBy(_._1).foreach { case (dn, ty) =>
        before ++= s"CREATE DOMAIN ${qual(sn, dn)} AS $ty;\n"
      }
    }

    // tables (pl:2676–2710); generated CHECKs inline (pl:2966–2979)
    cat.allTables.foreach { case (sn, t) =>
      val colLines = t.cols.sortBy(_.pos).map { c =>
        val (cn, w) = Identifiers.format(c.name, conf)
        warnings ++= w
        val identityClause =
          if (conf.useIdentityColumn && c.identity.isDefined) {
            val id = c.identity.get
            s" GENERATED ALWAYS AS IDENTITY (START WITH ${id.start} " +
              s"INCREMENT BY ${id.step})"
          } else ""
        val nn = if (c.notNull) " NOT NULL" else ""
        val gen = c.computedExpr.map { e =>
          val stored = if (c.computedPersisted) " STORED" else ""
          s" /* GENERATED ALWAYS AS ($e)$stored */"
        }.getOrElse("")
        s"  $cn ${c.pgType}$identityClause$nn$gen"
      }
      val checkLines = t.cols.sortBy(_.pos)
        .flatMap(c => c.generatedCheck.map(
          _.format(Identifiers.format(c.name, conf)._1)))
        .map(chk => s"  CHECK ($chk)")
      before ++= s"CREATE TABLE ${qual(sn, t.name)} (\n"
      before ++= (colLines ++ checkLines).mkString(",\n")
      before ++= "\n);\n"
    }

    // AFTER: sequences (pl:2718–2777) — skipped when identity columns used
    schemas.foreach { case (sn, sd) =>
      sd.sequences.toSeq.sortBy(_._1).foreach { case (qn, sq) =>
        val owned = (sq.ownerTable, sq.ownerCol) match {
          case (Some(t), Some(c)) if !conf.useIdentityColumn =>
            s" OWNED BY ${qual(sn, t)}.${fmt(c)}"
          case _ => ""
        }
        val isIdentityBacked = sq.ownerTable.isDefined
        if (!(conf.useIdentityColumn && isIdentityBacked)) {
          after ++= s"CREATE SEQUENCE ${qual(sn, qn)}"
          sq.start.foreach(v => after ++= s" START WITH $v")
          sq.step.foreach(v => after ++= s" INCREMENT BY $v")
          sq.min.foreach(v => after ++= s" MINVALUE $v")
          sq.max.foreach(v => after ++= s" MAXVALUE $v")
          sq.cache.foreach(v => after ++= s" CACHE $v")
          after ++= s"$owned;\n"
          (sq.ownerTable, sq.ownerCol) match {
            case (Some(t), Some(c)) =>
              // default + setval from loaded data (pl:3048–3063);
              // negative step sequences track min() instead of max()
              val agg = if (sq.step.exists(_ < 0)) "min" else "max"
              after ++= s"ALTER TABLE ${qual(sn, t)} ALTER COLUMN ${fmt(c)} " +
                s"SET DEFAULT nextval('${qual(sn, qn)}');\n"
              after ++= s"SELECT setval('${qual(sn, qn)}', coalesce(" +
                s"(SELECT $agg(${fmt(c)}) FROM ${qual(sn, t)}), " +
                s"${sq.start.getOrElse(1L)}), true);\n"
            case _ =>
          }
        } else {
          // identity column: still align the implicit sequence with data
          (sq.ownerTable, sq.ownerCol) match {
            case (Some(t), Some(c)) =>
              val agg = if (sq.step.exists(_ < 0)) "min" else "max"
              after ++= s"SELECT setval(pg_get_serial_sequence('" +
                s"${qual(sn, t)}', '${Identifiers.rename(c, conf)}'), " +
                s"coalesce((SELECT $agg(${fmt(c)}) FROM ${qual(sn, t)}), " +
                s"${sq.start.getOrElse(1L)}), true);\n"
            case _ =>
          }
        }
      }
    }

    // PKs then UNIQUEs (pl:2780–2825)
    cat.allTables.foreach { case (sn, t) =>
      t.constraints.foreach {
        case PrimaryKey(name, cols) =>
          val cn = name.filter(Identifiers.constraintNameValid)
            .map(n => s"CONSTRAINT ${fmt(n)} ").getOrElse("")
          after ++= s"ALTER TABLE ${qual(sn, t.name)} ADD ${cn}PRIMARY KEY " +
            s"(${cols.map(fmt).mkString(", ")});\n"
        case _ =>
      }
    }
    cat.allTables.foreach { case (sn, t) =>
      t.constraints.foreach {
        case Unique(name, cols) =>
          val cn = name.filter(Identifiers.constraintNameValid)
            .map(n => s"CONSTRAINT ${fmt(n)} ").getOrElse("")
          after ++= s"ALTER TABLE ${qual(sn, t.name)} ADD ${cn}UNIQUE " +
            s"(${cols.map(fmt).mkString(", ")});\n"
        case _ =>
      }
    }

    // indexes (pl:2827–2899): WHERE → unsure; DISABLED → commented in unsure
    cat.allTables.foreach { case (sn, t) =>
      t.indexes.toSeq.sortBy(_._1).foreach { case (_, ix) =>
        val uq = if (ix.unique) "UNIQUE " else ""
        val cols = ix.cols.map { case (c, asc) =>
          fmt(c) + (if (asc) "" else " DESC") }.mkString(", ")
        val include = if (ix.include.nonEmpty)
          s" INCLUDE (${ix.include.map(fmt).mkString(", ")})" else ""
        val whereClause = ix.where.map(w => s" WHERE $w").getOrElse("")
        val sql = s"CREATE ${uq}INDEX ${fmt(ix.name)} ON " +
          s"${qual(sn, t.name)} ($cols)$include$whereClause;"
        if (ix.disabled) unsure ++= s"-- disabled in source:\n-- $sql\n"
        else if (ix.where.isDefined) unsure ++= sql + "\n"
        else after ++= sql + "\n"
      }
    }

    // FKs (pl:2900–2960); -validate_constraints=after → NOT VALID
    cat.allTables.foreach { case (sn, t) =>
      t.constraints.foreach {
        case fk: ForeignKey =>
          val cn = fk.name.filter(Identifiers.constraintNameValid)
            .map(n => s"CONSTRAINT ${fmt(n)} ").getOrElse("")
          val actions = new StringBuilder
          if (fk.onDeleteCascade) actions ++= " ON DELETE CASCADE"
          if (fk.onDeleteSetNull) actions ++= " ON DELETE SET NULL"
          if (fk.onUpdateCascade) actions ++= " ON UPDATE CASCADE"
          if (fk.onUpdateSetNull) actions ++= " ON UPDATE SET NULL"
          val notValid =
            if (conf.validateConstraints == "after") " NOT VALID" else ""
          after ++= s"ALTER TABLE ${qual(sn, t.name)} ADD ${cn}FOREIGN KEY " +
            s"(${fk.localCols.map(fmt).mkString(", ")}) REFERENCES " +
            s"${qual(fk.remoteSchema, fk.remoteTable)} " +
            s"(${fk.remoteCols.map(fmt).mkString(", ")})$actions$notValid;\n"
        case _ =>
      }
    }

    // defaults (pl:3008–3046): sure → after, expression → unsure
    cat.allTables.foreach { case (sn, t) =>
      t.cols.sortBy(_.pos).foreach { c =>
        c.default.foreach { d =>
          if (c.identity.isEmpty) {
            val sql = s"ALTER TABLE ${qual(sn, t.name)} ALTER COLUMN " +
              s"${fmt(c.name)} SET DEFAULT ${d.value};"
            (if (d.unsure) unsure else after) ++= sql + "\n"
          }
        }
      }
    }

    // CHECK constraints — always unsure (translated T-SQL, pl:2275–2294)
    cat.allTables.foreach { case (sn, t) =>
      t.constraints.foreach {
        case Check(name, pred, _) =>
          val cn = name.filter(Identifiers.constraintNameValid)
            .map(n => s"CONSTRAINT ${fmt(n)} ").getOrElse("")
          unsure ++= s"ALTER TABLE ${qual(sn, t.name)} ADD ${cn}CHECK " +
            s"($pred);\n"
        case _ =>
      }
    }

    // comments (pl:3065–3096)
    schemas.foreach { case (sn, sd) =>
      sd.comment.foreach(cm =>
        after ++= s"COMMENT ON SCHEMA ${fmt(sn)} IS ${lit(cm)};\n")
      sd.tables.toSeq.sortBy(_._1).foreach { case (_, t) =>
        t.comment.foreach(cm =>
          after ++= s"COMMENT ON TABLE ${qual(sn, t.name)} IS ${lit(cm)};\n")
        t.cols.foreach { c =>
          c.comment.foreach(cm =>
            after ++= s"COMMENT ON COLUMN ${qual(sn, t.name)}." +
              s"${fmt(c.name)} IS ${lit(cm)};\n")
        }
        t.indexes.toSeq.sortBy(_._1).foreach { case (_, ix) =>
          ix.comment.foreach { cm =>
            // schema-qualified (an unqualified name breaks under -nr,
            // where the index lives outside the search_path), and
            // routed to the SAME script tier as its CREATE INDEX — a
            // filtered index is created in unsure.sql, so its comment
            // in after.sql would reference a missing relation
            val sql = s"COMMENT ON INDEX ${qual(sn, ix.name)} IS ${lit(cm)};\n"
            if (ix.disabled) unsure ++= s"-- index disabled in source: $sql"
            else if (ix.where.isDefined) unsure ++= sql
            else after ++= sql
          }
        }
      }
    }

    // views, declaration order (pl:3097–3120)
    schemas.foreach { case (sn, sd) =>
      sd.viewOrder.foreach { vn =>
        unsure ++= sd.views(vn).sql + ";\n"
        sd.views(vn).comment.foreach(cm =>
          unsure ++= s"COMMENT ON VIEW ${qual(sn, vn)} IS ${lit(cm)};\n")
      }
    }

    before ++= "COMMIT;\n"; after ++= "COMMIT;\n"; unsure ++= "COMMIT;\n"

    // col-map lineage (pl:2588–2610, 2701–2705): orig → converted names
    cat.allTables.foreach { case (sn, t) =>
      colMap ++= s"${t.origSchema}.${t.name}\t$sn.${Identifiers.rename(t.name, conf)}\n"
      t.cols.sortBy(_.pos).foreach { c =>
        colMap ++= s"${t.origSchema}.${t.name}.${c.name}\t" +
          s"$sn.${Identifiers.rename(t.name, conf)}." +
          s"${Identifiers.rename(c.name, conf)}\n"
      }
    }

    Output(before.toString, after.toString, unsure.toString,
      colMap.toString, warnings.result())
  }

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"
}

object PgDdlEmitter {
  /** Emitted script set (moved out of the class so the case-class
    * type test needs no outer reference). */
  final case class Output(before: String, after: String, unsure: String,
      colMap: String, warnings: Seq[String])
}
