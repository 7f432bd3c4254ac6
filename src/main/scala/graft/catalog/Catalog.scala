package graft.catalog

import org.apache.spark.sql.types._

/** Immutable catalog IR for a parsed SQL Server schema dump.
  *
  * Mirrors the nested `$objects` hash of the reference
  * (sqlserver2pgsql.pl:25–28, built by parse_dump 1512–2576) as plain Scala
  * case classes. The IR is engine-agnostic: the pure front half (parser,
  * converters, DDL emitters) works on it without a SparkSession; the Spark
  * back half derives `StructType` schemas and per-table copy/diff plans.
  */

/** A SQL type as it appears in the source dump, e.g. `nvarchar(255)`,
  * `numeric(10,2)`, `varbinary(max)`.
  */
final case class SqlType(
    name: String,                 // lower-cased base type name
    typeSchema: Option[String] = None, // e.g. user-defined type's schema
    arg1: Option[Int] = None,     // length or precision
    arg2: Option[Int] = None,     // scale
    isMax: Boolean = false        // `(max)` qualifier (dropped → unbounded)
) {
  def render: String = {
    val quals =
      if (isMax) "(max)"
      else (arg1, arg2) match {
        case (Some(a), Some(b)) => s"($a,$b)"
        case (Some(a), None)    => s"($a)"
        case _                  => ""
      }
    name + quals
  }
}

/** Column default: the normalized PG-ready value plus an "unsure" flag for
  * arbitrary expressions (sqlserver2pgsql.pl:633–683 store_default_value).
  */
final case class DefaultDef(value: String, unsure: Boolean = false)

/** IDENTITY(start, step) column metadata → sequence (pl:1451–1481). */
final case class IdentityDef(start: Long, step: Long)

final case class ColumnDef(
    name: String,
    pos: Int,
    sqlType: SqlType,
    pgType: String,               // converted PostgreSQL type (B1)
    sparkType: DataType,          // converted Spark type (§1.3)
    notNull: Boolean = false,
    default: Option[DefaultDef] = None,
    identity: Option[IdentityDef] = None,
    comment: Option[String] = None,
    /** computed column: translated expression + PERSISTED flag (A5). */
    computedExpr: Option[String] = None,
    computedPersisted: Boolean = false,
    /** extra generated CHECK (citext length / bytea octet_length, B1). */
    generatedCheck: Option[String] = None
)

sealed trait Constraint { def name: Option[String] }
final case class PrimaryKey(name: Option[String], cols: Seq[String])
    extends Constraint
final case class Unique(name: Option[String], cols: Seq[String])
    extends Constraint
final case class ForeignKey(
    name: Option[String],
    localCols: Seq[String],
    remoteSchema: String,
    remoteTable: String,
    remoteCols: Seq[String],
    onDeleteCascade: Boolean = false,
    onDeleteSetNull: Boolean = false,
    onUpdateCascade: Boolean = false,
    onUpdateSetNull: Boolean = false
) extends Constraint
/** CHECK with translated predicate; `unsure` follows the reference's
  * three-tier confidence output (A23, pl:2275–2294).
  */
final case class Check(name: Option[String], predicate: String,
    unsure: Boolean = true) extends Constraint

final case class IndexDef(
    name: String,
    unique: Boolean = false,
    /** columns with sort order, e.g. Seq(("col", true)) = ASC. */
    cols: Seq[(String, Boolean)] = Nil,
    include: Seq[String] = Nil,
    where: Option[String] = None,  // partial-index predicate (translated)
    disabled: Boolean = false,
    comment: Option[String] = None
)

final case class SequenceDef(
    name: String,
    start: Option[Long] = None,
    step: Option[Long] = None,
    min: Option[Long] = None,
    max: Option[Long] = None,
    cache: Option[Long] = None,
    /** OWNED BY table.col when generated from IDENTITY (pl:1471–1480). */
    ownerSchema: Option[String] = None,
    ownerTable: Option[String] = None,
    ownerCol: Option[String] = None
)

final case class ViewDef(
    name: String,
    /** fully translated `CREATE VIEW` SQL (A12). */
    sql: String,
    comment: Option[String] = None
)

final case class TableDef(
    name: String,
    origSchema: String,
    cols: Vector[ColumnDef] = Vector.empty,
    constraints: Vector[Constraint] = Vector.empty,
    indexes: Map[String, IndexDef] = Map.empty,
    hasLobs: Boolean = false,      // drives partitioned-scan choice (C3)
    comment: Option[String] = None
) {
  def pk: Option[PrimaryKey] =
    constraints.collectFirst { case p: PrimaryKey => p }
  def colByName(n: String): Option[ColumnDef] =
    cols.find(_.name.equalsIgnoreCase(n))
  def withCol(c: ColumnDef): TableDef = copy(cols = cols :+ c)
  /** Spark schema of the migrated table (§1.3 mapping). */
  def sparkSchema: StructType =
    StructType(cols.sortBy(_.pos).map(c =>
      StructField(c.name, c.sparkType, nullable = !c.notNull)))
}

final case class SchemaDef(
    name: String,
    tables: Map[String, TableDef] = Map.empty,
    sequences: Map[String, SequenceDef] = Map.empty,
    /** CREATE TYPE x FROM y → CREATE DOMAIN (A13). */
    domains: Map[String, String] = Map.empty,
    /** CREATE TYPE x AS TABLE → composite type (A14). */
    tableTypes: Map[String, Seq[(String, String)]] = Map.empty,
    views: Map[String, ViewDef] = Map.empty,
    /** declaration order of views — later views may reference earlier
      * ones (pl:75, 1890–1891). */
    viewOrder: Vector[String] = Vector.empty,
    comment: Option[String] = None
)

/** Which implicit target-side casts the load needs (pl:243–255):
  * 'C' = CREATE CAST, 'S' = system-catalog tweak (xml).
  */
final case class Catalog(
    schemas: Map[String, SchemaDef] = Map.empty,
    casts: Map[String, Char] = Map.empty,
    variables: Map[String, String] = Map.empty,
    requiresPostgis: Boolean = false,
    requiresCitext: Boolean = false,
    warnings: Vector[String] = Vector.empty
) {
  def schema(s: String): SchemaDef = schemas.getOrElse(s, SchemaDef(s))
  def updateSchema(s: String)(f: SchemaDef => SchemaDef): Catalog =
    copy(schemas = schemas.updated(s, f(schema(s))))
  def updateTable(s: String, t: String)(f: TableDef => TableDef): Catalog =
    updateSchema(s) { sd =>
      val tab = sd.tables.getOrElse(t, TableDef(t, s))
      sd.copy(tables = sd.tables.updated(t, f(tab)))
    }
  def table(s: String, t: String): Option[TableDef] =
    schemas.get(s).flatMap(_.tables.get(t))
  def warn(msg: String): Catalog = copy(warnings = warnings :+ msg)
  def allTables: Seq[(String, TableDef)] =
    schemas.toSeq.sortBy(_._1).flatMap { case (sn, sd) =>
      sd.tables.toSeq.sortBy(_._1).map { case (_, t) => (sn, t) }
    }
}
