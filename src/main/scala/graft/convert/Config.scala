package graft.convert

/** Engine configuration — the reference's CLI/conf option matrix
  * (sqlserver2pgsql.pl:3272–3312 GetOptions, 153–178 defaults).
  */
final case class Config(
    /** -i: case-insensitive mode — text types become citext (pl:386–418). */
    caseInsensitive: Boolean = false,
    /** -num: narrow numeric(p,0) to integral types (pl:226–238). */
    convertNumericToInt: Boolean = false,
    /** identifier policy (pl:212–218): 0=lowercase, 1=keep, 2=camel→snake. */
    identifierCase: IdentifierCase = IdentifierCase.Lowercase,
    /** -drop_rowversion: drop timestamp/rowversion cols (pl:1437–1443). */
    dropRowversion: Boolean = false,
    /** -use_identity_column: GENERATED ALWAYS AS IDENTITY vs sequences
      * (pl:2722–2744). */
    useIdentityColumn: Boolean = true,
    /** -nr: don't relabel dbo→public (pl:719–741). */
    relabelDbo: Boolean = true,
    /** user schema remapping `src=>dst;…` (pl:716–751). */
    relabelSchemas: Map[String, String] = Map.empty,
    /** -validate_constraints: yes | after (NOT VALID) | no (pl:2900–2960). */
    validateConstraints: String = "yes",
    /** read parallelism (-pi, pl:165). */
    parallelismIn: Int = 1,
    /** write parallelism (-po, pl:166). */
    parallelismOut: Int = 8,
    /** incremental sort batch (-sort_size, pl:167). */
    sortSize: Int = 10000,
    ignoreErrors: Boolean = false
) {
  /** dbo→public default + user remapping (B14, pl:716–751). */
  def relabel(schema: String): String = {
    val s = relabelSchemas.getOrElse(schema, schema)
    if (s == schema && relabelDbo && schema.equalsIgnoreCase("dbo")) "public"
    else s
  }
}

sealed trait IdentifierCase
object IdentifierCase {
  case object Lowercase extends IdentifierCase
  case object Keep extends IdentifierCase
  case object CamelToSnake extends IdentifierCase
}
