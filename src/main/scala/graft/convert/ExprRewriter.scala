package graft.convert

/** B6/B7: table-driven T-SQL → PostgreSQL/Spark-SQL scalar expression
  * rewriting.
  *
  * Re-expresses `convert_transact_function` (sqlserver2pgsql.pl:585–601)
  * and `convert_transactsql_code` (pl:603–630): bracket-identifier
  * unquoting, ISNULL→COALESCE, getdate()→CURRENT_TIMESTAMP,
  * user_name()→CURRENT_USER, SPACE→REPEAT, CHARINDEX→POSITION,
  * DATEPART→date_part, DATEADD→interval arithmetic, CONVERT→CAST, and
  * `+` string concatenation → `||` (view rewriting, pl:1857–1876).
  *
  * Like the reference, this is a best-effort textual rewriter — outputs
  * that use it flow to the "unsure" tier unless the construct is on the
  * known-safe list. Spark-dialect output differs from PG only where the
  * SQL surface differs (interval literals, date_part naming).
  */
object ExprRewriter {

  sealed trait Dialect
  case object Pg extends Dialect
  case object Sparksql extends Dialect

  /** Rewrite a T-SQL scalar expression/predicate. `rename` is the
    * identifier policy applied to every `[bracketed]` identifier.
    */
  def rewrite(expr: String, dialect: Dialect = Pg,
      rename: String => String = identity): String = {
    var s = expr
    // [ident] → policy-renamed identifier (pl:616–618)
    s = """\[([^\]]+)\]""".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(rename(m.group(1))))
    s = rewriteFunctions(s, dialect)
    s
  }

  private val isnullRe = """(?i)\bISNULL\s*\(""".r
  private val getdateRe = """(?i)\bGETDATE\s*\(\s*\)""".r
  private val sysdatetimeRe = """(?i)\bSYSDATETIME\s*\(\s*\)""".r
  private val userNameRe = """(?i)\buser_name\s*\(\s*\)""".r
  private val spaceRe = """(?i)\bSPACE\s*\(""".r
  private val lenRe = """(?i)\bLEN\s*\(""".r
  private val newidRe = """(?i)\bNEWID\s*\(\s*\)""".r

  private def rewriteFunctions(in: String, dialect: Dialect): String = {
    var s = in
    s = isnullRe.replaceAllIn(s, "COALESCE(")
    s = getdateRe.replaceAllIn(s,
      if (dialect == Pg) "CURRENT_TIMESTAMP" else "current_timestamp()")
    s = sysdatetimeRe.replaceAllIn(s,
      if (dialect == Pg) "CURRENT_TIMESTAMP" else "current_timestamp()")
    s = userNameRe.replaceAllIn(s,
      if (dialect == Pg) "CURRENT_USER" else "current_user()")
    s = spaceRe.replaceAllIn(s, "REPEAT(' ',")
    s = lenRe.replaceAllIn(s, "LENGTH(")
    s = newidRe.replaceAllIn(s,
      if (dialect == Pg) "gen_random_uuid()" else "uuid()")
    s = rewriteCharindex(s, dialect)
    s = rewriteDatepart(s, dialect)
    s = rewriteDateadd(s, dialect)
    s = rewriteConvert(s, dialect)
    s
  }

  /** CHARINDEX(sub, str) → POSITION(sub IN str) (pl:593). Spark SQL also
    * accepts the POSITION(x IN y) form.
    */
  private def rewriteCharindex(s: String, dialect: Dialect): String =
    rewriteCall(s, "charindex", dialect) {
      case Seq(sub, str) => s"POSITION($sub IN $str)"
      case args => s"CHARINDEX(${args.mkString(", ")})" // 3-arg: unsupported
    }

  /** DATEPART(part, d) → date_part('part', d) (pl:595). */
  private def rewriteDatepart(s: String, dialect: Dialect): String =
    rewriteCall(s, "datepart", dialect) {
      case Seq(part, d) => s"date_part('${part.trim.toLowerCase}', $d)"
      case args => s"DATEPART(${args.mkString(", ")})"
    }

  /** DATEADD(unit, n, d) → d + n * INTERVAL '1 unit' (pl:596–597).
    * Spark: accepts the same arithmetic with INTERVAL literals.
    */
  private def rewriteDateadd(s: String, dialect: Dialect): String =
    rewriteCall(s, "dateadd", dialect) {
      case Seq(unit, n, d) =>
        val u = unit.trim.toLowerCase match {
          case "dd" | "d" => "day"
          case "mm" | "m" => "month"
          case "yy" | "yyyy" => "year"
          case "hh" => "hour"
          case "mi" | "n" => "minute"
          case "ss" | "s" => "second"
          case "wk" | "ww" => "week"
          case other => other
        }
        s"($d + ($n) * INTERVAL '1 $u')"
      case args => s"DATEADD(${args.mkString(", ")})"
    }

  /** CONVERT(type[(n[,m])], x[, style]) → CAST(x AS type) (pl:598–600);
    * the T-SQL style argument is dropped.
    */
  private def rewriteConvert(s: String, dialect: Dialect): String =
    rewriteCall(s, "convert", dialect) {
      case Seq(tpe, x) => s"CAST($x AS ${tpe.trim})"
      case Seq(tpe, x, _) => s"CAST($x AS ${tpe.trim})"
      case args => s"CONVERT(${args.mkString(", ")})"
    }

  /** Generic innermost-out rewrite of `fn(args…)` with balanced-paren,
    * quote-aware argument splitting — the structural improvement over the
    * reference's flat regexes (which break on nested calls).
    */
  private def rewriteCall(input: String, fn: String, dialect: Dialect)(
      f: Seq[String] => String): String = {
    val re = s"(?i)\\b$fn\\s*\\(".r
    var s = input
    // Resume each search AFTER the previous replacement: a fallback branch
    // that re-emits the same function name (legal 3-arg CHARINDEX, odd-arity
    // DATEPART/DATEADD/CONVERT) would otherwise re-match forever.
    var from = 0
    var continue = true
    while (continue && from < s.length) {
      re.findFirstMatchIn(s.substring(from)) match {
        case None => continue = false
        case Some(m) =>
          val start = from + m.start
          val open = from + m.end - 1
          findClose(s, open) match {
            case None => continue = false
            case Some(close) =>
              val args = splitArgs(s.substring(open + 1, close))
              // recurse into args so nested calls rewrite first
              val rwArgs = args.map(a => rewriteFunctions(a, dialect))
              val repl = f(rwArgs)
              s = s.substring(0, start) + repl + s.substring(close + 1)
              from = start + repl.length
          }
      }
    }
    s
  }

  /** Index of the ')' matching the '(' at `open`, honoring quotes. */
  private def findClose(s: String, open: Int): Option[Int] = {
    var depth = 0; var i = open; var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return Some(i)
        case _ =>
      }
      i += 1
    }
    None
  }

  /** Split a call's argument list on top-level commas. */
  private[convert] def splitArgs(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0; var inStr = false; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    val last = s.substring(start).trim
    if (last.nonEmpty || start < s.length) out += last
    out.result()
  }

  /** View-body string concatenation: `+` between string-ish operands →
    * `||` (pl:1857–1876). The reference applies this when either operand
    * is a quoted literal or the expression context is known textual; we
    * take the same literal-driven heuristic.
    */
  def rewriteConcat(s: String): String = {
    // a + 'lit'  /  'lit' + a  → ||
    var out = s
    var prev = ""
    while (prev != out) {
      prev = out
      out = out.replaceAll("""('(?:[^']|'')*')\s*\+""", "$1 ||")
      out = out.replaceAll("""\+\s*('(?:[^']|'')*')""", "|| $1")
    }
    // ident || b + c chains where left side already became || keep + for
    // numerics — matches the reference's conservative behavior.
    out
  }
}
