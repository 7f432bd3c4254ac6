package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-entropy statistics as ONE map-only native
  * kernel — the compression-proxy quality signal corpus pipelines use
  * to catch gibberish / binary-pasted / keyboard-mash documents
  * (near-zero or near-maximal char entropy both flag): Shannon
  * entropy in bits over the row's Unicode code-point distribution
  * (ALL code points, whitespace included).
  *
  * Returns struct(n_chars, n_distinct, entropy_nanos):
  *  - n_chars: total code points;
  *  - n_distinct: distinct code points;
  *  - entropy_nanos: −Σ_c floor((p_c·ln p_c / ln 2)·1e9) as a LONG in
  *    nano-bits. Each term is floor-quantized BEFORE the sum, and the
  *    sum is integer, so the result is order-independent and
  *    engine-exact (the same nano-unit discipline as naiveBayes —
  *    decimal/double summation can drift in the last digit across
  *    engines). Consumers divide by 1e9 for bits.
  *
  * Why a native kernel and not explode(split(text, '')): the
  * declarative form inflates the row stream ×len(text) and pays a
  * (doc, char) shuffle for what is a per-row computation; here it is
  * a pure projection — zero shuffle at any scale. The DuckDB oracle
  * replays the explode formulation and must agree exactly.
  *
  * Code points (not UTF-16 units) so supplementary-plane text (CJK
  * extensions, emoji) counts like DuckDB's per-code-point split.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy_nanos", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects a string column, got ${child.dataType}")

  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var nanos = 0L
    if (n > 0) {
      val it = counts.values().iterator()
      while (it.hasNext) {
        val cnt = it.next()
        val p = cnt.toDouble / n.toDouble
        // EXACT oracle parity: ((p * ln p) / ln 2) * 1e9, floored —
        // keep this operation order in any replay
        nanos += math.floor(p * math.log(p) / math.log(2.0) * 1e9).toLong
      }
    }
    new GenericInternalRow(Array[Any](n, counts.size.toLong, -nanos))
  }

  override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this,
      classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.stats($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy = copy(child = newChild)
}
