package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a text column as ONE native kernel —
  * bit-identical to the declarative
  * `wordNgramsFromTokens(tokens(lower(text)), n)` composition
  * (lower → trim → split `\s+` → first-occurrence-distinct sliding
  * windows; short docs emit the whole text as one gram, so every doc
  * stays dedupable), but evaluated in a single pass per row.
  *
  * Why it exists: the declarative form is a higher-order `transform`
  * whose `element_at(toks, …)` lambda runs on the INTERPRETED path
  * whenever the projection feeds a Generate (explode) — interpreted
  * eval has no common-subexpression elimination, so the inlined
  * split() re-tokenizes once per element access (measured 12 s vs
  * 0.6 s for the same sf0.1 gram stream). Here tokenization happens
  * exactly once per row regardless of the surrounding plan.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects a string column, got ${child.dataType}")

  def ngrams(text: UTF8String): ArrayData = {
    // mirror split(trim(lower(text)), "\s+", -1) EXACTLY:
    //  - lower via UTF8String.toLowerCase (locale-independent ASCII
    //    fast path — Java's String.toLowerCase is default-locale
    //    sensitive, e.g. Turkish dotless i);
    //  - trim via UTF8String.trim(), which strips ONLY ' ' (0x20) —
    //    Java's String.trim strips all chars <= 0x20, so tab/newline
    //    padding would diverge from the declarative pipeline (the
    //    declarative path keeps a leading/trailing empty token there);
    //  - split with limit -1 keeps trailing empties, same as Spark's
    //    split; an empty doc yields [""] → ONE empty gram.
    val toks = text.toLowerCase.trim().toString.split("\\s+", -1)
    if (toks.length >= n) {
      // first-occurrence order, like array_distinct
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      val sb = new java.lang.StringBuilder()
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else if (toks.length > 0) {
      new GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else new GenericArrayData(Array.empty[Any])
  }

  override def nullSafeEval(input: Any): Any =
    ngrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNgrams", this,
      classOf[WordNgrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.ngrams($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)
}
