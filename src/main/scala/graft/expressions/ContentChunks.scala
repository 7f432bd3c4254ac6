package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries via a polynomial rolling hash —
  * the CDC primitive (Muthitacharoen et al. 2001, LBFS) that makes
  * byte/segment-level dedup survive insertions: a fixed-size chunker
  * shifts every boundary after an edit, while content-defined
  * boundaries depend only on the local `w`-wide window, so chunking
  * RESYNCs at the first boundary past the edit and every later chunk
  * hash is preserved. At 100 TB this is how near-identical blobs
  * (recrawled pages, re-encoded docs) share storage- and dedup-work:
  * group by chunk hash, count distinct blobs per chunk.
  *
  * Definition (pure mask, deliberately min/max-free so a SQL oracle
  * replays it exactly): over the row's code points b₁..bₙ,
  * `H(i) = Σ_{j=0..w−1} b_{i−j} · pʲ  mod M` for i ≥ w; position i is
  * a boundary iff `H(i) mod D == r`; n is always a terminal boundary.
  * Chunk k spans (prevBoundary, boundary]. All arithmetic is exact
  * 64-bit integer — code points reach 0x10FFFF (&lt; 2²¹) and coefficients
  * are &lt; M ≤ 2³⁰ (enforced), so each product is &lt; 2⁵¹, and the
  * accumulator is reduced mod M after every addition so it never
  * exceeds M + 2⁵¹ &lt; 2⁵² — comfortably inside 64-bit (and the BIGINT
  * oracle), so any engine replays it bit-for-bit.
  *
  * Returns array<struct<start, len>> with 1-based code-point offsets
  * (consumers cut the chunk text with substr(start, len) and hash it
  * declaratively); empty input → empty array.
  */
case class ContentChunks(child: Expression, w: Int, p: Long, m: Long,
    d: Long, r: Long) extends UnaryExpression {
  require(w >= 2, "window must be >= 2")
  require(m > 1 && d > 1 && r >= 0 && r < d, "need M > 1, 0 <= r < D")
  // keeps every code-point · coefficient product < 2^51 (see scaladoc)
  require(m <= (1L << 30), "modulus must be <= 2^30 for exact 64-bit math")

  private val coef: Array[Long] = {
    val c = new Array[Long](w)
    c(0) = 1L % m
    var j = 1
    while (j < w) { c(j) = c(j - 1) * (p % m) % m; j += 1 }
    c
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "content_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"content_chunks expects a string column, got ${child.dataType}")

  def chunks(text: UTF8String): ArrayData = {
    val s = text.toString
    // code points, not UTF-16 units — matches per-code-point SQL split
    val n = s.codePointCount(0, s.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val b = new Array[Long](n + 1) // 1-based
    var i = 0
    var pos = 1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      b(pos) = cp.toLong
      pos += 1
      i += Character.charCount(cp)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var prev = 0
    var idx = w
    while (idx <= n) {
      var h = 0L
      var j = 0
      while (j < w) { h = (h + b(idx - j) * coef(j)) % m; j += 1 }
      if (h % d == r) {
        out += new GenericInternalRow(Array[Any](prev + 1, idx - prev))
        prev = idx
      }
      idx += 1
    }
    if (prev < n)
      out += new GenericInternalRow(Array[Any](prev + 1, n - prev))
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("contentChunks", this,
      classOf[ContentChunks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.chunks($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ContentChunks = copy(child = newChild)
}
