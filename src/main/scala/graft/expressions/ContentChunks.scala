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
  *
  * `minLen`/`maxLen` add the PRODUCTION clamp (LBFS §"chunking" /
  * FastCDC): the pure mask degrades on boundary DROUGHTS — a
  * low-entropy payload (repeated filler, zero runs) whose window
  * values never hit the mask emits one giant chunk, and a
  * pathological payload can emit a chunk per code point. The clamp
  * bounds both ends: a mask hit closer than `minLen` to the previous
  * boundary is IGNORED, and a chunk reaching `maxLen` is FORCED to
  * close regardless of the mask. Forced boundaries lose the
  * resync-after-edit property for the droughty span only — the
  * standard CDC trade. Defaults (1, MaxValue) are exactly the
  * unclamped contract, which the SQL oracle replays; the clamped
  * variant is sequential per blob (each boundary depends on the
  * previous ACCEPTED boundary) and is therefore gated by a
  * kernel-vs-driver-reference property spec instead.
  */
case class ContentChunks(child: Expression, w: Int, p: Long, m: Long,
    d: Long, r: Long, minLen: Int = 1, maxLen: Int = Int.MaxValue)
    extends UnaryExpression {
  require(w >= 2, "window must be >= 2")
  require(m > 1 && d > 1 && r >= 0 && r < d, "need M > 1, 0 <= r < D")
  // keeps every code-point · coefficient product < 2^51 (see scaladoc)
  require(m <= (1L << 30), "modulus must be <= 2^30 for exact 64-bit math")
  require(minLen >= 1 && maxLen >= minLen,
    "need 1 <= minLen <= maxLen")

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
    var idx = 1
    while (idx <= n) {
      val len = idx - prev
      // mask hits before minLen are ignored; positions < w have no
      // full window and can only close via the maxLen force
      val maskHit = len >= minLen && idx >= w && {
        var h = 0L
        var j = 0
        while (j < w) { h = (h + b(idx - j) * coef(j)) % m; j += 1 }
        h % d == r
      }
      if (maskHit || len == maxLen) {
        out += new GenericInternalRow(Array[Any](prev + 1, len))
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
