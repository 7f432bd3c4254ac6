package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation under a unigram language model — the encode
  * half of the SentencePiece-style tokenizer (Kudo 2018, public
  * paper): choose the segmentation of a word that maximizes the sum
  * of per-piece log probabilities.
  *
  * Cross-engine determinism contract (shared verbatim by the
  * driver-side trainer's E-step, this kernel, and the DuckDB oracle
  * replay):
  *   - scores are NANO-QUANTIZED LONGS (floor(ln(p)·1e9)) — Viterbi
  *     sums integers, so engines can never drift mid-sum (the
  *     round-7 float-discipline rule);
  *   - at each end position, candidates are ranked by
  *     (score DESC, piece length DESC) — equal-score ties prefer the
  *     LONGER piece;
  *   - a single character absent from the piece table scores
  *     [[UnigramSegment.UnkNano]] (coverage fallback; unreachable in
  *     the gates, whose trainer keeps every corpus character alive).
  *
  * Positions are Unicode CODE POINTS (the BpeSegmentWord convention;
  * DuckDB's string slicing is also per character, so the oracle
  * agrees on non-ASCII input too).
  */
object UnigramSegment {

  /** Score of an out-of-vocabulary single character. Large enough to
    * lose every tie against real pieces, small enough that a whole
    * word of OOV chars cannot overflow a long sum.
    */
  val UnkNano: Long = -1000000000000000L

  /** Viterbi-segment `w` under `scores` (piece → nano log-prob).
    * `maxPieceLen` bounds candidate piece length in CODE POINTS.
    */
  def viterbi(w: String, scores: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Array[String] = {
    // code-point offsets: off(i) = UTF-16 index of the i-th code point
    val nCp = w.codePointCount(0, w.length)
    if (nCp == 0) return Array.empty
    val off = new Array[Int](nCp + 1)
    var ci = 0; var si = 0
    while (ci < nCp) { off(ci) = si; si = w.offsetByCodePoints(si, 1); ci += 1 }
    off(nCp) = w.length
    val best = new Array[Long](nCp + 1)
    val back = new Array[Int](nCp + 1)
    var i = 1
    while (i <= nCp) {
      var bs = 0L; var bk = 0; var any = false
      val kMax = math.min(maxPieceLen, i)
      var k = 1
      while (k <= kMax) {
        val piece = w.substring(off(i - k), off(i))
        val sc = scores.get(piece)
        val s: java.lang.Long =
          if (sc ne null) sc
          else if (k == 1) java.lang.Long.valueOf(UnkNano)
          else null
        if (s ne null) {
          val cand = best(i - k) + s.longValue()
          // (score DESC, k DESC): strictly better, or tie with longer k
          if (!any || cand > bs || (cand == bs && k > bk)) {
            bs = cand; bk = k; any = true
          }
        }
        k += 1
      }
      best(i) = bs; back(i) = bk
      i += 1
    }
    // backtrack from the end; piece count ≤ nCp
    val out = new Array[String](nCp)
    var n = 0; var pos = nCp
    while (pos > 0) {
      val k = back(pos)
      out(n) = w.substring(off(pos - k), off(pos))
      n += 1; pos -= k
    }
    val segs = new Array[String](n)
    var j = 0
    while (j < n) { segs(j) = out(n - 1 - j); j += 1 }
    segs
  }
}

/** Native Viterbi-encode of one word under a trained unigram piece
  * table — the unigram twin of [[BpeSegmentWord]]: the operator runs
  * it per DISTINCT word (the vocab table), never per token, so the
  * corpus-sized side of tokenization stays a broadcast dictionary
  * lookup. Scores and tie rules are [[UnigramSegment]]'s (oracle- and
  * trainer-pinned).
  */
case class UnigramSegmentWord(child: Expression,
    pieces: Array[(String, Long)])
    extends UnaryExpression with ArrayParamValueEquality {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unigram_segment_word"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unigram_segment_word expects a string column, got ${child.dataType}")

  @transient private lazy val table = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }
  @transient private lazy val maxLen =
    if (pieces.isEmpty) 1
    else pieces.iterator
      .map(p => p._1.codePointCount(0, p._1.length)).max.max(1)

  def segment(w: UTF8String): ArrayData =
    new GenericArrayData(
      UnigramSegment.viterbi(w.toString, table, maxLen)
        .map(x => UTF8String.fromString(x): Any))

  override def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegmentWord", this,
      classOf[UnigramSegmentWord].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segment($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSegmentWord = copy(child = newChild)
}
