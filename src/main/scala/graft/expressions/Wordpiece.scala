package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match WordPiece tokenization of ONE pre-split word
  * into subword pieces (the algorithm behind BERT-style tokenizers:
  * Wu et al. 2016, "Google's Neural Machine Translation System").
  *
  * Semantics (matching the published algorithm exactly):
  *   - the vocabulary holds START pieces (plain strings) and
  *     CONTINUATION pieces (prefixed "##"), matched by position;
  *   - at each position the LONGEST matching piece wins; no
  *     backtracking — if no piece matches at some position the whole
  *     word collapses to a single `[UNK]` token (even when a
  *     non-greedy segmentation would have succeeded);
  *   - continuation pieces are emitted WITH their "##" marker, so the
  *     output round-trips: strip "##" and concatenate = input word;
  *   - the empty string tokenizes to an empty array.
  *
  * Matching is over Java String chars (the vocab and corpus words are
  * expected NFC-normalized upstream; no case folding happens here —
  * lower() belongs to the caller's pre-tokenization, where the oracle
  * can replay it).
  *
  * Scale: the vocabulary rides into codegen as ONE reference object
  * shared by every row of a partition (the standard shipped-literal
  * pattern — a 30k-piece BERT vocab is ~300 KB, far below broadcast
  * sizes that matter). Lookup is hash-set probes from the longest
  * plausible length downward, bounded by the longest vocab piece, so
  * per-word cost is O(len · maxPieceLen) string hashing — no trie
  * pointer-chasing, and the loop body stays inside whole-stage codegen.
  */
case class WordpieceTokenize(child: Expression, vocab: Seq[String],
    unk: String = "[UNK]") extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "wordpiece_tokenize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wordpiece_tokenize expects a string word, got ${child.dataType}")

  // Start pieces and (##-stripped) continuation pieces as separate
  // hash sets; longest lengths bound the greedy probe window.
  @transient private lazy val startSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(p => if (!p.startsWith("##") && p.nonEmpty) s.add(p))
    s
  }
  @transient private lazy val contSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(p => if (p.startsWith("##") && p.length > 2) s.add(p.substring(2)))
    s
  }
  @transient private lazy val maxStartLen: Int = {
    var m = 0
    val it = startSet.iterator()
    while (it.hasNext) m = math.max(m, it.next().length)
    m
  }
  @transient private lazy val maxContLen: Int = {
    var m = 0
    val it = contSet.iterator()
    while (it.hasNext) m = math.max(m, it.next().length)
    m
  }
  @transient private lazy val unkUtf8 = UTF8String.fromString(unk)

  /** Greedy longest-match; called from both eval and generated code. */
  def tokenizeWord(w: UTF8String): ArrayData = {
    val word = w.toString
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var pos = 0
    while (pos < n) {
      val atStart = pos == 0
      val set = if (atStart) startSet else contSet
      val maxLen = if (atStart) maxStartLen else maxContLen
      var end = math.min(n, pos + maxLen)
      var hit: String = null
      while (end > pos && hit == null) {
        val cand = word.substring(pos, end)
        if (set.contains(cand)) hit = cand else end -= 1
      }
      if (hit == null) return new GenericArrayData(Array[Any](unkUtf8))
      out += UTF8String.fromString(if (atStart) hit else "##" + hit)
      pos = end
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    tokenizeWord(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpiece", this,
      classOf[WordpieceTokenize].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.tokenizeWord($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordpieceTokenize = copy(child = newChild)
}
