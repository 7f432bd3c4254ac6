package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge applied to a symbol array (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * public paper): every LEFTMOST NON-OVERLAPPING adjacent (a, b)
  * collapses to the concatenated symbol in a single left-to-right
  * scan. For an overlapping same-symbol chain (a a a with a = b) this
  * merges positions (1,2) and leaves 3 — the reference greedy
  * semantics, which the SQL oracle reproduces with the run-parity
  * rule (within a run of consecutive match starts, every other start
  * beginning at the first is chosen).
  *
  * A native kernel rather than a higher-order fold: the merge runs
  * once per vocab row per round, and an `aggregate`/`transform`
  * lambda here would land on the interpreted path the PlanLint gate
  * exists to keep out of hot loops.
  */
case class BpeMergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {

  private val merged = a + b

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_merge_pair"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_pair expects array<string>, got $other")
    }

  private val ua = UTF8String.fromString(a)
  private val ub = UTF8String.fromString(b)
  private val um = UTF8String.fromString(merged)

  def merge(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && arr.getUTF8String(i) == ua &&
          arr.getUTF8String(i + 1) == ub) {
        out += um
        i += 2
      } else {
        out += arr.getUTF8String(i)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    merge(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerge", this,
      classOf[BpeMergePair].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.merge($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeMergePair = copy(child = newChild)
}
