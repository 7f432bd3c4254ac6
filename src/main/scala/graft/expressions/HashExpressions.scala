package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for the portable (md5-derived) document-hashing hot
  * paths. The declarative forms — a transform() producing md5 strings,
  * another parsing hex halves, then numHashes/numBits interpreted
  * array passes — are correct but lambda-bound; these expressions do
  * the digest and all minima/votes in ONE pass per document inside
  * whole-stage codegen.
  *
  * Hash definitions are IDENTICAL to the declarative forms (and to the
  * DuckDB oracle replicas): h1 = first 15 md5 hex chars as a 60-bit
  * int, h2 = next 10 hex chars as a 40-bit int, seeded value
  * h1 + i·h2 (Carter–Wegman/Broder linear family, overflow-free).
  */
object HashExpressions {

  /** h1 from digest bytes: hex chars [0,15) = bytes 0–6 + high nibble
    * of byte 7 — equals Long.parseLong(hex.substring(0,15), 16).
    */
  def h1(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** h2 from digest bytes: hex chars [15,25) = low nibble of byte 7,
    * bytes 8–11, high nibble of byte 12.
    */
  def h2(d: Array[Byte]): Long = {
    var v = d(7) & 0x0fL
    var i = 8
    while (i < 12) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(12) & 0xffL) >>> 4)
  }
}

/** Carter–Wegman portable MinHash signature: array<string> n-grams →
  * array<long> of `numHashes` minima, one md5 per gram, single pass.
  * Component i of the signature is min over grams of h1(g) + i·h2(g).
  * Null grams are skipped (array_min semantics); an empty/all-null
  * gram set yields all-null components (array_min of empty = null).
  */
case class PortableMinHash(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "portable_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_minhash expects array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val grams = v.asInstanceOf[ArrayData]
    val n = grams.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val md = MessageDigest.getInstance("MD5")
    var g = 0
    while (g < n) {
      if (!grams.isNullAt(g)) {
        any = true
        md.reset()
        val d = md.digest(grams.getUTF8String(g).getBytes)
        val a = HashExpressions.h1(d)
        val b = HashExpressions.h2(d)
        var i = 0
        var v2 = a // a + i*b, accumulated additively
        while (i < numHashes) {
          if (v2 < mins(i)) mins(i) = v2
          v2 += b
          i += 1
        }
      }
      g += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](numHashes)(null))
    else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mdRef = ctx.addMutableState("java.security.MessageDigest", "md",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (Exception e) { throw new RuntimeException(e); }""".stripMargin)
    val hx = HashExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val g = ctx.freshName("g")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val v2 = ctx.freshName("v2")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val res = ctx.freshName("res")
      s"""
         |int $n = $in.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $g = 0; $g < $n; $g++) {
         |  if (!$in.isNullAt($g)) {
         |    $any = true;
         |    $mdRef.reset();
         |    byte[] $d = $mdRef.digest($in.getUTF8String($g).getBytes());
         |    long $a = $hx.h1($d);
         |    long $b = $hx.h2($d);
         |    long $v2 = $a;
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      if ($v2 < $mins[$i]) $mins[$i] = $v2;
         |      $v2 += $b;
         |    }
         |  }
         |}
         |if (!$any) {
         |  Object[] $res = new Object[$numHashes];
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PortableMinHash =
    copy(child = newChild)
}

/** Portable SimHash: array<string> tokens → 60-bit signature long.
  * Per token one md5; h1's bits vote ±1 per position; sign → bit.
  * Bit-identical to tokenHashesPortable + simhashFromHashes(_, 60)
  * and to the DuckDB oracle replica.
  */
case class PortableSimHash(child: Expression, numBits: Int = 60)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_simhash expects array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val votes = new Array[Int](numBits)
    val md = MessageDigest.getInstance("MD5")
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        md.reset()
        val h = HashExpressions.h1(md.digest(toks.getUTF8String(t).getBytes))
        var b = 0
        while (b < numBits) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < numBits) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mdRef = ctx.addMutableState("java.security.MessageDigest", "md",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (Exception e) { throw new RuntimeException(e); }""".stripMargin)
    val hx = HashExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $in.numElements();
         |int[] $votes = new int[$numBits];
         |for (int $t = 0; $t < $n; $t++) {
         |  if (!$in.isNullAt($t)) {
         |    $mdRef.reset();
         |    long $h = $hx.h1($mdRef.digest($in.getUTF8String($t).getBytes()));
         |    for (int $b = 0; $b < $numBits; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $numBits; $b++) {
         |  if ($votes[$b] >= 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash =
    copy(child = newChild)
}
