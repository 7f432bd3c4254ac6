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

  /** Portable finalizer for the CW family: the raw h1 + i·h2 keeps its
    * high bits (the min-deciding ones) almost constant in i, so one
    * gram tends to win MANY seeds and band components collide ~5× too
    * often. Rotating the halves moves the i-dependent low bits to the
    * top, and a right-shift xor diffuses them — both expressible in
    * any SQL engine with 64-bit shifts/xor (no wrapping multiply,
    * which DuckDB would reject as overflow).
    */
  def mix(u: Long): Long = {
    val w = ((u & 0x3FFFFFFFL) << 30) | (u >>> 30)
    w ^ (w >>> 15)
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
        var v2 = a // a + i*b, accumulated additively, then mixed
        while (i < numHashes) {
          val f = HashExpressions.mix(v2)
          if (f < mins(i)) mins(i) = f
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
      val f = ctx.freshName("f")
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
         |      long $f = $hx.mix($v2);
         |      if ($f < $mins[$i]) $mins[$i] = $f;
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

/** Shared kernel for the fused tokens → word-n-gram → Carter–Wegman
  * MinHash pass: no intermediate gram-string array is ever built —
  * each window digests the token bytes directly (space-separated,
  * byte-identical to md5(concat_ws(" ", window))). Duplicate grams
  * cannot change a minimum, so skipping array_distinct is exact.
  */
object NgramMinHashKernel {
  def compute(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int, numHashes: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val cnt = tokens.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    var any = false
    if (cnt > 0) {
      val toks = new Array[Array[Byte]](cnt)
      var i = 0
      while (i < cnt) {
        toks(i) = if (tokens.isNullAt(i)) null
                  else tokens.getUTF8String(i).getBytes
        i += 1
      }
      val space = ' '.toByte
      def digestWindow(from: Int, until: Int): Unit = {
        md.reset()
        var j = from
        var first = true
        while (j < until) {
          if (toks(j) != null) {
            if (!first) md.update(space)
            md.update(toks(j))
            first = false
          }
          j += 1
        }
        val d = md.digest()
        val a = HashExpressions.h1(d)
        val b = HashExpressions.h2(d)
        var k = 0
        var v = a
        while (k < numHashes) {
          val f = HashExpressions.mix(v)
          if (f < mins(k)) mins(k) = f
          v += b
          k += 1
        }
        any = true
      }
      if (cnt >= n) {
        var w = 0
        while (w <= cnt - n) { digestWindow(w, w + n); w += 1 }
      } else digestWindow(0, cnt) // whole short doc as one gram
    }
    if (!any)
      new GenericArrayData(Array.fill[Any](numHashes)(null))
    else new GenericArrayData(mins)
  }
}

/** Fused tokens → n-gram → portable MinHash signature in one pass
  * (see NgramMinHashKernel). Signature values are bit-identical to
  * wordNgramsFromTokens + PortableMinHash, without materializing the
  * gram array.
  */
case class PortableNgramMinHash(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "portable_ngram_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_ngram_minhash expects array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    NgramMinHashKernel.compute(v.asInstanceOf[ArrayData], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val kernel = NgramMinHashKernel.getClass.getName.stripSuffix("$") +
      "$.MODULE$"
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $kernel.compute($in, $n, $numHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression): PortableNgramMinHash =
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
