package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{PortableMinHash, PortableSimHash, SignBits, VecDot}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql` users (and external
  * SQL tooling) reach the codegen kernels without the Scala API.
  *
  * Activate with either
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * - `vec_dot(a, b)`            — dot product of float/double arrays
  * - `sign_bits(v, planes, dims)` — hyperplane sign-bit string for LSH
  * - `portable_minhash(grams, n)` — Carter–Wegman md5 MinHash signature
  * - `portable_simhash(tokens)`   — 60-bit md5 SimHash
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))

    ext.injectFunction((FunctionIdentifier("sign_bits"),
      new ExpressionInfo(classOf[SignBits].getName, "sign_bits"),
      (children: Seq[Expression]) => {
        val planes = intLit(children(1), "sign_bits planes")
        val dims = if (children.length > 2)
          intLit(children(2), "sign_bits dims") else 64
        graft.functions.Similarity.signBitsExpr(children.head, planes, dims)
      }))

    ext.injectFunction((FunctionIdentifier("portable_minhash"),
      new ExpressionInfo(classOf[PortableMinHash].getName, "portable_minhash"),
      (children: Seq[Expression]) => {
        val n = if (children.length > 1)
          intLit(children(1), "portable_minhash numHashes") else 16
        PortableMinHash(children.head, n)
      }))

    ext.injectFunction((FunctionIdentifier("portable_simhash"),
      new ExpressionInfo(classOf[PortableSimHash].getName, "portable_simhash"),
      (children: Seq[Expression]) => PortableSimHash(children.head, 60)))
  }
}
