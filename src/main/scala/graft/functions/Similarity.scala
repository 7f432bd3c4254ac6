package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * variant as the 100 TB scale path.
  *
  * All arithmetic is higher-order array expressions (`zip_with` +
  * `aggregate`) — codegen-compatible, no UDF, executes map-side.
  */
object Similarity {

  /** Dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero vectors rather than NaN. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Brute-force exact top-k neighbors for every query vector.
    *
    * queries × corpus cross join — correct at any scale when `queries`
    * is small enough to broadcast (the common case: a probe batch
    * against a huge corpus). Ranking is one window per query id; with
    * k ≪ corpus this is the textbook pattern Catalyst turns into a
    * partial top-k (WindowGroupLimit pushes rank < k+1 below the sort).
    *
    * Norms are precomputed per side before the join — computing
    * `sqrt(dot(v,v))` inside the pair expression would redo each
    * corpus norm once per query (100 queries = 100× wasted work).
    * cos = dot/(na*nb) is bit-identical to the unstaged form.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(corpusId), col(corpusVec),
      norm(col(corpusVec)).as("__cn"))
    val q = queries.select(col(queryId), col(queryVec),
      norm(col(queryVec)).as("__qn"))
    val denom = col("__cn") * col("__qn")
    val joined = c.crossJoin(broadcast(q))
      .filter(col(queryId) =!= col(corpusId)) // self-match excluded
      .select(col(queryId), col(corpusId),
        when(denom === 0, lit(0.0))
          .otherwise(dot(col(corpusVec), col(queryVec)) / denom).as("cos"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col(corpusId).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for sign-LSH:
    * plane `p`, dimension `d` → uniform in [-1, 1], derived from a
    * driver-side hash so executors need no shared state and results
    * are stable across runs. Materialized as a literal array so the
    * executor does array lookups, not per-element hash calls.
    */
  private def planeVector(p: Int, dims: Int): Array[Double] =
    Array.tabulate(dims) { d =>
      val h = scala.util.hashing.MurmurHash3.productHash((p, d))
      (math.floorMod(h, 1000003).toDouble / 500001.5) - 1.0
    }

  /** Sign-LSH signature: for each of `planes` hyperplanes, the sign of
    * the projection — a bit string. Vectors in the same bucket are
    * likely neighbors; bucketing turns all-pairs similarity into a
    * per-bucket join (the scale path for ANN and near-dup).
    * `dims` must match the embedding dimensionality.
    */
  def hyperplaneSignature(vec: Column, planes: Int = 8,
      dims: Int = 64): Column =
    concat((0 until planes).map { p =>
      val plane = lit(planeVector(p, dims))
      val proj = aggregate(
        zip_with(vec, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      // dims mismatch ⇒ zip_with null-pads ⇒ proj NULL: surface it as a
      // loud error instead of silently collapsing every vector into one
      // bucket (correct results, but LSH degrades to brute force)
      when(proj.isNull, raise_error(lit(
        s"hyperplaneSignature: vector dims != $dims")))
        .when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** LSH-bucketed approximate top-k: like bruteForceTopK but queries
    * only compare against corpus vectors sharing their signature.
    * Recall < 1.0 by construction; multiply `planes` down or probe
    * multiple buckets for higher recall.
    */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, planes: Int = 8, dims: Int = 64): DataFrame = {
    val c = corpus.select(col(corpusId), col(corpusVec),
      hyperplaneSignature(col(corpusVec), planes, dims).as("sig"),
      norm(col(corpusVec)).as("__cn"))
    val q = queries.select(col(queryId), col(queryVec),
      hyperplaneSignature(col(queryVec), planes, dims).as("sig"),
      norm(col(queryVec)).as("__qn"))
    val denom = col("__cn") * col("__qn")
    val joined = c.join(q.hint("broadcast"), Seq("sig"))
      .filter(col(queryId) =!= col(corpusId))
      .select(col(queryId), col(corpusId),
        when(denom === 0, lit(0.0))
          .otherwise(dot(col(corpusVec), col(queryVec)) / denom).as("cos"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col(corpusId).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** SimHash64 over whitespace tokens: per-token 64-bit hash votes on
    * each bit position weighted ±1; the sign vector is the signature.
    * Built from xxhash64 (stable, seedable, codegen'd). Spark-side
    * near-dup key; grouped by equality (Hamming-radius probing is a
    * follow-on).
    */
  /** Token hashes for simhash: each token hashed ONCE with the native
    * xxhash64. Materialize this as its own column before calling
    * `simhashFromHashes` so the 64 bit-votes share one hash pass.
    */
  def tokenHashes(text: Column): Column =
    transform(TextAnalysis.tokens(lower(text)), t => xxhash64(t))

  /** 64-bit simhash from a precomputed token-hash array: for each bit
    * b, sum over tokens of (bit set ? +1 : −1); sign → bit b.
    */
  def simhashFromHashes(hashes: Column): Column = {
    val bits = (0 until 64).map { b =>
      val vote = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  def simhash64(text: Column): Column = simhashFromHashes(tokenHashes(text))
}
