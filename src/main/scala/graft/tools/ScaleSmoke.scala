package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Similarity}

/** Empirical scale check for the dedup/similarity hot paths: grow the
  * corpus by k× (content-distinct transforms per copy, so candidate
  * volume is not inflated quadratically by design) and confirm wall
  * time grows ~linearly — the local proxy for "no O(n²) stage".
  *
  * Copies are made content-distinct deterministically: every token
  * gets a copy-specific suffix, which changes every token, gram,
  * minhash and simhash (bag-of-words operators are permutation
  * INVARIANT — reversing/sorting tokens would leave simhash identical
  * and collapse sorted n-grams, inflating pairs quadratically; that
  * mistake is why this transform suffixes instead of permutes).
  * Embeddings get large per-copy noise (cos ≈0.6 vs original — below
  * every near-dup threshold). Within each copy the original dup
  * structure is preserved, so true pairs scale exactly k×.
  */
object ScaleSmoke {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def docsAt(base: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { c =>
      val shifted = base.select(
        (col("doc_id") + lit(c * 1000000L)).as("doc_id"),
        col("lang"), col("text"))
      if (c == 0) shifted
      else shifted.withColumn("text",
        concat_ws(" ", transform(split(col("text"), "\\s+"),
          t => concat(t, lit(s"~$c")))))
    }.reduce(_ union _)

  private def embAt(base: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { c =>
      base.select((col("vec_id") + lit(c * 1000000L)).as("vec_id"),
        (if (c == 0) transform(col("embedding"), x => x.cast("double"))
         else transform(col("embedding"), (x, i) =>
           x.cast("double") + lit(0.5) *
             (((col("vec_id") * 13 + i * 7 + lit(c)) % 17 - 8).cast("double") /
               lit(8.0)))).as("embedding"))
    }.reduce(_ union _)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                  else Seq(1, 2, 4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // warmup
    docs0.count(); emb0.count()
    println(f"${"factor"}%-7s ${"docs"}%-7s ${"minhash"}%-9s ${"hamming"}%-9s ${"embdup"}%-9s ${"annlsh"}%-9s ${"passage"}%-9s ${"tfidf"}%-9s ${"lmscore"}%-9s")
    factors.foreach { f =>
      val docs = docsAt(docs0, f).cache()
      val nd = docs.count()
      val emb = embAt(emb0, f).cache()
      emb.count()
      val (p1, tMinhash) = timed(Dedup.ngramJaccardPairsLsh(
        docs, "doc_id", "text", threshold = 0.5).count())
      val (p2, tHamming) = timed(Dedup.simhashNearDups(
        docs, "doc_id", "text", radius = 3).count())
      val (p3, tEmbDup) = timed(Dedup.embeddingNearDups(
        emb, "vec_id", "embedding", threshold = 0.95,
        bands = 4, rowsPerBand = 16).count())
      val queries = emb0.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), x => x.cast("double")).as("qvec"))
      val (p4, tAnn) = timed(Similarity.lshTopK(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 5, bands = 8, rowsPerBand = 16)
        .count())
      val (p5, tPassage) = timed(Dedup.passageDedup(
        docs, "doc_id", "text").count())
      val (p6, tTfidf) = timed(graft.functions.TextAnalysis.tfidfTopTerms(
        docs.select(col("doc_id"), col("text")), "doc_id", "text").count())
      val (p7, tLm) = timed(graft.functions.TextAnalysis.bigramLmScore(
        docs.select(col("doc_id"), col("text")), "doc_id", "text").count())
      println(f"$f%-7d $nd%-7d $tMinhash%-9.2f $tHamming%-9.2f $tEmbDup%-9.2f $tAnn%-9.2f $tPassage%-9.2f $tTfidf%-9.2f $tLm%-9.2f" +
        s"   (pairs: $p1/$p2/$p3, ann: $p4, rows: $p5/$p6/$p7)")
      docs.unpersist(); emb.unpersist()
    }
    // Round-6 second-session paths: directed containment (prefix
    // filter over the rarest-gram inverted index), RAG token chunking
    // (map-only explode), and wordpiece tokenization (codegen'd
    // greedy matcher). All three must grow ~linearly.
    println(f"${"factor"}%-7s ${"docs"}%-7s ${"contain"}%-9s ${"chunk"}%-9s ${"wordpiece"}%-9s")
    factors.foreach { f =>
      val docs = docsAt(docs0, f).cache()
      val nd = docs.count()
      val (c1, tCont) = timed(Dedup.containmentPairs(
        docs, "doc_id", "text", threshold = 0.9, n = 3).count())
      val (c2, tChunk) = timed(graft.functions.TextAnalysis.chunkTokens(
        docs, "doc_id", "text", size = 64, stride = 48).count())
      val letters = ('a' to 'z').map(_.toString)
      val vocab = Seq("the", "and", "ing") ++ letters ++
        letters.map("##" + _) :+ "##ing"
      val (c3, tWp) = timed(docs.select(
          explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
            .as("w"))
        .select(graft.functions.TextAnalysis.wordpiecePieces(col("w"), vocab)
          .as("p"))
        .agg(sum(size(col("p")))).collect().head.getLong(0))
      println(f"$f%-7d $nd%-7d $tCont%-9.2f $tChunk%-9.2f $tWp%-9.2f" +
        s"   (pairs: $c1, chunks: $c2, pieces: $c3)")
      docs.unpersist()
    }
    // Incremental dedup scale claim: FIXED delta batch against a
    // GROWING history whose band index is prebuilt (the production
    // shape — the index is a stored artifact). Incremental cost must
    // stay near-flat while the full-corpus pipeline grows with the
    // corpus: the delta pays its own hashing + collision-sized
    // verification only.
    println(f"${"factor"}%-7s ${"history"}%-8s ${"fullLsh"}%-9s ${"incLsh"}%-9s")
    factors.foreach { f =>
      val hist = docsAt(docs0, f).filter(col("doc_id") % 5 =!= 0).cache()
      val nh = hist.count()
      val delta = docs0.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("lang"), col("text"))
      val index = Dedup.lshBands(hist, "doc_id", "text", 16, 8, 3).cache()
      index.count()
      val (nInc, tInc) = timed(Dedup.nearDupDelta(
        index, hist, delta, "doc_id", "text", threshold = 0.5).count())
      val (nFull, tFull) = timed(Dedup.ngramJaccardPairsLsh(
        hist.unionByName(delta), "doc_id", "text", threshold = 0.5).count())
      println(f"$f%-7d $nh%-8d $tFull%-9.2f $tInc%-9.2f" +
        s"  (pairs full: $nFull, delta-touching: $nInc)")
      hist.unpersist(); index.unpersist()
    }
    spark.stop()
    sys.exit(0)
  }
}
