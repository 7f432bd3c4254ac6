package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkTestBase

class FunctionsSpec extends AnyFunSuite with SparkTestBase {

  test("text analysis: token count, ratios, quality bounds") {
    import spark.implicits._
    val df = Seq(
      (1, "the quick brown fox jumps over the lazy dog"),
      (2, ""),
      (3, "a, b. c! d?")).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.punctRatio(col("text")).as("p"),
      TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getInt(1) === 9)
    assert(out(2).getInt(1) === 0)
    assert(out(3).getDouble(2) > 0.2) // heavy punctuation
    out.values.foreach { r =>
      val q = r.getDouble(3); assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("lang id votes for the profile language") {
    import spark.implicits._
    val df = Seq(
      ("en", "the cat and the dog is of no concern to anyone"),
      ("fr", "le chat est dans la maison et les oiseaux"),
      ("de", "der hund und die katze ist nicht da"),
      ("es", "el perro y la casa que los gatos es bonita"))
      .toDF("expected", "text")
    val out = df.select(col("expected"),
      TextAnalysis.langId(col("text")).as("got")).collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1),
      s"lang mismatch for ${r.getString(0)}"))
  }

  test("tfidf top terms ranks rare terms above common ones") {
    import spark.implicits._
    // 'zebra' appears once in one doc; 'the' is everywhere — zebra must
    // outrank it despite equal tf
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog ate the zebra"),
      (3L, "the bird saw the cat")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 2 rank 1: 'ate', 'dog', 'zebra' all have tf=1, df=1 →
    // identical score, tie broken by term ascending
    assert(out((2L, 1))._1 == "ate")
    assert(out((2L, 2))._1 == "dog")
    // doc 1: 'the' has tf=2 but df=3 (every doc) → ln(4/4)=0 score;
    // rank 1 must be a df=1 term (cat has df=2): 'mat', 'on', 'sat' tie
    assert(out((1L, 1))._1 == "mat" && out((1L, 1))._3 == 1L)
    // ranks are dense 1..k per doc
    assert(out.keys.toSeq.groupBy(_._1).values.forall(
      _.map(_._2).sorted == Seq(1, 2)))
  }

  test("bigram LM score: common sequences outscore rare ones") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat"), (2L, "the cat"), (3L, "the dog"),
      (4L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // P(cat|the) = 2/3 → ln ≈ −0.4055; P(dog|the) = 1/3 → ln ≈ −1.0987
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2 - (-0.4055)) < 1e-9)
    assert(out(2L)._2 == out(1L)._2)
    assert(math.abs(out(3L)._2 - (-1.0987)) < 1e-9)
    assert(out(1L)._2 > out(3L)._2)
    // single-token doc: no bigrams, score pinned to 0
    assert(out(4L) == (0L, 0.0))
  }

  test("tfidf guards reserved column names") {
    import spark.implicits._
    val df = Seq((1L, "x", 9L)).toDF("doc_id", "text", "tf")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.tfidfTopTerms(df, "doc_id", "text")
    }
    assert(e.getMessage.contains("tf"))
  }

  test("passage dedup removes repeated boilerplate, keeps first host") {
    import spark.implicits._
    // 8-token boilerplate block shared by docs 1 and 2; doc 3 is all
    // boilerplate and must survive as an empty document
    val boiler = "all rights reserved contact us terms of service"
    val df = Seq(
      (1L, s"unique alpha beta gamma delta epsilon zeta eta $boiler"),
      (2L, s"$boiler other words here make a second passage"),
      (3L, boiler)).toDF("doc_id", "text")
    val out = Dedup.passageDedup(df, "doc_id", "text", passageTokens = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 owns the boilerplate's first occurrence (passage idx 1) —
    // everything survives
    assert(out(1L)._2 == 2L && out(1L)._3 == 2L)
    assert(out(1L)._1.endsWith(boiler))
    // doc 2's copy of the boilerplate is removed, its unique tail stays
    assert(out(2L)._1 == "other words here make a second passage")
    assert(out(2L)._2 == 2L && out(2L)._3 == 1L)
    // doc 3 is pure boilerplate → empty text, zero kept
    assert(out(3L)._1 == "" && out(3L)._3 == 0L)
  }

  test("passage dedup is identity on a dup-free corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = Dedup.passageDedup(df, "doc_id", "text", passageTokens = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "one two three four five six seven eight nine")
    assert(out(2L) == "alpha beta gamma")
  }

  test("trigram similarity follows pg_trgm padding semantics") {
    import spark.implicits._
    // pg_trgm('word'): {'  w',' wo','wor','ord','rd '} — 5 trigrams
    val tg = Seq("word").toDF("s")
      .select(Trigram.trigrams(col("s"))).head.getSeq[String](0).toSet
    assert(tg === Set("  w", " wo", "wor", "ord", "rd "))
    val sims = Seq(
      ("word", "word"), ("word", "two words"), ("word", "")).toDF("a", "b")
      .select(Trigram.similarity(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    assert(sims(0) === 1.0)
    assert(sims(1) > 0 && sims(1) < 1.0)
    assert(sims(2) === 0.0) // empty side → 0, like pg_trgm
  }

  test("trigram pair search equals brute force, with and without maxDf") {
    import spark.implicits._
    val df = Seq((1L, "alpha centauri"), (2L, "alpha centuri"),
      (3L, "beta pictoris"), (4L, "alphacentauri")).toDF("id", "s")
    def pairs(maxDf: Option[Long]) =
      Trigram.similarPairs(df, "id", "s", threshold = 0.4, maxDf = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = {
      val rows = df.collect().map(r => r.getLong(0) -> r.getString(1))
      (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
        sim = Seq((sa, sb)).toDF("a", "b")
          .select(Trigram.similarity(col("a"), col("b"))).head.getDouble(0)
        if sim >= 0.4
      } yield (ia, ib)).toSet
    }
    assert(pairs(None) === brute)
    assert(brute.contains((1L, 2L))) // the typo pair must be found
    // a generous cap keeps every pair; exact sims are unchanged
    assert(pairs(Some(100L)) === brute)
  }

  test("rrfFuse: docs in both lists outrank single-list docs; exact contributions") {
    import spark.implicits._
    // query 1: doc 10 is rank 3 in BOTH lists; doc 20 is rank 1 in one
    // list only — 2/(60+3) > 1/(60+1), so consensus wins
    val lex = Seq((1L, 10L, 3), (1L, 20L, 1), (1L, 30L, 2))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 10L, 3), (1L, 40L, 1), (1L, 30L, 5))
      .toDF("query_id", "doc_id", "rank")
    val out = TextAnalysis.rrfFuse(Seq(lex, dense),
        "query_id", "doc_id", "rank", kConst = 60, topK = 10)
      .collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getLong(3), r.getInt(4)))
      .toMap
    def c(rank: Int): Double = math.floor(1.0 / (60.0 + rank) * 1e9) / 1e9
    // doc 30: ranks 2 and 5 in the two lists → also two contributions
    assert(out(10L)._2 === 2L && out(30L)._2 === 2L)
    assert(out(20L)._2 === 1L && out(40L)._2 === 1L)
    // fused order: 10 (2/63 ≈ .03175) > 30 (1/62+1/65 ≈ .03151) — both
    // beat every single-list doc
    assert(out(10L)._3 === 1 && out(30L)._3 === 2)
    assert(out(20L)._3 === 3 && out(40L)._3 === 4) // 1/(61) ties → doc asc
    // score is the floor-quantized decimal sum, bit-exact
    assert(math.abs(out(10L)._1 - (c(3) + c(3))) < 1e-12)
    assert(math.abs(out(40L)._1 - c(1)) < 1e-12)
  }

  test("fingerprint is whitespace/case insensitive") {
    import spark.implicits._
    val df = Seq(("A  B\tC"), ("a b c")).toDF("text")
    val fps = df.select(TextAnalysis.fingerprint(col("text")))
      .collect().map(_.getString(0)).distinct
    assert(fps.length === 1)
  }

  test("exact dedup groups duplicate texts") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "SAME   text"), (3L, "other"))
      .toDF("doc_id", "text")
    val g = Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(g.length === 2)
    val dup = g.find(_.getLong(2) === 2L).get
    assert(dup.getLong(1) === 1L) // keeper = min id
  }

  test("minhash LSH finds a near-duplicate pair") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    val df = Seq(
      (1L, base),
      (2L, base + " indeed"),       // near-dup of 1
      (3L, "completely different content about database engines and query optimizers running fast"))
      .toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(df, "doc_id", "text",
      numHashes = 16, bands = 8, ngramN = 3).collect()
    val pairs = cands.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("short and empty docs survive ngram/minhash under ANSI mode") {
    import spark.implicits._
    // Spark 4 defaults ANSI on: element_at past the array end errors, so
    // docs with < n tokens must never reach the sliding window.
    val df = Seq(
      (1L, "en", "word"),                       // 1 token < n=3
      (2L, "en", "word"),                       // dup of the short doc
      (3L, "en", "two tokens"),
      (4L, "en", ""),                           // empty
      (5L, "en", "a full five token document here"))
      .toDF("doc_id", "lang", "text")
    val cands = Dedup.minhashCandidates(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    // empty doc yields no grams, so it pairs with nothing
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard: identical=1, disjoint absent") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "alpha beta gamma delta epsilon zeta"),
      (2L, "en", "alpha beta gamma delta epsilon zeta"),
      (3L, "en", "one two three four five six"))
      .toDF("doc_id", "lang", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(!pairs.contains((1L, 3L)))
  }

  test("simhash: identical docs share signature, different do not") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark catalyst optimizer rewrites logical plans"),
      (2L, "spark catalyst optimizer rewrites logical plans"),
      (3L, "completely unrelated words about gardening and cooking"))
      .toDF("doc_id", "text")
    val g = Dedup.simhashGroups(df, "doc_id", "text").collect()
    assert(g.length === 2)
    assert(g.find(_.getLong(2) === 2L).isDefined)
  }

  test("cosine: orthogonal=0, identical=1") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
  }

  test("brute-force topK returns k ranked neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val res = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "qid", "qv", 3).collect()
    assert(res.length === 3)
    assert(res.map(_.getAs[Int]("rank")).toSeq.sorted === Seq(1, 2, 3))
    // ranks ordered by similarity
    val byRank = res.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("LSH signature buckets identical vectors together") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val sigs = df.select(
      Similarity.hyperplaneSignature(col("embedding"), 8, dims = 3))
      .collect().map(_.getString(0))
    assert(sigs(0) === sigs(1))
    assert(sigs(0).length === 8)
  }

  test("codegen VecDot/SignBits are bit-identical to the declarative forms") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1),
        Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      Similarity.dot(col("a"), col("b")).as("fast"),
      Similarity.dotDeclarative(col("a"), col("b")).as("slow"),
      Similarity.signBits(col("a"), 12, dims = 16).as("fastBits"),
      Similarity.signBitsDeclarative(col("a"), 12, dims = 16).as("slowBits"))
      .collect()
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(r.getString(2) === r.getString(3))
      assert(r.getString(2).length === 12)
    }
  }

  test("bm25Rank ranks rarer and denser term matches higher") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare rare common filler filler"),
      (2L, "rare common filler filler filler"),
      (3L, "common common filler filler filler"),
      (4L, "filler filler filler filler filler")).toDF("doc_id", "text")
    val queries = Seq((10L, "rare common")).toDF("query_id", "qtext")
    val out = TextAnalysis.bm25Rank(docs, "doc_id", "text",
      queries, "query_id", "qtext", k = 4)
      .orderBy(col("rank")).collect()
    // doc 1 (rare x2) > doc 2 (rare x1) > doc 3 (common only);
    // doc 4 matches no query term and must be absent
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2, 3))
    assert(out(0).getDouble(2) > out(1).getDouble(2))
    assert(out(1).getDouble(2) > out(2).getDouble(2))
  }

  test("codegen MatProject is bit-identical to the declarative randomProject") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 40).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v")
    val cmp = df.select(
      Similarity.randomProject(col("v"), 16, 64).as("fast"),
      Similarity.randomProjectDeclarative(col("v"), 16, 64).as("slow"))
      .collect()
    cmp.foreach { r =>
      val fast = r.getSeq[Double](0)
      val slow = r.getSeq[Double](1)
      assert(fast.length === 16)
      fast.zip(slow).foreach { case (f, s) =>
        assert(java.lang.Double.doubleToLongBits(f) ===
          java.lang.Double.doubleToLongBits(s))
      }
    }
  }

  test("codegen NearestCell matches the declarative array_min argmin") {
    import spark.implicits._
    import org.apache.spark.sql.graftglue.Glue.{column => exprCol, expression => colExpr}
    val rnd = new scala.util.Random(13)
    val cents = Array.fill(16)(Array.fill(24)(rnd.nextDouble() * 2 - 1))
    val rows = (1 to 80).map(i =>
      (i.toLong, Array.fill(24)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v")
    val declarative = array_min(array(cents.zipWithIndex.toIndexedSeq.map {
      case (c, i) =>
        val cNormSq = c.map(x => x * x).sum
        struct((lit(cNormSq) - lit(2.0) * Similarity.dot(col("v"), lit(c)))
          .as("score"), lit(i).as("cell"))
    }: _*)).getField("cell")
    val cmp = df.select(
      exprCol(graft.expressions.NearestCell(colExpr(col("v")), cents)).as("fast"),
      declarative.as("slow")).collect()
    cmp.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // exercise the tie path: two identical centroids must keep the
    // smaller cell index, matching array_min's struct ordering
    val tied = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val t = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "v")
      .select(exprCol(graft.expressions.NearestCell(colExpr(col("v")), tied)))
      .head.getInt(0)
    assert(t === 0)
  }

  test("MatProject fails loudly on a dims mismatch") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      df.select(Similarity.randomProject(col("v"), 4, 64)).collect()
    }
    assert(e.getMessage.contains("dims") ||
      e.getCause != null && e.getCause.getMessage.contains("dims"))
  }

  test("VecDot null/length semantics mirror zip_with") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    assert(df.select(Similarity.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("codegen PortableMinHash/PortableSimHash match the declarative forms") {
    import spark.implicits._
    import org.apache.spark.sql.graftglue.Glue.{column => exprCol, expression => colExpr}
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "word"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.wordNgrams(col("text")).as("ng"),
        TextAnalysis.tokens(lower(col("text"))).as("toks"))
    val cmp = df.select(
      exprCol(graft.expressions.PortableMinHash(colExpr(col("ng")), 16)).as("fast"),
      col("ng"), col("toks"),
      exprCol(graft.expressions.PortableSimHash(colExpr(col("toks")), 60)).as("fastSim"))
      .select(col("fast"),
        Dedup.minhashFromHashPairsPortable(
          Dedup.portableGramHashPairs(transform(col("ng"), g => md5(g))), 16).as("slow"),
        col("fastSim"),
        Similarity.simhashFromHashes(
          transform(col("toks"),
            t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")), 60).as("slowSim"))
      .collect()
    cmp.foreach { r =>
      assert(r.getSeq[Any](0) === r.getSeq[Any](1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("fused ngram-minhash kernel equals the staged gram pipeline") {
    import spark.implicits._
    import org.apache.spark.sql.graftglue.Glue.{column => exprCol, expression => colExpr}
    val df = Seq(
      "the quick brown fox jumps over the lazy dog tonight",
      "word", "two tokens", "",
      "dup dup dup dup dup")                  // duplicate grams
      .toDF("text")
      .select(TextAnalysis.tokens(lower(col("text"))).as("toks"))
    val cmp = df.select(
      exprCol(graft.expressions.PortableNgramMinHash(
        colExpr(col("toks")), 3, 16)).as("fused"),
      Dedup.wordNgramsFromTokens(col("toks"), 3).as("ng"))
      .select(col("fused"),
        exprCol(graft.expressions.PortableMinHash(
          colExpr(col("ng")), 16)).as("staged"))
      .collect()
    cmp.foreach(r => assert(r.getSeq[Any](0) === r.getSeq[Any](1)))
  }

  test("portable md5-derived 60-bit hash matches the reference value") {
    import spark.implicits._
    // DuckDB: CAST('0x' || substr(md5('a'),1,15) AS BIGINT) = 57446577476672362
    val got = Seq("a").toDF("t")
      .select(Similarity.tokenHashesPortable(col("t")).getItem(0))
      .collect()(0).getLong(0)
    assert(got === 57446577476672362L)
  }

  test("banded sign-LSH: exact dups collide in every band; near-dups in some") {
    import spark.implicits._
    val v = Array.tabulate(8)(i => (i + 1).toFloat / 8f)
    val nearDup = v.clone(); nearDup(0) = v(0) + 0.02f
    val far = Array.tabulate(8)(i => ((i % 2) * 2 - 1).toFloat)
    val df = Seq((1L, v), (2L, v), (3L, nearDup), (4L, far))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(df, "vec_id", "embedding",
      threshold = 0.95, bands = 4, rowsPerBand = 4, dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))       // exact dup: guaranteed
    assert(pairs.contains((1L, 3L)))       // near dup, cos ≈0.9996
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("banded lshTopK recovers planted high-cos neighbors") {
    import spark.implicits._
    val base = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    def pert(eps: Float) = base.zipWithIndex.map { case (x, i) =>
      x + eps * (if (i % 2 == 0) 1 else -1) }
    val corpus = Seq(
      (10L, base), (11L, pert(0.01f)), (12L, pert(0.02f)),
      (13L, Array.tabulate(16)(i => math.cos(3 * i + 2).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, base)).toDF("query_id", "qvec")
    val got = Similarity.lshTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 2, bands = 6, rowsPerBand = 4,
      dims = 16).collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id")))
    assert(got.sortBy(_._1).map(_._2).take(2).toSeq === Seq(11L, 12L))
  }

  test("char shingles catch CJK near-dups that word grams cannot") {
    import spark.implicits._
    // unsegmented text: whitespace tokenization sees ONE token, so
    // word n-grams degenerate; char k-shingles stay discriminative
    val zh1 = "机器学习模型在大规模数据集上训练需要分布式计算框架支持"
    val zh2 = "机器学习模型在大规模数据集上训练需要分布式计算框架帮助" // 1-char edit
    val zh3 = "完全不同的内容讨论烹饪食谱和旅行计划与前文毫无关系可言"
    val df = Seq((1L, zh1), (2L, zh2), (3L, zh3)).toDF("doc_id", "text")
    val sets = df.select(col("doc_id"),
      Dedup.shingles(col("text"), k = 3).as("sh"))
    val l = sets.alias("l"); val r = sets.alias("r")
    val sims = l.join(r, col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id"), col("r.doc_id"),
        Dedup.jaccard(col("l.sh"), col("r.sh")).as("j"))
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2)))
      .toMap
    assert(sims((1L, 2L)) > 0.7)   // near-dup detected
    assert(sims((1L, 3L)) < 0.1 && sims((2L, 3L)) < 0.1)
    // and the banded candidate generator finds exactly that pair
    val cands = Dedup.minhashCandidatesChars(df, "doc_id", "text",
      k = 3, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("native WordNgrams is bit-identical to the declarative gram pipeline") {
    import spark.implicits._
    val docs = Seq(
      "The quick brown FOX jumps over the lazy dog",
      "a b c a b c a b c",            // duplicate grams → distinct order
      "one two",                      // shorter than n → whole doc
      "single",
      "",                             // empty → one empty gram
      "   padded   whitespace   ",
      "\tTab\tPadded body here\n",    // Spark trim strips ONLY 0x20 —
      "\n\n lines \r\n mixed \t",     // tabs/newlines survive as empty toks
      "x " * 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Seq(2, 3, 4).foreach { n =>
      val declarative = docs.select(col("doc_id"),
        Dedup.wordNgrams(col("text"), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      val native = docs.select(col("doc_id"),
        Dedup.wordNgramsNative(col("text"), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      assert(native === declarative, s"n=$n")
    }
  }

  test("native WordNgramsAll/WordChunks are bit-identical to the " +
      "declarative stream forms") {
    import spark.implicits._
    val docs = Seq(
      "The quick brown FOX jumps over the lazy dog",
      "a b c a b c a b c",            // duplicates KEPT (non-distinct)
      "one two", "single", "",
      "   padded   whitespace   ",
      "\tTab\tPadded body here\n",
      "x " * 50).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // all-ngrams vs the declarative sliding window over split tokens
    Seq((1, true), (2, true), (2, false), (3, false)).foreach {
      case (n, lc) =>
        val base = if (lc) lower(trim(col("text"))) else trim(col("text"))
        val toks = split(base, "\\s+")
        val declarative = docs.select(col("doc_id"),
            when(size(toks) >= n,
              transform(sequence(lit(0), size(toks) - n),
                i => concat_ws(" ",
                  (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
              .otherwise(array().cast("array<string>")).as("g"))
          .as[(Long, Seq[String])].collect().toMap
        val native = docs.select(col("doc_id"),
            graft.functions.TextAnalysis
              .wordNgramsAllNative(col("text"), n, lc).as("g"))
          .as[(Long, Seq[String])].collect().toMap
        assert(native === declarative, s"n=$n lowercase=$lc")
    }
    // chunks vs the declarative slice windows
    Seq(2, 5, 8).foreach { p =>
      val toks = split(trim(col("text")), "\\s+")
      val declarative = docs.select(col("doc_id"),
          transform(
            sequence(lit(0),
              greatest(ceil(size(toks) / lit(p.toDouble)).cast("int") - 1,
                lit(0))),
            i => concat_ws(" ", slice(toks, i * p + 1, lit(p)))).as("c"))
        .as[(Long, Seq[String])].collect().toMap
      val native = docs.select(col("doc_id"),
          graft.functions.TextAnalysis
            .wordChunksNative(col("text"), p).as("c"))
        .as[(Long, Seq[String])].collect().toMap
      assert(native === declarative, s"p=$p")
    }
  }

  test("containmentPairs: lossless prefix filter equals all-pairs truth") {
    import spark.implicits._
    // w1..w12 distinct tokens. doc 1 (12 tokens → 10 grams) is fully
    // contained in doc 2 (doc 1 + tail). doc 3 shares exactly 9 of
    // doc 1's 10 grams (drops the last token) — containment 9/10,
    // the exact ⌊(1−t)·n⌋ float-boundary case at t = 0.9. doc 4 is
    // disjoint. doc 5 is a short quote (3 tokens → 1 gram) inside
    // doc 2 — the Jaccard-invisible case.
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " t1 t2 t3 t4"),
      (3L, (1 to 11).map(i => s"w$i").mkString(" ")),
      (4L, "x1 x2 x3 x4 x5 x6"),
      (5L, "w3 w4 w5")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 0.9, 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth by brute force over all directed pairs
    val sets = docs.select(col("doc_id"),
        Dedup.wordNgrams(col("text"), 3).as("ng"))
      .as[(Long, Seq[String])].collect().toMap
    val truth = (for {
      a <- sets.keys; b <- sets.keys if a != b
      inter = sets(a).toSet.intersect(sets(b).toSet).size
      c = math.floor(inter.toDouble / sets(a).size * 10000) / 10000
      if c >= 0.9
    } yield (a, b)).toSet
    assert(got === truth)
    // the boundary pair (3 shares 9/9 of its grams with 1? no — check
    // direction 1→3: 9 of 10) and the quote 5→2 must both be present
    assert(got.contains((1L, 2L)) && got.contains((5L, 2L)))
    assert(got.contains((1L, 3L)) === (sets(1L).toSet
      .intersect(sets(3L).toSet).size.toDouble / sets(1L).size >= 0.9))
  }

  test("containmentPairs property: equals brute force on random overlapping docs") {
    import spark.implicits._
    // random docs built from a small token pool so substantial gram
    // sharing happens by chance; plus explicit prefix-embeddings
    val rnd = new scala.util.Random(9)
    val pool = (1 to 40).map(i => s"w$i")
    def randDoc(len: Int) =
      (1 to len).map(_ => pool(rnd.nextInt(pool.length))).mkString(" ")
    val bases = (1L to 40L).map(i => (i, randDoc(6 + rnd.nextInt(20))))
    val embedded = bases.filter(_._1 % 7 == 0).map { case (id, t) =>
      (id + 500L, t + " " + randDoc(3))
    }
    val docs = (bases ++ embedded).toDF("doc_id", "text")
    Seq(0.7, 0.9, 1.0).foreach { thr =>
      val got = Dedup.containmentPairs(docs, "doc_id", "text", thr, 3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = docs.select(col("doc_id"),
          Dedup.wordNgramsNative(col("text"), 3).as("ng"))
        .as[(Long, Seq[String])].collect().toMap
      val truth = (for {
        a <- sets.keys; b <- sets.keys
        if a != b && sets(a).nonEmpty
        inter = sets(a).toSet.intersect(sets(b).toSet).size
        c = math.floor(inter.toDouble / sets(a).size * 10000) / 10000
        if c >= thr
      } yield (a, b)).toSet
      assert(got === truth, s"threshold $thr")
    }
  }

  test("LSH-verified jaccard equals all-pairs on high-similarity docs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight again"
    val df = Seq(
      (1L, base), (2L, base), (3L, base + " slightly changed tail here"),
      (4L, "completely different content about database engines and optimizers"))
      .toDF("doc_id", "text")
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = norm(Dedup.ngramJaccardPairsLsh(df, "doc_id", "text", 0.5,
      portable = true).collect())
    val exact = norm(Dedup.ngramJaccardAllPairs(df, "doc_id", "text", 0.5)
      .collect())
    assert(lsh === exact)
    assert(lsh.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }

  test("simhash Hamming near-dups: pigeonhole blocks find close pairs only") {
    import spark.implicits._
    val base = "spark catalyst optimizer rewrites logical plans into physical plans with codegen stages enabled"
    val df = Seq(
      (1L, base),
      (2L, base),                                   // identical: hamming 0
      (3L, base.replace("codegen", "compiled")),    // one-token edit: small distance
      (4L, "completely unrelated words about gardening cooking and travel plans tomorrow"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", radius = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
    // exactness: every emitted pair is within the radius
    assert(pairs.values.forall(_ <= 3))
  }

  test("simhash Hamming: non-divisor radii use floor/ceil block widths") {
    import spark.implicits._
    val base = "spark catalyst optimizer rewrites logical plans into physical plans with codegen stages enabled"
    val df = Seq(
      (1L, base),
      (2L, base.replace("codegen", "compiled")),
      (3L, "completely unrelated words about gardening cooking and travel plans tomorrow"))
      .toDF("doc_id", "text")
    // radius 6 → 7 blocks over 60 bits (8*4 + 9*3 — not a divisor);
    // pigeonhole still guarantees recall within the radius, and larger
    // radii must find at least everything smaller radii find
    for (radius <- Seq(1, 4, 6)) {
      val pairs = Dedup.simhashNearDups(df, "doc_id", "text", radius)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
      assert(pairs.values.forall(_ <= radius), s"radius $radius")
      assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
    }
    // the one-token edit pair must appear once the radius covers its
    // true distance (small by construction; assert via the exact value)
    val all = Dedup.simhashNearDups(df, "doc_id", "text", radius = 12)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(all.contains((1L, 2L)))
  }

  test("ivfTrain separates well-clustered data and is deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // three tight, well-separated clusters in 8 dims
    val centers = Seq(
      Array.fill(8)(5f), Array.fill(8)(-5f),
      Array.tabulate(8)(i => if (i % 2 == 0) 5f else -5f))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 40
    } yield (ci * 100L + j, c.map(_ + rnd.nextFloat() * 0.5f))
    val df = rows.toDF("vec_id", "embedding")
    val trained = Similarity.ivfTrain(df, "vec_id", "embedding",
      nlist = 3, iters = 3)
    val trained2 = Similarity.ivfTrain(df.repartition(7), "vec_id",
      "embedding", nlist = 3, iters = 3)
    // deterministic across partitioning layouts (decimal accumulation)
    assert(trained.map(_.toSeq).toSeq === trained2.map(_.toSeq).toSeq)
    // after training, each true cluster center is closest to a DISTINCT
    // trained centroid (the sampled init has all seeds in cluster 0)
    def nearest(v: Array[Float]): Int =
      trained.zipWithIndex.minBy { case (c, _) =>
        c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum }._2
    assert(centers.map(nearest).distinct.size === 3)
  }

  test("ivfTrainTwoLevel: sampled training, movement stats converge") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array.fill(8)(5f), Array.fill(8)(-5f),
      Array.tabulate(8)(i => if (i % 2 == 0) 5f else -5f))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 60
    } yield (ci * 100L + j, c.map(_ + rnd.nextFloat() * 0.5f))
    val df = rows.toDF("vec_id", "embedding")
    // oversample=8 (farthest-point init) — this fixture IS clustered,
    // the geometry where farthest-point coverage is right
    val (trained, stats) = Similarity.ivfTrainTwoLevel(df, "vec_id",
      "embedding", nlist = 3, iters = 4, oversample = 8, wprobe = 1,
      sampleSize = 120)
    // sampled + wprobe=1 training still separates the clusters
    def nearest(v: Array[Float]): Int =
      trained.zipWithIndex.minBy { case (c, _) =>
        c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum }._2
    assert(centers.map(nearest).distinct.size === 3)
    // movement stats: one row per iteration; on tight clusters the
    // centroids settle — the last iteration moves (far) less than the
    // first
    assert(stats.length === 4)
    assert(stats.last.maxMoveSq < stats.head.maxMoveSq ||
      stats.last.maxMoveSq < 1e-6)
    // deterministic across partitionings (hash-ordered sample +
    // decimal means)
    val (trained2, _) = Similarity.ivfTrainTwoLevel(df.repartition(11),
      "vec_id", "embedding", nlist = 3, iters = 4, oversample = 8,
      wprobe = 1, sampleSize = 120)
    assert(trained.map(_.toSeq).toSeq === trained2.map(_.toSeq).toSeq)
    // stats table renders
    val tbl = Similarity.lloydStatsTable(spark, stats).collect()
    assert(tbl.length === 4)
  }

  test("trainers tolerate null vectors (the old posexplode drop semantics)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val centers = Seq(Array.fill(8)(5f), Array.fill(8)(-5f))
    val rows: Seq[(Long, Array[Float])] = (for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 30
    } yield (ci * 100L + j, c.map(_ + rnd.nextFloat() * 0.5f))) ++
      Seq((900L, null: Array[Float]), (901L, null: Array[Float]))
    val df = rows.toDF("vec_id", "embedding")
    val clean = df.filter(col("embedding").isNotNull)
    // null rows are dropped, not crashed on — and training equals
    // training on the pre-filtered corpus exactly
    val withNulls = Similarity.ivfTrain(df, "vec_id", "embedding",
      nlist = 2, iters = 2, oversample = 8)
    val noNulls = Similarity.ivfTrain(clean, "vec_id", "embedding",
      nlist = 2, iters = 2, oversample = 8)
    assert(withNulls.map(_.toSeq).toSeq === noNulls.map(_.toSeq).toSeq)
    val (two, _) = Similarity.ivfTrainTwoLevel(df, "vec_id", "embedding",
      nlist = 2, iters = 2, oversample = 8)
    assert(two.map(_.toSeq).toSeq === noNulls.map(_.toSeq).toSeq)
    // kmeanspar init: null rows excluded from sampling and weighting
    val init = Similarity.kmeansParInit(df, "vec_id", "embedding",
      nlist = 2)
    val init2 = Similarity.kmeansParInit(clean, "vec_id", "embedding",
      nlist = 2)
    assert(init.map(_.toSeq).toSeq === init2.map(_.toSeq).toSeq)
  }

  test("kmeansParInit: deterministic, nlist centroids, balanced start") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // four tight clusters; k-means|| must place exactly one seed near
    // each (farthest-point over NOISE picks corners — the pathology
    // this init exists to avoid; here data IS clustered so both
    // coverage and balance are checkable)
    val centers = Seq(
      Array.fill(8)(6f), Array.fill(8)(-6f),
      Array.tabulate(8)(i => if (i % 2 == 0) 6f else -6f),
      Array.tabulate(8)(i => if (i % 2 == 0) -6f else 6f))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 50
    } yield (ci * 1000L + j, c.map(_ + rnd.nextFloat() * 0.4f))
    val df = rows.toDF("vec_id", "embedding")
    val init = Similarity.kmeansParInit(df, "vec_id", "embedding",
      nlist = 4)
    assert(init.length === 4 && init.forall(_.length === 8))
    // each true cluster is covered by a DISTINCT init centroid
    def nearest(v: Array[Float]): Int =
      init.zipWithIndex.minBy { case (c, _) =>
        c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum }._2
    assert(centers.map(c => nearest(c)).distinct.size === 4)
    // deterministic across partitioning layouts
    val init2 = Similarity.kmeansParInit(df.repartition(13), "vec_id",
      "embedding", nlist = 4)
    assert(init.map(_.toSeq).toSeq === init2.map(_.toSeq).toSeq)
    // and usable as the ivfTrainTwoLevel init
    val (trained, _) = Similarity.ivfTrainTwoLevel(df, "vec_id",
      "embedding", nlist = 4, iters = 2, init = "kmeanspar")
    assert(trained.length === 4)
  }

  test("ivfCentroids: nlist-row TakeOrdered selection, never a full-corpus collect") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i, Array.fill(8)(i.toFloat % 7)))
      .toDF("vec_id", "embedding")
    // the driver-side result is exactly nlist rows...
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", 16)
    assert(cents.length === 16 && cents.forall(_.length === 8))
    // ...selected by a TakeOrdered plan (per-partition top-nlist, only
    // nlist rows reach the driver) — not orderBy+limit(n) over the corpus
    val plan = Similarity.centroidCandidates(df, "vec_id", "embedding", 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject(limit=16"), plan)
    // deterministic across partitioning layouts
    val cents2 = Similarity.ivfCentroids(df.repartition(13), "vec_id",
      "embedding", 16)
    assert(cents.map(_.toSeq).toSeq === cents2.map(_.toSeq).toSeq)
  }

  test("IVF topK recovers planted neighbors; nprobe=nlist equals brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val naturals = (1L to 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    // plant 2 near-copies of every 20th vector
    val planted = naturals.filter(_._1 % 20 == 0).flatMap { case (id, v) =>
      Seq(1, 2).map(j => (id + 1000L * j,
        v.map(x => x + 0.005f * j * (if (x > 0) 1 else -1))))
    }
    val corpus = (naturals ++ planted).toDF("vec_id", "embedding")
    val queries = naturals.filter(_._1 % 20 == 0)
      .toDF("query_id", "qvec")
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8)
    assert(cents.length === 8 && cents.forall(_.length === 16))
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"))).toSet
    val ivf = topSet(Similarity.ivfTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 2, cents, nprobe = 3))
    // the planted near-copies are each query's true top-2
    queries.collect().map(_.getLong(0)).foreach { q =>
      assert(ivf.contains((q, 1, q + 1000L)), s"query $q missing rank-1")
      assert(ivf.contains((q, 2, q + 2000L)), s"query $q missing rank-2")
    }
    // probing every cell degenerates to exact brute force
    val all = topSet(Similarity.ivfTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 2, cents, nprobe = 8))
    val bf = topSet(Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 2))
    assert(all === bf)
    // RBO audit (the ranked-overlap number beyond rank-1 recall): the
    // approximate ranking's RBO@10 vs exact rises with nprobe and is
    // exactly 1.0 at full probe (identical rankings)
    def lists(nprobe: Int) = Similarity.ivfTopK(corpus, "vec_id",
        "embedding", queries, "query_id", "qvec", k = 10, cents, nprobe)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    val exact10 = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 10)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    def rboVals(ap: org.apache.spark.sql.DataFrame) =
      graft.functions.TextAnalysis.rboOverlap(exact10, ap,
        "query_id", "doc_id", "rank", p = 0.9, k = 10)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Double]("rbo")).toMap
    val rboFull = rboVals(lists(8))
    assert(rboFull.values.forall(v => v >= 0.6512), // Σ full-overlap @10
      s"full-probe RBO must be the maximal self-RBO, got $rboFull")
    val rboPartial = rboVals(lists(2))
    queries.collect().map(_.getLong(0)).foreach { q =>
      assert(rboPartial.getOrElse(q, 0.0) <= rboFull(q) + 1e-9,
        s"query $q: partial-probe RBO exceeds full-probe")
    }
  }

  test("IVF index persists as tables, appends deltas, searches identically") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val base = (1L to 150L).map(i =>
      (i, Array.fill(16)(rnd.nextDouble() * 2 - 1)))
    val delta = base.filter(_._1 % 15 == 0).map { case (id, v) =>
      (id + 5000L, v.map(x => x + 0.004 * (if (x > 0) 1 else -1)))
    }
    val baseDf = base.toDF("vec_id", "embedding")
    val deltaDf = delta.toDF("vec_id", "embedding")
    val queries = base.filter(_._1 % 15 == 0).toDF("query_id", "qvec")
    val cents = Similarity.ivfCentroids(baseDf, "vec_id", "embedding", 6)

    // centroid table round-trips the quantizer exactly
    val back = Similarity.centroidsFromTable(
      Similarity.centroidsTable(spark, cents))
    assert(back.length === cents.length)
    cents.indices.foreach(i => assert(back(i).sameElements(cents(i))))

    // appended assignments == full rebuild under the frozen quantizer
    val full = Similarity.ivfAssignments(baseDf.union(deltaDf),
      "vec_id", "embedding", cents)
    val appended = Similarity.ivfAssignments(baseDf, "vec_id", "embedding", cents)
      .union(Similarity.ivfAssignments(deltaDf, "vec_id", "embedding", cents))
    def cellsOf(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cellsOf(appended) === cellsOf(full))

    // parquet round-trip of BOTH tables; indexed search over the
    // stored+appended index equals the direct in-memory ivfTopK
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.centroidsTable(spark, cents)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    appended.write.mode("overwrite").parquet(s"$dir/assignments")
    val storedCents = Similarity.centroidsFromTable(
      spark.read.parquet(s"$dir/centroids"))
    val storedIndex = spark.read.parquet(s"$dir/assignments")
    def topSet2(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"))).toSet
    val indexed = topSet2(Similarity.ivfTopKIndexed(storedIndex,
      "vec_id", "embedding", queries, "query_id", "qvec",
      k = 2, storedCents, nprobe = 3))
    val direct = topSet2(Similarity.ivfTopK(baseDf.union(deltaDf),
      "vec_id", "embedding", queries, "query_id", "qvec",
      k = 2, cents, nprobe = 3))
    assert(indexed === direct)
    // the appended near-copy is each query's rank-1 neighbor
    queries.collect().map(_.getLong(0)).foreach { q =>
      assert(indexed.contains((q, 1, q + 5000L)), s"query $q missing delta twin")
    }
  }

  test("int8 quantization: codes integral in [-127,127], extremes hit ±127") {
    import spark.implicits._
    val d = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = d.select(col("vec_id"), col("embedding"),
        Similarity.maxAbs(col("embedding")).as("mx"))
      .select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding"), col("mx")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == Seq(64.0, -127.0, 32.0, 0.0))
    assert(out(2L) == Seq(0.0, 0.0, 0.0, 0.0))   // zero vector: no NaN
    assert(out.values.flatten.forall(v => v == math.floor(v) && v.abs <= 127))
  }

  test("quantizedTopK ranks like brute force on well-separated vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 150L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 30 === 0)
      .toDF("query_id", "qvec")
    def sets(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
      .toSet
    val qz = Similarity.quantizedTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10)
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10)
    // int8 error is ~1/254 per element; on random 16-dim data the top-10
    // sets agree almost everywhere — require >= 80% overlap
    val inter = sets(qz).intersect(sets(bf)).size.toDouble
    assert(inter / sets(bf).size >= 0.8, s"overlap ${inter / sets(bf).size}")
    // determinism: re-run is identical including ranks
    val again = Similarity.quantizedTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10)
    assert(qz.collect().map(_.toSeq).toSeq ==
      again.collect().map(_.toSeq).toSeq)
  }

  test("lowerJoin matches ciJoin on ASCII and broadcast-hash-joins") {
    import spark.implicits._
    val a = Seq((1L, "Alpha"), (2L, "BETA")).toDF("id", "name")
    val b = Seq((10L, "alpha"), (20L, "beta")).toDF("id2", "name")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaCollation = pairs(Citext.ciJoin(a, b, Seq("name")))
    val viaLower = pairs(Citext.lowerJoin(a, b, Seq("name")))
    assert(viaCollation === Set((1L, 10L), (2L, 20L)))
    assert(viaLower === viaCollation)
    val plan = Citext.lowerJoin(a, b, Seq("name"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("label centroids: exact element-wise means per label") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 6.0f)),
      (1, Array(-1.0f, 0.5f))).toDF("label", "embedding")
    val out = Similarity.labelCentroids(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out((0, 0)) === (2L, 2.0))   // (1+3)/2
    assert(out((0, 1)) === (2L, 4.0))   // (2+6)/2
    assert(out((1, 0))._2 === -1.0)
    assert(out((1, 1))._2 === 0.5)
  }

  test("multimodal: decode plumbing tags failures instead of aborting") {
    import spark.implicits._
    val df = Seq(
      (1L, "real payload bytes".getBytes("UTF-8")),
      (2L, Array.empty[Byte])).toDF("id", "payload")
    val out = Multimodal.decodeMeta(df, "payload").collect()
    val meta = out.map(r => r.getLong(0) ->
      r.getStruct(r.length - 1)).toMap
    assert(meta(1L).getBoolean(4)) // decode_ok
    assert(!meta(2L).getBoolean(4)) // empty payload → tagged, not thrown
    assert(meta(2L).getString(5) != null)
  }

  test("multimodal: custom decoder factory opens per partition and closes") {
    import spark.implicits._
    CountingDecoderFactory.reset()
    val df = Seq(
      (1L, "abc".getBytes("UTF-8")), (2L, "def".getBytes("UTF-8")),
      (3L, "ghi".getBytes("UTF-8")), (4L, "jkl".getBytes("UTF-8")))
      .toDF("id", "payload").repartition(2)
    val out = Multimodal.decodeMeta(df, "payload", CountingDecoderFactory)
      .collect()
    assert(out.forall(_.getStruct(2).getString(0) == "fake-codec"))
    // one open per partition (not per row), and every open was closed
    assert(CountingDecoderFactory.opens.get() == 2)
    assert(CountingDecoderFactory.closes.get() == 2)
  }

  test("multimodal: native-handle seam frees every handle even when the task dies") {
    import spark.implicits._
    // success path: handles freed, no use-after-free, one per partition
    NativeHandleDecoderFactory.reset()
    val ok = Seq((1L, "a".getBytes("UTF-8")), (2L, "b".getBytes("UTF-8")),
      (3L, "c".getBytes("UTF-8")), (4L, "d".getBytes("UTF-8")))
      .toDF("id", "payload").repartition(2)
    val out = Multimodal.decodeMeta(ok, "payload", NativeHandleDecoderFactory)
      .collect()
    assert(out.forall(_.getStruct(2).getString(0) == "native-mock"))
    assert(NativeHandleDecoderFactory.opens.get() == 2)
    assert(NativeHandleDecoderFactory.closes.get() == 2)
    assert(NativeHandleDecoderFactory.live.isEmpty)

    // crash path: a LinkageError (native-bridge failure shape) escapes
    // the per-row error channel by design and kills the task — the
    // task-completion listener must still free the partition's handle
    NativeHandleDecoderFactory.reset()
    val bad = Seq((1L, "fine".getBytes("UTF-8")),
      (2L, "CRASH".getBytes("UTF-8")), (3L, "fine".getBytes("UTF-8")))
      .toDF("id", "payload").repartition(1)
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMeta(bad, "payload", NativeHandleDecoderFactory)
        .collect()
    }
    assert(NativeHandleDecoderFactory.opens.get() >= 1)
    assert(NativeHandleDecoderFactory.closes.get()
      == NativeHandleDecoderFactory.opens.get(),
      "task failure leaked a native handle")
    assert(NativeHandleDecoderFactory.live.isEmpty)
  }

  test("multimodal: ImageIO decoder reads real PNG/BMP, flags corrupt bytes") {
    import spark.implicits._
    // real encoded images via the JDK writers — PNG and BMP — plus a
    // truncated PNG and plain garbage
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, x * 31 + y)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = encode("png", 20, 11)
    val bmp = encode("bmp", 7, 33)
    val df = Seq(
      (1L, png), (2L, bmp),
      (3L, java.util.Arrays.copyOf(png, 10)),
      (4L, "not an image at all".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = Multimodal.decodeMeta(df, "payload",
        Multimodal.ImageIoDecoderFactory).collect()
      .map(r => r.getLong(0) -> r.getStruct(r.length - 1)).toMap
    assert(out(1L).getString(0) == "png" && out(1L).getInt(1) == 20 &&
      out(1L).getInt(2) == 11 && out(1L).getBoolean(4))
    assert(out(2L).getString(0) == "bmp" && out(2L).getInt(1) == 7 &&
      out(2L).getInt(2) == 33 && out(2L).getBoolean(4))
    assert(!out(3L).getBoolean(4) && out(3L).getString(5) != null)
    assert(!out(4L).getBoolean(4))
  }

  test("multimodal: synthetic PNG fixture round-trips through the decoder") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 97L, 130L).toDF("doc_id")
    val out = Multimodal.decodeMeta(
        Multimodal.withSyntheticPng(ids, "doc_id", truncateEvery = 97L),
        "payload", Multimodal.ImageIoDecoderFactory)
      .select(col("doc_id"), col("media_meta.*")).collect()
      .map(r => r.getLong(0) -> r).toMap
    // dims replay the generator arithmetic: 8 + id%16, 8 + (7id)%16
    assert(out(5L).getString(1) == "png" && out(5L).getInt(2) == 13 &&
      out(5L).getInt(3) == 11 && out(5L).getBoolean(5))
    assert(out(130L).getInt(2) == 10 && out(130L).getInt(3) == 22)
    // ids 0 and 97 are truncated → flagged, not thrown
    assert(!out(0L).getBoolean(5) && !out(97L).getBoolean(5))
  }

  test("multimodal: synthetic WAV round-trips through the JavaSound decoder") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 89L, 178L, 6L).toDF("doc_id")
    val out = Multimodal.decodeAudioMeta(
        Multimodal.withSyntheticWav(ids, "doc_id", truncateEvery = 89L),
        "payload")
      .select(col("doc_id"), col("audio_meta.*")).collect()
      .map(r => r.getLong(0) -> r).toMap
    // id=1: stereo, 16 kHz, 50 + 13%200 = 63 frames
    assert(out(1L).getString(1) == "wave" && out(1L).getInt(2) == 16000 &&
      out(1L).getInt(3) == 2 && out(1L).getInt(4) == 16 &&
      out(1L).getLong(5) == 63L && out(1L).getBoolean(6))
    // id=6: mono (6%2=0 → 1+0), 8 kHz (6%3=0), 50 + 78%200 = 128 frames
    assert(out(6L).getInt(2) == 8000 && out(6L).getInt(3) == 1 &&
      out(6L).getLong(5) == 128L)
    // ids 89 and 178 are truncated mid-data: the header parses but the
    // frame-count drain must flag them — not throw, not under-report
    assert(!out(89L).getBoolean(6) && out(89L).getString(7) != null)
    assert(!out(178L).getBoolean(6))
  }

  test("multimodal: JavaSound decoder rejects non-audio payloads") {
    import spark.implicits._
    val df = Seq(
      (1L, "definitely not a wav".getBytes("UTF-8")),
      (2L, Array.empty[Byte])).toDF("id", "payload")
    val out = Multimodal.decodeAudioMeta(df, "payload").collect()
      .map(r => r.getLong(0) -> r.getStruct(r.length - 1)).toMap
    assert(!out(1L).getBoolean(5) && out(1L).getString(6) != null)
    assert(!out(2L).getBoolean(5))
  }

  test("multimodal: fixed chunking covers the payload, binary included") {
    import spark.implicits._
    val payload = Array.tabulate(700)(i => (i % 251).toByte)
    val df = Seq((1L, payload), (2L, Array.empty[Byte]))
      .toDF("id", "payload")
    val chunks = Multimodal.chunkFixed(df, "payload", 256)
      .select(col("id"), col("chunk_idx"), col("chunk_len"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val one = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(one.map(_._2).toSeq === Seq(0, 1, 2))
    assert(one.map(_._3).toSeq === Seq(256, 256, 188)) // 700 bytes total
    assert(chunks.filter(_._1 == 2L).map(_._3).toSeq === Seq(0))
  }

  test("multimodal: resize plumbing keeps schema and tags failures") {
    import spark.implicits._
    val df = Seq(
      (1L, "real payload bytes".getBytes("UTF-8")),
      (2L, Array.empty[Byte])).toDF("id", "payload")
    val out = Multimodal.resizeTo(df, "payload", 64, 64).collect()
      .map(r => r.getLong(0) ->
        (r.get(2), r.getStruct(3).getAs[Boolean]("resize_ok"))).toMap
    assert(out(1L)._2 === true)
    assert(out(1L)._1.asInstanceOf[Array[Byte]].length === 64 * 64 / 64)
    assert(out(2L)._2 === false && out(2L)._1 === null)
  }

  test("multimodal: aHash64 equals the integer replay on decoded gray pixels") {
    import spark.implicits._
    // independent reimplementation of the fixture's pixel arithmetic
    val md = java.security.MessageDigest.getInstance("MD5")
    def px(base: Long, x: Int, y: Int): Int = {
      val hex = md.digest(s"px|$base|$x|$y".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 256).toInt
    }
    def expectedHash(id: Long): Long = {
      val base = id - id % 4; val j = (id % 4).toInt
      val g = Array.tabulate(64) { i =>
        val (x, y) = (i % 8, i / 8)
        val g0 = px(base, x, y)
        if (j > 0 && y == 0 && x == j - 1) (g0 + 128) % 256 else g0
      }
      val total = g.sum
      (0 until 64).foldLeft(0L)((acc, i) =>
        if (64L * g(i) >= total) acc | (1L << i) else acc)
    }
    val ids = Seq(0L, 1L, 7L, 12L).toDF("doc_id")
    val out = Multimodal.imageAHash64(
        Multimodal.withSyntheticGrayPng8(ids, "doc_id"), "payload")
      .select(col("doc_id"), col("ahash"), col("ahash_ok")).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(0L, 1L, 7L, 12L).foreach { id =>
      assert(out(id).getBoolean(2), s"id $id should decode")
      assert(out(id).getLong(1) === expectedHash(id), s"hash mismatch id $id")
    }
    // corrupt payload → null hash + error, never a task abort
    val bad = Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val b = Multimodal.imageAHash64(bad, "payload").collect().head
    assert(b.get(2) == null && b.getBoolean(3) === false &&
      b.getString(4) != null)
  }

  test("multimodal: aHash64 block-means RGB images larger than 8x8") {
    import spark.implicits._
    // 16×16 RGB: each 2×2 block averages; constant image → every block
    // mean equals the global mean → all 64 bits set (>= rule) → -1L
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val flat = Multimodal.imageAHash64(
      Seq((1L, bos.toByteArray)).toDF("doc_id", "payload"), "payload")
      .collect().head
    assert(flat.getLong(2) === -1L)
    // top half bright, bottom half dark → low 32 bits (rows 0–3) set
    val img2 = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img2.setRGB(x, y, if (y < 8) 0xffffff else 0x000000)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img2, "png", bos2)
    val split = Multimodal.imageAHash64(
      Seq((1L, bos2.toByteArray)).toDF("doc_id", "payload"), "payload")
      .collect().head
    assert(split.getLong(2) === 0x00000000ffffffffL)
  }

  test("hamming near-dups on aHash signatures find planted twins only") {
    import spark.implicits._
    val ids = (0L until 16L).toDF("doc_id")
    val hashed = Multimodal.imageAHash64(
        Multimodal.withSyntheticGrayPng8(ids, "doc_id"), "payload")
      .select(col("doc_id"), col("ahash"))
    val pairs = Dedup.hammingNearDups(hashed, "doc_id", "ahash",
        numBits = 64, radius = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // brute-force truth over the same signatures
    val sigs = hashed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = for {
      a <- 0L until 16L; b <- (a + 1) until 16L
      d = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if d <= 6
    } yield (a, b, d)
    assert(pairs.toSet === truth.toSet)
    // twins (same group of 4) are all found; the fixture plants them close
    val sameGroup = truth.filter { case (a, b, _) => a / 4 == b / 4 }
    assert(sameGroup.size === 4 * 6)
  }

  test("multimodal: audio fingerprint thresholds decoded windows exactly") {
    import spark.implicits._
    // hand-built mono WAV: 64 silent samples then 64 at +1000 → the
    // loud half sets exactly the high 32 window bits
    def wav(samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000)
        .putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val halfLoud = wav(Array.tabulate(128)(i => if (i < 64) 0 else 1000))
    val out = Multimodal.audioFingerprint64(
      Seq((1L, halfLoud), (2L, Array[Byte](9, 9, 9))).toDF("id", "payload"),
      "payload").collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) === 128L)
    assert(out(1L).getLong(3) === 0xffffffff00000000L)
    assert(out(1L).getBoolean(4))
    // corrupt payload → error channel, not a task abort
    assert(out(2L).get(3) == null && !out(2L).getBoolean(4))
    // synthetic fixture replay: kernel output equals the independent
    // integer reimplementation of the sample/window arithmetic
    val ids = Seq(3L, 10L, 11L).toDF("doc_id")
    val fps = Multimodal.audioFingerprint64(
        Multimodal.withSyntheticWav(ids, "doc_id"), "payload")
      .select(col("doc_id"), col("n_samples"), col("afp")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Seq(3L, 10L, 11L).foreach { id =>
      val n = ((50 + (id * 13) % 200) * (1 + id % 2)).toInt
      val a = Array.tabulate(n)(i =>
        math.abs(math.floorMod(id * 31 + i * 7, 65536L) - 32768L))
      val total = a.sum
      var fp = 0L
      for (w <- 0 until 64) {
        val from = w * n / 64; val to = (w + 1) * n / 64
        if (to > from) {
          val winSum = a.slice(from, to).sum
          if (winSum * n >= total * (to - from)) fp |= 1L << w
        }
      }
      assert(fps(id) === (n.toLong, fp), s"id $id")
    }
  }

  test("new-op plan shapes: RRF group-limit, DSIR broadcast, hamming equi-join") {
    import spark.implicits._
    // rrfFuse: the per-query re-rank must plan the two-phase
    // WindowGroupLimit (partial top-k BEFORE the exchange). The lists
    // must be bigger than topK — Catalyst correctly drops the
    // group-limit when the input's known maxRows already fits it
    val lst = spark.range(50).select((col("id") % 2).as("query_id"),
      col("id").as("doc_id"), (col("id") / 2 + 1).cast("int").as("rank"))
    val rrfPlan = TextAnalysis.rrfFuse(Seq(lst, lst),
      "query_id", "doc_id", "rank").queryExecution.executedPlan.toString
    assert(rrfPlan.contains("WindowGroupLimit"), rrfPlan)
    // dsirLogWeights: the bucket-stats join back onto the raw gram
    // stream must broadcast (the ≤buckets-row side), never SMJ the
    // corpus-sized side
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val dsirPlan = graft.functions.Curation
      .dsirLogWeights(docs, docs.limit(1), "doc_id", "text", buckets = 64)
      .queryExecution.executedPlan.toString
    assert(dsirPlan.contains("BroadcastHashJoin"), dsirPlan)
    // hammingNearDups: candidates come from an equi-join on block
    // columns — a cartesian/broadcast-nested-loop product would be the
    // quadratic plan the pigeonhole exists to avoid
    val sigs = Seq((1L, 5L), (2L, 7L)).toDF("id", "sig")
    val hamPlan = Dedup.hammingNearDups(sigs, "id", "sig", 64, 3)
      .queryExecution.executedPlan.toString
    assert(!hamPlan.contains("CartesianProduct") &&
      !hamPlan.contains("BroadcastNestedLoopJoin"), hamPlan)
    // tfidfTopTerms: the (term, df) table spans the whole corpus
    // vocabulary — it must SHUFFLE-join back onto tf, never broadcast
    // (a multi-GB broadcast at 100 TB). The only broadcast in the plan
    // is the 1-row corpus-count N.
    val docs2 = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val tfidfExec = TextAnalysis.tfidfTopTerms(docs2, "doc_id", "text")
      .queryExecution.executedPlan
    val tfidfPlan = tfidfExec.toString
    assert(tfidfPlan.contains("SortMergeJoin") ||
      tfidfPlan.contains("ShuffledHashJoin"), tfidfPlan)
    val bhjLines = tfidfPlan.linesIterator
      .filter(_.contains("BroadcastHashJoin")).toSeq
    assert(bhjLines.isEmpty, s"vocab df table must not broadcast:\n$tfidfPlan")
    // containmentPairs: candidate generation must stay an equi-join
    // (no cartesian / nested-loop), and the hinted gram-df join must
    // plan as a sort-merge (the corpus-vocabulary side never
    // broadcasts — the shuffle_merge hint makes that structural)
    val contPlan = Dedup.containmentPairs(docs2, "doc_id", "text", 0.9, 3)
      .queryExecution.executedPlan.toString
    assert(!contPlan.contains("CartesianProduct") &&
      !contPlan.contains("BroadcastNestedLoopJoin"), contPlan)
    assert(contPlan.contains("SortMergeJoin"),
      s"gram-df join must be the hinted sort-merge:\n$contPlan")
    // negativeSample: the ONLY broadcast is the nShards-row count
    // table; the probe ⋈ permutation join must not be a product
    val negPlan = graft.functions.Curation
      .negativeSample(docs2, "doc_id", k = 1, nShards = 2)
      .queryExecution.executedPlan.toString
    assert(!negPlan.contains("CartesianProduct") &&
      !negPlan.contains("BroadcastNestedLoopJoin"), negPlan)
  }

  test("script-routed dedup: CJK twins caught by char route, missed by word route") {
    import spark.implicits._
    // two CJK near-dups differing in ONE character, no whitespace —
    // word tokenization sees a single differing token; plus a latin
    // near-dup pair the word route must still find
    val cjkA = "深夜の東京は雨が降り続け街の灯りが濡れた路面に揺れて見えた"
    val cjkB = cjkA.replace('雨', '雪')
    val latA = "the quick brown fox jumps over the lazy dog again and again today"
    val latB = "the quick brown fox jumps over the lazy dog again and again now"
    val df = Seq((1L, cjkA), (2L, cjkB), (10L, latA), (11L, latB),
      (20L, "totally unrelated latin content words here about databases"))
      .toDF("doc_id", "text")
    val routed = Dedup.scriptRoutedNearDups(df, "doc_id", "text",
      wordThreshold = 0.5, charThreshold = 0.5, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(routed.contains((1L, 2L, "cjk")), s"CJK twin missed: $routed")
    assert(routed.contains((10L, 11L, "word")), s"latin twin missed: $routed")
    assert(routed.size == 2, s"unexpected pairs: $routed")
    // the word-only pipeline cannot see the CJK twin (one token per
    // doc → disjoint single-gram sets) — the reason the router exists
    val wordOnly = Dedup.ngramJaccardPairsLsh(df, "doc_id", "text",
      threshold = 0.1, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!wordOnly.contains((1L, 2L)), s"word route should miss CJK: $wordOnly")
  }

  test("connectedComponentsStar: 1k chain in logarithmic rounds, equals min-label") {
    import spark.implicits._
    // a 1000-node chain has diameter 999 — min-label propagation would
    // need ~999 rounds; the star rewriting must converge within 15
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("a", "b")
    val star = Dedup.connectedComponentsStar(chain, "a", "b", maxIter = 15)
    assert(star.count() === 1000L)
    assert(star.filter(col("cluster_id") =!= 0L).isEmpty,
      "every chain node must label to the component minimum 0")
    // interchangeability: identical labels to min-label propagation on
    // a multi-component graph (chain + cycle + pair + isolated-ish)
    val g = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (30L, 30L)).toDF("a", "b")
    val viaStar = Dedup.connectedComponentsStar(g, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLabel = Dedup.connectedComponents(g, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStar === viaLabel)
  }

  test("connected components: reliable checkpointDir — identical clusters, checkpoint files on disk") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_ck").toFile
    try {
      val g = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L),
        (20L, 21L), (30L, 30L)).toDF("a", "b")
      def toSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plainStar = toSet(Dedup.connectedComponentsStar(g, "a", "b"))
      val relStar = toSet(Dedup.connectedComponentsStar(g, "a", "b",
        checkpointDir = Some(ckpt.getAbsolutePath)))
      assert(relStar === plainStar)
      val relMin = toSet(Dedup.connectedComponents(g, "a", "b",
        checkpointDir = Some(ckpt.getAbsolutePath)))
      assert(relMin === plainStar)
      def rddDirs(f: java.io.File): Int =
        Option(f.listFiles).map(_.map(c =>
          (if (c.getName.startsWith("rdd-")) 1 else 0) + rddDirs(c)).sum)
          .getOrElse(0)
      assert(rddDirs(ckpt) > 0,
        "reliable cuts must materialize rdd-* checkpoint dirs")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(ckpt)
    }
  }

  test("stripBoilerplateLines: per-source frequency cut, order, empty docs") {
    import spark.implicits._
    // source A (3 docs ≥ minDocs=3): "footer" in all 3 → dropped;
    // "half" in 2/3 ≈ 0.67 ≥ 0.5 → dropped; unique lines stay in order.
    // Doc 3 is footer-only → must survive as empty text. Source B has
    // only 1 doc (< minDocs) → nothing stripped even though its line
    // is 100% frequent.
    val df = Seq(
      (1L, "A", "alpha\nfooter\nhalf\nomega"),
      (2L, "A", "beta\nhalf\nfooter"),
      (3L, "A", "footer"),
      (4L, "B", "footer")).toDF("id", "src", "text")
    val out = Curation.stripBoilerplateLines(df, "id", "text", "src",
      minDocs = 3, minFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getInt(3), r.getInt(4))).toMap
    assert(out(1L) === (("alpha\nomega", 2, 2)))
    assert(out(2L) === (("beta", 1, 2)))
    assert(out(3L) === (("", 0, 1)))
    assert(out(4L) === (("footer", 1, 0)))
  }

  test("PQ: codebook shape, exact self-distance, cluster recovery") {
    import spark.implicits._
    // two well-separated clusters whose prototypes are exactly the
    // stride-sampled codebook vectors (ids 0, 1 with stride 1):
    // members encode to their prototype, so ADC ranks same-cluster
    // members first and an external copy of a prototype has distance 0
    def v(base: Double, eps: Double) =
      Seq(base + eps, base - eps, base + eps, base - eps)
    val corpus = (
      Seq((0L, v(0.0, 0.0)), (1L, v(10.0, 0.0))) ++
      (2L to 6L).map(i => (i, v(0.0, 0.01 * i))) ++
      (10L to 14L).map(i => (i, v(10.0, 0.01 * i)))
    ).toDF("id", "vec")
    val books = Similarity.pqBooks(corpus, "id", "vec",
      m = 2, k = 2, dims = 4, stride = 1L)
    assert(books.length == 2 && books(0).length == 2 &&
      books(0)(0).length == 2)
    val queries = Seq((100L, v(0.0, 0.0)), (101L, v(10.0, 0.0)))
      .toDF("qid", "qvec")
    val top = Similarity.pqTopK(corpus, "id", "vec",
      queries, "qid", "qvec", books, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    val q0 = top.filter(_._1 == 100L).sortBy(_._4).map(_._2)
    val q1 = top.filter(_._1 == 101L).sortBy(_._4).map(_._2)
    // every returned neighbor of each prototype query is in its cluster
    assert(q0.toSet.subsetOf((Seq(0L) ++ (2L to 6L)).toSet), q0.mkString(","))
    assert(q1.toSet.subsetOf((Seq(1L) ++ (10L to 14L)).toSet), q1.mkString(","))
    // the prototype itself is rank 1 with EXACT zero ADC distance
    // (its codes select itself; the LUT entry is the true distance 0)
    val d0 = top.filter(t => t._1 == 100L && t._2 == 0L).head._3
    assert(d0 === 0L)
    // the corpus side of the scoring join must carry codes, not vectors
    val plan = Similarity.pqTopK(corpus, "id", "vec",
      queries, "qid", "qvec", books, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("IVF-PQ: probed-cell ADC agrees with flat PQ at full probe") {
    import spark.implicits._
    def v(base: Double, eps: Double) =
      Seq(base + eps, base - eps, base + eps, base - eps)
    val corpus = (
      Seq((0L, v(0.0, 0.0)), (1L, v(10.0, 0.0))) ++
      (2L to 6L).map(i => (i, v(0.0, 0.01 * i))) ++
      (10L to 14L).map(i => (i, v(10.0, 0.01 * i)))
    ).toDF("id", "vec")
    val books = Similarity.pqBooks(corpus, "id", "vec",
      m = 2, k = 2, dims = 4, stride = 1L)
    val cents = Array(Array(0.0, 0.0, 0.0, 0.0), Array(10.0, 10.0, 10.0, 10.0))
    val queries = Seq((100L, v(0.0, 0.0)), (101L, v(10.0, 0.0)))
      .toDF("qid", "qvec")
    // nprobe = all cells → must equal the flat PQ ranking exactly
    val full = Similarity.ivfPqTopK(corpus, "id", "vec", queries,
      "qid", "qvec", k = 4, cents, books, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val flat = Similarity.pqTopK(corpus, "id", "vec", queries,
      "qid", "qvec", books, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(full === flat)
    // nprobe = 1 restricts candidates to the query's own cell
    val one = Similarity.ivfPqTopK(corpus, "id", "vec", queries,
      "qid", "qvec", k = 10, cents, books, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.filter(_._1 == 100L).map(_._2).toSet
      .subsetOf((Seq(0L) ++ (2L to 6L)).toSet))
    assert(one.filter(_._1 == 101L).map(_._2).toSet
      .subsetOf((Seq(1L) ++ (10L to 14L)).toSet))
  }

  test("IVFADC: zero-centroid degeneracy equals flat PQ; residual beats raw") {
    import spark.implicits._
    def v(base: Double, eps: Double) =
      Seq(base + eps, base - eps, base + eps, base - eps)
    // ids 0/1 are the stride-1 book sample — they carry DISTINCT
    // nonzero offsets from their cluster centers so the residual
    // codebook entries are nonzero and distinct (sampling the exact
    // prototypes would make every residual book entry the zero
    // vector and collapse all residual codes)
    val corpus = (
      Seq((0L, v(0.0, 0.02)), (1L, v(10.0, 0.05))) ++
      (2L to 6L).map(i => (i, v(0.0, 0.01 * i))) ++
      (10L to 14L).map(i => (i, v(10.0, 0.01 * i)))
    ).toDF("id", "vec")
    val queries = Seq((100L, v(0.0, 0.013)), (101L, v(10.0, 0.013)))
      .toDF("qid", "qvec")
    // (a) ONE all-zero centroid → residual is the identity → must
    // equal flat pqTopK with the same books EXACTLY
    val zeroCent = Array(Array(0.0, 0.0, 0.0, 0.0))
    val rawBooks = Similarity.pqBooks(corpus, "id", "vec",
      m = 2, k = 2, dims = 4, stride = 1L)
    val residBooksZero = Similarity.pqBooksResidual(corpus, "id", "vec",
      zeroCent, m = 2, k = 2, dims = 4, stride = 1L)
    assert(residBooksZero.map(_.map(_.toSeq).toSeq).toSeq ===
      rawBooks.map(_.map(_.toSeq).toSeq).toSeq)
    val degen = Similarity.ivfPqResidualTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 4, zeroCent, residBooksZero, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    val flat = Similarity.pqTopK(corpus, "id", "vec", queries,
      "qid", "qvec", rawBooks, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(degen === flat)
    // (b) with real cluster centroids, residual codes see only the
    // WITHIN-cluster offsets (energy ~0.01² vs the raw 10² between
    // clusters): raw-vector PQ with this tiny codebook collapses all
    // same-cluster members to ADC distance 0 from the query (ties —
    // no ranking signal), while residual ADC separates them
    val cents = Array(Array(0.0, 0.0, 0.0, 0.0),
      Array(10.0, 10.0, 10.0, 10.0))
    val residBooks = Similarity.pqBooksResidual(corpus, "id", "vec",
      cents, m = 2, k = 2, dims = 4, stride = 1L)
    val res = Similarity.ivfPqResidualTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 6, cents, residBooks, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every neighbor of each query is in its own cluster…
    assert(res.filter(_._1 == 100L).map(_._2).toSet
      .subsetOf((Seq(0L) ++ (2L to 6L)).toSet))
    assert(res.filter(_._1 == 101L).map(_._2).toSet
      .subsetOf((Seq(1L) ++ (10L to 14L)).toSet))
    // …and residual ADC distances are NOT all collapsed to one value
    val dists100 = res.filter(_._1 == 100L).map(_._3).distinct
    assert(dists100.length > 1,
      s"residual ADC should separate within-cluster members: $dists100")
    // determinism across partitionings
    val again = Similarity.ivfPqResidualTopK(corpus.repartition(7),
      "id", "vec", queries, "qid", "qvec", k = 6, cents, residBooks,
      nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === res.toSet)
    // kernel == declarative composition BIT-IDENTICALLY (including the
    // nano distances) — the parity the SQL oracle rests on
    val kern = Similarity.ivfPqResidualTopK(corpus, "id", "vec",
      queries, "qid", "qvec", k = 6, cents, residBooks, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    val decl = Similarity.ivfPqResidualTopKDeclarative(corpus, "id",
      "vec", queries, "qid", "qvec", k = 6, cents, residBooks,
      nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(kern === decl)
  }

  test("IMI: cell pairs partition, full probe equals flat PQ, pruning prunes") {
    import spark.implicits._
    // 4 clusters at the corners of a 2-half product space: half-0
    // near {0, 10}, half-1 near {0, 10} independently — the geometry
    // IMI factorizes (a vector-space quantizer would need 4 cells; IMI
    // gets them from 2+2 centroids)
    def v(a: Double, b: Double, eps: Double) =
      Seq(a + eps, a - eps, b + eps, b - eps)
    val protos = Seq(
      (0L, v(0, 0, 0)), (1L, v(10, 10, 0)),
      (2L, v(0, 10, 0)), (3L, v(10, 0, 0)))
    val corpus = (protos ++
      (4L to 8L).map(i => (i, v(0, 0, 0.01 * i))) ++
      (10L to 14L).map(i => (i, v(10, 10, 0.001 * i))) ++
      (20L to 24L).map(i => (i, v(0, 10, 0.001 * i))) ++
      (30L to 34L).map(i => (i, v(10, 0, 0.001 * i)))
    ).toDF("id", "vec")
    // coarse: K=2 per half from ids {0,1} (stride 1) → halves get
    // centroids {~0-half, ~10-half}; 4 IMI cells
    val coarse = Similarity.pqBooks(corpus, "id", "vec",
      m = 2, k = 2, dims = 4, stride = 1L)
    val fine = Similarity.pqBooks(corpus, "id", "vec",
      m = 4, k = 4, dims = 4, stride = 1L)
    // every vector gets exactly one of the 4 cells; each cluster maps
    // to a DISTINCT cell
    val cells = corpus.select(col("id"),
        Similarity.imiCells(col("vec"), coarse).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells.values.forall(c => c >= 0 && c < 4))
    assert(Seq(0L, 1L, 2L, 3L).map(cells).distinct.size === 4)
    assert((4L to 8L).forall(i => cells(i) === cells(0L)))
    assert((10L to 14L).forall(i => cells(i) === cells(1L)))
    val queries = Seq((100L, v(0, 0, 0.005)), (101L, v(10, 10, 0.005)))
      .toDF("qid", "qvec")
    // full probe (nprobe = K² = 4) must equal flat PQ EXACTLY — the
    // IMI layer is pure pruning
    val full = Similarity.imiTopK(corpus, "id", "vec", queries,
      "qid", "qvec", coarse, fine, k = 6, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    val flat = Similarity.pqTopK(corpus, "id", "vec", queries,
      "qid", "qvec", fine, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(full === flat)
    // nprobe = 1 probes only the query's own cell pair
    val one = Similarity.imiTopK(corpus, "id", "vec", queries,
      "qid", "qvec", coarse, fine, k = 20, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.filter(_._1 == 100L).map(_._2).toSet
      .subsetOf((Seq(0L) ++ (4L to 8L)).toSet))
    assert(one.filter(_._1 == 101L).map(_._2).toSet
      .subsetOf((Seq(1L) ++ (10L to 14L)).toSet))
    // determinism across partitionings
    val again = Similarity.imiTopK(corpus.repartition(7), "id", "vec",
      queries, "qid", "qvec", coarse, fine, k = 6, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(again === full)
  }

  test("IMI: native cell-assign kernel is bit-identical to declarative imiCells") {
    import spark.implicits._
    // deterministic pseudo-random vectors; K=4 per half over 8 dims,
    // with half-1's centroids 2 and 3 DUPLICATED — every vector ties
    // on that pair and the kernel must break to the LOWER code, the
    // pqEncode array_min(struct(d, c)) rule
    def prng(seed: Long): Double = {
      val x = seed * 6364136223846793005L + 1442695040888963407L
      ((x >>> 11).toDouble / (1L << 53).toDouble) * 20.0 - 10.0
    }
    val rows = (0L until 200L).map(i =>
      (i, (0 until 8).map(j => prng(i * 31 + j)).toSeq))
    val corpus = rows.toDF("id", "vec")
    val coarse = Similarity.pqBooks(corpus, "id", "vec",
      m = 2, k = 4, dims = 8, stride = 7L)
    coarse(1)(3) = coarse(1)(2).clone() // forced tie plateau
    val both = corpus.select(
        Similarity.imiCells(col("vec"), coarse).as("decl"),
        coalesce(
          org.apache.spark.sql.graftglue.Glue.column(
            graft.expressions.ImiCellAssign(
              org.apache.spark.sql.graftglue.Glue.expression(col("vec")),
              coarse)),
          lit(-1)).as("kern"))
      .collect()
    assert(both.length === 200)
    both.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // the tie plateau is actually exercised: some vector lands in
    // half-1 code 2, and NONE may land in the duplicate code 3
    val h1 = both.map(_.getInt(1) % 4)
    assert(h1.contains(2) && !h1.contains(3))
    // float input takes the same path (gate vectors are float parquet)
    val fcorpus = rows.map { case (i, v) => (i, v.map(_.toFloat)) }
      .toDF("id", "vec")
    val fboth = fcorpus.select(
        Similarity.imiCells(col("vec"), coarse).as("decl"),
        coalesce(
          org.apache.spark.sql.graftglue.Glue.column(
            graft.expressions.ImiCellAssign(
              org.apache.spark.sql.graftglue.Glue.expression(col("vec")),
              coarse)),
          lit(-1)).as("kern"))
      .collect()
    fboth.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("PQ: native flat-encode kernel is bit-identical to declarative pqEncode") {
    import spark.implicits._
    def prng(seed: Long): Double = {
      val x = seed * 2862933555777941757L + 3037000493L
      ((x >>> 11).toDouble / (1L << 53).toDouble) * 6.0 - 3.0
    }
    val rows = (0L until 150L).map(i =>
      (i, (0 until 16).map(j => prng(i * 17 + j).toFloat).toSeq))
    val corpus = rows.toDF("id", "vec")
    // m=4, k=5 books over the float→double transform cast — the exact
    // non-attribute-child shape the gates feed the encode; book (2,4)
    // duplicates (2,1) to force a tie plateau (must break to code 1)
    val casted = corpus.select(col("id"),
      transform(col("vec"), x => x.cast("double")).as("vec"))
    val books = Similarity.pqBooks(casted, "id", "vec",
      m = 4, k = 5, dims = 16, stride = 13L)
    books(2)(4) = books(2)(1).clone()
    val both = casted.select(
        Similarity.pqEncode(col("vec"), books).as("decl"),
        Similarity.pqEncodeNative(col("vec"), books).as("kern"))
      .collect()
    assert(both.length === 150)
    both.foreach { r =>
      assert(r.getSeq[Int](0) === r.getSeq[Int](1))
      assert(r.getSeq[Int](1)(2) !== 4) // tie never picks the duplicate
    }
    // raw float attribute child too (the no-cast path)
    val fboth = corpus.select(
        Similarity.pqEncode(col("vec"), books).as("decl"),
        Similarity.pqEncodeNative(col("vec"), books).as("kern"))
      .collect()
    fboth.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
  }

  test("multimodal: frame sampling explodes by stride") {
    import spark.implicits._
    val df = Seq((1L, "x".getBytes("UTF-8"))).toDF("id", "payload")
    val decoded = Multimodal.decodeMeta(df, "payload")
    val frames = Multimodal.sampleFrames(decoded, "media_meta", 5)
    val n = frames.count()
    val nFrames = decoded.select(col("media_meta.n_frames")).head.getInt(0)
    assert(n === (0 until nFrames by 5).size)
  }

  test("streaming: windowed agg batch semantics") {
    import spark.implicits._
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0))
      .toDF("ts", "event_type", "value")
    val out = graft.streaming.EventStream.windowedAgg(df, "1 hour")
      .orderBy("window_start").collect()
    assert(out.length === 2)
    assert(out(0).getLong(2) === 2L)
    assert(out(0).getDecimal(3).doubleValue() === 3.0)
  }

  test("script profile: counts, dominance, tie priority") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello world"),
      (2L, "日本語のテキストです"),
      (3L, "привет мир"),
      (4L, "مرحبا"),
      (5L, "ab 文字"),   // tie 2-2 → latin wins by priority
      (6L, "123 !?")     // no letters at all
    ).toDF("id", "text")
    val out = TextAnalysis.scriptProfile(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1).getAs[String]("dominant") === "latin")
    assert(out(2).getAs[String]("dominant") === "cjk")
    assert(out(3).getAs[String]("dominant") === "cyrillic")
    assert(out(4).getAs[String]("dominant") === "arabic")
    assert(out(5).getAs[String]("dominant") === "latin")
    assert(out(5).getLong(1) === 2L) // n_latin
    assert(out(5).getLong(2) === 2L) // n_cjk
    assert(out(6).getLong(1) === 0L)
    assert(out(6).getAs[String]("dominant") === "latin") // all-zero tie
    // cjkFraction must equal scriptProfile's frac_cjk (same formula,
    // scripted-characters denominator); cjkCharShare divides by ALL
    // characters, so the space in "ab 文字" dilutes it (2/5 vs 2/4)
    val frac = df.select(col("id"),
      TextAnalysis.cjkFraction(col("text")).as("f"),
      TextAnalysis.cjkCharShare(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    (1L to 6L).foreach(i =>
      assert(frac(i)._1 === out(i).getAs[Double]("frac_cjk"),
        s"cjkFraction diverged from frac_cjk for id $i"))
    assert(frac(5L)._1 === 0.5)
    assert(frac(5L)._2 === 0.4)
  }

  test("url canonicalization: ports, params, slashes, fragments, www") {
    import spark.implicits._
    val cases = Seq(
      // default ports stripped only for the matching scheme
      ("HTTP://Host.COM:80/a", "http://host.com/a"),
      ("https://host.com:443/a", "https://host.com/a"),
      ("http://host.com:8080/a", "http://host.com:8080/a"),
      // non-default scheme keeps its port
      ("ftp://Host.com:80/a", "ftp://host.com:80/a"),
      // root path normalizes to "/", trailing slash dropped elsewhere
      ("https://x.com", "https://x.com/"),
      ("https://x.com/", "https://x.com/"),
      ("https://x.com/a/b/", "https://x.com/a/b"),
      ("https://x.com//a///b", "https://x.com/a/b"),
      // tracking params out, rest sorted; empty query dropped
      ("https://x.com/p?utm_source=a&z=1&a=2#f", "https://x.com/p?a=2&z=1"),
      ("https://x.com/p?utm_source=a&gclid=b", "https://x.com/p"),
      ("https://x.com/p?fbclid=1", "https://x.com/p"))
    val out = cases.map(_._1).toDF("u")
      .select(col("u"), Web.canonicalizeUrl(col("u")).as("c")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(out(in) === want, s"canon($in)") }
    val doms = Seq("https://WWW.Sub.Host.ORG:443/x", "http://plain.com/a")
      .toDF("u").select(Web.domainOf(col("u"))).collect().map(_.getString(0))
    assert(doms.toSeq === Seq("sub.host.org", "plain.com"))
  }

  test("random projection: linear, deterministic, distance-preserving") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val proj = df.select(col("id"),
      Similarity.randomProject(col("v"), 16, 64).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // linearity: proj(2v) = 2 proj(v)
    val doubled = df.select(col("id"),
      Similarity.randomProject(transform(col("v"),
        x => x * 2).as("v2"), 16, 64).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    proj.foreach { case (id, p) =>
      p.zip(doubled(id)).foreach { case (a, b) =>
        assert(math.abs(b - 2 * a) < 1e-9) }
    }
    // JL: projected squared distances within 3x of original on average
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = vecs.map { case (id, v) => id -> v.map(_.toDouble).toSeq }.toMap
    val ratios = for {
      i <- 0L until 20L; j <- (i + 1) until 20L
    } yield d2(proj(i), proj(j)) / d2(orig(i), orig(j))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 1.5, s"mean distortion $mean")
  }

  test("gopher quality stats: dup lines, bullets, ellipsis, thresholds") {
    import spark.implicits._
    val good = (("word " * 60).trim + "\nanother line of body text")
    val dupHeavy = "same line\nsame line\nsame line\nother"
    val bullets = "- a\n- b\n- c\nbody"
    val df = Seq((1L, good), (2L, dupHeavy), (3L, bullets), (4L, ""))
      .toDF("id", "text")
    val out = TextAnalysis.gopherQualityStats(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 60 + 5 = 65 words, clean → passes
    assert(out(1).getAs[Boolean]("passes"))
    assert(out(1).getLong(1) === 65L)
    assert(out(1).getDouble(7) === 0.0) // dup_line_frac
    // doc 2: 2 of 4 lines are repeats → 0.5 ≥ 0.3, fails
    assert(out(2).getDouble(7) === 0.5)
    assert(out(2).getDouble(8) > 0.0) // dup_line_char_frac
    assert(!out(2).getAs[Boolean]("passes"))
    // doc 3: 3 of 4 lines bulleted → 0.75 < 0.9 on bullets, but word
    // count fails; bullet fraction is what we assert
    assert(out(3).getDouble(5) === 0.75)
    // doc 4: empty doc → zero words, all ratios defined (no NaN/null)
    assert(out(4).getLong(1) === 0L)
    (2 to 8).foreach(i => assert(!out(4).isNullAt(i), s"col $i null"))
  }

  test("nearDupDelta equals full-corpus LSH restricted to delta pairs") {
    import spark.implicits._
    // corpus with planted twins straddling the history/delta split:
    // 40 base docs; ids 10 and 11 share text (11 is delta), 20 and 25
    // share text (both delta at %5), 13 and 14 share (both history)
    val base = (0L until 40L).map(i =>
      (i, s"alpha bravo charlie delta echo foxtrot golf hotel unique$i token$i"))
    val twin = Map(11L -> 10L, 25L -> 20L, 14L -> 13L)
    val docs = base.map { case (i, t) =>
      (i, twin.get(i).map(j => base(j.toInt)._2).getOrElse(t))
    }.toDF("doc_id", "text")
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    // the index round-trips through parquet — it IS a stored artifact
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lsh-index").toString
    Dedup.lshBands(history, "doc_id", "text", 16, 8, 3, portable = true)
      .write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    val inc = Dedup.nearDupDelta(index, history, delta, "doc_id", "text",
        threshold = 0.5, n = 3, numHashes = 16, bands = 8, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.ngramJaccardPairsLsh(docs, "doc_id", "text",
        threshold = 0.5, n = 3, numHashes = 16, bands = 8, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
    assert(inc === full)
    // the history-history twin (13, 14) must NOT appear; the
    // straddling twin (10, 11) and delta-delta twin (20, 25) must
    assert(!inc.contains((13L, 14L)))
    assert(inc.contains((10L, 11L)) === (11L % 5 == 0 || 10L % 5 == 0))
    assert(inc.contains((20L, 25L)))
  }

  test("perceptronTrain: exact integer replay, converges on separable data") {
    import spark.implicits._
    // 2-D separable toy task: class +1 clusters at x≈+1, class −1 at
    // x≈−1 (y-dim is noise). 3 epochs must produce a w with positive
    // first component that classifies every row correctly.
    val rows = (0 until 20).map { i =>
      val y = if (i % 2 == 0) 1L else -1L
      val x0 = y * 1.0 + (i % 5 - 2) * 0.05
      val x1 = (i % 7 - 3) * 0.1
      (y, Seq(x0.toFloat, x1.toFloat))
    }
    val df = rows.toDF("y", "vec")
    val w = Similarity.perceptronTrain(df, "vec", "y", dims = 2, iters = 3)
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    // independent integer replay of the same 3 epochs
    val xq = rows.map { case (y, v) =>
      (y, v.map(x => math.floor(x.toDouble * 1000).toLong).toArray)
    }
    var wRef = Array(0L, 0L)
    for (_ <- 1 to 3) {
      val upd = Array(0L, 0L)
      xq.foreach { case (y, x) =>
        val m = y * (wRef(0) * x(0) + wRef(1) * x(1))
        if (m <= 0) { upd(0) += y * x(0); upd(1) += y * x(1) }
      }
      wRef = Array(wRef(0) + upd(0), wRef(1) + upd(1))
    }
    assert(w.toSeq === wRef.toSeq)
    assert(w(0) > 0)
    // every row classified correctly after convergence
    assert(xq.forall { case (y, x) =>
      y * (w(0) * x(0) + w(1) * x(1)) > 0
    })
    // scoreLinear reproduces the same integer dot products map-side
    val weights = Similarity.perceptronTrain(df, "vec", "y",
      dims = 2, iters = 3)
    val scored = Similarity.scoreLinear(
        df.withColumn("rid", monotonically_increasing_id()),
        "vec", weights, dims = 2)
      .select(col("y"), col("score")).collect()
    assert(scored.length === 20)
    scored.foreach { r =>
      assert(r.getLong(1) != 0L && (r.getLong(0) * r.getLong(1)) > 0,
        s"row with y=${r.getLong(0)} scored ${r.getLong(1)}")
    }
  }

  test("perceptronTrain survives many epochs (lineage is checkpointed)") {
    import spark.implicits._
    // regression: before the per-epoch localCheckpoint the weight
    // plan doubled per epoch (w embedded in margin AND update), so 18
    // epochs built a ~2^18-node plan and hung the analyzer
    val df = (0 until 20).map { i =>
      val y = if (i % 2 == 0) 1L else -1L
      (y, Seq((y * 1.0).toFloat, (i % 3 - 1) * 0.1f))
    }.toDF("y", "vec")
    val w = Similarity.perceptronTrain(df, "vec", "y", dims = 2, iters = 18)
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    assert(w(0) > 0) // converged on the separable toy task
  }

  test("multimodal: frame sampling hashes exactly the strided frames") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def px(seed: Long, x: Int, y: Int): Int = {
      val hex = md.digest(s"px|$seed|$x|$y".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 256).toInt
    }
    def frameHash(id: Long, f: Int): Long = {
      val g = Array.tabulate(64)(i => px(id * 100L + f, i % 8, i / 8))
      val total = g.sum
      (0 until 64).foldLeft(0L)((acc, i) =>
        if (64L * g(i) >= total) acc | (1L << i) else acc)
    }
    val ids = Seq(0L, 3L, 9L).toDF("doc_id")
    val vids = Multimodal.withSyntheticVideo(ids, "doc_id")
    // stride 1 = every frame; count and every hash replayed exactly
    val all = Multimodal.frameSampleAHash(vids, "payload", every = 1)
      .select("doc_id", "frame_idx", "n_frames", "ahash", "frame_ok")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    Seq(0L, 3L, 9L).foreach { id =>
      val n = (6 + id % 5).toInt
      assert(all.count(_._1._1 == id) === n, s"id $id frame count")
      (0 until n).foreach { f =>
        val r = all((id, f))
        assert(r.getInt(2) === n)
        assert(r.getBoolean(4), s"frame ($id,$f) should decode")
        assert(r.getLong(3) === frameHash(id, f), s"hash ($id,$f)")
      }
    }
    // stride 3 decodes only indices ≡ 0 (mod 3)
    val strided = Multimodal.frameSampleAHash(vids, "payload", every = 3)
      .select("doc_id", "frame_idx").collect()
    assert(strided.forall(_.getInt(1) % 3 == 0))
    assert(strided.count(_.getLong(0) == 9L) === 4) // n=10 → 0,3,6,9
  }

  test("multimodal: corrupt and truncated frames error per-row, not per-task") {
    import spark.implicits._
    def frame(body: Array[Byte]): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(body.length).array() ++ body
    val good = Multimodal.withSyntheticVideo(
        Seq(5L).toDF("doc_id"), "doc_id")
      .collect().head.getAs[Array[Byte]]("payload")
    // container with [good-png, garbage, good-png]: one error row for
    // the garbage frame, real hashes for its neighbors
    val goodPng = {
      val bb = java.nio.ByteBuffer.wrap(good)
      val len0 = bb.getInt(8)
      good.slice(12, 12 + len0)
    }
    val mixed = "GVID".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(4).putInt(3).array() ++
      frame(goodPng) ++ frame(Array[Byte](9, 9, 9)) ++ frame(goodPng)
    val sel = Seq("doc_id", "frame_idx", "n_frames", "ahash", "frame_ok",
      "frame_error")
    val rows = Multimodal.frameSampleAHash(
        Seq((1L, mixed)).toDF("doc_id", "payload"), "payload", every = 1)
      .select(sel.head, sel.tail: _*).collect().sortBy(_.getInt(1))
    assert(rows.length === 3)
    assert(rows(0).getBoolean(4) && rows(2).getBoolean(4))
    assert(!rows(1).getBoolean(4) && rows(1).get(3) == null)
    assert(rows(0).getLong(3) === rows(2).getLong(3))
    // truncated payload: frames before the cut decode, then one
    // truncation marker row
    val cut = good.dropRight(5)
    val t = Multimodal.frameSampleAHash(
        Seq((2L, cut)).toDF("doc_id", "payload"), "payload", every = 1)
      .select(sel.head, sel.tail: _*).collect().sortBy(_.getInt(1))
    val nFrames = (6 + 5 % 5)
    assert(t.length === nFrames) // last frame replaced by the marker
    assert(t.dropRight(1).forall(_.getBoolean(4)))
    assert(!t.last.getBoolean(4) &&
      t.last.getString(5).startsWith("truncated"))
    // non-container payload → single error row
    val bad = Multimodal.frameSampleAHash(
        Seq((3L, Array[Byte](1, 2))).toDF("doc_id", "payload"),
        "payload", every = 1)
      .select(sel.head, sel.tail: _*).collect()
    assert(bad.length === 1 && !bad.head.getBoolean(4))
    // corrupt frame length near Int.MaxValue: `off + 4 + len` wraps
    // negative — must surface as a truncation row, never a task abort
    val evil = "GVID".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(4).putInt(2).array() ++
      frame(goodPng) ++
      java.nio.ByteBuffer.allocate(4).putInt(Int.MaxValue - 2).array() ++
      Array[Byte](1, 2, 3)
    val ev = Multimodal.frameSampleAHash(
        Seq((4L, evil)).toDF("doc_id", "payload"), "payload", every = 1)
      .select(sel.head, sel.tail: _*).collect().sortBy(_.getInt(1))
    assert(ev.length === 2)
    assert(ev(0).getBoolean(4))
    assert(!ev(1).getBoolean(4) &&
      ev(1).getString(5).startsWith("truncated"))
  }

  test("multimodal: MJPEG-in-AVI real-container path through the frame seam") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 9L).toDF("doc_id")
    val vids = Multimodal.withSyntheticMjpegAvi(ids, "doc_id")
    val sel = Seq("doc_id", "frame_idx", "n_frames", "ahash",
      "frame_ok", "frame_error")
    // every frame: counts follow 6 + id%5; all decodes succeed
    val all = Multimodal.aviFrameSampleAHash(vids, "payload", every = 1)
      .select(sel.head, sel.tail: _*).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    Seq(0L, 3L, 9L).foreach { id =>
      val n = (6 + id % 5).toInt
      val mine = all.keys.filter(_._1 == id)
      assert(mine.size === n, s"id $id")
      assert(mine.forall(k => all(k).getBoolean(4)))
      assert((0 until n).forall(f => all((id, f)).getInt(2) === n))
    }
    // stride: only frames 0, 3, 6, ... decode; hashes equal stride-1's
    val strided = Multimodal.aviFrameSampleAHash(vids, "payload",
        every = 3)
      .select(sel.head, sel.tail: _*).collect()
    assert(strided.forall(r => r.getInt(1) % 3 === 0))
    strided.foreach(r =>
      assert(r.getLong(3) === all((r.getLong(0), r.getInt(1))).getLong(3)))
    // deterministic across partitionings (same JDK JPEG codec)
    val again = Multimodal.aviFrameSampleAHash(
        vids.repartition(5), "payload", every = 1)
      .select(sel.head, sel.tail: _*).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(again === all.map { case (k, r) => k -> r.getLong(3) })
    // self-parity: re-encode the SAME md5 pixels with ImageIO and
    // decode directly — the container path must hash identically
    // (same codec, same bytes; the portable pixel formula is the
    // GVID fixture's)
    val md = java.security.MessageDigest.getInstance("MD5")
    def px(seed: Long, x: Int, y: Int): Int = {
      val hex = md.digest(s"px|$seed|$x|$y".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 256).toInt
    }
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8)
      img.getRaster.setSample(x, y, 0, px(3L * 100L + 2L, x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val direct = Multimodal.ahash64Of(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray)))
    assert(all((3L, 2)).getLong(3) === direct)
    // a corrupt frame yields ONE bad row, the rest decode; garbage
    // payload yields one container-level error row
    val payload = vids.filter(col("doc_id") === 0L)
      .select("payload").head.getAs[Array[Byte]](0)
    // find the second '00dc' chunk and wreck its JPEG body
    def findDc(from: Int): Int = {
      val i = payload.indexOfSlice("00dc".getBytes("US-ASCII"), from)
      assert(i > 0); i
    }
    val dc2 = findDc(findDc(0) + 4)
    val wrecked = payload.clone()
    // kill the SOI marker (body starts at header+8) — mid-body
    // corruption often still decodes (JPEG is resilient by design);
    // a missing SOI is unambiguously not a JPEG
    wrecked(dc2 + 8) = 0x00
    wrecked(dc2 + 9) = 0x00
    val w = Multimodal.aviFrameSampleAHash(
        Seq((7L, wrecked)).toDF("doc_id", "payload"), "payload",
        every = 1)
      .select(sel.head, sel.tail: _*).collect().sortBy(_.getInt(1))
    assert(w.count(!_.getBoolean(4)) === 1)
    assert(!w(1).getBoolean(4)) // frame 1 is the wrecked one
    assert(w.filter(_.getInt(1) != 1).forall(_.getBoolean(4)))
    val bad = Multimodal.aviFrameSampleAHash(
        Seq((8L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload"),
        "payload", every = 1)
      .select(sel.head, sel.tail: _*).collect()
    assert(bad.length === 1 && !bad.head.getBoolean(4))
  }

  test("BPE: greedy merge kernel + hand-computed training rounds") {
    import spark.implicits._
    // the kernel's left-to-right greedy on overlapping chains
    def mergeOf(syms: Seq[String], a: String, b: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("s")
        .select(org.apache.spark.sql.graftglue.Glue.column(
          graft.expressions.BpeMergePair(
            org.apache.spark.sql.graftglue.Glue.expression(col("s")),
            a, b)).as("m"))
        .as[Seq[String]].collect().head
    assert(mergeOf(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(mergeOf(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(mergeOf(Seq("x", "a", "b", "a", "b"), "a", "b")
      === Seq("x", "ab", "ab"))
    assert(mergeOf(Seq("a", "b", "c"), "b", "c") === Seq("a", "bc"))
    assert(mergeOf(Seq("q"), "a", "b") === Seq("q"))
    // training on the BPE paper's shape: "low" ×5, "lower" ×2,
    // "newest" ×6, "widest" ×3 — first merges are hand-computable:
    // round 1: pair counts include (e,s)=9, (s,t)=9, (w,e)=8(hmm)...
    // verified by hand below against the deterministic tie rule
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = graft.functions.TextAnalysis.bpeTrain(docs, "text", 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // counts: es appears in newest(6) + widest(3) = 9; st likewise 9;
    // tie (9, "e s") < (9, "s t") lexicographically → round 1 = (e,s).
    // round 2: (es,t) count 9 wins (ties under 9 none).
    assert(merges(0) === ((1, "e", "s", 9L)))
    assert(merges(1) === ((2, "es", "t", 9L)))
    // round 3: remaining pairs all ≤ 8: (l,o)=7, (o,w)=7, (n,e)=6,
    // (w,est)=6, (e,w)=6... max is 7; tie ("l o" vs "o w") → (l,o)
    assert(merges(2) === ((3, "l", "o", 7L)))
    assert(merges(3)._1 === 4)
    // the merge table is deterministic under a different layout
    val again = graft.functions.TextAnalysis.bpeTrain(
        docs.repartition(5), "text", 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(again.toSeq === merges.toSeq)
  }

  test("bpeTrainLocal: merge table identical to distributed bpeTrain") {
    import spark.implicits._
    // richer corpus than the paper fixture: repeated vocabulary with
    // overlapping stems so merges cascade (merged symbols re-pair),
    // exercising the incremental delta updates; 20 rounds runs the
    // loop well past the hand-checkable prefix
    val ws = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++
      Seq.fill(4)("lowest") ++ Seq.fill(7)("newer") ++
      Seq.fill(2)("wide") ++ Seq.fill(9)("news") ++ Seq("q")
    val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    def tab(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq
    val dist = tab(graft.functions.TextAnalysis.bpeTrain(docs, "text", 20))
    val local = tab(graft.functions.TextAnalysis.bpeTrainLocal(
      docs, "text", 20))
    assert(local === dist)
    // both exhaust identically when every word is one symbol
    val tiny = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val dTiny = tab(graft.functions.TextAnalysis.bpeTrain(tiny, "text", 10))
    val lTiny = tab(graft.functions.TextAnalysis.bpeTrainLocal(
      tiny, "text", 10))
    assert(lTiny === dTiny)
    assert(lTiny.length < 10) // stopped at exhaustion, not the cap
    // the vocab guard dies loudly instead of collecting unbounded
    intercept[IllegalArgumentException] {
      graft.functions.TextAnalysis.bpeTrainLocal(docs, "text", 2,
        maxVocab = 3)
    }
  }

  test("bpeSegmentWords: encoder applies ranked merges; train→encode round-trips") {
    import spark.implicits._
    // kernel edge semantics via a hand table: cascade ((a,b)→ab,
    // (ab,c)→abc), same-symbol chain pair-skip, absent merge no-op
    def seg(w: String, ms: Seq[(String, String)]): Seq[String] = {
      val df = Seq(Tuple1(w)).toDF("text") // one word, one doc
      graft.functions.TextAnalysis
        .bpeSegmentWords(df, "text", ms)
        .collect().head.getString(1).split(" ").toSeq
    }
    assert(seg("abc", Seq(("a", "b"), ("ab", "c"))) === Seq("abc"))
    assert(seg("aaaa", Seq(("a", "a"))) === Seq("aa", "aa"))
    assert(seg("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
    assert(seg("xyz", Seq(("q", "r"))) === Seq("x", "y", "z"))
    assert(seg("abab", Seq(("a", "b"), ("ab", "ab")))
      === Seq("abab"))
    // round-trip: segmenting the TRAINING corpus with the trained
    // table reproduces training's own final symbol state — checked
    // against an independent driver replay of sequential greedy merges
    val ws = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++
      Seq.fill(9)("news")
    val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = graft.functions.TextAnalysis
      .bpeTrainLocal(docs, "text", 6)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def ref(w: String): Seq[String] = {
      var syms = w.split("").filter(_.nonEmpty).toSeq
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    val got = graft.functions.TextAnalysis
      .bpeSegmentWords(docs, "text", merges)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getInt(2), r.getLong(3))).toMap
    ws.distinct.foreach { w =>
      val r = ref(w)
      assert(got(w)._1 === r.mkString(" "), w)
      assert(got(w)._2 === r.length)
    }
    assert(got("low")._3 === 5L) // word_freq carried through
  }

  test("semanticDedup catches paraphrase twins MinHash cannot see; " +
      "pair search stays a cell equi-join") {
    import spark.implicits._
    // two paraphrase pairs with DISJOINT token sets (zero shared
    // n-grams → n-gram Jaccard 0, structurally invisible to MinHash)
    // whose embeddings sit at cosine ≈ 1; docs 5/6 are unrelated
    val texts = Seq(
      (1L, "the automobile accelerated rapidly down the highway"),
      (2L, "a car sped quickly along that road"),
      (3L, "physicians recommend drinking water every morning"),
      (4L, "doctors advise consuming fluids at dawn"),
      (5L, "quarterly earnings exceeded analyst expectations"),
      (6L, "volcanic eruptions reshape island geology"))
      .toDF("doc_id", "text")
    // hand-built embeddings: paraphrase pairs share a direction with a
    // tiny nudge; unrelated docs get orthogonal directions
    def vec(axis: Int, nudge: Double): Seq[Double] =
      Seq.tabulate(8)(i => (if (i == axis) 1.0 else 0.0) +
        (if (i == (axis + 1) % 8) nudge else 0.0))
    val embs = Seq(
      (1L, vec(0, 0.0)), (2L, vec(0, 0.01)),
      (3L, vec(2, 0.0)), (4L, vec(2, 0.01)),
      (5L, vec(4, 0.0)), (6L, vec(6, 0.0)))
      .toDF("doc_id", "embedding")
    // MinHash sees NOTHING: no shared grams → no shared band anywhere
    val mh = graft.functions.Dedup.minhashCandidates(
      texts, "doc_id", "text", numHashes = 16, bands = 8, ngramN = 2)
    assert(mh.isEmpty, "disjoint-token paraphrases must be MinHash-invisible")
    // semantic dedup pairs exactly the paraphrase twins
    val docs = embs.join(texts, "doc_id")
      .withColumn("quality", length(col("text")).cast("int"))
    val cents = graft.functions.Similarity.ivfCentroids(
      embs, "doc_id", "embedding", 4)
    val pairs = graft.functions.Dedup.semanticPairs(
      docs, "doc_id", "embedding", cents, threshold = 0.95)
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (3L, 4L)))
    // plan shape: the candidate join is an equi-join on the cell id —
    // no cartesian / nested-loop anywhere in the pair search
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"semantic pair search degenerated to all-pairs:\n$plan")
    assert(plan.contains("cell"), s"join keys lost the cell id:\n$plan")
    // end-to-end: one survivor per paraphrase pair, best quality kept
    // (doc 1 has the longer text of pair (1,2); doc 3 of pair (3,4))
    val kept = graft.functions.Dedup.semanticDedup(
        docs, "doc_id", "embedding", "quality", cents, threshold = 0.95)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("kept"))).toMap
    assert(kept(1L) === ((1L, true)) && kept(2L) === ((1L, false)))
    assert(kept(3L) === ((3L, true)) && kept(4L) === ((3L, false)))
    assert(kept(5L) === ((5L, true)) && kept(6L) === ((6L, true)))
  }

  test("content-defined chunking: spans tile the text, edits resync, " +
      "fixed chunking does not") {
    import spark.implicits._
    // aperiodic content (a periodic string makes every window hash
    // repeat with the period — boundaries all-or-nothing); any
    // polynomial mod 26 is periodic, so mix via a Knuth multiply
    val base = (1 to 400).map { i =>
      ('a' + (((i * 2654435761L) >>> 13) % 26)).toChar
    }.mkString
    val edited = "INSERTED!" + base // 9-char prefix insertion
    val df = Seq((1L, base), (2L, edited), (3L, "")).toDF("id", "text")
    val out = graft.functions.Multimodal
      .chunkContentDefined(df, "text")
      .collect()
      .groupBy(_.getAs[Long]("id"))
    // spans TILE each text exactly: contiguous, 1-based, full cover
    Seq(1L, 2L).foreach { id =>
      val spans = out(id).sortBy(_.getAs[Int]("chunk_idx"))
        .map(r => (r.getAs[Int]("chunk_start"), r.getAs[Int]("chunk_len")))
      assert(spans.head._1 === 1)
      spans.sliding(2).foreach {
        case Array((s1, l1), (s2, _)) => assert(s2 === s1 + l1)
        case _ =>
      }
      val n = if (id == 1L) base.length else edited.length
      assert(spans.last._1 + spans.last._2 - 1 === n)
    }
    assert(!out.contains(3L)) // empty payload -> no chunk rows
    // CDC property: after the first boundary past the edit, chunk
    // hashes RESYNC — the tail chunks of base reappear in edited
    val h1 = out(1L).map(_.getAs[String]("chunk_hash"))
    val h2 = out(2L).map(_.getAs[String]("chunk_hash")).toSet
    assert(out(1L).length >= 3, "fixture should produce several chunks")
    assert(h1.tail.forall(h2.contains),
      "all post-resync chunk hashes must survive the insertion")
    // fixed chunking loses EVERY chunk hash under the same edit
    val fixed = graft.functions.Multimodal.chunkFixed(
        df.filter(col("id") =!= 3L), "text", 64)
      .collect().groupBy(_.getAs[Long]("id"))
    val f1 = fixed(1L).map(_.getAs[String]("chunk_hash")).toSet
    val f2 = fixed(2L).map(_.getAs[String]("chunk_hash")).toSet
    assert((f1 intersect f2).isEmpty)
  }

  test("ivfOccupancyStats: balanced vs captured-cell quantizers") {
    import spark.implicits._
    val corpus = (0L until 100L).map { i =>
      (i, Seq((i % 10).toDouble, (i / 10).toDouble))
    }.toDF("vec_id", "embedding")
    // two far centroids splitting the 10x10 grid in half: balanced
    val balanced = Array(Array(2.0, 4.5), Array(7.0, 4.5))
    val b = Similarity.ivfOccupancyStats(corpus, "vec_id", "embedding",
      balanced).collect().head
    assert(b.getInt(0) === 2 && b.getLong(1) === 2L)
    assert(b.getLong(2) === 100L && b.getLong(3) === 50L)
    assert(b.getDouble(5) === 1.0)
    // one near centroid + one far outlier: capture — every vector in
    // cell 0, cell 1 empty, imbalance == n_used==1 so max/mean == 1?
    // no: mean is over USED cells; with one used cell max==mean —
    // the capture signal is n_cells_used << n_cells plus max == n
    val captured = Array(Array(4.5, 4.5), Array(1000.0, 1000.0))
    val c = Similarity.ivfOccupancyStats(corpus, "vec_id", "embedding",
      captured).collect().head
    assert(c.getInt(0) === 2 && c.getLong(1) === 1L)
    assert(c.getLong(3) === 100L)
  }

  test("chunkOverlapPairs: edited twin pairs, stop-chunk guard kills boilerplate") {
    import spark.implicits._
    val base = (1 to 500).map { i =>
      ('a' + (((i * 2654435761L) >>> 13) % 26)).toChar
    }.mkString
    val other = (1 to 500).map { i =>
      ('a' + (((i * 1099511628211L) >>> 17) % 26)).toChar
    }.mkString
    val df = Seq(
      (1L, base),
      (2L, "XYZ " + base),        // prefix-edited twin of 1
      (3L, other),                 // unrelated
      (4L, base.reverse)           // unrelated content, same chars
    ).toDF("id", "text")
    val pairs = graft.functions.Multimodal
      .chunkOverlapPairs(df, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("overlap")).toMap
    assert(pairs.contains((1L, 2L)), "edited twin must pair")
    assert(pairs((1L, 2L)) > 0.6)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // stop-chunk guard: a chunk shared by MORE than maxDf blobs
    // produces no candidates at all
    val boiler = (1L to 10L).map(i => (i, base)).toDF("id", "text")
    val guarded = graft.functions.Multimodal
      .chunkOverlapPairs(boiler, "id", "text", threshold = 0.5, maxDf = 5)
    assert(guarded.count() === 0L,
      "chunks above the df cap must generate no pairs")
    // ...and with the cap open, all 45 identical pairs appear at 1.0
    val open = graft.functions.Multimodal
      .chunkOverlapPairs(boiler, "id", "text", threshold = 0.5, maxDf = 100)
    assert(open.count() === 45L)
  }

  test("two-level IVF assignment: full probe == flat exactly, groups partition") {
    import spark.implicits._
    // deterministic pseudo-random corpus, dims=4
    val corpus = (0L until 200L).map { i =>
      (i, Seq.tabulate(4)(d => ((i * 31 + d * 17) % 19 - 9).toDouble / 9.0))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 12)
    val (supers, members) = Similarity.ivfGroups(cents, 4)
    // groups PARTITION the cells: every cell in exactly one group
    assert(members.flatten.sorted.toSeq === (0 until cents.length))
    // wprobe == ngroups scans every centroid -> bit-identical to flat
    // (including tie behavior: lower global cell id wins, as flat's
    // first-scanned-wins does)
    val flat = Similarity.ivfAssignments(corpus, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val full = Similarity.ivfAssignmentsTwoLevel(corpus, "vec_id",
        "embedding", cents, supers, members, wprobe = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(full === flat)
    // crafted tie: two IDENTICAL centroids in different groups; the
    // lower cell id must win under full probe, matching flat
    val tieCents = Array(Array(1.0, 0.0), Array(1.0, 0.0),
      Array(-1.0, 0.0), Array(0.0, 1.0))
    val (ts, tm) = Similarity.ivfGroups(tieCents, 4)
    val one = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.ivfAssignmentsTwoLevel(one, "vec_id", "embedding",
        tieCents, ts, tm, wprobe = 4)
      .collect().head.getInt(2)
    val flatGot = Similarity.ivfAssignments(one, "vec_id", "embedding",
      tieCents).collect().head.getInt(2)
    assert(got === 0 && flatGot === 0)
    // wprobe=1 agreement stays high on smooth data (approximation
    // quality floor, not exactness)
    val w1 = Similarity.ivfAssignmentsTwoLevel(corpus, "vec_id",
        "embedding", cents, supers, members, wprobe = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val agree = flat.count { case (k, v) => w1(k) == v }
    assert(agree >= 160, s"two-level wprobe=1 agreement too low: $agree/200")
  }

  test("char entropy: hand values, code points, empty and null text") {
    import spark.implicits._
    val df = Seq(
      (1, "aaaa"),          // one symbol: 0 bits
      (2, "ab"),            // two equiprobable: exactly 1 bit
      (3, "aabb"),          // still 1 bit
      (4, ""),              // empty: all zeros
      (5, "😀😀a") // emoji = ONE code point, twice
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.charEntropy(col("text")).as("ce"))
      .select(col("id"), col("ce.n_chars"), col("ce.n_distinct"),
        col("ce.entropy_nanos"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1) === ((4L, 1L, 0L)))
    // p=0.5 twice: each term floor(0.5*ln(.5)/ln2*1e9) = floor(-5e8)
    assert(out(2) === ((2L, 2L, 1000000000L)))
    assert(out(3) === ((4L, 2L, 1000000000L)))
    assert(out(4) === ((0L, 0L, 0L)))
    // 2 emoji + 1 'a' = 3 code points, 2 distinct (NOT 5 UTF-16 units)
    assert(out(5)._1 === 3L && out(5)._2 === 2L)
    // null text -> null struct, not a crash
    val nulls = Seq((6, null: String)).toDF("id", "text")
      .select(TextAnalysis.charEntropy(col("text")).as("ce")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("naive Bayes: hand-computed model, OOV fallback, prior-only empty doc") {
    import spark.implicits._
    val train = Seq(
      ("spam", "buy cheap pills buy"),
      ("spam", "cheap pills now"),
      ("ham", "meeting notes attached"),
      ("ham", "notes from the meeting"),
      ("ham", "the meeting moved")).toDF("y", "text")
    val model = TextAnalysis.naiveBayesTrain(train, "y", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // vocab = {buy cheap pills now meeting notes attached from the moved} = 10
    // spam tokens = 7, ham tokens = 10
    assert(model.size === 20) // dense: 10 terms x 2 labels
    assert(model(("spam", "buy"))._1 === 2L)
    assert(model(("ham", "buy"))._1 === 0L)
    // ln((2+1)/(7+10)) floor-quantized
    assert(model(("spam", "buy"))._2 ===
      math.floor(math.log(3.0 / 17.0) * 1e9) / 1e9)
    assert(model(("ham", "buy"))._2 ===
      math.floor(math.log(1.0 / 20.0) * 1e9) / 1e9)

    val priors = TextAnalysis.naiveBayesPriors(train, "y", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(priors("spam")._1 ===
      math.floor(math.log(2.0 / 5.0) * 1e9).toLong)
    assert(priors("ham")._3 === // 10 ham tokens + V=10
      math.floor(math.log(1.0 / 20.0) * 1e9) / 1e9)

    val test = Seq(
      (1L, "cheap pills"),          // clear spam
      (2L, "meeting notes"),        // clear ham
      (3L, "zzz qqq"),              // all-OOV: priors + OOV defaults
      (4L, "")).toDF("doc_id", "text") // empty: prior only -> ham (3/5)
    val m = TextAnalysis.naiveBayesTrain(train, "y", "text")
    val p = TextAnalysis.naiveBayesPriors(train, "y", "text")
    val out = TextAnalysis.naiveBayesClassify(test, "doc_id", "text", m, p)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "spam")
    assert(out(2L) === "ham")
    assert(out(4L) === "ham")
    // all-OOV doc: ham has larger prior AND larger (less negative) OOV
    // default (bigger denominator side: ln(1/30) < ln(1/27)? compute:
    // spam oov = 1/(7+10), ham oov = 1/(10+10) -> spam larger; decided
    // by the exact nano sums either way — replay them:
    val nanos = (lbl: String, terms: Int) =>
      priors(lbl)._1 + terms *
        math.floor(1 * (math.floor(math.log(1.0 /
          (if (lbl == "spam") 17 else 20)) * 1e9) / 1e9) * 1e9).toLong
    val expected3 = if (nanos("spam", 2) > nanos("ham", 2) ||
      (nanos("spam", 2) == nanos("ham", 2) && "ham" > "spam")) "spam"
      else "ham"
    assert(out(3L) === expected3)
  }

  test("NB n-gram features: word order separable only with bigrams") {
    import spark.implicits._
    // label f = the token stream, label r = SAME tokens reversed:
    // unigram bags identical between labels by construction
    val fwd = Seq("red green blue", "one two three four",
      "cat dog bird fish")
    val train = fwd.zipWithIndex.map { case (t, i) =>
        (i.toLong, "f", t) }
      .++(fwd.zipWithIndex.map { case (t, i) =>
        (i.toLong, "r", t.split(" ").reverse.mkString(" ")) })
      .toDF("id", "lbl", "text")
    val test = Seq((1L, "red green blue"), (2L, "blue green red"),
      (3L, "four three two one")).toDF("doc_id", "text")
    def classify(feats: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column) =
      TextAnalysis.naiveBayesClassify(test, "doc_id", "text",
        TextAnalysis.naiveBayesTrain(train, "lbl", "text", feats),
        TextAnalysis.naiveBayesPriors(train, "lbl", "text", feats),
        feats)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // unigram bag: every test doc ties between f and r (identical
    // counts, equal priors) -> label tie-break gives 'f' for ALL,
    // misclassifying the reversed docs
    val uni = classify(TextAnalysis.nbUnigramFeatures)
    assert(uni(1L) === "f" && uni(2L) === "f" && uni(3L) === "f")
    // bigrams encode order and separate
    val bi = classify(TextAnalysis.nbUnionFeatures(Seq(
      TextAnalysis.nbUnigramFeatures,
      TextAnalysis.nbWordNgramFeatures(2))))
    assert(bi(1L) === "f")
    assert(bi(2L) === "r")
    assert(bi(3L) === "r")
  }

  test("NB char-ngram features: OOV word classified by morphology") {
    import spark.implicits._
    // label A words share 'ab...' morphology, label B 'xy...': a test
    // word seen by NEITHER as a unigram still classifies by char
    // 2-grams
    val train = Seq(("A", "abc abd abe"), ("B", "xyz xyw xyv"))
      .toDF("lbl", "text")
    val test = Seq((1L, "abz"), (2L, "xyq")).toDF("doc_id", "text")
    val feats = TextAnalysis.nbCharNgramFeatures(2)
    val out = TextAnalysis.naiveBayesClassify(test, "doc_id", "text",
      TextAnalysis.naiveBayesTrain(train, "lbl", "text", feats),
      TextAnalysis.naiveBayesPriors(train, "lbl", "text", feats),
      feats)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "A")
    assert(out(2L) === "B")
    // the char n-gram stream itself: normalized (lower, ws-collapsed),
    // non-distinct, code-point offsets
    val grams = Seq((1L, "AB  ab"))
      .toDF("id", "text")
      .select(explode(TextAnalysis.nbCharNgramFeatures(2)(col("text")))
        .as("g"))
      .collect().map(_.getString(0)).toSeq
    assert(grams === Seq("ab", "b ", " a", "ab")) // "ab  ab" -> "ab ab"
  }

  test("graphAnnTopK: full-probe/big-ef exactness, IVF routing, small-ef recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val naturals = (0L until 300L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val planted = naturals.filter(_._1 % 20 == 0).flatMap { case (id, v) =>
      Seq(1, 2).map(j => (id + 1000L * j,
        v.map(x => x + 0.005f * j * (if (x > 0) 1 else -1))))
    }
    val corpus = (naturals ++ planted).toDF("vec_id", "embedding")
    val queries = naturals.filter(_._1 % 20 == 0)
      .toDF("query_id", "qvec")
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8)
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"))).toSet
    // EXACTNESS contract: every cell probed + ef >= any cell
    // population -> the walk visits the whole connected cell graph
    // and the result equals brute force exactly (ranks included)
    val exact = topSet(Similarity.graphAnnTopK(corpus, "vec_id",
      "embedding", queries, "query_id", "qvec", k = 5, cents,
      nprobe = 8, degree = 6, ef = 10000))
    val bf = topSet(Similarity.bruteForceTopK(corpus, "vec_id",
      "embedding", queries, "query_id", "qvec", k = 5))
    assert(exact === bf)
    // IVF routing at nprobe=3: the planted near-copies quantize with
    // their query, so rank-1/2 are recovered through the graph walk
    val routed = topSet(Similarity.graphAnnTopK(corpus, "vec_id",
      "embedding", queries, "query_id", "qvec", k = 2, cents,
      nprobe = 3, degree = 6, ef = 1024))
    queries.collect().map(_.getLong(0)).foreach { q =>
      assert(routed.contains((q, 1, q + 1000L)), s"query $q missing rank-1")
      assert(routed.contains((q, 2, q + 2000L)), s"query $q missing rank-2")
    }
    // STORED-INDEX parity: graphAnnBuild + graphAnnTopKIndexed must
    // reproduce the inline path exactly at every setting (shared
    // NswGraph build/walk — the graphs are identical by construction)
    val index = Similarity.graphAnnBuild(corpus, "vec_id", "embedding",
      cents, degree = 6, efConstruction = 64).localCheckpoint()
    val viaIndex = topSet(Similarity.graphAnnTopKIndexed(index,
      "vec_id", "embedding", queries, "query_id", "qvec", k = 2, cents,
      nprobe = 3, ef = 1024))
    assert(viaIndex === topSet(Similarity.graphAnnTopK(corpus, "vec_id",
      "embedding", queries, "query_id", "qvec", k = 2, cents,
      nprobe = 3, degree = 6, ef = 1024)))
    // INCREMENTAL APPEND: build from the naturals only, append the
    // planted twins as a delta against the FROZEN quantizer —
    // untouched rows pass through, touched cells insert via
    // search-and-link. The exactness contract is insertion-order
    // independent, so full probe + big ef over the appended index
    // still equals brute force over the full corpus; and every
    // planted twin (delta rows) must be findable.
    val baseIdx = Similarity.graphAnnBuild(naturals.toDF("vec_id",
      "embedding"), "vec_id", "embedding", cents, degree = 6,
      efConstruction = 64)
    val appended = Similarity.graphAnnAppend(baseIdx,
      planted.toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, degree = 6, efConstruction = 64).localCheckpoint()
    assert(appended.count() === corpus.count())
    val viaAppend = topSet(Similarity.graphAnnTopKIndexed(appended,
      "vec_id", "embedding", queries, "query_id", "qvec", k = 5, cents,
      nprobe = 8, ef = 10000))
    assert(viaAppend === bf)
    // the APPROXIMATE regime (small ef — the low-latency point of the
    // operator): recall of the planted rank-1 stays high; fully
    // deterministic for this seeded fixture
    val approx = topSet(Similarity.graphAnnTopK(corpus, "vec_id",
      "embedding", queries, "query_id", "qvec", k = 2, cents,
      nprobe = 3, degree = 6, ef = 8))
    val qids = queries.collect().map(_.getLong(0))
    val hit = qids.count(q => approx.contains((q, 1, q + 1000L)))
    assert(hit >= math.ceil(qids.length * 0.8).toInt,
      s"small-ef rank-1 recall too low: $hit/${qids.length}")
  }

  test("graphAnnRemove: rebuild == fresh build of survivors; no-op; whole cell; ivfRemove") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val pts = (0L until 240L).map(i =>
      (i, Array.fill(12)(rnd.nextFloat() * 2 - 1)))
    val corpus = pts.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 6)
    val full = Similarity.graphAnnBuild(corpus, "vec_id", "embedding",
      cents, degree = 4, efConstruction = 32).localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Int]("cell"), r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Double]]("embedding").toSeq,
        r.getAs[scala.collection.Seq[Long]]("neighbors").toSeq)).toSet
    // THE delete contract: remove(set) over build(all) is IDENTICAL
    // (neighbors included — the relink determinism) to a fresh build
    // of (all − set): touched cells re-run the same id-ordered
    // insertion, untouched cells pass through byte-identical.
    val dead = pts.map(_._1).filter(_ % 5 == 2).toDF("vec_id")
    val removed = Similarity.graphAnnRemove(full, dead, "vec_id",
      "embedding", degree = 4, efConstruction = 32)
    val fresh = Similarity.graphAnnBuild(
      corpus.filter(col("vec_id") % 5 =!= 2), "vec_id", "embedding",
      cents, degree = 4, efConstruction = 32)
    assert(rows(removed) === rows(fresh))
    // tombstones matching nothing: pure pass-through, no cell touched
    val noop = Similarity.graphAnnRemove(full,
      Seq(999999L).toDF("vec_id"), "vec_id", "embedding",
      degree = 4, efConstruction = 32)
    assert(rows(noop) === rows(full))
    // removing EVERY member of a cell leaves no rows for that cell
    // and still equals the fresh build of the survivors
    val cell0Ids = full.filter(col("cell") === 0).select(col("vec_id"))
    val rmCell = Similarity.graphAnnRemove(full, cell0Ids, "vec_id",
      "embedding", degree = 4, efConstruction = 32).localCheckpoint()
    assert(rmCell.filter(col("cell") === 0).count() === 0L)
    val freshNoCell = Similarity.graphAnnBuild(
      corpus.join(cell0Ids, Seq("vec_id"), "left_anti"), "vec_id",
      "embedding", cents, degree = 4, efConstruction = 32)
    assert(rows(rmCell) === rows(freshNoCell))
    // flat-index twin: ivfRemove drops exactly the tombstoned rows
    val idx = Similarity.ivfAssignments(corpus, "vec_id", "embedding",
      cents)
    val ivfRm = Similarity.ivfRemove(idx, dead, "vec_id")
    assert(ivfRm.count() === idx.count() - dead.count())
    assert(ivfRm.join(dead, Seq("vec_id"), "left_semi").count() === 0L)
    // survivors' assignment rows are untouched (no re-quantization)
    assert(ivfRm.exceptAll(idx).count() === 0L)
  }

  test("refineCentroids: splits an oversized cell, exactness holds under the refined quantizer") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    def around(center: Double, n: Int, base: Long) = (0 until n).map(i =>
      (base + i, Array.fill(8)(center + rnd.nextDouble() * 0.1)))
    // two healthy cells (40 points each) + one oversized cell whose
    // 300 members form 3 separable sub-blobs (metric-splittable —
    // the case the guard exists for)
    val pts = around(5.0, 40, 0L) ++ around(-5.0, 40, 1000L) ++
      around(0.0, 100, 2000L) ++ around(0.8, 100, 3000L) ++
      around(1.6, 100, 4000L)
    val corpus = pts.toDF("vec_id", "embedding")
    val cents = Array(Array.fill(8)(5.0), Array.fill(8)(-5.0),
      Array.fill(8)(0.8))
    def maxPop(cs: Array[Array[Double]]) = Similarity.ivfAssignments(
        corpus, "vec_id", "embedding", cs)
      .groupBy(col("cell")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxPop(cents) === 300L)
    val refined = Similarity.refineCentroids(corpus, "vec_id",
      "embedding", cents, maxPop = 120L)
    // untouched cells keep their centroids; the hot cell becomes
    // ceil(300/120) = 3 sub-centroids
    assert(refined.length === 5)
    assert(refined(0).toSeq === cents(0).toSeq)
    assert(refined(1).toSeq === cents(1).toSeq)
    // the split actually disperses the blob
    assert(maxPop(refined) <= 150L, s"still ${maxPop(refined)} together")
    // deterministic: a rerun yields bit-identical centroids
    val again = Similarity.refineCentroids(corpus, "vec_id",
      "embedding", cents, maxPop = 120L)
    assert(again.map(_.toSeq).toSeq === refined.map(_.toSeq).toSeq)
    // full-probe exactness is quantizer-agnostic: graph ANN under the
    // REFINED quantizer still equals brute force
    val queries = pts.filter(_._1 % 100 == 0).map { case (id, v) =>
      (id + 50000L, v) }.toDF("query_id", "qvec")
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"))).toSet
    val viaRefined = topSet(Similarity.graphAnnTopK(corpus, "vec_id",
      "embedding", queries, "query_id", "qvec", k = 3, refined,
      nprobe = 5, degree = 6, ef = 10000))
    val bf = topSet(Similarity.bruteForceTopK(corpus, "vec_id",
      "embedding", queries, "query_id", "qvec", k = 3))
    assert(viaRefined === bf)
  }

  test("wordpiece trainer: likelihood rule, double-tie break, ## chains, exhaustion") {
    import spark.implicits._
    // freq: aa×10, qu×2, ab×8. BPE's count rule would merge (a,##a)
    // first (count 10); WordPiece's score rule picks (q,##u): 2/(2·2)
    // = 0.5 beats 10/(18·10) — rare symbols merge first.
    val text = (Seq.fill(10)("aa") ++ Seq.fill(2)("qu") ++
      Seq.fill(8)("ab")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.wordpieceTrainLocal(docs, "text", nMerges = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // round 2 is an EXACT double tie: 10/(18·10) and 8/(18·8) are
    // both correctly-rounded 1/18 → identical doubles → (a,b) ASC
    // picks ##a over ##b. Round 4 has no pairs left → 3 rows only.
    assert(got.toSeq === Seq(
      (1, "q", "##u", 2L, 2L, 2L),
      (2, "a", "##a", 10L, 18L, 10L),
      (3, "a", "##b", 8L, 8L, 8L)))
    // continuation-chain merge keeps the ## marker: (##y,##z) wins
    // round 1 by the (a,b) ASC tie ('#' < 'x'), producing "##yz"
    val docs2 = Seq((1L, Seq.fill(5)("xyz").mkString(" ")))
      .toDF("doc_id", "text")
    val got2 = TextAnalysis.wordpieceTrainLocal(docs2, "text", nMerges = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got2.toSeq === Seq(
      (1, "##y", "##z"), (2, "x", "##yz")))
  }

  test("unigram Viterbi: hand DP, longer-piece tie rule, UNK fallback, code points") {
    import graft.expressions.UnigramSegment
    def tab(ps: (String, Long)*): java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      ps.foreach { case (p, v) => m.put(p, java.lang.Long.valueOf(v)) }
      m
    }
    // "abc": [ab][c] = -3-5 = -8 beats [a][bc] = -4-5 = -9 and
    // [a][b][c] = -4-6-5 = -15
    assert(UnigramSegment.viterbi("abc",
      tab("a" -> -4L, "b" -> -6L, "c" -> -5L, "ab" -> -3L, "bc" -> -5L),
      3).toSeq === Seq("ab", "c"))
    // exact tie: [ab] = -10 equals [a][b] = -10 -> LONGER piece wins
    assert(UnigramSegment.viterbi("ab",
      tab("a" -> -4L, "b" -> -6L, "ab" -> -10L), 2).toSeq === Seq("ab"))
    // the tie rule is applied at each END position: at pos 3 both
    // [a][ba] and [ab][a] score -14, and the longer FINAL piece wins
    assert(UnigramSegment.viterbi("aba",
      tab("a" -> -4L, "b" -> -6L, "ab" -> -10L, "ba" -> -10L), 2)
      .toSeq === Seq("a", "ba"))
    // OOV char: UNK-scored single char, segmentation still total
    assert(UnigramSegment.viterbi("axb",
      tab("a" -> -4L, "b" -> -6L), 3).toSeq === Seq("a", "x", "b"))
    // UNK always loses to any real piece covering the position
    assert(UnigramSegment.viterbi("ab",
      tab("ab" -> -999999999L), 2).toSeq === Seq("ab"))
    // empty word
    assert(UnigramSegment.viterbi("", tab("a" -> -1L), 3).toSeq === Seq.empty)
    // code points: emoji is ONE position (would split surrogates if
    // the DP ran on UTF-16 chars)
    assert(UnigramSegment.viterbi("a\ud83d\ude00b",
      tab("a" -> -4L, "b" -> -6L, "\ud83d\ude00" -> -2L,
        "a\ud83d\ude00" -> -3L), 3).toSeq === Seq("a\ud83d\ude00", "b"))
  }

  test("unigram soft-EM: hand posterior, char-mass conservation, EM monotonicity") {
    import spark.implicits._
    // hand-checkable lattice: corpus = "ab"×4, "cd"×4. Seed keeps all
    // chars + both bigrams; nothing pruned (targetMulti = seedMulti).
    val docs = Seq((1L, (Seq.fill(4)("ab") ++ Seq.fill(4)("cd"))
      .mkString(" "))).toDF("doc_id", "text")
    def table(rounds: Int) = TextAnalysis.unigramTrainSoftLocal(docs,
        "text", targetMulti = 2, seedMulti = 2, maxPieceLen = 2,
        emRounds = rounds)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val t1 = table(1)
    assert(t1.keySet === Set("a", "b", "c", "d", "ab", "cd"))
    // round-0 probs: every piece (4 chars + 2 bigrams) has seed count
    // 4 of total 24 → p = 1/6 each. Word "ab": P([ab]) = 1/6,
    // P([a][b]) = 1/36 → posterior(ab) = (1/6)/(1/6 + 1/36) = 6/7;
    // expected counts: ab → 4·6/7, a → 4·1/7 → floored to 1.0
    assert(math.abs(t1("ab")._1 - 4.0 * 6 / 7) < 1e-9)
    assert(t1("a")._1 === 1.0) // 4/7 ≈ 0.57 → char floor lifts to 1
    // char-mass conservation BEFORE the floor: each word's posterior
    // segmentations cover its chars exactly once, so Σ E[c(p)]·len(p)
    // = Σ f(w)·len(w) = 16. With 4 chars floored from 4/7 to 1, the
    // reported mass is 16 + 4·(1 − 4/7)
    val mass = t1.iterator.map { case (p, (c, _)) => c * p.length }.sum
    assert(math.abs(mass - (16.0 + 4 * (1.0 - 4.0 / 7))) < 1e-9)
    // EM monotonicity (the EM guarantee): corpus log-likelihood under
    // the round-r table is non-decreasing in r. LL computed from the
    // returned tables by the spec's own forward pass.
    def ll(tab: Map[String, (Double, Long)]): Double = {
      val total = tab.values.map(_._1).sum
      def lp(p: String) = math.log(tab(p)._1 / total)
      // words ab, cd with freq 4: forward = p(piece) + p(a)p(b)
      Seq("ab", "cd").map { w =>
        4.0 * math.log(math.exp(lp(w)) +
          math.exp(lp(w.substring(0, 1)) + lp(w.substring(1))))
      }.sum
    }
    val lls = Seq(1, 2, 3).map(r => ll(table(r)))
    assert(lls.sliding(2).forall { case Seq(a, b) => b >= a - 1e-9 },
      s"EM likelihood decreased: $lls")
    // soft-EM concentrates on the bigram segmentation round over round
    assert(table(3)("ab")._1 > t1("ab")._1)
  }

  test("unigram soft-EM quantized: hand posterior in nano, tracks the unquantized twin") {
    import spark.implicits._
    // same hand lattice as the unquantized spec: "ab"×4, "cd"×4
    val docs = Seq((1L, (Seq.fill(4)("ab") ++ Seq.fill(4)("cd"))
      .mkString(" "))).toDF("doc_id", "text")
    val q = TextAnalysis.unigramTrainSoftQuantLocal(docs, "text",
        targetMulti = 2, seedMulti = 2, maxPieceLen = 2, emRounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q.keySet === Set("a", "b", "c", "d", "ab", "cd"))
    // posterior(ab) = 6/7 per occurrence; 4 occurrences → expected
    // count 24/7, quantized per-word: floor((6/7·4)·1e9) — ONE word
    // carries all 4 occurrences, so one floor of the total
    assert(q("ab") === math.floor((6.0 / 7 * 4) * 1e9).toLong)
    // char a: 4·1/7 ≈ 0.571e9 nano → floored to 1e9 (one occurrence)
    assert(q("a") === 1000000000L)
    // the quantized table tracks the unquantized twin within
    // quantization error (≤ one nano per contributing word)
    val u = TextAnalysis.unigramTrainSoftLocal(docs, "text",
        targetMulti = 2, seedMulti = 2, maxPieceLen = 2, emRounds = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    q.foreach { case (p, nano) =>
      assert(math.abs(nano / 1e9 - u(p)) < 1e-6,
        s"piece $p: quant ${nano / 1e9} vs soft ${u(p)}")
    }
    // bit-stable by construction: a rerun is identical to the long
    val q2 = TextAnalysis.unigramTrainSoftQuantLocal(docs, "text",
        targetMulti = 2, seedMulti = 2, maxPieceLen = 2, emRounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q2 === q)
    // multi-round stays in the quantize→divide→quantize discipline
    // and keeps concentrating mass on the bigram
    val q3 = TextAnalysis.unigramTrainSoftQuantLocal(docs, "text",
        targetMulti = 2, seedMulti = 2, maxPieceLen = 2, emRounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q3("ab") > q("ab"))
  }

  test("unigram exact-loss pruning: lost-mass scores, hand lattice, loss beats count rank") {
    import spark.implicits._
    // hand lattice: "ab"×4, "cd"×4 — seed keeps both bigrams; after
    // one EM round p(ab) = p(cd) by symmetry, and removing "ab" from
    // word "ab" leaves only the a·b path: lost fraction =
    // 1 − (p(a)p(b)) / (p(ab) + p(a)p(b))
    val docs = Seq((1L, (Seq.fill(4)("ab") ++ Seq.fill(4)("cd"))
      .mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.unigramTrainPruneLocal(docs, "text",
        targetMulti = 2, pruneCand = 2, seedMulti = 2, maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byPiece = out.map(t => t._1 -> t).toMap
    assert(byPiece.keySet === Set("a", "b", "c", "d", "ab", "cd"))
    // chars are never scored (unprunable)
    Seq("a", "b", "c", "d").foreach(c => assert(byPiece(c)._3 === 0L))
    // the two bigrams have identical lattices → identical loss
    assert(byPiece("ab")._3 === byPiece("cd")._3 && byPiece("ab")._3 > 0L)
    // exact value: post-EM nano counts replayed by the spec
    val cnt = out.map(t => t._1 -> t._2).toMap
    val tot = cnt.values.sum.toDouble
    val pa = cnt("a") / tot; val pb = cnt("b") / tot
    val pab = cnt("ab") / tot
    val aFull = pab + pa * pb
    val expected = math.floor(((1.0 - (pa * pb) / aFull) * 4.0) * 1e9).toLong
    assert(byPiece("ab")._3 === expected)
    // determinism: rerun bit-identical
    val out2 = TextAnalysis.unigramTrainPruneLocal(docs, "text",
        targetMulti = 2, pruneCand = 2, seedMulti = 2, maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out2.toSeq === out.toSeq)
    // loss-rank differs from count-rank where it should: "xy" appears
    // often but ONLY inside "xyz" where the trigram also covers it —
    // removing "xy" costs little mass (xyz + x·y·z paths remain),
    // while rarer "qr" is load-bearing for "qr" the word. With
    // targetMulti = 1 the loss rank must keep the piece whose removal
    // loses more mass even if its count is lower.
    val docs2 = Seq((1L,
      (Seq.fill(12)("xyz") ++ Seq.fill(5)("qr")).mkString(" ")))
      .toDF("doc_id", "text")
    val pruned = TextAnalysis.unigramTrainPruneLocal(docs2, "text",
        targetMulti = 1, pruneCand = 4, seedMulti = 8, maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .filter(_._1.length > 1)
    // whichever multi piece survives, its loss must be the max among
    // candidates — sanity that selection is BY LOSS
    assert(pruned.length === 1 && pruned.head._2 > 0L)
  }

  test("unigram trainer: char floor, prune bound, kernel/driver round-trip parity") {
    import spark.implicits._
    // corpus where a frequent bigram absorbs its chars: 'ab' dominates
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, if (i % 4 == 3) "xy xy ab" else "ab ab ab ab"))
      .toDF("doc_id", "text")
    val trained = TextAnalysis.unigramTrainLocal(docs, "text",
      targetMulti = 2, seedMulti = 8, maxPieceLen = 2, emRounds = 2)
    val rows = trained.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byPiece = rows.map(t => t._1 -> t).toMap
    // every corpus char survives (a, b, x, y), floored at >= 1 even
    // when fully absorbed by 'ab'/'xy'
    Seq("a", "b", "x", "y").foreach { c =>
      assert(byPiece.contains(c), s"char $c pruned")
      assert(byPiece(c)._2 >= 1L)
    }
    assert(byPiece("a")._2 === 1L) // fully absorbed -> floor
    // multi-char pieces bounded by targetMulti and actually useful
    val multi = rows.filter(_._1.length > 1)
    assert(multi.length <= 2 && multi.map(_._1).toSet === Set("ab", "xy"))
    // log-probs: quantized ln(cnt/total), monotone in cnt
    val total = rows.map(_._2).sum.toDouble
    rows.foreach { case (_, c, lp) =>
      assert(lp === math.floor(StrictMath.log(c / total) * 1e9).toLong)
    }
    // round-trip: the kernel's segmentation of the training corpus
    // equals the driver Viterbi under the same table
    val pieces = rows.map(t => (t._1, t._3)).toSeq
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach { case (p, v) => m.put(p, java.lang.Long.valueOf(v)) }
    val seg = TextAnalysis.unigramSegmentWords(docs, "text", pieces)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(seg.keySet === Set("ab", "xy"))
    seg.foreach { case (w, syms) =>
      assert(syms === graft.expressions.UnigramSegment
        .viterbi(w, m, 2).mkString(" "))
    }
    assert(seg("ab") === "ab" && seg("xy") === "xy")
  }
}

/** Instrumented decoder factory (top-level object so executors in
  * local mode share the counters with the test).
  */
/** JNI-shaped mock: every open() "allocates a native handle" (an entry
  * in a process-wide table, like a malloc'd codec context) that only
  * close() frees. A payload of "CRASH" raises a LinkageError — the
  * shape of a real native-bridge failure, which the per-row Exception
  * channel deliberately does NOT absorb — so the task dies and only
  * the task-completion listener stands between the handle and a leak.
  */
object NativeHandleDecoderFactory
    extends graft.functions.Multimodal.MediaDecoderFactory {
  val nextHandle = new java.util.concurrent.atomic.AtomicLong(0)
  val live: java.util.Set[java.lang.Long] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { opens.set(0); closes.set(0); live.clear() }
  def open(): graft.functions.Multimodal.MediaDecoder = {
    opens.incrementAndGet()
    val handle = java.lang.Long.valueOf(nextHandle.incrementAndGet())
    live.add(handle)
    new graft.functions.Multimodal.MediaDecoder {
      def decode(bytes: Array[Byte]): (String, Int, Int, Int) = {
        if (!live.contains(handle))
          throw new IllegalStateException("use after free")
        if (bytes != null && new String(bytes, "UTF-8") == "CRASH")
          throw new LinkageError("simulated native codec crash")
        ("native-mock", 4, 4, 1)
      }
      override def close(): Unit = {
        if (live.remove(handle)) closes.incrementAndGet()
        ()
      }
    }
  }
}

object CountingDecoderFactory extends graft.functions.Multimodal.MediaDecoderFactory {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { opens.set(0); closes.set(0) }
  def open(): graft.functions.Multimodal.MediaDecoder = {
    opens.incrementAndGet()
    new graft.functions.Multimodal.MediaDecoder {
      def decode(bytes: Array[Byte]): (String, Int, Int, Int) =
        ("fake-codec", 8, 8, 1)
      override def close(): Unit = { closes.incrementAndGet(); () }
    }
  }
}
