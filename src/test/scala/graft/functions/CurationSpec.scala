package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.operators.Sessionize

class CurationSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang")
  }

  test("splitAssign: deterministic, complete, and stable under growth") {
    val d1 = docs((0L until 200L).map(i => (i, s"doc $i", "en")): _*)
    val a = Curation.splitAssign(d1, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(a.size == 200)
    // every bucket in [0,100), split consistent with bucket
    a.values.foreach { case (b, s) =>
      assert(b >= 0 && b < 100)
      assert(s == (if (b < 90) "train" else if (b < 95) "valid" else "test"))
    }
    // all three splits are populated at n=200
    assert(a.values.map(_._2).toSet == Set("train", "valid", "test"))
    // growing the corpus never reassigns an existing id
    val d2 = docs((0L until 400L).map(i => (i, s"doc $i", "en")): _*)
    val b = Curation.splitAssign(d2, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    a.foreach { case (id, v) => assert(b(id) == v) }
  }

  test("stratifiedSample: per-stratum rates honored deterministically") {
    val d = docs((0L until 1000L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "en" else "de")): _*)
    val kept = Curation.stratifiedSample(d, "doc_id", "lang",
      Seq("en" -> 2000), defaultPer10k = 5000).collect()
    val en = kept.count(_.getString(2) == "en")
    val de = kept.count(_.getString(2) == "de")
    // 500 docs per stratum; expectation 100 en / 250 de, generous bounds
    assert(en > 50 && en < 160, s"en kept $en")
    assert(de > 180 && de < 320, s"de kept $de")
    // deterministic: a second run keeps the identical id set
    val again = Curation.stratifiedSample(d, "doc_id", "lang",
      Seq("en" -> 2000), defaultPer10k = 5000).collect()
    assert(kept.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet)
  }

  test("piiRedact masks emails and phones, leaves clean text alone") {
    import spark.implicits._
    val d = Seq(
      "reach me at jane.doe+x@sub.example.org today",
      "call 555-0123 or 555-0123-4567 now",
      "nothing sensitive here").toDF("t")
    val out = d.select(Curation.piiRedact(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(out(0) == "reach me at <EMAIL> today")
    assert(out(1) == "call <PHONE> or <PHONE> now")
    assert(out(2) == "nothing sensitive here")
  }

  test("decontaminate flags only docs sharing an n-gram with the benchmark") {
    val bench = docs((900L, "the quick brown fox jumps over the lazy dog", "en"))
    val corpus = docs(
      (1L, "the quick brown fox jumps somewhere else entirely today", "en"),
      (2L, "completely unrelated text with no shared phrases at all", "en"),
      (3L, "the quick brown fox jumps over the lazy dog exactly", "en"))
    val out = Curation.decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(1L) && out.contains(3L) && !out.contains(2L))
    // doc 3 contains the whole benchmark doc: every benchmark gram hits
    assert(out(3L) > out(1L))
  }

  test("decontaminateBloom output is bit-identical to exact decontaminate") {
    val bench = docs(
      (900L, "the quick brown fox jumps over the lazy dog", "en"),
      (901L, "pack my box with five dozen liquor jugs", "en"))
    val corpus = docs((1L to 60L).map { i =>
      val text =
        if (i % 7 == 0) s"prefix $i the quick brown fox jumps over it"
        else if (i % 11 == 0) s"note $i pack my box with five dozen things"
        else s"unique filler document number $i with plain words"
      (i, text, "en")
    }: _*)
    val exact = Curation.decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().map(_.toSeq)
    val bloom = Curation.decontaminateBloom(corpus, bench, "doc_id", "text",
      n = 4, expectedGrams = 1000L, numBits = 65536L)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(exact.nonEmpty)
    assert(bloom.toSeq == exact.toSeq)
  }

  test("packSequences: offsets are contiguous per shard, packs honor budget") {
    val d = docs((1L to 100L).map(i =>
      (i, Seq.fill((i % 13 + 1).toInt)("tok").mkString(" "), "en")): _*)
    val out = Curation.packSequences(d, "doc_id", "text",
      budget = 16, nShards = 4).collect()
    assert(out.length == 100)
    // within each shard ordered by id: start = previous end
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      var expectStart = 0L
      sorted.foreach { r =>
        val (nTok, start) = (r.getLong(2), r.getLong(3))
        assert(start == expectStart, s"doc ${r.getLong(0)} start")
        assert(r.getLong(4) == start / 16)            // pack_first
        assert(r.getLong(5) == math.max(start + nTok - 1, start) / 16)
        expectStart = start + nTok
      }
    }
    // a doc spanning a 16-token boundary reports pack_first < pack_last
    assert(out.exists(r => r.getLong(4) < r.getLong(5)))
  }

  test("packSequences: empty docs occupy zero width at their offset") {
    val d = docs((1L, "a b c", "en"), (2L, "   ", "en"), (3L, "d e", "en"))
    val out = Curation.packSequences(d, "doc_id", "text",
      budget = 4, nShards = 1).collect().sortBy(_.getLong(0))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(byId(2L)._1 == 0L)                 // no tokens
    assert(byId(2L)._3 == byId(2L)._4)        // pack_first == pack_last
    // doc 3 starts exactly where doc 1 ended (empty doc consumed nothing)
    assert(byId(3L)._2 == byId(1L)._1)
  }

  test("shuffleAssign: permutation per shard, deterministic, salt re-rolls") {
    val d = docs((1L to 500L).map(i => (i, s"doc $i", "en")): _*)
    val out = Curation.shuffleAssign(d, "doc_id", nShards = 8).collect()
    assert(out.length == 500)
    // pos is a 1..n permutation within every shard
    out.groupBy(_.getLong(1)).foreach { case (s, rows) =>
      assert(s >= 0 && s < 8)
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic under re-run; a different salt produces a new order
    val again = Curation.shuffleAssign(d, "doc_id", nShards = 8).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    val rerolled = Curation.shuffleAssign(d, "doc_id", 8, salt = "epoch2|")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rerolled != out.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("topTokens: counts, ordering, tie-break") {
    val d = docs(
      (1L, "b b b a a c", "en"),
      (2L, "a b  ", "en"))
    val out = Curation.topTokens(d, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("b", 4L), ("a", 3L), ("c", 1L)))
  }

  test("repetitionStats: ttr and max frequency") {
    val d = docs((1L, "a a a b", "en"), (2L, "w x y z", "en"))
    val out = Curation.repetitionStats(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getInt(4))).toMap
    assert(out(1L) == ((4, 2, 0.5, 3)))
    assert(out(2L) == ((4, 4, 1.0, 1)))
  }

  test("repetitionStats: adversarial single-token megadoc stays linear-ish") {
    // 200k copies of one token — the old distinct×tokens nested scan
    // did ~4e10 comparisons here; the sorted-run fold is one pass
    val mega = Seq.fill(200000)("spam").mkString(" ")
    val d = docs((1L, mega, "en"), (2L, "", "en"))
    val t0 = System.nanoTime()
    val out = Curation.repetitionStats(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out(1L).getInt(1) == 200000 && out(1L).getInt(2) == 1)
    assert(out(1L).getInt(4) == 200000)
    // empty doc: split('') = [''] on both engines → one empty token
    assert(out(2L).getInt(1) == 1 && out(2L).getInt(4) == 1)
    assert(secs < 30.0, s"megadoc took $secs s — quadratic regression?")
  }

  test("bloomNumBits sizing and decontaminateBloomAuto parity") {
    // classic figures: 1% fpp ≈ 9.59 bits/item, 3% ≈ 7.30 bits/item
    assert(math.abs(Curation.bloomNumBits(1000000L, 0.01) / 1e6 - 9.585) < 0.01)
    assert(math.abs(Curation.bloomNumBits(1000000L, 0.03) / 1e6 - 7.298) < 0.01)
    val bench = docs((900L, "the quick brown fox jumps over the lazy dog", "en"))
    val corpus = docs(
      (1L, "the quick brown fox jumps somewhere else entirely today", "en"),
      (2L, "completely unrelated text with no shared phrases at all", "en"))
    val exact = Curation.decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().map(_.toSeq)
    val auto = Curation.decontaminateBloomAuto(corpus, bench, "doc_id",
      "text", n = 4, expectedGrams = 500L, fpp = 0.01)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(auto.toSeq == exact.toSeq)
  }

  test("packSequences/shuffleAssign reject colliding id column names") {
    val d = docs((1L, "a b", "en")).withColumnRenamed("doc_id", "shard")
    intercept[IllegalArgumentException] {
      Curation.packSequences(d, "shard", "text", budget = 4, nShards = 2)
    }
    intercept[IllegalArgumentException] {
      Curation.shuffleAssign(d, "shard", nShards = 2)
    }
  }

  test("connectedComponents: chain, clique, and pair resolve to min labels") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), clique 10-11-12, pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dupSpanStats: interval union, cross-doc only, hashGrams parity") {
    import spark.implicits._
    // docs 1 and 2 share "ABCDEFGH" (8 chars); doc 3 repeats its own
    // substring but shares nothing cross-doc; doc 4 is short
    val docs = Seq(
      (1L, "xxABCDEFGHyy"),
      (2L, "ABCDEFGHzzzz"),
      (3L, "ppppQQQQppppQQQQ"),
      (4L, "ab")).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, "doc_id", "text", gramChars = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: grams ABCD..EFGH at pos 3..7 (5 grams), union = [3, 11) = 8 chars
    assert(out(1)._1 === 5L)
    assert(out(1)._2 === 8L)
    // doc 2: same 5 grams at pos 1..5, union = [1, 9) = 8 chars
    assert(out(2)._2 === 8L)
    // doc 3: self-repeats only → no cross-doc grams
    assert(out(3) === ((0L, 0L, 0.0)))
    // doc 4: shorter than gram size
    assert(out(4) === ((0L, 0L, 0.0)))
    // hashed variant computes identical statistics
    val hashed = Dedup.dupSpanStats(docs, "doc_id", "text", 4,
      hashGrams = true)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(hashed === out)
  }

  test("dupSpans: maximal merged extents — overlap, touch, disjoint, none") {
    import spark.implicits._
    // k=4. doc1/doc2 share "ABCDEFGH" (overlapping grams → ONE span)
    // and doc1 repeats "ABCD" later (disjoint second span). doc5/doc6
    // share "KLMN" and "OPQR", which in doc5 sit EXACTLY adjacent —
    // intervals [1,5) and [5,9) touch and must merge into one maximal
    // run. doc3 self-repeats only (no cross-doc grams → no rows).
    val docs = Seq(
      (1L, "xxABCDEFGHyyABCDzz"),
      (2L, "ABCDEFGHzzzz"),
      (3L, "ppppQQQQppppQQQQ"),
      (5L, "KLMNOPQR"),
      (6L, "KLMNzzOPQR")).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(docs, "doc_id", "text", gramChars = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // doc1: 5 overlapping grams at pos 3..7 → one span [3,10]; the
    // repeated ABCD at pos 13 → disjoint span [13,16]
    assert(spans((1L, 1L)) === ((3L, 10L, 8L, 5L)))
    assert(spans((1L, 2L)) === ((13L, 16L, 4L, 1L)))
    // doc2: one span [1,8]
    assert(spans((2L, 1L)) === ((1L, 8L, 8L, 5L)))
    // doc5: KLMN at [1,5) and OPQR at [5,9) TOUCH → merged [1,8]
    assert(spans((5L, 1L)) === ((1L, 8L, 8L, 2L)))
    // doc6: KLMN span [1,4], OPQR span [7,10] — separated, two spans
    assert(spans((6L, 1L)) === ((1L, 4L, 4L, 1L)))
    assert(spans((6L, 2L)) === ((7L, 10L, 4L, 1L)))
    // doc3: self-repeats are not cross-doc dups → no span rows
    assert(!spans.keySet.exists(_._1 == 3L))
    // coverage invariant: per-doc sum of span_len equals dupSpanStats'
    // interval-union dup_chars (the two operators share semantics)
    val fromSpans = spans.toSeq.groupBy(_._1._1)
      .map { case (d, ss) => d -> ss.map(_._2._3).sum }
    val cov = Dedup.dupSpanStats(docs, "doc_id", "text", gramChars = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { d =>
      assert(cov(d) === fromSpans.getOrElse(d, 0L), s"doc $d")
    }
    // hashGrams variant is identical
    val hashed = Dedup.dupSpans(docs, "doc_id", "text", 4,
      hashGrams = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(hashed === spans)
  }

  test("dupSpanPartners: three-way shared span attributes per-partner sub-extents") {
    import spark.implicits._
    // k=4. A = P+Q where P="abcdefgh" is shared with B, Q="ijklmnop"
    // with C, and D is a FULL copy of A. The P/Q boundary grams of A
    // exist only in A and D, so A's dup grams are contiguous → ONE
    // maximal span covering all of A, merged from evidence of THREE
    // different partners with three different sub-extents.
    val docs = Seq(
      (1L, "abcdefghijklmnop"), // A
      (2L, "xxabcdefghyy"),     // B: contains P
      (3L, "zzijklmnopww"),     // C: contains Q
      (4L, "abcdefghijklmnop")  // D = A
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanPartners(docs, "doc_id", "text", gramChars = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // A has 13 gram positions (1..13), all duplicated → span 1 only.
    // Partner B shares grams fully inside P (pos 1..5 → extent
    // [1,8]); C shares pos 9..13 → [9,16]; D shares everything.
    assert(got((1L, 1L, 2L)) === ((5L, 1L, 8L)))
    assert(got((1L, 1L, 3L)) === ((5L, 9L, 16L)))
    assert(got((1L, 1L, 4L)) === ((13L, 1L, 16L)))
    // B's copy of P sits at pos 3 → span [3,10], shared with A and D
    assert(got((2L, 1L, 1L)) === ((5L, 3L, 10L)))
    assert(got((2L, 1L, 4L)) === ((5L, 3L, 10L)))
    // C mirrors B
    assert(got((3L, 1L, 1L)) === ((5L, 3L, 10L)))
    assert(got((3L, 1L, 4L)) === ((5L, 3L, 10L)))
    // D mirrors A
    assert(got((4L, 1L, 2L)) === ((5L, 1L, 8L)))
    assert(got((4L, 1L, 3L)) === ((5L, 9L, 16L)))
    assert(got((4L, 1L, 1L)) === ((13L, 1L, 16L)))
    // B and C share nothing with each other; no self-partners
    assert(got.size === 10)
    assert(!got.keySet.exists(k => k._1 == k._3))
    // attribution is consistent with dupSpans: every (doc, span) with
    // partners IS a maximal span, and the union of partner extents
    // stays inside it
    val spans = Dedup.dupSpans(docs, "doc_id", "text", gramChars = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    got.foreach { case ((d, si, _), (_, s0, e0)) =>
      val (ss, se) = spans((d, si))
      assert(s0 >= ss && e0 <= se, s"extent [$s0,$e0] outside span [$ss,$se]")
    }
    // hashGrams variant is identical
    val hashed = Dedup.dupSpanPartners(docs, "doc_id", "text", 4,
        hashGrams = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(hashed === got)
  }

  test("CharGramsWithPos: bit-identical to the declarative substr transform") {
    import spark.implicits._
    // multi-byte code points (é = 2 bytes, 文 = 3, 𝄞 = surrogate
    // pair) — offsets must count CODE POINTS like Spark's substr;
    // plus shorter-than-k and empty strings
    val texts = Seq("hello world", "caférätsel文字化け", "a𝄞b𝄞c𝄞d",
      "ab", "", "   spaces  kept   raw ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val k = 3
    val both = df.select(
        org.apache.spark.sql.graftglue.Glue.column(
          graft.expressions.CharGramsWithPos(
            org.apache.spark.sql.graftglue.Glue.expression(col("text")),
            k)).as("kern"),
        when(length(col("text")) >= k,
          transform(sequence(lit(1), length(col("text")) - k + 1),
            i => struct(i.as("pos"),
              col("text").substr(i, lit(k)).as("gram"))))
          .otherwise(array()).as("decl"))
      .collect()
    both.foreach { r =>
      val kern = r.getSeq[org.apache.spark.sql.Row](0)
        .map(g => (g.getInt(0), g.getString(1)))
      val decl = r.getSeq[org.apache.spark.sql.Row](1)
        .map(g => (g.getInt(0), g.getString(1)))
      assert(kern === decl)
    }
  }

  test("keepBestPerCluster: quality argmax, id tiebreak, singletons") {
    import spark.implicits._
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), // cluster 1: tie 2 vs 3
      (10L, 5L), (11L, 99L),                        // cluster 10: 11 wins
      (42L, 7L)                                     // singleton
    ).toDF("doc_id", "len")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L)).toDF("id", "cluster_id")
    val out = Dedup.keepBestPerCluster(docs, "doc_id", clusters, "len")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Boolean]("kept"))).toMap
    assert(out === Map(
      1L -> (1L, false), 2L -> (1L, true), 3L -> (1L, false),
      10L -> (10L, false), 11L -> (10L, true),
      42L -> (42L, true)))
  }

  test("dsirLogWeights ranks target-like docs above off-domain docs") {
    import spark.implicits._
    // target domain: cooking text; raw corpus has one cooking doc, one
    // astronomy doc, one mixed — importance order must follow likeness
    val target = Seq(
      (100L, "simmer the garlic butter sauce slowly"),
      (101L, "whisk butter garlic into the warm sauce"),
      (102L, "season the sauce then simmer garlic")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "simmer garlic butter sauce"),
      (2L, "neutron star collapse emits gravitational waves"),
      (3L, "simmer the telescope sauce")).toDF("doc_id", "text")
    val out = graft.functions.Curation
      .dsirLogWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(3L) && out(3L) > out(2L),
      s"expected cooking > mixed > astronomy, got $out")
    // every raw doc is scored exactly once
    assert(out.size === 3)
    // reserved output names are guarded
    val bad = raw.withColumnRenamed("doc_id", "log_w")
    assertThrows[IllegalArgumentException] {
      graft.functions.Curation.dsirLogWeights(bad, target, "log_w", "text")
    }
  }

  test("sessionize: gap starts new session; rollup aggregates per session") {
    import spark.implicits._
    val gap = 1800000000L // 30 min in µs
    val ev = Seq(
      // user 1: two events 10 min apart, then one 31 min later
      (1L, 100L, 0L, 2.5), (2L, 100L, 600000000L, 1.5),
      (3L, 100L, 600000000L + 1860000000L, 4.0),
      // user 2: single event
      (4L, 200L, 0L, 9.0)
    ).toDF("event_id", "user_id", "ts_us", "value")
    val out = Sessionize.rollup(ev, "user_id", "event_id",
      col("ts_us"), gap, "value")
      .orderBy("user_id", "session_idx").collect()
    assert(out.length == 3)
    val s1 = out(0)
    assert(s1.getLong(0) == 100L && s1.getLong(1) == 1L &&
      s1.getLong(2) == 2L && s1.getDouble(5) == 4.0)
    val s2 = out(1)
    assert(s2.getLong(1) == 2L && s2.getLong(2) == 1L &&
      s2.getDouble(5) == 4.0)
    assert(out(2).getLong(0) == 200L)
    // exactly at the gap boundary (not >) stays in-session
    val edge = Seq((1L, 1L, 0L, 1.0), (2L, 1L, gap, 1.0))
      .toDF("event_id", "user_id", "ts_us", "value")
    assert(Sessionize.rollup(edge, "user_id", "event_id",
      col("ts_us"), gap, "value").count() == 1)
  }

  test("sessionize rollup plans a single exchange (windows + agg co-partition)") {
    import spark.implicits._
    val ev = (1L to 100L).map(i => (i, i % 5, i * 1000000L, 1.0))
      .toDF("event_id", "user_id", "ts_us", "value")
    val plan = Sessionize.rollup(ev, "user_id", "event_id",
      col("ts_us"), 1800000000L, "value")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 Exchange, got $exchanges:\n$plan")
  }

  test("temperatureMixture: α=1 is proportional, α<1 up-samples the tail") {
    import spark.implicits._
    val corpus = ((0L until 900L).map(i => (i, "big")) ++
      (900L until 1000L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    // α=1: every source keeps the same fraction budget/Σn
    val prop = Curation.temperatureMixture(corpus, "source", 1.0, 500L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(prop("big") === prop("small"))
    assert(prop("big") === 500L * 1000000L / 1000L)
    // α=0.5 (budget low enough that no source caps): the small source's
    // keep rate strictly exceeds the big one's
    val sq = Curation.temperatureMixture(corpus, "source", 0.5, 300L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sq("small")._3 > sq("big")._3)
    assert(sq("big")._2 === math.floor(math.sqrt(900.0) * 1e6).toLong)
    // expected kept = Σ rate·n/10^6 stays within rounding of the budget
    val expected = sq.values.map(v => v._3 * v._1 / 1000000.0).sum
    assert(math.abs(expected - 300.0) < 2.0, s"expected ≈ budget, got $expected")
    // once a source caps at 10^6 the residual budget does NOT
    // redistribute (mixing filters, it never replicates): at budget
    // 500 `small` caps (keeps all 100) and `big` carries only its own
    // α-share — expected kept is 375 + 100, short of the budget
    val sq500 = Curation.temperatureMixture(corpus, "source", 0.5, 500L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(sq500("small")._2 === 1000000L)
    val expected500 = sq500.values.map(v => v._2 * v._1 / 1000000.0).sum
    assert(math.abs(expected500 - 475.0) < 2.0, s"got $expected500")
    // a budget beyond the corpus caps every rate at 10^6, never above
    val capped = Curation.temperatureMixture(corpus, "source", 0.5, 100000L)
      .collect().map(_.getLong(3))
    assert(capped.forall(_ === 1000000L))
  }

  test("applyMixture: deterministic hash subset honoring per-source rates") {
    import spark.implicits._
    val corpus = ((0L until 400L).map(i => (i, "a")) ++
      (400L until 500L).map(i => (i, "b"))).toDF("doc_id", "source")
    val kept = Curation.applyMixture(corpus, "doc_id", "source", 0.5, 200L)
    val again = Curation.applyMixture(corpus, "doc_id", "source", 0.5, 200L)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === again.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(ids.subsetOf((0L until 500L).toSet))
    // schema passes through minus nothing (rate col dropped)
    assert(kept.columns.toSet === Set("doc_id", "source"))
    // per-source keep counts concentrate near rate·n/10^6
    val rates = Curation.temperatureMixture(corpus, "source", 0.5, 200L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (src, (n, ppm)) =>
      val exp = ppm * n / 1000000.0
      assert(math.abs(bySrc.getOrElse(src, 0L) - exp) <= 4 * math.sqrt(exp) + 3,
        s"$src kept ${bySrc.getOrElse(src, 0L)} vs expected $exp")
    }
  }

  test("negativeSample: k distinct non-self negatives, deterministic") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Curation.negativeSample(docs, "doc_id", k = 5, nShards = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet === (1L to 400L).toSet)
    byQuery.foreach { case (q, rows) =>
      val negs = rows.map(_._3)
      assert(negs.length >= 4 && negs.length <= 5, s"query $q: ${negs.length}")
      assert(negs.distinct.length === negs.length, s"query $q repeated a negative")
      assert(!negs.contains(q), s"query $q sampled itself")
    }
    // mostly k (self-collision odds ≈ k/n per query)
    assert(byQuery.values.count(_.length == 5) > 380)
    // bit-deterministic under a different layout
    val again = Curation.negativeSample(docs.repartition(7), "doc_id",
      k = 5, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === out.toSet)
  }

  test("leakageSafeSplit: clusters move as one unit; singletons match splitAssign") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 1-2-3 is one cluster; 10-11 another; rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Curation.leakageSafeSplit(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(3))).toMap
    // every cluster member shares the representative's split
    assert(Set(out(1L), out(2L), out(3L)).size === 1)
    assert(out(1L)._1 === 1L)
    assert(Set(out(10L), out(11L)).size === 1)
    // singletons: identical to the per-doc splitAssign
    val plain = Curation.splitAssign(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    (1L to 300L).filterNot(Set(1L, 2L, 3L, 10L, 11L)).foreach { i =>
      assert(out(i)._2 === plain(i), s"singleton $i diverged")
    }
    // all three splits actually occur at n=300
    assert(out.values.map(_._2).toSet === Set("train", "valid", "test"))
  }

  test("lengthBuckets: bound semantics, batch capacity, partition invariance") {
    import spark.implicits._
    val docs = (1L to 200L).map(i =>
      (i, (1L to (i % 37 + 1)).map(j => s"t$j").mkString(" "))) :+
      (201L, "")
    val df = docs.toDF("doc_id", "text")
    val out = Curation.lengthBuckets(df, "doc_id", "text",
      step = 8, batchSize = 4, nShards = 3).collect()
    out.foreach { r =>
      val (n, bound, waste) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("bucket_bound"), r.getAs[Long]("pad_waste"))
      // bound = smallest multiple of step >= n; waste < step
      assert(bound % 8 == 0 && bound >= n && (n == 0 || bound - n < 8))
      assert(waste == bound - n)
    }
    // no batch exceeds batchSize docs
    val sizes = out.groupBy(r => (r.getAs[Long]("shard"),
      r.getAs[Long]("bucket_bound"), r.getAs[Long]("batch_in_bucket")))
      .map(_._2.length)
    assert(sizes.forall(_ <= 4) && sizes.exists(_ == 4))
    // empty doc: zero tokens, zero bound, zero waste
    val empty = out.find(_.getAs[Long]("doc_id") == 201L).get
    assert(empty.getAs[Long]("n_tokens") == 0 &&
      empty.getAs[Long]("bucket_bound") == 0 &&
      empty.getAs[Long]("pad_waste") == 0)
    // batch-max accounting: the batch's max is the true pad-to if the
    // consumer pads per batch; waste is never worse than the bucket
    // bound's, and equals max − n within each batch
    out.groupBy(r => (r.getAs[Long]("shard"),
      r.getAs[Long]("bucket_bound"), r.getAs[Long]("batch_in_bucket")))
      .foreach { case (_, rows) =>
        val mx = rows.map(_.getAs[Long]("n_tokens")).max
        rows.foreach { r =>
          assert(r.getAs[Long]("batch_max_tokens") == mx)
          assert(r.getAs[Long]("pad_waste_batch_max") ==
            mx - r.getAs[Long]("n_tokens"))
          assert(r.getAs[Long]("pad_waste_batch_max") <=
            r.getAs[Long]("pad_waste"))
        }
      }
    // the batch-max window rides the bucket window's partitioning:
    // exactly ONE exchange in the whole plan
    val plan = Curation.lengthBuckets(df, "doc_id", "text",
      step = 8, batchSize = 4, nShards = 3)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"batch-max accounting added an exchange:\n$plan")
    // deterministic under a different physical layout
    val again = Curation.lengthBuckets(df.repartition(7), "doc_id", "text",
      step = 8, batchSize = 4, nShards = 3).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("batch_in_bucket"))).toSet
    assert(key(out) === key(again))
  }

  test("kAnonymityAudit: group sizes, violations, null as a value") {
    import spark.implicits._
    val df = Seq(
      ("NY", "a"), ("NY", "a"), ("NY", "a"),   // size 3: ok at k=3
      ("SF", "b"), ("SF", "b"),                // size 2: violates
      (null: String, "c")                      // null QI, size 1: violates
    ).toDF("city", "plan")
    val out = Curation.kAnonymityAudit(df, Seq("city", "plan"), k = 3)
      .collect().map(r => (Option(r.getString(0)).getOrElse("∅"),
        r.getString(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(("NY", "a")) === ((3L, false)))
    assert(out(("SF", "b")) === ((2L, true)))
    assert(out(("∅", "c")) === ((1L, true)))
    intercept[IllegalArgumentException] {
      Curation.kAnonymityAudit(df, Seq.empty, k = 3)
    }
  }

  test("scrubSpans: splice, overlap/unsorted guard, full cover, pass-through") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij"), // two spans
      (2L, "hello"),      // no spans -> untouched
      (3L, "xyz"),        // fully covered -> ''
      (4L, "0123456789")) // unsorted + overlapping spans
      .toDF("doc_id", "text")
    val spans = Seq(
      (1L, 2L, 3L),   // cut "bc"
      (1L, 6L, 7L),   // cut "fg"
      (3L, 1L, 3L),   // whole doc
      (4L, 7L, 9L),   // arrives BEFORE the earlier span
      (4L, 1L, 4L),
      (4L, 3L, 5L))   // overlaps the previous -> cursor guard
      .toDF("doc_id", "span_start", "span_end")
    val out = Curation.scrubSpans(docs, spans, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "adehij",  // a + de + hij
      2L -> "hello",
      3L -> "",
      4L -> "59"))     // cut [1,4]+[3,5] then [7,9] -> keep pos 6, 10
    // column set and order preserved
    val cols = Curation.scrubSpans(docs, spans, "doc_id", "text").columns
    assert(cols.toSeq === Seq("doc_id", "text"))
  }

  test("weightedSample: non-positive weights are excluded, never win") {
    import spark.implicits._
    // without the w > 0 contract, w = -1 gives 1/w < 0 so
    // u^(1/w) > 1 — the row would ALWAYS outrank every legal row;
    // w = 0 gives pow(u, +inf) = 0 (never wins, but still undefined
    // A-ES input). Both must be filtered, not ranked.
    val df = ((1L to 50L).map(i => (i, 10L)) ++
        Seq((100L, 0L), (101L, -1L), (102L, -1000000L)))
      .toDF("doc_id", "w")
    val picked = Curation.weightedSample(df, "doc_id", "w", k = 20)
      .collect().map(_.getLong(0)).toSet
    assert(picked.size === 20)
    assert(!picked.exists(_ >= 100L),
      "a non-positive-weight row entered the sample")
    // k larger than the legal population: only legal rows come back
    val all = Curation.weightedSample(df, "doc_id", "w", k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(all === (1L to 50L).toSet)
  }
}
