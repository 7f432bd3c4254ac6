package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit truths for the round-6 audit/mining operators (their gates
  * pin oracle parity; these pin hand-computed semantics).
  */
class AuditOpsSpec extends AnyFunSuite with SparkTestBase {

  test("ksDrift: hand-computed D on small samples; identical samples → 0") {
    import spark.implicits._
    // src = {1,2,3,4}, tgt = {3,4,5,6}: empirical CDFs diverge most
    // at v=2 (F_src=0.5, F_tgt=0) → D = 0.5
    val src = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val tgt = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = Profile.ksDrift(src, tgt, "v").collect().head
    assert(r.getAs[Long]("n_src") === 4L && r.getAs[Long]("n_tgt") === 4L)
    assert(r.getAs[Double]("ks") === 0.5)
    // identical distributions → D = 0
    val same = Profile.ksDrift(src, src, "v").collect().head
    assert(same.getAs[Double]("ks") === 0.0)
    // disjoint supports → D = 1
    val far = Seq(100.0, 101.0).toDF("v")
    assert(Profile.ksDrift(src, far, "v").collect().head
      .getAs[Double]("ks") === 1.0)
  }

  test("ksDriftBucketed: lower-bounds exact D, converges with buckets") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val src = (1 to 400).map(_ => rnd.nextDouble() * 100).toDF("v")
    val tgt = (1 to 400).map(_ => rnd.nextDouble() * 100 + 15).toDF("v")
    val exact = Profile.ksDrift(src, tgt, "v").collect().head
      .getAs[Double]("ks")
    val coarse = Profile.ksDriftBucketed(src, tgt, "v", 8).collect().head
      .getAs[Double]("ks_bucketed")
    val fine = Profile.ksDriftBucketed(src, tgt, "v", 512).collect().head
      .getAs[Double]("ks_bucketed")
    assert(coarse <= exact + 1e-9)
    assert(fine <= exact + 1e-9)
    assert(fine >= coarse - 1e-9)          // refinement never loses
    assert(exact - fine < 0.02)            // 512 bins ≈ exact here
    // a planted shift this large must be visible even at 8 bins
    assert(coarse > 0.05)
  }

  test("marginTopPairs: margins from hand-built geometry; mined flag") {
    import spark.implicits._
    // target vectors: t1 along x, t2 along y, t3 at 45°.
    val tgt = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(1.0, 1.0))).toDF("vec_id", "v")
    // q1 nearly along x: cos(t1)=~1, cos(t3)=~0.72 → margin ≈ 1.38
    // q2 at 45°: cos(t3)=1, cos(t1)=cos(t2)=0.7071 → margin ≈ 1.414
    val src = Seq(
      (10L, Seq(0.99, 0.05)), (11L, Seq(1.0, 1.0))).toDF("src_id", "q")
    val out = graft.functions.Similarity.marginTopPairs(
        tgt, "vec_id", "v", src, "src_id", "q", marginThreshold = 1.4)
      .collect().map(r => r.getAs[Long]("src_id") ->
        (r.getAs[Long]("tgt_id"), r.getAs[Double]("margin"),
          r.getAs[Boolean]("mined"))).toMap
    assert(out(10L)._1 === 1L)
    assert(!out(10L)._3 && out(10L)._2 < 1.4)
    assert(out(11L)._1 === 3L)
    assert(out(11L)._3 && math.abs(out(11L)._2 - 1.4142) < 0.001)
  }

  test("quotaSample: caps per stratum, hash-order stability under growth") {
    import spark.implicits._
    val docs = ((1L to 100L).map(i => (i, "a")) ++
      (101L to 110L).map(i => (i, "b"))).toDF("doc_id", "s")
    val out = graft.functions.Curation.quotaSample(docs, "doc_id", "s", 15)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byS = out.groupBy(_._2)
    assert(byS("a").length === 15)       // capped
    assert(byS("b").length === 10)       // under quota: all kept
    assert(out.forall(_._3 <= 15))
    // growth stability: adding docs never evicts an already-chosen doc
    // whose hash rank was strictly inside the quota... (new docs can
    // displace boundary picks; the SET of ranks stays 1..cap). Check
    // determinism instead: same picks on a different layout.
    val again = graft.functions.Curation.quotaSample(
      docs.repartition(7), "doc_id", "s", 15)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(again === out.toSet)
  }

  test("rboOverlap: identical lists hit the 1 - p^k closed form; shifts decay") {
    import spark.implicits._
    val list = (1 to 20).map(d => (1L, d.toLong * 100, d)).toDF(
      "query_id", "doc_id", "rank")
    val same = graft.functions.TextAnalysis.rboOverlap(
        list, list, "query_id", "doc_id", "rank", p = 0.9, k = 20)
      .collect().head
    assert(same.getAs[Long]("n_joint") === 20L)
    // RBO of identical top-k lists = (1-p)·Σ p^(d-1) = 1 - p^k;
    // frozen floor-quantized weights land just below the exact value
    val exact = 1.0 - math.pow(0.9, 20)
    val got = same.getAs[Double]("rbo")
    assert(got <= exact && exact - got < 1e-3, s"$got vs $exact")
    // one-position rotation loses top-weighted mass but stays high
    val shifted = (1 to 20).map(d => (1L, (d % 20 + 1).toLong * 100, d))
      .toDF("query_id", "doc_id", "rank")
    val rot = graft.functions.TextAnalysis.rboOverlap(
        list, shifted, "query_id", "doc_id", "rank", p = 0.9, k = 20)
      .collect().head.getAs[Double]("rbo")
    assert(rot < got && rot > 0.5)
    // disjoint lists: no shared docs → no output row for the query
    val other = (1 to 20).map(d => (1L, d.toLong + 9000, d)).toDF(
      "query_id", "doc_id", "rank")
    assert(graft.functions.TextAnalysis.rboOverlap(
      list, other, "query_id", "doc_id", "rank").count() === 0L)
  }

  test("benfordAudit: log-uniform data fits, uniform data deviates") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // log-uniform magnitudes across 4 decades — Benford by construction
    val benford = (1 to 4000).map(_ =>
      math.pow(10.0, rnd.nextDouble() * 4)).toDF("v")
    val fit = Profile.benfordAudit(benford, "v").collect()
    assert(fit.map(_.getAs[Int]("digit")).sorted.toSeq === (1 to 9))
    assert(fit.map(_.getAs[Double]("dev")).max < 0.03)
    // digit-1 share must dominate (≈0.301)
    val d1 = fit.find(_.getAs[Int]("digit") == 1).get
    assert(math.abs(d1.getAs[Double]("obs_share") - 0.301) < 0.03)
    // uniform [1, 10): every leading digit equally likely → digit 1 at
    // ~0.111 vs expected 0.301 → dev ≈ 0.19
    val uniform = (1 to 4000).map(_ => 1.0 + rnd.nextDouble() * 9).toDF("v")
    val flat = Profile.benfordAudit(uniform, "v").collect()
    val flatD1 = flat.find(_.getAs[Int]("digit") == 1).get
    assert(flatD1.getAs[Double]("dev") > 0.1)
  }

  test("sourceCards: cross-source duplicate counts against both sources") {
    import spark.implicits._
    val docs = Seq(
      (1L, "sA", "en", 10L, "same text"),
      (2L, "sB", "en", 10L, "same   TEXT"),   // ws/case dup of 1
      (3L, "sA", "de", 20L, "unique one"),
      (4L, "sA", "en", 30L, "unique two"))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
    val cards = Profile.sourceCards(docs, "source", "doc_id", "text",
        "lang", "n_chars")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("dup_docs"),
          r.getAs[String]("top_lang"))).toMap
    assert(cards("sA") === ((3L, 1L, "en")))
    assert(cards("sB") === ((1L, 1L, "en")))
  }
}
