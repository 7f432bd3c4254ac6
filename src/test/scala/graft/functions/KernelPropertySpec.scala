package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Property tests for the round-7 native kernels: each kernel is
  * checked against an INDEPENDENT driver-side reference
  * implementation on deterministically sampled random inputs, plus
  * the structural invariants that define the operator.
  */
class KernelPropertySpec extends AnyFunSuite with SparkTestBase {

  /** Deterministic sampler (same convention as ConvertSpec — the
    * scalatestplus bridge is not on the offline classpath).
    */
  private def samples[A](gen: Gen[A], n: Int = 60): Seq[A] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 300)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf(" ", " ", "\t", ".", "!"),
      1 -> Gen.oneOf("é", "ü", "中", "文", "😀"))) // incl emoji
  } yield cs.mkString

  test("property: CharEntropy equals reference on random unicode text") {
    import spark.implicits._
    def ref(s: String): (Long, Long, Long) = {
      val cps = s.codePoints().toArray
      val n = cps.length.toLong
      if (n == 0) (0L, 0L, 0L)
      else {
        val counts = cps.groupBy(identity).view.mapValues(_.length.toLong)
        val nanos = counts.values.map { c =>
          val p = c.toDouble / n.toDouble
          math.floor(p * math.log(p) / math.log(2.0) * 1e9).toLong
        }.sum
        (n, counts.size.toLong, -nanos)
      }
    }
    val texts = samples(textGen).distinct
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.charEntropy(col("text")).as("ce"))
      .collect()
      .map(r => r.getLong(0) -> {
        val s = r.getStruct(1); (s.getLong(0), s.getLong(1), s.getLong(2))
      }).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === ref(t), s"mismatch for ${t.take(40)}")
    }
    // invariants: entropy within [0, n*log2(distinct)] nano-bits (+1
    // per-term floor slack), permutation invariance
    texts.zipWithIndex.foreach { case (t, i) =>
      val (n, k, e) = got(i.toLong)
      assert(e >= 0L)
      if (k > 0)
        assert(e <= (n * math.log(k.toDouble) / math.log(2.0) * 1e9)
          .toLong + k)
    }
    val perm = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, new String(t.codePoints().toArray.sorted
        .flatMap(Character.toChars), 0,
        t.codePoints().toArray.sorted.flatMap(Character.toChars).length))
    }.toDF("id", "text")
      .select(col("id"), TextAnalysis.charEntropy(col("text")).as("ce"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1).getLong(2)).toMap
    texts.indices.foreach { i =>
      assert(perm(i.toLong) === got(i.toLong)._3,
        "entropy must be order-invariant in the character stream")
    }
  }

  test("property: ContentChunks boundaries equal reference; spans tile") {
    import spark.implicits._
    val w = 16; val p = 31L; val m = 1000000007L; val d = 64L
    def ref(s: String): Seq[(Int, Int)] = {
      val cps = s.codePoints().toArray.map(_.toLong)
      val n = cps.length
      if (n == 0) return Seq.empty
      val coef = Array.iterate(1L, w)(c => c * p % m)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var prev = 0
      for (i <- w to n) {
        var h = 0L
        for (j <- 0 until w) h = (h + cps(i - 1 - j) * coef(j)) % m
        if (h % d == 0L) { out += ((prev + 1, i - prev)); prev = i }
      }
      if (prev < n) out += ((prev + 1, n - prev))
      out.toSeq
    }
    val texts = samples(textGen).distinct
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = graft.functions.Multimodal.chunkContentDefined(got, "text")
      .collect()
      .groupBy(_.getAs[Long]("id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("chunk_idx"))
        .map(r => (r.getAs[Int]("chunk_start"), r.getAs[Int]("chunk_len")))
        .toSeq).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val spans = rows.getOrElse(i.toLong, Seq.empty)
      assert(spans === ref(t), s"boundary mismatch for ${t.take(40)}")
      // tiling invariant: contiguous from 1, covers every code point
      val n = t.codePoints().toArray.length
      if (n == 0) assert(spans.isEmpty)
      else {
        assert(spans.head._1 === 1)
        spans.sliding(2).foreach {
          case Seq((s1, l1), (s2, _)) => assert(s2 === s1 + l1)
          case _ =>
        }
        assert(spans.map(_._2).sum === n)
      }
    }
  }

  test("property: clamped ContentChunks equals reference; bounds hold") {
    import spark.implicits._
    val w = 16; val p = 31L; val m = 1000000007L; val d = 64L
    val minLen = 8; val maxLen = 40
    // independent driver reference of the clamped contract: a mask
    // hit closer than minLen to the previous ACCEPTED boundary is
    // ignored; a chunk reaching maxLen closes regardless of the mask
    def ref(s: String): Seq[(Int, Int)] = {
      val cps = s.codePoints().toArray.map(_.toLong)
      val n = cps.length
      if (n == 0) return Seq.empty
      val coef = Array.iterate(1L, w)(c => c * p % m)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var prev = 0
      for (i <- 1 to n) {
        val len = i - prev
        val hit = len >= minLen && i >= w && {
          var h = 0L
          for (j <- 0 until w) h = (h + cps(i - 1 - j) * coef(j)) % m
          h % d == 0L
        }
        if (hit || len == maxLen) { out += ((prev + 1, len)); prev = i }
      }
      if (prev < n) out += ((prev + 1, n - prev))
      out.toSeq
    }
    // random text PLUS boundary-drought payloads (repeated filler —
    // the low-entropy case the clamp exists for) and hash-mixed long
    // strings (Knuth multiply, not a periodic pattern — see the
    // verify recipe's CDC fixture note)
    val droughts = Seq("a" * 300, "ab" * 150, " " * 120,
      (0 until 400).map(i =>
        ('a' + (((i * 2654435761L) >>> 16) % 26).toInt).toChar).mkString)
    val texts = (samples(textGen).distinct ++ droughts)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = graft.functions.Multimodal.chunkContentDefined(got, "text",
        minLen = minLen, maxLen = maxLen)
      .collect()
      .groupBy(_.getAs[Long]("id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("chunk_idx"))
        .map(r => (r.getAs[Int]("chunk_start"), r.getAs[Int]("chunk_len")))
        .toSeq).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val spans = rows.getOrElse(i.toLong, Seq.empty)
      assert(spans === ref(t), s"clamped mismatch for ${t.take(40)}")
      val n = t.codePoints().toArray.length
      if (n == 0) assert(spans.isEmpty)
      else {
        // tiling + the clamp bounds: every chunk <= maxLen; every
        // chunk but the terminal tail >= minLen
        assert(spans.head._1 === 1)
        spans.sliding(2).foreach {
          case Seq((s1, l1), (s2, _)) => assert(s2 === s1 + l1)
          case _ =>
        }
        assert(spans.map(_._2).sum === n)
        assert(spans.forall(_._2 <= maxLen), s"maxLen violated: $spans")
        assert(spans.dropRight(1).forall(_._2 >= minLen),
          s"minLen violated: $spans")
      }
    }
    // the drought payload demonstrates WHY: unclamped emits one giant
    // chunk, clamped bounds every chunk at maxLen
    val droughtDf = Seq((0L, "a" * 300)).toDF("id", "text")
    val unclamped = graft.functions.Multimodal
      .chunkContentDefined(droughtDf, "text")
      .collect().map(_.getAs[Int]("chunk_len"))
    val clamped = graft.functions.Multimodal
      .chunkContentDefined(droughtDf, "text",
        minLen = minLen, maxLen = maxLen)
      .collect().map(_.getAs[Int]("chunk_len"))
    assert(unclamped.max > maxLen) // the drought really happens
    assert(clamped.max <= maxLen)
  }

  test("property: BpeMergePair kernel equals the shared greedy rule") {
    import spark.implicits._
    // the distributed per-round kernel keeps its own UTF8String loop
    // for the hot path; this pins it bit-identical to BpeMerge.greedy
    // (the single shared rule the driver trainer and encoder use) on
    // random symbol chains incl. overlapping same-symbol runs
    val symGen: Gen[List[String]] = for {
      n <- Gen.choose(0, 12)
      ss <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "c", "q"))
    } yield ss
    val cases = samples(symGen, 80)
    val pairs = Seq(("a", "b"), ("a", "a"), ("ab", "c"), ("b", "a"))
    pairs.foreach { case (a, b) =>
      val viaKernel = cases.map(_.toSeq).toDF("s")
        .select(org.apache.spark.sql.graftglue.Glue.column(
          graft.expressions.BpeMergePair(
            org.apache.spark.sql.graftglue.Glue.expression(col("s")),
            a, b)))
        .as[Seq[String]].collect()
      cases.zip(viaKernel).foreach { case (in, out) =>
        val ref = graft.expressions.BpeMerge.greedy(in.toArray, a, b)
        assert(out === ref.toSeq, s"pair ($a,$b) on $in")
      }
    }
  }

  test("property: two-level full probe equals flat on random vectors") {
    import spark.implicits._
    val vecGen = for {
      dims <- Gen.const(6)
      nVec <- Gen.choose(20, 60)
      seedv <- Gen.choose(1, 1000000)
    } yield (nVec, seedv)
    samples(vecGen, 12).distinct.foreach { case (nVec, seedv) =>
      val corpus = (0L until nVec.toLong).map { i =>
        (i, Seq.tabulate(6)(dd =>
          (((i + seedv) * 2654435761L + dd * 40503L) % 2001 - 1000)
            .toDouble / 1000.0))
      }.toDF("vec_id", "embedding")
      val nlist = 8
      val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", nlist)
      Seq(1, 2, 3).foreach { ng =>
        val (supers, members) = Similarity.ivfGroups(cents, ng)
        assert(members.flatten.sorted.toSeq === (0 until cents.length))
        val flat = Similarity
          .ivfAssignments(corpus, "vec_id", "embedding", cents)
          .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
        val full = Similarity.ivfAssignmentsTwoLevel(corpus, "vec_id",
            "embedding", cents, supers, members, wprobe = ng)
          .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
        assert(full === flat,
          s"full-probe two-level diverged from flat (ngroups=$ng)")
      }
    }
  }

  test("property: IMI multi-sequence probe equals full pair sort") {
    // the lazy frontier walk must return the IDENTICAL (dist, cell)
    // prefix as materializing + sorting all K² pairs — including tie
    // plateaus, which the walk handles by draining equal-dist heap
    // entries past nprobe before the final sort
    val gen = for {
      k <- Gen.choose(3, 40)
      nprobe <- Gen.choose(1, k * k)
      quant <- Gen.oneOf(1L, 1L, 7L, 1000000L) // small quant → many ties
      d0 <- Gen.listOfN(k, Gen.choose(0L, 50L).map(_ * quant))
      d1 <- Gen.listOfN(k, Gen.choose(0L, 50L).map(_ * quant))
    } yield (nprobe, d0.toArray, d1.toArray)
    samples(gen, 120).foreach { case (nprobe, d0, d1) =>
      val d = Array(d0, d1)
      val sorted = graft.expressions.ImiProbeCells.pairsSorted(d, nprobe)
      val multi = graft.expressions.ImiProbeCells.pairsMultiSeq(d, nprobe)
      assert(multi.toSeq === sorted.toSeq,
        s"k=${d0.length} nprobe=$nprobe d0=${d0.mkString(",")} " +
          s"d1=${d1.mkString(",")}")
    }
    // all-equal distances: the fully degenerate plateau
    val flat = Array(Array.fill(9)(5L), Array.fill(9)(5L))
    assert(graft.expressions.ImiProbeCells.pairsMultiSeq(flat, 20).toSeq ===
      graft.expressions.ImiProbeCells.pairsSorted(flat, 20).toSeq)
  }

  test("property: tree assignment at full beam equals flat; training too") {
    import spark.implicits._
    val vecGen = for {
      nVec <- Gen.choose(30, 80)
      seedv <- Gen.choose(1, 1000000)
      nlist <- Gen.choose(5, 20)
      fanout <- Gen.choose(2, 4)
    } yield (nVec, seedv, nlist, fanout)
    samples(vecGen, 10).distinct.foreach { case (nVec, seedv, nlist, fanout) =>
      val corpus = (0L until nVec.toLong).map { i =>
        (i, Seq.tabulate(6)(dd =>
          (((i + seedv) * 2654435761L + dd * 40503L) % 2001 - 1000)
            .toDouble / 1000.0))
      }.toDF("vec_id", "embedding")
      val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding",
        nlist, oversample = 1)
      val tree = Similarity.ivfTree(cents, fanout)
      // structure: every global cell appears in exactly one leaf
      def leaves(n: graft.expressions.CentroidTreeNode): Seq[Int] =
        if (n.isLeaf) n.cells.toSeq else n.children.flatMap(leaves).toSeq
      assert(leaves(tree).sorted === cents.indices.toSeq)
      val flat = Similarity
        .ivfAssignments(corpus, "vec_id", "embedding", cents)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      // full beam (>= node count) must be bit-identical to flat
      val full = Similarity.ivfAssignmentsTree(corpus, "vec_id",
          "embedding", cents, tree, beam = tree.countNodes)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(full === flat,
        s"full-beam tree diverged from flat (nlist=$nlist fanout=$fanout)")
      // and full-beam TREE TRAINING equals flat training (shared
      // decimal means; only the assignment kernel differs)
      val flatTrained = Similarity.ivfTrain(corpus, "vec_id", "embedding",
        nlist, iters = 2, oversample = 1)
      val (treeTrained, stats) = Similarity.ivfTrainTree(corpus, "vec_id",
        "embedding", nlist, iters = 2, oversample = 1, fanout = fanout,
        beam = Int.MaxValue)
      assert(treeTrained.map(_.toSeq).toSeq ===
        flatTrained.map(_.toSeq).toSeq)
      assert(stats.length === 2)
    }
    // duplicate-centroid degeneracy terminates as a leaf, stays exact
    val dup = Array.fill(7)(Array(1.0, 2.0, 3.0))
    val dupTree = Similarity.ivfTree(dup, fanout = 3)
    def leaves2(n: graft.expressions.CentroidTreeNode): Seq[Int] =
      if (n.isLeaf) n.cells.toSeq else n.children.flatMap(leaves2).toSeq
    assert(leaves2(dupTree).sorted === (0 until 7))
  }

  test("property: two-level TRAINING at full probe equals flat training") {
    import spark.implicits._
    val vecGen = for {
      nVec <- Gen.choose(30, 80)
      seedv <- Gen.choose(1, 1000000)
    } yield (nVec, seedv)
    samples(vecGen, 8).distinct.foreach { case (nVec, seedv) =>
      val corpus = (0L until nVec.toLong).map { i =>
        (i, Seq.tabulate(6)(dd =>
          (((i + seedv) * 2654435761L + dd * 40503L) % 2001 - 1000)
            .toDouble / 1000.0))
      }.toDF("vec_id", "embedding")
      val nlist = 8
      val flat = Similarity.ivfTrain(corpus, "vec_id", "embedding",
        nlist, iters = 2, oversample = 1)
      Seq(2, 3).foreach { ng =>
        // wprobe == ngroups → every Lloyd assignment is bit-identical
        // to flat, and the shared decimal means path does the rest:
        // the TRAINED CENTROIDS must match exactly, not approximately
        val (two, stats) = Similarity.ivfTrainTwoLevel(corpus, "vec_id",
          "embedding", nlist, iters = 2, oversample = 1,
          ngroups = ng, wprobe = ng)
        assert(two.map(_.toSeq).toSeq === flat.map(_.toSeq).toSeq,
          s"two-level training diverged from flat (ngroups=$ng)")
        assert(stats.length === 2 && stats.map(_.iter) === Seq(0, 1))
      }
    }
  }

  test("kernels: Array ctor params compare by VALUE (canonicalization/CSE)") {
    // case-class equality on Array is reference equality — the
    // ArrayParamValueEquality mixin restores value semantics so
    // Catalyst subexpression elimination can dedup identical kernels
    val books = Array(
      Array(Array(0.0, 1.0), Array(2.0, 3.0)),
      Array(Array(4.0, 5.0), Array(6.0, 7.0)))
    val booksCopy = books.map(_.map(_.clone()))
    val child = org.apache.spark.sql.graftglue.Glue.expression(col("vec"))
    val a = graft.expressions.ImiCellAssign(child, books)
    val b = graft.expressions.ImiCellAssign(child, booksCopy)
    assert(a === b)
    assert(a.hashCode === b.hashCode)
    assert(a.semanticEquals(b))
    val p = graft.expressions.PqEncodeFlat(child, books)
    val q = graft.expressions.PqEncodeFlat(child, booksCopy)
    assert(p === q && p.semanticEquals(q))
    assert(p !== a) // different kernel class, same params
    val mutated = books.map(_.map(_.clone()))
    mutated(1)(0)(0) = 99.0
    assert(a !== graft.expressions.ImiCellAssign(child, mutated))
    val sChild = org.apache.spark.sql.graftglue.Glue.expression(col("w"))
    val m1 = graft.expressions.BpeSegmentWord(sChild, Array(("a", "b")))
    val m2 = graft.expressions.BpeSegmentWord(sChild, Array(("a", "b")))
    assert(m1 === m2 && m1.hashCode === m2.hashCode)
    assert(m1 !== graft.expressions.BpeSegmentWord(sChild, Array(("a", "c"))))
  }

  test("kernels: a null vector ELEMENT degrades to a null result, not a job failure") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Option(0.9), Option(0.9), Option(0.1), Option(0.1))),
      (2L, Seq(Option(1.0), None, Option(1.0), Option(1.0)))
    ).toDF("id", "vec") // array<double> with containsNull = true
    val books = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    def kcol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.graftglue.Glue.column(e)
    def vecE = org.apache.spark.sql.graftglue.Glue.expression(col("vec"))
    val got = df.select(col("id"),
        coalesce(kcol(graft.expressions.ImiCellAssign(vecE, books)),
          lit(-1)).as("cell"),
        kcol(graft.expressions.PqEncodeFlat(vecE, books)).as("codes"))
      .orderBy("id").collect()
    // half 0 (0.9,0.9) → c1; half 1 (0.1,0.1) → c0; cell = 1·2 + 0
    assert(got(0).getInt(1) === 2)
    assert(!got(0).isNullAt(2))
    assert(got(1).getInt(1) === -1) // null element → null cell → coalesce
    assert(got(1).isNullAt(2)) // null element → null codes
    // end-to-end: a degraded row must never reach the rankings —
    // without the isNotNull filter on dist_nano, Spark's NULLS FIRST
    // on the ascending sort would hand it rank 1 for every query
    val queries = Seq((10L, Seq(0.8, 0.8, 0.2, 0.2)))
      .toDF("query_id", "qvec")
    val top = Similarity.pqTopK(df, "id", "vec", queries, "query_id",
        "qvec", books, k = 2)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("rank")))
    assert(top.toSeq === Seq((1L, 1))) // row 2 degraded → excluded
  }
}
