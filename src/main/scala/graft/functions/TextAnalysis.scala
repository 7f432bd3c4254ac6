package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All pure Catalyst column expressions (whole-stage codegen, no UDFs)
  * so they run at 100 TB as map-only projections — no shuffle, no
  * driver involvement. Each has a DuckDB-expressible twin for the
  * correctness oracle (portable constructs only: replace-counting
  * instead of regexp_count, md5 instead of engine-specific hashes).
  */
object TextAnalysis {

  /** Reciprocal-rank fusion (Cormack et al. 2009) of any number of
    * ranked retrieval lists — the standard hybrid-search combiner
    * (BM25 + dense ANN, or any mix of retrievers): each list
    * contributes 1/(kConst + rank) for every (query, doc) it ranks,
    * contributions sum, and the fused top-k re-ranks on the total.
    * Rank-based (score scales never need calibrating across
    * retrievers), and kConst=60 is the published default.
    *
    * Scale shape: inputs are already per-query top-k lists (k rows per
    * query per retriever), so the union + groupBy shuffle carries
    * O(queries × k × lists) rows — independent of corpus size; the
    * re-rank window is per-query over ≤ k·lists rows and plans with
    * WindowGroupLimit. Portability: each contribution is
    * floor-quantized to 9 decimals and summed as DECIMAL(28,9), so
    * totals are order-independent and engine-replayable.
    *
    * Input contract: each list should carry one row per (query, doc);
    * a retriever that emits duplicates is defensively collapsed to its
    * best (minimum) rank per (query, doc) so neither the contribution
    * sum nor `n_lists` (count of lists ranking the doc) is inflated.
    */
  def rrfFuse(lists: Seq[DataFrame], queryCol: String, docCol: String,
      rankCol: String, kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(kConst > 0 && topK > 0, "kConst and topK must be positive")
    val unioned = lists
      .map(_.select(col(queryCol), col(docCol),
          col(rankCol).cast("long").as("__r"))
        .groupBy(col(queryCol), col(docCol))
        .agg(min(col("__r")).as("__r")))
      .reduce(_ unionByName _)
    val contrib = floor(lit(1.0) /
      (lit(kConst.toDouble) + col("__r").cast("double")) * 1e9) / 1e9
    val fused = unioned
      .select(col(queryCol), col(docCol),
        contrib.cast("decimal(28,9)").as("__c"))
      .groupBy(col(queryCol), col(docCol))
      .agg(sum(col("__c")).as("__s"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("__s").desc, col(docCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(queryCol), col(docCol),
        (floor(col("__s").cast("double") * 1e9) / 1e9).as("rrf_score"),
        col("n_lists"), col("rank"))
  }

  /** Rank-biased overlap (Webber et al. 2010) between two top-k
    * rankings per query — the standard top-weighted similarity of two
    * retrieval lists (e.g. lexical vs dense): RBO@k = (1−p) Σ_{d≤k}
    * p^(d−1)·|A_:d ∩ B_:d|/d. Restructured per shared doc: a doc
    * first present in both prefixes at depth m contributes
    * W(m) = Σ_{d=m..k} p^(d−1)/d, so the whole metric is ONE
    * equi-join on (query, doc) + a weight lookup + a per-query sum.
    * The weights are pre-quantized 12-decimal DECIMAL literals
    * ([[rboWeights]]) — the sum is exact and engine-replayable; an
    * oracle must embed the SAME literals (IEEE pow is not
    * cross-engine reproducible, frozen constants are).
    */
  def rboOverlap(listA: DataFrame, listB: DataFrame, queryCol: String,
      docCol: String, rankCol: String, p: Double = 0.9,
      k: Int = 20): DataFrame = {
    val wLits = array(rboWeights(p, k).map(s =>
      expr(s"CAST('$s' AS DECIMAL(16,12))")): _*)
    listA.alias("a")
      .join(listB.alias("b"), Seq(queryCol, docCol))
      .select(col(queryCol),
        greatest(col(s"a.$rankCol"), col(s"b.$rankCol")).as("__m"))
      // docs first co-present deeper than k contribute nothing to
      // RBO@k — and the filter keeps element_at inside the weight
      // array when callers pass lists longer than k (ANSI errors on
      // out-of-range element_at)
      .filter(col("__m") <= k)
      .select(col(queryCol), element_at(wLits, col("__m")).as("__w"))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_joint"), sum(col("__w")).as("__s"))
      .select(col(queryCol), col("n_joint"),
        (floor(col("__s").cast("double") * lit(1.0 - p) * 10000) / 10000)
          .as("rbo"))
  }

  /** W(m) = Σ_{d=m..k} p^(d−1)/d, floor-quantized to 12 decimals and
    * stringified — the frozen weight table [[rboOverlap]] and its
    * oracles share.
    */
  def rboWeights(p: Double, k: Int): Seq[String] =
    (1 to k).map { m =>
      val w = (m to k).map(d => math.pow(p, d - 1) / d).sum
      java.math.BigDecimal.valueOf(w)
        .setScale(12, java.math.RoundingMode.FLOOR).toPlainString
    }

  /** Quantize a double to 4 decimals via floor — unlike round(), floor
    * is a pure IEEE-double operation with no decimal-string tie
    * semantics, so Spark and any oracle engine produce bit-identical
    * results for bit-identical inputs.
    */
  def q4(c: Column): Column = floor(c * 10000) / 10000

  /** Whitespace tokenization; trim first so leading/trailing blanks
    * don't produce empty tokens.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Real greedy longest-match WordPiece segmentation of one pre-split
    * word against a fixed vocabulary (Wu et al. 2016) — the exact
    * algorithm, not the heuristic estimate below. Returns the piece
    * array ("##"-marked continuations); a word with no greedy
    * segmentation collapses to ["[UNK]"]. The vocab ships as one
    * per-partition reference object inside whole-stage codegen
    * (graft.expressions.WordpieceTokenize), so a 30k-piece production
    * vocab costs one hash-set per executor, not per row.
    */
  def wordpiecePieces(word: Column, vocab: Seq[String]): Column =
    exprColumn(graft.expressions.WordpieceTokenize(
      columnExpr(word), vocab))

  private def exprColumn(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftglue.Glue.column(e)
  private def columnExpr(c: Column) =
    org.apache.spark.sql.graftglue.Glue.expression(c)

  // heavy map-side kernels (tokenize/gram explodes) engage the whole
  // cluster even when the input arrived as one unsplittable scan split
  // — no-op on properly-split inputs (see Tables.spreadScan)
  private def spread(df: DataFrame): DataFrame =
    graft.sources.Tables.spreadScan(df)

  /** Non-distinct word n-gram stream as ONE native kernel —
    * bit-identical to the declarative sliding-window `transform`, but
    * safe to feed a Generate: the declarative form re-tokenizes per
    * element on the interpreted path (the PlanLint trap,
    * expressions.WordNgrams doc). n=1 is exactly the token array.
    */
  def wordNgramsAllNative(text: Column, n: Int, lowercase: Boolean): Column =
    exprColumn(graft.expressions.WordNgramsAll(columnExpr(text), n, lowercase))

  /** Non-overlapping p-token chunk array (≥ 1 chunk) as ONE native
    * kernel — the passage splitter, Generate-safe like
    * [[wordNgramsAllNative]].
    */
  def wordChunksNative(text: Column, p: Int): Column =
    exprColumn(graft.expressions.WordChunks(columnExpr(text), p))

  // ------------------------------------------------------------------
  // BPE tokenizer training (Sennrich et al. 2016 — public paper): the
  // corpus-scale induction step of a subword tokenizer. The corpus is
  // scanned ONCE into a word-frequency table; every subsequent merge
  // round works on the VOCAB (distinct words — orders of magnitude
  // smaller), the standard practice that makes BPE training tractable
  // at any corpus size.
  // ------------------------------------------------------------------

  /** Word-frequency table over lowercase [a-z]+ words — the single
    * corpus-sized pass of BPE training. Partial-agg'd groupBy; the
    * letters-only extraction keeps every downstream symbol free of
    * whitespace/regex metacharacters (symbols join on single spaces).
    */
  private def bpeWordFreq(df: DataFrame, textCol: String): DataFrame =
    spread(df.select(col(textCol)))
      .select(explode(expr(
        s"regexp_extract_all(lower(`$textCol`), '[a-z]+', 0)")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))

  /** Adjacent-symbol pair counts for the CURRENT segmentation —
    * round-k statistics of BPE training. Symbols ride as a
    * space-joined string so the Generate-safe native bigram kernel
    * ([[wordNgramsAllNative]]) produces the pair stream; counts are
    * weighted by word frequency and partial-aggregate to ≤ |pairs|
    * rows. `symsCol` must hold array<string> symbols.
    */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("__f"),
        explode(wordNgramsAllNative(
          array_join(col("__s"), " "), 2, lowercase = false)).as("__p"))
      .groupBy(col("__p")).agg(sum(col("__f")).as("n"))

  /** Top adjacent character-pair counts over the word-frequency table
    * — BPE training round 1's statistics as an auditable report.
    * Deterministic order: count desc, pair asc.
    */
  def bpePairCounts(df: DataFrame, textCol: String,
      topK: Int = 20): DataFrame =
    pairCounts(bpeWordFreq(df, textCol)
        .select(col("__w"), col("__f"), split(col("__w"), "").as("__s")))
      .select(substring_index(col("__p"), " ", 1).as("sym_a"),
        substring_index(col("__p"), " ", -1).as("sym_b"), col("n"))
      .orderBy(col("n").desc, col("sym_a").asc, col("sym_b").asc)
      .limit(topK)

  /** Full BPE merge training: `nMerges` rounds of (count pairs →
    * take the argmax (count desc, pair asc) → apply the merge
    * left-to-right greedily via the native [[graft.expressions.BpeMergePair]]
    * kernel). Returns the merge table (rank, sym_a, sym_b, n) — the
    * artifact a BPE tokenizer IS.
    *
    * Scale shape: ONE corpus scan builds the word-freq table; each
    * round is a vocab-sized pair count (partial-agg'd) plus a 1-row
    * TakeOrdered to the driver (bounded like the IVF centroid
    * hydration) and a map-side merge rewrite; `localCheckpoint`
    * truncates the growing per-round lineage (the connected-components
    * convention). Driver never holds more than one (pair, count) row.
    */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = bpeWordFreq(df, textCol)
      .select(col("__w"), col("__f"), split(col("__w"), "").as("__s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("__p").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top.head.getString(0)
        val n = top.head.getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        merges += ((r, a, b, n))
        vocab = vocab.withColumn("__s", exprColumn(
            graft.expressions.BpeMergePair(columnExpr(col("__s")), a, b)))
          .localCheckpoint()
        r += 1
      }
    }
    merges.toSeq.toDF("rank", "sym_a", "sym_b", "n")
  }

  /** [[bpeTrain]] at REALISTIC vocab scale (1k–32k merges): one
    * distributed corpus scan builds the word-frequency table, which
    * then trains DRIVER-SIDE — the bounded-artifact rule the IVF
    * centroids follow (the distinct-word table is MBs at any corpus
    * size; what is corpus-sized is counting it, which stays
    * distributed). The per-round distributed loop of [[bpeTrain]]
    * pays ~2 Spark jobs per merge — a scheduling floor that is
    * invisible at the gate's 8 merges and is the WHOLE cost at 32k
    * (measured in ScaleSmoke's `bpe` mode); the reference trainers
    * (SentencePiece, HF tokenizers — both public) are driver/local
    * for exactly this reason.
    *
    * Parity (spec-pinned): identical merge table to [[bpeTrain]] —
    * same word regex, same (count desc, pair-string asc) argmax (the
    * pair string is ASCII, so Java ordering == UTF8 binary ordering),
    * same greedy left-to-right merge with pair-skip, same stop-when-
    * no-pairs. The loop is incremental: a merge re-segments ONLY the
    * words currently containing the pair (tracked in a pair→words
    * occurrence index) and updates the global pair counts by delta —
    * O(affected words · word length) per round, not O(vocab).
    *
    * `maxVocab` guards the collect: training dies loudly rather than
    * silently materializing an unbounded vocabulary on the driver
    * (same contract as the quantizer hydration bounds).
    */
  def bpeTrainLocal(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 1 << 21): DataFrame = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // limit() bounds what reaches the driver BEFORE the collect: if
    // the vocabulary exceeds maxVocab, at most maxVocab+1 rows ever
    // materialize and the require fires — the guard cannot arrive
    // after the OOM it exists to prevent. Order is irrelevant: the
    // trainer builds pair counts from ALL rows and its argmax is a
    // full scan with a deterministic tie-break.
    val rows = bpeWordFreq(df, textCol).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"bpeTrainLocal: vocab exceeds maxVocab $maxVocab")
    val words: Array[Array[String]] =
      rows.map(_.getString(0).split("").filter(_.nonEmpty))
    val freq: Array[Long] = rows.map(_.getLong(1))
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    val occ = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.HashSet[Int]]
    def pairsOf(syms: Array[String]): Iterator[String] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator
        .map(i => syms(i) + " " + syms(i + 1))
    def addWord(idx: Int): Unit = pairsOf(words(idx)).foreach { p =>
      counts.updateWith(p) { c => Some(c.getOrElse(0L) + freq(idx)) }
      occ.getOrElseUpdate(p,
        scala.collection.mutable.HashSet.empty[Int]) += idx
    }
    def dropWord(idx: Int): Unit = pairsOf(words(idx)).foreach { p =>
      counts.updateWith(p) { c =>
        val n = c.getOrElse(0L) - freq(idx)
        if (n <= 0L) None else Some(n)
      }
      occ.get(p).foreach { s => s -= idx; if (s.isEmpty) occ -= p }
    }
    words.indices.foreach(addWord)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var r = 1
    while (r <= nMerges && counts.nonEmpty) {
      // argmax (count desc, pair asc) — order-independent full scan
      var bestP: String = null
      var bestN = 0L
      counts.foreach { case (p, n) =>
        if (bestP == null || n > bestN || (n == bestN && p < bestP)) {
          bestP = p; bestN = n
        }
      }
      val sep = bestP.indexOf(' ')
      val a = bestP.substring(0, sep)
      val b = bestP.substring(sep + 1)
      merges += ((r, a, b, bestN))
      // re-segment ONLY the words containing the pair, updating
      // counts and the occurrence index by delta
      val affected = occ.getOrElse(bestP,
        scala.collection.mutable.HashSet.empty[Int]).toArray
      affected.foreach { idx =>
        dropWord(idx)
        words(idx) = graft.expressions.BpeMerge.greedy(words(idx), a, b)
        addWord(idx)
      }
      r += 1
    }
    merges.toSeq.toDF("rank", "sym_a", "sym_b", "n")
  }

  /** Apply a trained BPE merge table to the corpus VOCABULARY — the
    * encoder half of the tokenizer ([[bpeTrain]]/[[bpeTrainLocal]]
    * produce the table; this consumes it). One distributed word-count
    * pass builds the distinct-word table; the
    * [[graft.expressions.BpeSegmentWord]] kernel applies all merges
    * in rank order per distinct word (sequential = the training
    * loop's own replay, so segmenting the TRAINING corpus reproduces
    * training's final vocab state exactly — oracle-gated). Output:
    * (word, syms [space-joined], n_syms, word_freq).
    *
    * 100 TB shape: tokenization cost splits into a vocab-sized encode
    * (this — millions of distinct words, map-only) and a corpus-sized
    * broadcast lookup of the resulting dictionary; the corpus never
    * re-runs the merge loop per token.
    */
  def bpeSegmentWords(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    bpeWordFreq(df, textCol)
      .select(col("__w").as("word"),
        exprColumn(graft.expressions.BpeSegmentWord(
          columnExpr(col("__w")), merges.toArray)).as("__s"),
        col("__f").as("word_freq"))
      .select(col("word"), array_join(col("__s"), " ").as("syms"),
        size(col("__s")).as("n_syms"), col("word_freq"))

  /** Train a WordPiece merge table (Schuster & Nakajima 2012; the
    * BERT tokenizer's training rule, Wu et al. 2016) driver-side over
    * the corpus word-frequency table — the [[bpeTrainLocal]] scale
    * contract: ONE distributed word count, then a driver loop over
    * the MB-sized vocab. Completes the tokenizer family's train side
    * (BPE: [[bpeTrain]]/[[bpeTrainLocal]]; unigram:
    * [[unigramTrainLocal]]; WordPiece encode was already gated via
    * [[wordpiecePieces]]).
    *
    * The rule that distinguishes WordPiece from BPE: each round
    * merges the adjacent pair maximizing LIKELIHOOD GAIN
    * score = count(a,b) / (count(a)·count(b)), not the raw pair
    * count — rare-symbol pairs merge first (`q ##u` before any
    * frequent `e ##r`). Words segment as first-char plain +
    * "##"-marked continuations; a merge concatenates with the
    * continuation marker stripped, so pieces stay position-typed.
    *
    * Cross-engine determinism: score = double(pn) / (double(an) ·
    * double(bn)) — each COUNT converts to double first (exact below
    * 2⁵³; any real corpus' word-occurrence total — ~2e13 at 100 TB —
    * is), then one IEEE multiply and one IEEE divide, each correctly
    * rounded, so Spark and the DuckDB oracle (which mirrors the same
    * operation order) compute bit-identical scores even where the
    * integer product an·bn itself would exceed 2⁵³ or overflow Long;
    * ties break (a ASC, b ASC). Merge application is the BPE greedy
    * left-to-right pair-skip scan (run-parity rule), ##-aware.
    * Output: (rank, sym_a, sym_b, n_pair, n_a, n_b) — counts, not the
    * double, ride in the gate's hash.
    */
  def wordpieceTrainLocal(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 1 << 21): DataFrame = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = bpeWordFreq(df, textCol).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"wordpieceTrainLocal: vocab exceeds maxVocab $maxVocab")
    val wf: Array[(String, Long)] =
      rows.map(r => (r.getString(0), r.getLong(1)))
    def strip(s: String): String =
      if (s.startsWith("##")) s.substring(2) else s
    // BpeMerge.greedy's scan with the ##-stripping concat
    def wpGreedy(syms: Array[String], a: String,
        b: String): Array[String] = {
      var found = false; var j = 0
      while (!found && j + 1 < syms.length) {
        found = syms(j) == a && syms(j + 1) == b; j += 1
      }
      if (!found) syms
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](
          syms.length)
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + strip(b)); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toArray
      }
    }
    val segs: Array[Array[String]] = wf.map { case (w, _) =>
      val cps = w.codePoints().toArray
      cps.indices.map(i =>
        if (i == 0) new String(cps, 0, 1)
        else "##" + new String(cps, i, 1)).toArray
    }
    // INCREMENTAL loop (the bpeTrainLocal shape, plus a maintained
    // symbol-count map for the score denominators): a merge
    // re-segments ONLY the words containing the pair (pair → words
    // occurrence index) and delta-updates both count maps — O(affected
    // words · word length) per round, not O(vocab). The per-round
    // argmax stays a full scan of the pair map (MB-sized at any
    // corpus), which is also what keeps it hash-order independent.
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val sc = scala.collection.mutable.HashMap.empty[String, Long]
    val occ = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def addWord(idx: Int): Unit = {
      val f = wf(idx)._2; val s = segs(idx)
      var j = 0
      while (j < s.length) {
        sc.updateWith(s(j))(c => Some(c.getOrElse(0L) + f))
        if (j + 1 < s.length) {
          val p = (s(j), s(j + 1))
          pc.updateWith(p)(c => Some(c.getOrElse(0L) + f))
          occ.getOrElseUpdate(p,
            scala.collection.mutable.HashSet.empty[Int]) += idx
        }
        j += 1
      }
    }
    def dropWord(idx: Int): Unit = {
      val f = wf(idx)._2; val s = segs(idx)
      var j = 0
      while (j < s.length) {
        sc.updateWith(s(j))(c => {
          val n = c.getOrElse(0L) - f
          if (n <= 0L) None else Some(n)
        })
        if (j + 1 < s.length) {
          val p = (s(j), s(j + 1))
          pc.updateWith(p)(c => {
            val n = c.getOrElse(0L) - f
            if (n <= 0L) None else Some(n)
          })
          occ.get(p).foreach { set => set -= idx; if (set.isEmpty) occ -= p }
        }
        j += 1
      }
    }
    wf.indices.foreach(addWord)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long, Long)]
    var r = 1
    while (r <= nMerges && pc.nonEmpty) {
      // argmax (score DESC, a ASC, b ASC) — hash-order independent
      var bA: String = null; var bB: String = null
      var bPn = 0L; var bScore = -1.0
      pc.foreach { case ((a, b), pn) =>
        // convert EACH count before multiplying: sc(a) * sc(b) as
        // Longs overflows past ~3e9-occurrence symbols (the 100 TB
        // regime), flipping the score sign. double·double then the
        // division are each ONE correctly-rounded IEEE op, so the
        // result stays bit-identical cross-engine even though the
        // product itself may round.
        val score = pn.toDouble / (sc(a).toDouble * sc(b).toDouble)
        if (score > bScore || (score == bScore &&
            (a < bA || (a == bA && b < bB)))) {
          bScore = score; bA = a; bB = b; bPn = pn
        }
      }
      merges += ((r, bA, bB, bPn, sc(bA), sc(bB)))
      val affected = occ.getOrElse((bA, bB),
        scala.collection.mutable.HashSet.empty[Int]).toArray
      affected.foreach { idx =>
        dropWord(idx)
        segs(idx) = wpGreedy(segs(idx), bA, bB)
        addWord(idx)
      }
      r += 1
    }
    merges.toSeq
      .toDF("rank", "sym_a", "sym_b", "n_pair", "n_a", "n_b")
  }

  // ------------------------------------------------------------------
  // Unigram-LM tokenizer (Kudo 2018, SentencePiece — public paper):
  // the third major subword algorithm next to BPE and WordPiece. Same
  // scale contract as bpeTrainLocal: ONE distributed corpus scan
  // builds the word-frequency table; training (seed → hard-EM →
  // prune) runs driver-side over the MB-sized vocab; encoding runs
  // the Viterbi kernel per DISTINCT word.
  // ------------------------------------------------------------------

  /** floor(ln(cnt/total)·1e9) per piece — the nano-quantized log-prob
    * table every Viterbi pass sums as LONGS (float discipline rule:
    * quantize once per round, never sum raw doubles cross-engine).
    * StrictMath.log pins the JVM side to fdlibm regardless of
    * intrinsics.
    */
  private def unigramLogp(
      counts: Iterable[(String, Long)]): java.util.HashMap[String, java.lang.Long] = {
    val total = counts.iterator.map(_._2).sum.toDouble
    val m = new java.util.HashMap[String, java.lang.Long](counts.size * 2)
    counts.foreach { case (p, c) =>
      m.put(p, java.lang.Long.valueOf(
        math.floor(StrictMath.log(c.toDouble / total) * 1e9).toLong))
    }
    m
  }

  /** Train a unigram-LM tokenizer (SentencePiece shape, hard-EM
    * variant) on the corpus word-frequency table. Pipeline, every
    * step deterministic and oracle-replayed in SQL:
    *
    *  1. SEED: every substring of length 1..`maxPieceLen` of every
    *     distinct word, counted by word frequency; keep ALL single
    *     characters plus the top `seedMulti` multi-char substrings by
    *     (count DESC, piece ASC).
    *  2. HARD-EM ×`emRounds`: Viterbi-segment every word under the
    *     current nano log-probs ([[graft.expressions.UnigramSegment]]
    *     — score DESC, longer-piece tie rule); recount pieces by word
    *     frequency. Multi-char pieces with zero count drop; single
    *     characters are floored at count 1 (coverage guarantee — a
    *     char absorbed by longer pieces must survive so any word
    *     stays segmentable after pruning).
    *  3. PRUNE: keep all single characters + the top `targetMulti`
    *     multi-char pieces by (count DESC, piece ASC); renormalize.
    *
    * Exact-loss pruning (re-Viterbi per removed piece) is the full
    * SentencePiece refinement; count-ranked pruning is the standard
    * simplification and keeps every step SQL-expressible for the
    * oracle. Output: (piece, cnt, logp_nano) — logp_nano =
    * floor(ln(cnt/Σcnt)·1e9).
    *
    * 100 TB shape: identical to [[bpeTrainLocal]] — the corpus-sized
    * work is one partial-agg'd word count; everything after runs on
    * the driver over the bounded vocab (`maxVocab`-guarded collect,
    * bounded BEFORE materialization by limit()).
    */
  def unigramTrainLocal(df: DataFrame, textCol: String,
      targetMulti: Int = 12, seedMulti: Int = 60, maxPieceLen: Int = 3,
      emRounds: Int = 2, maxVocab: Int = 1 << 21): DataFrame = {
    require(targetMulti >= 0 && seedMulti >= targetMulti,
      "need seedMulti >= targetMulti >= 0")
    require(maxPieceLen >= 1 && emRounds >= 1, "need maxPieceLen/emRounds >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = bpeWordFreq(df, textCol).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"unigramTrainLocal: vocab exceeds maxVocab $maxVocab")
    val wf: Array[(String, Long)] =
      rows.map(r => (r.getString(0), r.getLong(1)))
    // all single characters (code points) — never pruned
    val chars: Array[String] = wf.iterator.map(_._1)
      .flatMap(w => w.codePoints().toArray.map(Character.toString))
      .toSet.toArray.sorted
    // seed: substring counts, len 1..maxPieceLen in code points
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    wf.foreach { case (w, f) =>
      val cps = w.codePoints().toArray
      var i = 0
      while (i < cps.length) {
        var k = 1
        while (k <= math.min(maxPieceLen, cps.length - i)) {
          val p = new String(cps, i, k)
          sub.updateWith(p)(c => Some(c.getOrElse(0L) + f))
          k += 1
        }
        i += 1
      }
    }
    def topMulti(m: collection.Map[String, Long], n: Int): Seq[(String, Long)] =
      m.iterator.filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
        .toSeq.sortBy { case (p, c) => (-c, p) }.take(n)
    var counts: Seq[(String, Long)] =
      chars.map(c => (c, sub(c))).toSeq ++ topMulti(sub, seedMulti)
    var r = 1
    while (r <= emRounds) {
      val scores = unigramLogp(counts)
      val newc = scala.collection.mutable.HashMap.empty[String, Long]
      wf.foreach { case (w, f) =>
        graft.expressions.UnigramSegment.viterbi(w, scores, maxPieceLen)
          .foreach(p => newc.updateWith(p)(c => Some(c.getOrElse(0L) + f)))
      }
      counts = chars.map(c => (c, math.max(newc.getOrElse(c, 0L), 1L))).toSeq ++
        newc.iterator
          .filter { case (p, c) => p.codePointCount(0, p.length) > 1 && c > 0 }
          .toSeq.sortBy(_._1)
      r += 1
    }
    val countMap = counts.toMap
    val kept: Seq[(String, Long)] =
      chars.map(c => (c, countMap(c))).toSeq ++ topMulti(countMap, targetMulti)
    val logp = unigramLogp(kept)
    kept.map { case (p, c) => (p, c, logp.get(p).longValue()) }
      .sortBy(_._1)
      .toDF("piece", "cnt", "logp_nano")
  }

  /** log(e^a + e^b) without overflow; -∞-safe. */
  private def lse(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log1p(math.exp(math.min(a, b) - m)) }

  /** SOFT-EM unigram-LM training — the full published algorithm
    * (Kudo 2018 §3.2: the E-step computes EXPECTED piece counts by
    * forward–backward over each word's segmentation lattice, instead
    * of [[unigramTrainLocal]]'s hard Viterbi assignment). Same seed,
    * piece-set update (zero-mass multi-char pieces drop, single
    * chars floor at mass 1), prune and scale contract as the hard
    * trainer; counts are fractional (posterior mass), so the M-step
    * renormalizes real-valued weights.
    *
    * Float-honesty: forward–backward in LOG space is log-sum-exp
    * chains whose accumulation order no two engines reproduce
    * bit-identically, so this operator is SPEC-verified (posterior
    * char-mass conservation, hand-computed posteriors, the EM
    * likelihood monotonicity guarantee) rather than oracle-hashed.
    * [[unigramTrainSoftQuantLocal]] is the hash-gateable twin: the
    * same E-step in probability space with nano-quantized
    * contributions (gate txt_unigram_soft). Output here: (piece,
    * exp_cnt DOUBLE, logp_nano) sorted by piece.
    */
  def unigramTrainSoftLocal(df: DataFrame, textCol: String,
      targetMulti: Int = 12, seedMulti: Int = 60, maxPieceLen: Int = 3,
      emRounds: Int = 2, maxVocab: Int = 1 << 21): DataFrame = {
    require(targetMulti >= 0 && seedMulti >= targetMulti,
      "need seedMulti >= targetMulti >= 0")
    require(maxPieceLen >= 1 && emRounds >= 1, "need maxPieceLen/emRounds >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = bpeWordFreq(df, textCol).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"unigramTrainSoftLocal: vocab exceeds maxVocab $maxVocab")
    val wf: Array[(String, Long)] =
      rows.map(r => (r.getString(0), r.getLong(1)))
    val chars: Array[String] = wf.iterator.map(_._1)
      .flatMap(w => w.codePoints().toArray.map(Character.toString))
      .toSet.toArray.sorted
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    wf.foreach { case (w, f) =>
      val cps = w.codePoints().toArray
      var i = 0
      while (i < cps.length) {
        var k = 1
        while (k <= math.min(maxPieceLen, cps.length - i)) {
          sub.updateWith(new String(cps, i, k))(c =>
            Some(c.getOrElse(0L) + f))
          k += 1
        }
        i += 1
      }
    }
    val seedMultiPieces = sub.iterator
      .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(seedMulti)
    var counts: Seq[(String, Double)] =
      chars.map(c => (c, sub(c).toDouble)).toSeq ++
        seedMultiPieces.map { case (p, c) => (p, c.toDouble) }
    // expected counts of one word's pieces under `lp` — classic
    // lattice forward-backward in natural-log doubles
    def expected(w: String, f: Long,
        lp: java.util.HashMap[String, java.lang.Double],
        out: scala.collection.mutable.HashMap[String, Double]): Unit = {
      val cps = w.codePoints().toArray
      val L = cps.length
      def piece(i: Int, k: Int) = new String(cps, i, k)
      def score(i: Int, k: Int): Double = {
        val s = lp.get(piece(i, k))
        if (s eq null) Double.NegativeInfinity else s.doubleValue()
      }
      val alpha = Array.fill(L + 1)(Double.NegativeInfinity)
      val beta = Array.fill(L + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0; beta(L) = 0.0
      var i = 1
      while (i <= L) {
        var k = 1
        while (k <= math.min(maxPieceLen, i)) {
          alpha(i) = lse(alpha(i), alpha(i - k) + score(i - k, k)); k += 1
        }
        i += 1
      }
      var j = L - 1
      while (j >= 0) {
        var k = 1
        while (k <= math.min(maxPieceLen, L - j)) {
          beta(j) = lse(beta(j), score(j, k) + beta(j + k)); k += 1
        }
        j -= 1
      }
      if (alpha(L) == Double.NegativeInfinity) return // uncoverable
      var s = 0
      while (s < L) {
        var k = 1
        while (k <= math.min(maxPieceLen, L - s)) {
          val sc = score(s, k)
          if (sc != Double.NegativeInfinity) {
            val post = math.exp(alpha(s) + sc + beta(s + k) - alpha(L))
            if (post > 0.0)
              out.updateWith(piece(s, k))(c =>
                Some(c.getOrElse(0.0) + post * f))
          }
          k += 1
        }
        s += 1
      }
    }
    var r = 1
    while (r <= emRounds) {
      val total = counts.iterator.map(_._2).sum
      val lp = new java.util.HashMap[String, java.lang.Double](counts.size * 2)
      counts.foreach { case (p, c) => lp.put(p, math.log(c / total)) }
      val newc = scala.collection.mutable.HashMap.empty[String, Double]
      wf.foreach { case (w, f) => expected(w, f, lp, newc) }
      counts = chars.map(c => (c, math.max(newc.getOrElse(c, 0.0), 1.0)))
        .toSeq ++
        newc.iterator
          .filter { case (p, c) =>
            p.codePointCount(0, p.length) > 1 && c > 0.0 }
          .toSeq.sortBy(_._1)
      r += 1
    }
    val countMap = counts.toMap
    val kept: Seq[(String, Double)] =
      chars.map(c => (c, countMap(c))).toSeq ++
        countMap.iterator
          .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
          .toSeq.sortBy { case (p, c) => (-c, p) }.take(targetMulti)
    val total = kept.iterator.map(_._2).sum
    kept.map { case (p, c) =>
      (p, c, math.floor(math.log(c / total) * 1e9).toLong)
    }.sortBy(_._1).toDF("piece", "exp_cnt", "logp_nano")
  }

  /** SOFT-EM unigram training, HASH-GATEABLE edition — the full
    * forward–backward E-step of [[unigramTrainSoftLocal]] made
    * cross-engine bit-stable by two changes, closing the documented
    * float-honesty boundary for at least one EM round:
    *
    *  1. PROBABILITY space, not log space: α/β recurrences use only
    *     p = cnt/total (one correctly-rounded IEEE division of exact
    *     integers), multiplies and adds — each a SINGLE
    *     correctly-rounded operation, accumulated in a PINNED order
    *     (k ascending, ((t₁+t₂)+t₃)), so any IEEE-754 engine that
    *     mirrors the operation order reproduces every double
    *     bit-identically. No log/exp/log1p anywhere (the lse chains
    *     are exactly what no two engines agree on). Underflow costs
    *     nothing at sane word lengths: p ≥ 1/total keeps α above
    *     double-min for words ≤ ~140 chars even at a 2e13-occurrence
    *     corpus.
    *  2. Posterior contributions quantize BEFORE accumulation: each
    *     (word, piece) posterior mass becomes
    *     floor(((α·p·β/αL)·f)·1e9) — a LONG in nano-units — and the
    *     E-step total is a SUM OF LONGS, exact and order-free, so
    *     neither engine's aggregation order can matter (the
    *     floor(x·1e9)-longs discipline from the round-7 rule, applied
    *     to expected counts).
    *
    * Same seed, char-floor (one occurrence = 1e9 nano), zero-drop and
    * count-ranked prune as the other trainers. Output: (piece,
    * exp_cnt_nano) — the quantized expected counts; log-probs are
    * deliberately NOT emitted (ln is transcendental; consumers
    * re-derive locally). Nano totals sum in a Long: fine to ~9e18
    * nano ≈ 9e9 word occurrences per training vocab pass; past that
    * scale the quantization unit drops to micro (the discipline, not
    * the constant, is the contract). emRounds defaults to 1 — the
    * gated regime; more rounds stay bit-stable by the same argument
    * (round r+1's probabilities divide two exact longs again).
    */
  def unigramTrainSoftQuantLocal(df: DataFrame, textCol: String,
      targetMulti: Int = 12, seedMulti: Int = 60, maxPieceLen: Int = 3,
      emRounds: Int = 1, maxVocab: Int = 1 << 21): DataFrame = {
    require(targetMulti >= 0 && seedMulti >= targetMulti,
      "need seedMulti >= targetMulti >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val (_, chars, counts) = softQuantEm(df, textCol, seedMulti,
      maxPieceLen, emRounds, maxVocab)
    def topMulti(m: collection.Map[String, Long], n: Int): Seq[(String, Long)] =
      m.iterator.filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
        .toSeq.sortBy { case (p, c) => (-c, p) }.take(n)
    val countMap = counts.toMap
    val kept: Seq[(String, Long)] =
      chars.map(c => (c, countMap(c))).toSeq ++ topMulti(countMap, targetMulti)
    kept.sortBy(_._1).toDF("piece", "exp_cnt_nano")
  }

  /** The seed + quantized-soft-EM core shared by
    * [[unigramTrainSoftQuantLocal]] and [[unigramTrainPruneLocal]]:
    * returns (word-freq table, all single chars, post-EM nano counts)
    * BEFORE any pruning. Every double derives from exact longs
    * through single correctly-rounded IEEE ops in a pinned order
    * (standing rule 7) and posterior contributions quantize to nano
    * longs before the order-free integer sum.
    */
  private def softQuantEm(df: DataFrame, textCol: String,
      seedMulti: Int, maxPieceLen: Int, emRounds: Int, maxVocab: Int)
      : (Array[(String, Long)], Array[String], Seq[(String, Long)]) = {
    require(maxPieceLen >= 1 && emRounds >= 1, "need maxPieceLen/emRounds >= 1")
    val rows = bpeWordFreq(df, textCol).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"softQuantEm: vocab exceeds maxVocab $maxVocab")
    val wf: Array[(String, Long)] =
      rows.map(r => (r.getString(0), r.getLong(1)))
    val chars: Array[String] = wf.iterator.map(_._1)
      .flatMap(w => w.codePoints().toArray.map(Character.toString))
      .toSet.toArray.sorted
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    wf.foreach { case (w, f) =>
      val cps = w.codePoints().toArray
      var i = 0
      while (i < cps.length) {
        var k = 1
        while (k <= math.min(maxPieceLen, cps.length - i)) {
          sub.updateWith(new String(cps, i, k))(c =>
            Some(c.getOrElse(0L) + f))
          k += 1
        }
        i += 1
      }
    }
    def topMulti(m: collection.Map[String, Long], n: Int): Seq[(String, Long)] =
      m.iterator.filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
        .toSeq.sortBy { case (p, c) => (-c, p) }.take(n)
    var counts: Seq[(String, Long)] =
      chars.map(c => (c, sub(c))).toSeq ++ topMulti(sub, seedMulti)
    // quantized E-step for one word: probability-space α/β in the
    // pinned order, nano-quantized contributions into `out`
    def expectedQuant(w: String, f: Long,
        p: java.util.HashMap[String, java.lang.Double],
        out: scala.collection.mutable.HashMap[String, Long]): Unit = {
      val cps = w.codePoints().toArray
      val L = cps.length
      def piece(i: Int, k: Int) = new String(cps, i, k)
      def pr(i: Int, k: Int): Double = {
        val v = p.get(piece(i, k))
        if (v eq null) 0.0 else v.doubleValue()
      }
      val alpha = new Array[Double](L + 1); alpha(0) = 1.0
      var i = 1
      while (i <= L) {
        var s = 0.0; var k = 1
        while (k <= math.min(maxPieceLen, i)) {
          s = s + alpha(i - k) * pr(i - k, k); k += 1
        }
        alpha(i) = s; i += 1
      }
      val beta = new Array[Double](L + 1); beta(L) = 1.0
      var j = L - 1
      while (j >= 0) {
        var s = 0.0; var k = 1
        while (k <= math.min(maxPieceLen, L - j)) {
          s = s + pr(j, k) * beta(j + k); k += 1
        }
        beta(j) = s; j -= 1
      }
      if (alpha(L) <= 0.0) return // uncoverable word
      var s0 = 0
      while (s0 < L) {
        var k = 1
        while (k <= math.min(maxPieceLen, L - s0)) {
          val pv = pr(s0, k)
          if (pv > 0.0) {
            val post = ((alpha(s0) * pv) * beta(s0 + k)) / alpha(L)
            val contrib = math.floor((post * f.toDouble) * 1e9).toLong
            if (contrib > 0L)
              out.updateWith(piece(s0, k))(c =>
                Some(c.getOrElse(0L) + contrib))
          }
          k += 1
        }
        s0 += 1
      }
    }
    var r = 1
    while (r <= emRounds) {
      val total = counts.iterator.map(_._2).sum
      val p = new java.util.HashMap[String, java.lang.Double](counts.size * 2)
      counts.foreach { case (pc, c) =>
        p.put(pc, java.lang.Double.valueOf(c.toDouble / total.toDouble))
      }
      val newc = scala.collection.mutable.HashMap.empty[String, Long]
      wf.foreach { case (w, f) => expectedQuant(w, f, p, newc) }
      counts = chars.map(c =>
          (c, math.max(newc.getOrElse(c, 0L), 1000000000L))).toSeq ++
        newc.iterator
          .filter { case (pc, c) =>
            pc.codePointCount(0, pc.length) > 1 && c > 0L }
          .toSeq.sortBy(_._1)
      r += 1
    }
    (wf, chars, counts)
  }

  /** EXACT-LOSS unigram pruning — the remaining gap to Kudo 2018
    * §3.2's step 3, closed under the oracle: instead of keeping the
    * top pieces by expected COUNT, keep the pieces whose REMOVAL
    * destroys the most segmentation probability mass. After one
    * quantized soft-EM round ([[softQuantEm]]), each count-ranked
    * candidate x is scored by
    *
    *   loss(x) = Σ_w floor(((1 − α_L^{¬x}(w)/α_L(w)) · f_w) · 1e9)
    *
    * where α_L is the word's total lattice mass under the post-EM
    * probabilities and α_L^{¬x} the same forward pass with x's
    * probability zeroed — the EXACT mass of segmentations that use x
    * at least once, not Kudo's Viterbi-path approximation. The
    * published criterion is the log-likelihood delta; ln is
    * transcendental and therefore not cross-engine bit-stable, so the
    * gated statistic is the lost-mass FRACTION: pure ÷ × − over
    * doubles derived from exact longs in a pinned order (standing
    * rule 7), floor-quantized per (word, candidate) BEFORE the
    * order-free integer sum. IEEE ops are monotone, so
    * α^{¬x} ≤ α holds in floating point too and every contribution is
    * ≥ 0 by construction. Ranking: chars always survive (coverage
    * guarantee); top `targetMulti` multi-char pieces by
    * (loss DESC, piece ASC) from the `pruneCand` count-ranked
    * candidates (the beam bounds the oracle's per-(word, candidate)
    * lattice replay).
    *
    * 100 TB shape: corpus-sized work is the ONE distributed word
    * count inside [[softQuantEm]]; the α passes run driver-side over
    * the bounded vocab × bounded candidate beam.
    *
    * Output: (piece, exp_cnt_nano, loss_nano) sorted by piece;
    * chars carry loss_nano = 0 (unprunable, never scored).
    */
  def unigramTrainPruneLocal(df: DataFrame, textCol: String,
      targetMulti: Int = 12, pruneCand: Int = 24, seedMulti: Int = 60,
      maxPieceLen: Int = 3, emRounds: Int = 1,
      maxVocab: Int = 1 << 21): DataFrame = {
    require(targetMulti >= 0 && pruneCand >= targetMulti &&
      seedMulti >= pruneCand,
      "need seedMulti >= pruneCand >= targetMulti >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val (wf, chars, counts) = softQuantEm(df, textCol, seedMulti,
      maxPieceLen, emRounds, maxVocab)
    val total = counts.iterator.map(_._2).sum
    val p = new java.util.HashMap[String, java.lang.Double](counts.size * 2)
    counts.foreach { case (pc, c) =>
      p.put(pc, java.lang.Double.valueOf(c.toDouble / total.toDouble))
    }
    val cands: Seq[String] = counts.iterator
      .filter { case (pc, _) => pc.codePointCount(0, pc.length) > 1 }
      .toSeq.sortBy { case (pc, c) => (-c, pc) }.take(pruneCand)
      .map(_._1)
    // forward lattice mass with an optional excluded piece — the SAME
    // pinned operation order as softQuantEm's α (k ascending,
    // ((t₁+t₂)+t₃)), so the oracle's recursive CTE replays every
    // double bit-identically
    def alphaL(cps: Array[Int], excl: String): Double = {
      val L = cps.length
      val alpha = new Array[Double](L + 1); alpha(0) = 1.0
      var i = 1
      while (i <= L) {
        var s = 0.0; var k = 1
        while (k <= math.min(maxPieceLen, i)) {
          val pc = new String(cps, i - k, k)
          val v = if (pc == excl) null else p.get(pc)
          val pv = if (v eq null) 0.0 else v.doubleValue()
          s = s + alpha(i - k) * pv
          k += 1
        }
        alpha(i) = s; i += 1
      }
      alpha(L)
    }
    val loss = scala.collection.mutable.HashMap.empty[String, Long]
    wf.foreach { case (w, f) =>
      val cps = w.codePoints().toArray
      val aFull = alphaL(cps, null)
      if (aFull > 0.0) {
        cands.foreach { x =>
          if (w.contains(x)) {
            val aNo = alphaL(cps, x)
            val contrib =
              math.floor(((1.0 - aNo / aFull) * f.toDouble) * 1e9).toLong
            if (contrib > 0L)
              loss.updateWith(x)(c => Some(c.getOrElse(0L) + contrib))
          }
        }
      }
    }
    val countMap = counts.toMap
    val keptMulti = cands
      .map(x => (x, loss.getOrElse(x, 0L)))
      .sortBy { case (x, l) => (-l, x) }.take(targetMulti)
    val kept: Seq[(String, Long, Long)] =
      chars.map(c => (c, countMap(c), 0L)).toSeq ++
        keptMulti.map { case (x, l) => (x, countMap(x), l) }
    kept.sortBy(_._1).toDF("piece", "exp_cnt_nano", "loss_nano")
  }

  /** Viterbi-encode the corpus VOCABULARY under a trained unigram
    * piece table ((piece, logp_nano) pairs from
    * [[unigramTrainLocal]]) — the unigram twin of
    * [[bpeSegmentWords]], same (word, syms, n_syms, word_freq)
    * output and the same 100 TB split: vocab-sized kernel encode,
    * corpus-sized broadcast lookup.
    */
  def unigramSegmentWords(df: DataFrame, textCol: String,
      pieces: Seq[(String, Long)]): DataFrame =
    bpeWordFreq(df, textCol)
      .select(col("__w").as("word"),
        exprColumn(graft.expressions.UnigramSegmentWord(
          columnExpr(col("__w")), pieces.toArray)).as("__s"),
        col("__f").as("word_freq"))
      .select(col("word"), array_join(col("__s"), " ").as("syms"),
        size(col("__s")).as("n_syms"), col("word_freq"))

  /** BPE-ish subword count estimate: words + digit runs + punctuation
    * marks each count as a token boundary; approximates tokenizer
    * inflation over plain word count with portable string ops.
    */
  def subwordCountEstimate(text: Column): Column = {
    // occurrences of punctuation count as extra tokens
    val punct = length(text) - length(regexp_replace(text, "[.,!?;:]", ""))
    tokenCount(text) + punct
  }

  /** Sliding-window token chunking with overlap — the RAG/embedding
    * preprocessing shape: chunk i covers tokens [i·stride, i·stride +
    * size); consecutive chunks share (size − stride) tokens so no
    * semantic boundary is lost to a hard cut. Documents shorter than
    * the overlap produce exactly one chunk; empty documents none.
    * Chunk count = max(1, ⌈(n − overlap)/stride⌉) — every token is
    * covered and the last chunk is the only short one.
    *
    * Map-only: tokens materialize once per row, chunks explode from a
    * sequence — at 100 TB this is scan-side row generation with no
    * shuffle; the emitted md5 fingerprint keys downstream chunk-level
    * dedup/embedding joins. Output: (id, chunk_id, start_token,
    * chunk_tokens, chunk_md5).
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val overlap = size - stride
    df.select(col(idCol), tokens(lower(col(textCol))).as("__toks"))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__nc",
        when(col("__n") > overlap,
          expr(s"(__n - $overlap + ${stride - 1}) div $stride"))
          .otherwise(lit(1)))
      .withColumn("__ci", explode(sequence(lit(0), col("__nc") - 1)))
      .withColumn("chunk_id", col("__ci").cast("long"))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("start_token"),
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(size)).as("__chunk"))
      .select(col(idCol), col("chunk_id"), col("start_token"),
        org.apache.spark.sql.functions.size(col("__chunk")).cast("long")
          .as("chunk_tokens"),
        md5(concat_ws(" ", col("__chunk"))).as("chunk_md5"))
  }

  /** Count non-overlapping occurrences of `needle` via replace —
    * portable to any SQL engine (no regexp_count needed).
    */
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(regexp_replace(text,
      java.util.regex.Pattern.quote(needle), ""))) / needle.length)
      .cast("int")

  private val stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** Stopword ratio: stopword tokens / all tokens, on space-padded text
    * so boundary words count.
    */
  def stopwordRatio(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val hits = stopwords.map(w => occurrences(padded, s" $w "))
      .reduce(_ + _)
    q4(hits.cast("double") / greatest(tokenCount(text), lit(1)))
  }

  def punctRatio(text: Column): Column =
    q4((length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
      .cast("double") / greatest(length(text), lit(1)))

  /** Composite quality score in [0,1]: length band + stopword presence
    * − punctuation excess. Deterministic, monotone, cheap; the exact
    * formula matters less than it being identical in the oracle.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5, lit(1.0))
    q4(greatest(least((lenScore + stopScore - punctPenalty) / 2,
      lit(1.0)), lit(0.0)))
  }

  /** Unicode script composition — the router in front of every
    * script-sensitive stage (whitespace tokenization is Latin-centric;
    * docs dominated by unsegmented scripts go to `Dedup.shingles`
    * instead, per the documented CJK limitation). Counts characters in
    * the Latin, CJK (Han + kana + Hangul), Cyrillic, and Arabic
    * blocks (map-only regexp count via replace-diff, codegen'd) and
    * names the dominant script with a fixed priority tie-break
    * (latin > cjk > cyrillic > arabic).
    */
  val LatinClass = "[A-Za-z\\x{00C0}-\\x{024F}]"
  val CjkClass = "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]"
  val CyrillicClass = "[\\x{0400}-\\x{04FF}]"
  val ArabicClass = "[\\x{0600}-\\x{06FF}]"

  private def scriptCount(text: Column, cls: String): Column =
    (length(text) - length(regexp_replace(text, cls, ""))).cast("bigint")

  /** CJK share of the scripted characters — same formula as
    * [[scriptProfile]]'s `frac_cjk`. Map-only, codegen'd; costs FOUR
    * regex passes (one per script class) — use [[cjkCharShare]] when
    * the consumer re-evaluates the routing column per downstream scan.
    */
  def cjkFraction(text: Column): Column = {
    val cjk = scriptCount(text, CjkClass)
    val total = greatest(scriptCount(text, LatinClass) + cjk +
      scriptCount(text, CyrillicClass) + scriptCount(text, ArabicClass),
      lit(1L)).cast("double")
    q4(cjk / total)
  }

  /** CJK share of ALL characters — the cheap routing predicate (ONE
    * regex pass vs cjkFraction's four). Unsegmented CJK text is nearly
    * all CJK code points, so a ≥0.3 cut routes identically in
    * practice while costing a quarter as much in pipelines whose
    * lazy DAG re-evaluates the router once per downstream consumer.
    */
  def cjkCharShare(text: Column): Column =
    q4(scriptCount(text, CjkClass) /
      greatest(length(text), lit(1)).cast("double"))

  def scriptProfile(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def cnt(cls: String): Column = scriptCount(col(textCol), cls)
    val latin = cnt(LatinClass)
    val cjk = cnt(CjkClass)
    val cyr = cnt(CyrillicClass)
    val arab = cnt(ArabicClass)
    val total = greatest(latin + cjk + cyr + arab, lit(1L)).cast("double")
    df.select(col(idCol),
      latin.as("n_latin"), cjk.as("n_cjk"), cyr.as("n_cyrillic"),
      arab.as("n_arabic"),
      q4(latin / total).as("frac_latin"),
      q4(cjk / total).as("frac_cjk"),
      when(latin >= cjk && latin >= cyr && latin >= arab, lit("latin"))
        .when(cjk >= cyr && cjk >= arab, lit("cjk"))
        .when(cyr >= arab, lit("cyrillic"))
        .otherwise(lit("arabic")).as("dominant"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", appendix A1.1 — public paper): the
    * standard web-corpus filter battery. Per document:
    *
    *  - `n_words`, `mean_word_len` — length gates;
    *  - `symbol_word_ratio` — '#' and '...' occurrences per word
    *    (boilerplate/markup signal);
    *  - `frac_alpha_words` — words containing at least one letter;
    *  - `frac_bullet_lines` / `frac_ellipsis_lines` — lines starting
    *    with a bullet mark, lines ending in an ellipsis;
    *  - `dup_line_frac` — lines repeating an earlier line;
    *  - `dup_line_char_frac` — characters inside those repeated lines
    *    (the char-weighted variant catches a few huge pasted blocks
    *    that the line-count variant underweights);
    *  - `passes` — the conjunction at Gopher's published thresholds.
    *
    * Map-only: every metric is a higher-order-function fold over the
    * split arrays — whole-stage codegen, zero shuffles, linear in
    * document bytes, so at 100 TB it rides the scan. Ratios are
    * floor-quantized (q4) for cross-engine hashing.
    */
  def gopherQualityStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = filter(split(col(textCol), "\n"), l => length(l) > 0)
    val words = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val nWords = size(words).cast("bigint")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val wordsD = greatest(size(words), lit(1)).cast("double")
    val meanWordLen = aggregate(words, lit(0L),
      (acc, w) => acc + length(w)).cast("double") / wordsD
    val symbolRatio = (occurrences(col(textCol), "#") +
      occurrences(col(textCol), "...")).cast("double") / wordsD
    val alphaFrac = size(filter(words,
      w => w.rlike("[A-Za-z]"))).cast("double") / wordsD
    val bulletFrac = size(filter(lines,
      l => l.startsWith("-") || l.startsWith("*") ||
        l.startsWith("•"))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines,
      l => l.endsWith("...") || l.endsWith("…")))
      .cast("double") / nLines
    val dupLines = (size(lines) - size(array_distinct(lines)))
    val dupLineFrac = dupLines.cast("double") / nLines
    val charsAll = aggregate(lines, lit(0L), (acc, l) => acc + length(l))
    val charsDistinct = aggregate(array_distinct(lines), lit(0L),
      (acc, l) => acc + length(l))
    val dupCharFrac = (charsAll - charsDistinct).cast("double") /
      greatest(charsAll, lit(1L)).cast("double")
    df.select(col(idCol), nWords.as("n_words"),
        q4(meanWordLen).as("mean_word_len"),
        q4(symbolRatio).as("symbol_word_ratio"),
        q4(alphaFrac).as("frac_alpha_words"),
        q4(bulletFrac).as("frac_bullet_lines"),
        q4(ellipsisFrac).as("frac_ellipsis_lines"),
        q4(dupLineFrac).as("dup_line_frac"),
        q4(dupCharFrac).as("dup_line_char_frac"))
      .withColumn("passes",
        (col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3 && col("mean_word_len") <= 10 &&
          col("symbol_word_ratio") < 0.1 &&
          col("frac_alpha_words") > 0.8 &&
          col("frac_bullet_lines") < 0.9 &&
          col("frac_ellipsis_lines") < 0.3 &&
          col("dup_line_frac") < 0.3).cast("boolean"))
  }

  /** Language ID by stopword-profile voting — the classic trigram/
    * stopword heuristic. Per language: count hits of its most frequent
    * function words; argmax wins, deterministic tie-break by vote count
    * then language code. Map-only at scale.
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "and", "is", "of", "to"),
    "es" -> Seq("el", "la", "que", "los", "es"),
    "fr" -> Seq("le", "la", "les", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  def langVotes(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langProfiles.map { case (lang, words) =>
      lang -> words.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
    }
  }

  def langId(text: Column): Column = {
    val votes = langVotes(text)
    // argmax with deterministic tie-break: higher vote wins; on equal
    // votes the earlier language code (alphabetical) wins. Encoded as
    // ONE array_max over (vote, reverse-position, lang) structs — a
    // when()-chain fold embeds each previous best twice, which grows
    // the expression tree exponentially (25 regexp_replace × 2^4
    // copies blew the 64KB JVM method limit and dropped the whole
    // stage out of codegen).
    val n = votes.size
    array_max(array(votes.zipWithIndex.map { case ((lang, v), i) =>
      struct(v.as("v"), lit(n - i).as("p"), lit(lang).as("l"))
    }: _*)).getField("l")
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * The canonical exact-dedup key — portable across engines (DuckDB
    * md5 produces the identical hex).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Per-document top-k terms by smoothed TF-IDF
    * (tf · ln((N+1)/(df+1))), the standard keyword-extraction /
    * topic-salience pass over a training corpus.
    *
    * Skew-safe at 100 TB: document frequency comes from a partial-
    * aggregated groupBy of the tf table (map-side combine collapses a
    * stopword's rows before the shuffle — a `term`-partitioned WINDOW
    * would instead route every "the" row to ONE task, and windows
    * cannot be skew-split). The (term, df) table then joins back onto
    * tf with a plain shuffle hash/sort-merge join on `term` — NOT a
    * broadcast: df spans the whole corpus vocabulary, which grows with
    * the corpus (heaps' law) and at 100 TB is a multi-GB relation that
    * would OOM the driver if broadcast; the shuffle join is AQE
    * skew-splittable on hot stopword terms. The df branch re-runs the
    * map-side tokenize + partial agg (column pruning makes its
    * exchange narrower than the tf one, so exchange reuse cannot
    * apply); both passes are map-side and skew-safe, and callers can
    * persist the tf table to trade memory for the second pass.
    * N rides in via a 1-row broadcast (parquet count(*) is
    * metadata-only). Ranking uses the floor-QUANTIZED score with a
    * term tie-break so ordering is reproducible across engines (a raw
    * ln() may differ in the last ulp between libm and the JVM); the
    * ranking window partitions by doc id — skew-safe, ids are unique.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val reserved = Seq("term", "tf", "df", "tfidf", "rank", "__n")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input column '$c' collides with a tfidfTopTerms output column"))
    val tf = spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // unbounded-size side: force the shuffle join even if a small test
    // fixture would auto-broadcast, so the tested plan IS the 100 TB
    // plan. SHUFFLE_HASH, not shuffle_merge (guide §3.1): both sides
    // still shuffle on term, but the vocab-sized df table builds a
    // per-partition hash map instead of BOTH corpus-sized streams
    // paying a full sort — the SMJ sorts were the hottest stage of the
    // NB/tfidf gates (26.6 CPU-s of 1.78M-row sorting on the nb_char
    // plan). Build side = the per-term aggregate, whose per-partition
    // share is vocab/shufflePartitions — bounded at any corpus scale.
    val withDf = tf
      .join(dfTable.hint("shuffle_hash"), Seq("term"))
    val n = df.agg(count(lit(1)).as("__n"))
    // floor-quantize to 6 decimals (same rationale as q4: pure IEEE
    // ops, no decimal-string tie semantics) BEFORE ranking so the
    // order is identical in any oracle engine
    val scored = withDf.crossJoin(broadcast(n))
      .withColumn("tfidf",
        floor(col("tf") * log((col("__n") + lit(1.0)) / (col("df") + lit(1.0)))
          * 1000000) / 1000000)
    val rankW = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** Okapi BM25 ranked retrieval — top-k documents per query, scored
    * with the standard robust-IDF variant:
    * `score(D,Q) = Σ_t ln(1 + (N−df+0.5)/(df+0.5)) ·
    * tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`.
    *
    * Plan shape is an inverted index expressed relationally — the
    * 100 TB story:
    *  - postings `(doc, dl, term) → tf` are ONE partial-aggregated
    *    groupBy over the exploded token stream (doc length rides the
    *    grouping key — functionally dependent on the doc, so it adds
    *    nothing to the shuffle key's cardinality);
    *  - the query side broadcasts (queries are human-sized), so the
    *    postings scan reduces map-side to query-term postings only;
    *  - per-term document frequencies are semi-joined down to the
    *    query's terms BEFORE broadcasting — the full vocabulary table
    *    never moves;
    *  - N and Σdl come from one scalar aggregate (integer sums —
    *    exact, so avgdl replays bit-for-bit in any engine).
    *
    * Per-term scores are floor-quantized to 9 decimals and summed as
    * DECIMAL(28,9) so the per-doc total is order-independent; ranking
    * ties break on the doc id. The emitted `score` is the exact
    * decimal total floor-quantized to 4 decimals.
    */
  def bm25Rank(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val reserved = Seq("term", "tf", "df", "dl", "score", "rank",
      "__n", "__sumdl", "__s")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input column '$c' collides with a bm25Rank output column"))
    val qterms = queries
      .select(col(queryIdCol), explode(tokens(col(queryTextCol))).as("term"))
      .distinct()
    // semi-join the exploded token stream on the (broadcast) query
    // vocabulary BEFORE the tf groupBy: the postings shuffle then
    // carries only query-term tokens, not the whole corpus — df per
    // term is unchanged because every doc containing the term survives
    val postings = spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol), size(tokens(col(textCol))).as("dl"),
        explode(tokens(col(textCol))).as("term"))
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"),
        "left_semi")
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = df
      .select(size(tokens(col(textCol))).cast("long").as("dl"))
      .agg(count(lit(1)).as("__n"), sum(col("dl")).as("__sumdl"))
    // association mirrors the oracle SQL exactly: (idf * (tf*(k1+1)))
    // / (tf + k1*(1 - b + ((b*dl)*n)/sumdl)) — IEEE doubles are
    // commutative but not associative, so the grouping is the contract
    val idf = log(lit(1.0) +
      (col("__n").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
    val tfNum = col("tf").cast("double") * lit(k1 + 1.0)
    val denom = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") * col("__n") /
        col("__sumdl").cast("double"))
    // df (docs containing the term) as a window count over the
    // semi-joined postings — one row per (doc, term), so count(*)
    // per term IS the document frequency; this replaces a groupBy
    // aggregate + broadcast-join pair (two scheduler stages) with a
    // single shuffle over the already-query-term-only postings
    val perTerm = postings
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(queryIdCol), col(idCol),
        (floor(idf * tfNum / denom * 1e9) / 1e9)
          .cast("decimal(28,9)").as("__s"))
    val totals = perTerm.groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("__s")).as("__t"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__t").desc, col(idCol).asc)
    totals.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol),
        q4(col("__t").cast("double")).as("score"), col("rank"))
  }

  /** Corpus-trained bigram language-model score per document — the
    * classic LM-based quality/fluency pass: score = mean over the
    * doc's bigrams of ln P(w₂|w₁), with P = c(w₁w₂)/c(w₁·) estimated
    * from the corpus itself (every observed bigram has count ≥ 1, so
    * no smoothing is needed). Repetitive or formulaic text scores
    * high, unusual token sequences score low; filters typically cut
    * both tails.
    *
    * Scale shape: bigrams explode map-side; the two count tables are
    * partial-aggregated groupBys (hot bigrams collapse map-side);
    * scoring joins are plain equi-joins AQE can skew-split. Per-bigram
    * log-probs are floor-quantized to 9 decimals and summed as
    * DECIMALS so the per-doc mean is order-independent and replays
    * bit-for-bit in any oracle engine.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val reserved = Seq("n_bigrams", "lm_score", "__toks", "__bg", "__w1",
      "__c12", "__c1", "__lp")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input column '$c' collides with a bigramLmScore column"))
    // non-distinct bigram stream: every occurrence counts in an LM.
    // Native kernel (Generate-safe, see wordNgramsAllNative); tokens
    // contain no whitespace by construction, so the bigram's first
    // word recovers exactly via substring_index on the single space
    val bg = df.select(col(idCol),
        explode(wordNgramsAllNative(col(textCol), 2, lowercase = false))
          .as("__bg"))
      .select(col(idCol), col("__bg"),
        substring_index(col("__bg"), " ", 1).as("__w1"))
    val c12 = bg.groupBy(col("__bg")).agg(count(lit(1)).as("__c12"))
    val c1 = bg.groupBy(col("__w1")).agg(count(lit(1)).as("__c1"))
    val scoredRows = bg
      .join(c12, Seq("__bg"))
      .join(c1, Seq("__w1"))
      .select(col(idCol),
        // floor-quantize BEFORE accumulating: the decimal sum is then
        // exact and order-independent
        (floor(log(col("__c12").cast("double") / col("__c1")) * 1e9) / 1e9)
          .cast("decimal(28,9)").as("__lp"))
    val agg = scoredRows.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"),
      sum(col("__lp")).as("__s"))
    // docs with < 2 tokens have no bigrams: keep them, score 0
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        q4(coalesce(col("__s").cast("double") / col("n_bigrams"), lit(0.0)))
          .as("lm_score"))
  }

  /** Winnowing-style shingle fingerprint: minimum md5 over all k-char
    * shingles — a rolling-hash document sketch. Identical results are a
    * strong near-dup signal under small edits. Pure higher-order array
    * functions (transform over a sequence), still no UDF.
    */
  def shingleFingerprint(text: Column, k: Int = 8): Column =
    shingleFingerprintFromNorm(
      regexp_replace(lower(trim(text)), "\\s+", " "), k)

  /** Hot-path variant taking a MATERIALIZED normalized-text column —
    * an inline regexp_replace would re-evaluate once per shingle
    * inside the lambda (see Dedup.wordNgramsFromTokens).
    */
  def shingleFingerprintFromNorm(norm: Column, k: Int = 8): Column = {
    val n = greatest(length(norm) - lit(k - 1), lit(1))
    array_min(transform(sequence(lit(1), n),
      i => md5(norm.substr(i, lit(k)))))
  }

  /** Character-entropy quality stats per row (struct of n_chars,
    * n_distinct, entropy_nanos) — see
    * [[graft.expressions.CharEntropy]]: a map-only native kernel, no
    * explode, no shuffle; nano-bit integer entropy for engine-exact
    * replay. Gibberish and binary-paste detection signal.
    */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.graftglue.Glue.column(
      graft.expressions.CharEntropy(
        org.apache.spark.sql.graftglue.Glue.expression(text)))

  // ------------------------------------------------------------------
  // Naive Bayes feature streams — the pluggable front of the NB
  // pipeline. Each is text → array<string> of feature OCCURRENCES
  // (non-distinct; the multinomial counts occurrences). All are
  // single-pass native kernels or plain column functions — no
  // interpreted-Generate lambdas — and each is SQL-replayable so the
  // trained model and classifications stay oracle-gated.
  // ------------------------------------------------------------------

  /** Word unigrams — the original [[naiveBayesTrain]] stream:
    * `split(trim(lower(text)), "\s+")` (empties filtered downstream).
    */
  val nbUnigramFeatures: Column => Column = t => tokens(lower(t))

  /** Word n-grams (n=2 bigrams capture local ORDER — the signal
    * unigram bags erase; see the txt_nb_ngram gate's planted
    * reversed-token docs). Space-joined, so n≥2 grams can never
    * collide with unigrams in a union stream.
    */
  def nbWordNgramFeatures(n: Int): Column => Column =
    t => wordNgramsAllNative(t, n, lowercase = true)

  /** Character n-grams of the whitespace-normalized lowercase text —
    * the fastText/CCNet subword shape that classifies morphology and
    * script (robust to OOV words). Native kernel:
    * [[graft.expressions.CharNgramsAll]].
    */
  def nbCharNgramFeatures(n: Int): Column => Column =
    t => exprColumn(graft.expressions.CharNgramsAll(columnExpr(t), n))

  /** Union of feature streams (fastText trains on
    * unigrams + bigrams + char n-grams concatenated into one bag).
    */
  def nbUnionFeatures(fs: Seq[Column => Column]): Column => Column =
    t => concat(fs.map(f => f(t)): _*)

  /** Multinomial Naive Bayes trainer — the fastText/CCNet-style linear
    * text classifier shape used as a quality / language filter in
    * LLM-corpus pipelines, trained fully distributed.
    *
    * `features` selects the feature stream (default: word unigrams —
    * the original behavior); the same function value must be passed
    * to [[naiveBayesPriors]] and [[naiveBayesClassify]].
    *
    * Returns the DENSE (term × label) model: for every vocabulary term
    * and every label, the Laplace-smoothed log-likelihood
    * `logp = ln((cnt + 1) / (label_tokens + V))`, floor-quantized to
    * 9 decimals so the model (and any score summed from it) is
    * engine-replayable. Densifying costs vocab × labels rows — labels
    * are a human-scale dimension, so this is ~vocab-sized — and makes
    * classification a single left join with a per-label OOV default.
    *
    * Plan shape at 100 TB: token counts are ONE partial-aggregated
    * wordcount groupBy (map-side combine before the only corpus-sized
    * exchange); label totals and vocabulary size are tiny aggregates of
    * the count table; the dense grid joins the count table on
    * (label, term) with a forced shuffle join — the model spans the
    * vocabulary, so a fixture-scale broadcast would lie about the plan.
    */
  def naiveBayesTrain(df: DataFrame, labelCol: String, textCol: String,
      features: Column => Column = nbUnigramFeatures)
      : DataFrame = {
    val reserved = Seq("label", "term", "cnt", "logp")
    reserved.foreach(c => require(!df.columns.contains(c) || c == labelCol,
      s"input column '$c' collides with a naiveBayesTrain output column"))
    val toks = spread(df.select(col(labelCol), col(textCol)))
      .select(col(labelCol).as("label"),
        explode(features(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val counts = toks.groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val labelTotals = counts.groupBy(col("label"))
      .agg(sum(col("cnt")).as("__lt"))
    val vsize = counts.select(col("term")).distinct()
      .agg(count(lit(1)).as("__v"))
    val dense = counts.select(col("term")).distinct()
      .crossJoin(broadcast(labelTotals))
    // stays sort-merge (measured, not assumed): here BOTH sides are
    // vocab-sized — a shuffled-hash build of the counts table was
    // tried and lost ~0.3 s on the big-vocab ngram gate (hash-map
    // build of the whole per-partition vocab costs more than the two
    // sorts it saves); classify's probe-side stream is where
    // shuffle_hash wins
    dense.hint("shuffle_merge")
      .join(counts.hint("shuffle_merge"), Seq("label", "term"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(vsize))
      .withColumn("logp",
        floor(log((col("cnt") + lit(1.0)) /
          (col("__lt").cast("double") + col("__v").cast("double"))) * 1e9)
          / 1e9)
      .select(col("label"), col("term"), col("cnt"), col("logp"))
  }

  /** Per-label classification constants for [[naiveBayesTrain]]'s
    * model: the log prior `ln(n_label / n_docs)` and the OOV default
    * log-likelihood `ln(1 / (label_tokens + V))` a test-time term
    * absent from the training vocabulary scores under Laplace
    * smoothing. Both floor-quantized to 9 decimals. Label-count rows —
    * always broadcastable.
    */
  def naiveBayesPriors(df: DataFrame, labelCol: String, textCol: String,
      features: Column => Column = nbUnigramFeatures)
      : DataFrame = {
    val toks = spread(df.select(col(labelCol), col(textCol)))
      .select(col(labelCol).as("label"),
        explode(features(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val counts = toks.groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val labelTotals = counts.groupBy(col("label"))
      .agg(sum(col("cnt")).as("__lt"))
    val vsize = counts.select(col("term")).distinct()
      .agg(count(lit(1)).as("__v"))
    val docTotals = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("__nd"))
    val n = df.agg(count(lit(1)).as("__n"))
    // prior also ships as INTEGER nano-units (floor on a double column
    // is already a long in Spark): re-deriving nanos from the
    // quantized double via another floor(x·1e9) can land one unit low
    // when the /1e9·1e9 round-trip dips just below the integer —
    // classification sums nanos, so they must come from the single
    // original floor
    docTotals.join(labelTotals, Seq("label"))
      .crossJoin(broadcast(vsize)).crossJoin(broadcast(n))
      .select(col("label"),
        floor(log(col("__nd").cast("double") / col("__n")) * 1e9)
          .as("prior_nanos"),
        (floor(log(col("__nd").cast("double") / col("__n")) * 1e9) / 1e9)
          .as("prior_logp"),
        (floor(log(lit(1.0) /
          (col("__lt").cast("double") + col("__v").cast("double"))) * 1e9)
          / 1e9).as("oov_logp"))
  }

  /** Multinomial Naive Bayes classification: argmax over labels of
    * `prior + Σ_t tf(t) · logp(t | label)`, with OOV terms falling
    * back to the label's smoothed default. Deterministic and
    * engine-replayable end to end: every per-term contribution is
    * floor-quantized to integer nano-units (`floor(x·1e9)`, a BIGINT)
    * and summed as BIGINT (order-independent and engine-exact — see
    * the "Why INTEGER nano-units" paragraph below), and the argmax
    * breaks score ties on the label string ascending.
    *
    * Plan shape: the tf table is one partial-agg'd groupBy of the
    * exploded token stream; the (doc, term) stream crossJoins the
    * BROADCAST per-label constants (labels are human-scale) and
    * left-joins the model on (term, label) with a forced shuffle join
    * (the model spans the vocabulary). Scores aggregate per
    * (doc, label); the final argmax window partitions by doc over
    * ≤ |labels| rows — skew-free. Docs with no tokens classify on the
    * prior alone via the docs × labels base.
    *
    * Why INTEGER nano-units, not DECIMAL: each `floor(tf·logp·1e9)` is
    * already an exact integer (a Spark long), and integer sums are
    * order-independent AND engine-exact. Summing the /1e9 doubles as
    * DECIMAL(28,9) instead was observed to drift 1e-9 against DuckDB —
    * the double→decimal cast rounds the shortest-repr string, and two
    * engines can disagree on the last digit for values a floor
    * boundary apart.
    */
  def naiveBayesClassify(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, priors: DataFrame,
      features: Column => Column = nbUnigramFeatures): DataFrame = {
    val tf = spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        explode(features(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
    // The model joins ON TERM ONLY, folded to one map<label, logp> row
    // per term — NOT on (term, label) with the tf stream pre-expanded
    // ×labels: that shape shuffled |labels|× the corpus-sized
    // (doc, term) stream and then sorted it for the merge join (the
    // hottest stage of every nb gate profile: a 1.78M-row sort for a
    // 355k-row tf table at 5 labels). Here the exchange carries the tf
    // table once; the ×labels expansion happens map-side AFTER the
    // join and feeds straight into the (doc, label) partial aggregate.
    // Per-term contribution arithmetic is unchanged operand for
    // operand (floor(tf · logp · 1e9) on the same doubles), so scores
    // are bit-identical; the map lookup per label replaces the join's
    // (term, label) match, with the same OOV fallback on a vocab miss
    // (the trained grid is dense, so an in-vocab term has every
    // label; a caller-supplied model must be unique per (term, label)
    // or map_from_entries throws under the default
    // spark.sql.mapKeyDedupPolicy=EXCEPTION — naiveBayesTrain's grid
    // is unique by construction). Still a forced shuffle join — the
    // model spans the vocabulary, a fixture-scale broadcast would lie
    // about the plan. SHUFFLE_HASH with the vocab-sized folded model
    // as build side (the tfidfTopTerms rationale): the corpus-sized
    // tf stream pays its one exchange but NO merge-join sort — the
    // round-18 shuffle_merge-on-both-sides form sorted both the tf
    // stream and the folded model and was the measured local
    // regression of the big-vocab gates (txt_nb_ngram −13%). The
    // fold's groupBy(term) exchange is reused by the join (same key),
    // so the fold adds aggregation work only.
    val modelByTerm = model
      .groupBy(col("term"))
      .agg(map_from_entries(collect_list(
        struct(col("label"), col("logp")))).as("__lp"))
    val contrib = tf
      .join(modelByTerm.hint("shuffle_hash"), Seq("term"), "left")
      .crossJoin(broadcast(priors.select(col("label"), col("oov_logp"))))
      .withColumn("__c",
        floor(col("__tf") *
          coalesce(element_at(col("__lp"), col("label")),
            col("oov_logp")) * 1e9))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("__c")).as("__s"))
    val base = docs.select(col(idCol)).crossJoin(broadcast(
      priors.select(col("label"), col("prior_nanos"))))
    val scored = base.join(contrib, Seq(idCol, "label"), "left")
      .withColumn("__nanos",
        col("prior_nanos") + coalesce(col("__s"), lit(0L)))
    // argmax via partial-aggregated min(struct(-nanos, label)) — the
    // LPA template, not a row_number window: the window re-partitioned
    // the scored table on doc (an extra exchange) and sorted every
    // partition for ≤ |labels| rows per doc. min over
    // (-nanos asc, label asc) is exactly the window's
    // (nanos desc, label asc) rank-1 row; negation is overflow-safe
    // (|nanos| = |Σ floor(tf·logp·1e9)| ≪ Long.MaxValue — logp is a
    // log-probability, tf is bounded by document length).
    scored.groupBy(col(idCol))
      .agg(min(struct((-col("__nanos")).as("n"), col("label").as("l")))
        .as("__m"))
      .select(col(idCol), col("__m.l").as("pred_label"),
        ((-col("__m.n")).cast("double") / 1e9).as("score"))
  }
}
