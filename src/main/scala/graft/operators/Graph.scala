package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the web-graph side of
  * corpus curation (link-based importance weighting à la CommonCrawl
  * page ranks feeding quality filters).
  *
  * All state lives in SCALED 64-BIT INTEGERS (fixed-point), not
  * doubles: every per-iteration op is integer multiply / integer
  * division / integer sum, so results are bit-identical across
  * engines, partitionings, and summation orders — a double PageRank's
  * Σ contributions is order-dependent and can never hash-verify. The
  * damping step (1−d) + d·Σ is computed as
  * `(15·(scale div n)) div 100 + (85·Σ) div 100` with all operands
  * positive, where integer division is truncating in both Spark
  * (`div`) and DuckDB (`//`).
  *
  * Plan shape at 100 TB: per iteration, ONE shuffle — the
  * contribution sum groupBy(dst); the rank⋈outdeg and edges⋈rank
  * joins cluster on the same src key (AQE reuses the partitioning),
  * and the node relation carries (node, outdeg) so degree never
  * recomputes. Each iteration's rank frame is persisted: the lineage
  * would otherwise re-run every prior iteration per action. Dangling
  * nodes (no out-edges) leak their damped mass — the simplest
  * convention that needs no global dangling-mass broadcast; document
  * and keep, since the oracle replays it exactly.
  */
object Graph {

  /** Fixed-point PageRank. `edges` must be a distinct (src, dst) long
    * edge list; self-loops allowed. Returns (node, pr) with pr the
    * scaled integer rank (pr/scale ≈ probability). Node ids must be
    * non-negative.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the edge list is touched by nodes, outdeg, AND every iteration —
    // persist it once or the caller's (possibly expensive) edge-build
    // plan re-runs per iteration
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst")).persist(lvl)
    // ONE scan of the cached edge list (explode of both endpoints),
    // not a union of two selects — the union form scanned e twice and
    // doubled the partial-distinct map stage (measured: 64 tasks vs 32
    // on the gate plan for identical output)
    val nodes = e.select(explode(array(col("__src"), col("__dst")))
      .as("node")).distinct().persist(lvl)
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__outdeg"))
    // out-degree is folded into the cached edge list ONCE — each
    // iteration then touches a single static relation; with the rank
    // frame node-sized relative to edges, AQE broadcasts it and the
    // only per-iteration exchange left is the partial-agg'd
    // contribution sum on dst
    val eDeg = e.join(deg, "__src")
      .select(col("__src"), col("__dst"), col("__outdeg")).persist(lvl)
    // |nodes| rides as a 1-row broadcast scalar instead of a driver
    // count(): the mid-pipeline action cost a full extra job sweep
    // (and its driver gap) per invocation; `div` is truncating integer
    // division in both Spark and Scala, so lit(scale) div n is
    // bit-identical to the old lit(scale / n) literal
    val nCnt = broadcast(nodes.agg(count(lit(1)).as("__n")))
    val base = expr(s"(15 * ($scale div __n)) div 100")
    var pr = nodes.crossJoin(nCnt)
      .select(col("node"), expr(s"$scale div __n").as("pr"))
      .persist(lvl)
    val intermediates = scala.collection.mutable.ArrayBuffer(pr)
    (0 until iters).foreach { _ =>
      val contrib = eDeg
        .join(pr.withColumnRenamed("node", "__src"), "__src")
        .select(col("__dst"),
          expr("pr div __outdeg").as("__c"))
        .groupBy(col("__dst"))
        .agg(sum(col("__c")).as("__m"))
      pr = nodes
        .join(contrib.withColumnRenamed("__dst", "node"), Seq("node"),
          "left")
        .crossJoin(nCnt)
        .select(col("node"),
          (base +
            expr(s"(85 * coalesce(__m, 0L)) div 100")).as("pr"))
        .persist(lvl)
      intermediates += pr
    }
    // ONE materializing job computes the whole chain (each iteration's
    // persist caches as the action sweeps through), then the scaffold
    // unpersists. Peak storage = iters node-sized frames; for deep
    // chains (iters ≫ 10) trade this for a count-per-iteration loop
    // that drops frame i−1 before computing i+1.
    pr.count()
    intermediates.dropRight(1).foreach(_.unpersist())
    e.unpersist(); eDeg.unpersist(); nodes.unpersist()
    // already materialized; the final frame stays cached for the
    // caller's action but is tracked so the harness's releaseAll
    // bounds its lifetime to this query (it leaked forever before)
    graft.CachePool.track(pr)
  }

  /** Distinct undirected co-occurrence edges (u < v) from an
    * (item, group) relation — two items are linked when they share a
    * group (market-basket projection: parts co-ordered, users
    * co-sessioned). The self-join fans out per group as basket², so
    * `maxGroupSize` caps pathological baskets FIRST (count + semi-join
    * filter) — the standard guard that keeps the projection linear in
    * realistic basket-size distributions at any corpus scale.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
      maxGroupSize: Int = 1000): DataFrame = {
    val items = df.select(col(groupCol).cast("long").as("__g"),
      col(itemCol).cast("long").as("__i")).distinct()
    val small = items.groupBy(col("__g")).agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxGroupSize).select(col("__g"))
    val kept = items.join(small, "__g")
    kept.as("a").join(kept.as("b"),
        col("a.__g") === col("b.__g") && col("a.__i") < col("b.__i"))
      .select(col("a.__i").as("u"), col("b.__i").as("v"))
      .distinct()
  }

  /** Per-node triangle participation counts over a distinct
    * undirected (u < v) edge list — the classic clustering/community
    * signal (and a spam-farm detector on link graphs).
    *
    * Degree-ordered orientation (Cohen / MapReduce triangle counting):
    * every edge is re-oriented from its lower-(degree, id) endpoint to
    * the higher one, so each wedge is generated at its lowest-degree
    * apex — the self-join fan-out is Σ d_oriented(v)² which is
    * O(E^1.5) worst case instead of Σ d(v)² (quadratic at hub nodes).
    * Wedges close against the oriented edge list with an equi-join.
    * Every triangle is produced exactly ONCE regardless of
    * orientation, so per-node counts replay with the simple id
    * orientation in the oracle.
    *
    * Plan: degree = one partial-agg'd groupBy; orientation = map-only
    * after one shuffle join of edges⋈degree (both endpoints); wedge +
    * closure are equi-joins on node keys. No driver state.
    */
  def triangleCounts(edges: DataFrame, uCol: String, vCol: String)
      : DataFrame = {
    val e = edges.select(col(uCol).cast("long").as("u"),
      col(vCol).cast("long").as("v"))
    // one scan of the caller's edge plan (explode of both endpoints),
    // not a unionAll that runs the upstream edge-build twice
    val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("__d"))
    // orient by (degree, id): lower endpoint -> higher endpoint
    val oriented = e
      .join(deg.withColumnRenamed("node", "u")
        .withColumnRenamed("__d", "__du"), "u")
      .join(deg.withColumnRenamed("node", "v")
        .withColumnRenamed("__d", "__dv"), "v")
      .select(
        when(col("__du") < col("__dv") ||
            (col("__du") === col("__dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("s"),
        when(col("__du") < col("__dv") ||
            (col("__du") === col("__dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("t"))
    // the oriented list is read by BOTH wedge sides and the closure
    // union — without a persist each reference re-runs the whole
    // edge-build (degree groupBy + two joins); ReusedExchange only
    // catches the identically-keyed subset (measured: 28 reuses vs
    // 3 full recomputes on the gate plan). Same convention as
    // pageRankFixedPoint: persist, leave cached for the caller.
    val orientedP = oriented
      .transform(graft.CachePool.persist(_))
    // wedges at the low apex; order the two far endpoints so each
    // candidate closure is probed once
    val w = orientedP.as("e1").join(orientedP.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"), col("e1.t").as("b"),
        col("e2.t").as("c"))
    // closure: (b, c) present in EITHER orientation
    val closed = w.join(
      orientedP.select(col("s").as("b"), col("t").as("c"))
        .unionAll(orientedP.select(col("t").as("b"), col("s").as("c"))),
      Seq("b", "c"))
    closed.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** One synchronous LPA voting round's adoption table, shared by all
    * three propagate variants: count votes per (dst, label), then take
    * the argmax label per dst — highest vote count, ties to the
    * SMALLER label. The argmax is a partial-aggregated
    * `max(struct(votes, ~label))` groupBy, NOT a row_number window:
    * the window form re-partitioned the vote table on dst (a third
    * exchange) and sorted every partition; the struct-max rides
    * map-side combine on an exchange that carries one row per
    * (dst-partial) and needs no sort. `~label` (bitwise NOT) inverts
    * the order of ALL longs without overflow (unlike unary minus at
    * Long.MinValue), so max(~label) == min(label) exactly — the same
    * tie the window's `orderBy(votes desc, label asc)` broke.
    */
  private def argmaxVotes(und: DataFrame, labels: DataFrame): DataFrame =
    und
      .join(labels.filter(col("label").isNotNull)
        .select(col("node").as("__s"), col("label").as("__nl")), "__s")
      .groupBy(col("__d"), col("__nl"))
      .agg(count(lit(1)).as("__votes"))
      .groupBy(col("__d"))
      .agg(max(struct(col("__votes").as("v"),
        bitwise_not(col("__nl")).as("li"))).as("__m"))
      .select(col("__d").as("node"),
        bitwise_not(col("__m.li")).as("__adopt"))

  /** Seeded synchronous label propagation — the graph-based
    * semi-supervised labeler (spread domain / quality / topic labels
    * from a labeled seed set over a similarity or interaction graph;
    * Zhu & Ghahramani 2002 / Raghavan 2007 family). Deterministic by
    * construction, like the other Graph operators: votes are INTEGER
    * edge counts, a node adopts the label with the highest vote
    * (ties → smaller label), seeds are clamped, and iterations are
    * synchronous — so the result is bit-identical across engines and
    * partitionings and a SQL oracle can unroll the rounds.
    *
    * `edges` is an undirected adjacency given as (src, dst) pairs
    * (both directions are expanded internally; parallel edges vote
    * with their multiplicity). `seeds` is (node, label) with long
    * labels. Unreached nodes end with null.
    *
    * Plan shape per iteration: ONE partial-agg'd shuffle (the
    * (node, label) vote count); the argmax window partitions per node
    * over ≤ |labels| rows; the labels frame persists per round
    * (lineage would otherwise replay all prior rounds per action) —
    * the pageRank convention.
    */
  def labelPropagate(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedNodeCol: String, seedLabelCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"))
    // ONE scan of the caller's (possibly expensive) edge plan: explode
    // both directions in a single pass instead of unionAll of two
    // selects, which ran the whole upstream edge-build twice before
    // the persist populated
    val und = e0.select(explode(array(
        struct(col("__s"), col("__d")),
        struct(col("__d").as("__s"), col("__s").as("__d")))).as("__e"))
      .select(col("__e.__s").as("__s"), col("__e.__d").as("__d"))
      .persist(lvl)
    val nodes = und.select(col("__s").as("node")).distinct().persist(lvl)
    // one label per node, deterministically: duplicate (node, label)
    // seed rows would fan out through the left join below, duplicating
    // the node's rows and multiplying its votes every round; a
    // conflicting pair (node, l1)/(node, l2) resolves to min(label) —
    // the same tie convention as vote adoption. Partial-agg'd groupBy,
    // seed-sized.
    val seed = seeds.select(col(seedNodeCol).cast("long").as("node"),
      col(seedLabelCol).cast("long").as("__seed"))
      .groupBy(col("node")).agg(min(col("__seed")).as("__seed"))
      .persist(lvl)
    var labels = nodes.join(seed, Seq("node"), "left")
      .select(col("node"), col("__seed").as("label"), col("__seed"))
      .persist(lvl)
    val intermediates = scala.collection.mutable.ArrayBuffer(labels)
    (0 until iters).foreach { _ =>
      val adopted = argmaxVotes(und, labels)
      labels = labels.select(col("node"), col("label"), col("__seed"))
        .join(adopted, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__seed"), col("__adopt"), col("label")).as("label"),
          col("__seed"))
        .persist(lvl)
      intermediates += labels
    }
    // ONE materializing job computes the whole chain (each round's
    // persist caches as the action sweeps through) — the pageRank
    // convention; per-round counts paid a job launch + driver gap per
    // round for nothing (fixed iteration count needs no convergence
    // probe)
    labels.count()
    intermediates.dropRight(1).foreach(_.unpersist())
    und.unpersist(); nodes.unpersist(); seed.unpersist()
    // final round's frame stays cached for the caller's action;
    // tracked so releaseAll bounds the lifetime (leaked forever before)
    graft.CachePool.track(labels)
    labels.select(col("node"), col("label"))
  }

  /** One LPA round's convergence snapshot: how many nodes changed
    * label (null-safe compare). changed == 0 means a fixed point —
    * every later round returns the identical labeling.
    */
  final case class LpaIterStats(iter: Int, changed: Long)

  /** [[labelPropagate]] with a convergence stop: runs synchronous
    * rounds until no node changes label (or `maxIters`), returning
    * the labeling plus per-round changed-node counts. The changed
    * count rides the SAME action that materializes each round's
    * persisted frame (one aggregate over the node-sized join of
    * consecutive labelings), so convergence detection adds no extra
    * pass over the edges. At a fixed point the labeling is EXACTLY
    * what any larger fixed iteration count would return
    * (spec-pinned), so maxIters stops being a quality knob and
    * becomes a safety bound.
    */
  def labelPropagateConverged(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedNodeCol: String,
      seedLabelCol: String, maxIters: Int,
      checkpointDir: Option[String] = None)
      : (DataFrame, Seq[LpaIterStats]) = {
    require(maxIters >= 1, "maxIters must be >= 1")
    // reliable per-round cuts when a dir is given — see [[Iterate]]:
    // localCheckpoint blocks die with their executor, which fails a
    // long converging job unrecoverably at cluster scale
    val reliable = Iterate.configure(edges, checkpointDir)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"))
    // one scan of the caller's edge plan (explode both directions),
    // not a unionAll that runs the upstream edge-build twice
    val und = e0.select(explode(array(
        struct(col("__s"), col("__d")),
        struct(col("__d").as("__s"), col("__s").as("__d")))).as("__e"))
      .select(col("__e.__s").as("__s"), col("__e.__d").as("__d"))
      .persist(lvl)
    val nodes = und.select(col("__s").as("node")).distinct().persist(lvl)
    val seed = seeds.select(col(seedNodeCol).cast("long").as("node"),
      col(seedLabelCol).cast("long").as("__seed"))
      .groupBy(col("node")).agg(min(col("__seed")).as("__seed"))
      .persist(lvl)
    // localCheckpoint, NOT persist, for the per-round frame: the
    // round-update join references the previous labels on BOTH sides
    // (votes and the carry-forward), so the ANALYZED plan doubles per
    // round — with a convergence loop's unbounded round count that
    // goes exponential in analysis time long before memory matters
    // (the CurationDemo 1.45 GB treeString lesson; measured: a 4-edge
    // chain took 70 s on persists, sub-second on checkpoints).
    // Fixed-small-iters labelPropagate keeps its persist convention;
    // unbounded loops cut lineage every round.
    var labels = Iterate.cut(nodes.join(seed, Seq("node"), "left")
      .select(col("node"), col("__seed").as("label"), col("__seed")),
      reliable)
    val stats = scala.collection.mutable.ArrayBuffer.empty[LpaIterStats]
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val adopted = argmaxVotes(und, labels)
      // the changed count rides the SAME action that materializes the
      // round's cut (Dataset.observe): one job per round instead of
      // cut + a second agg/collect job. coalesce: sum over ZERO rows
      // (empty graph) is NULL and the unboxing would NPE instead of
      // returning the empty labeling.
      val obs = org.apache.spark.sql.Observation()
      val next = Iterate.cut(labels
        .select(col("node"), col("label").as("__old"), col("__seed"))
        .join(adopted, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__seed"), col("__adopt"), col("__old"))
            .as("label"),
          col("__seed"), col("__old"))
        .observe(obs, coalesce(sum(
          when(not(col("label") <=> col("__old")), 1L).otherwise(0L)),
          lit(0L)).as("changed")),
        reliable)
      val changed = obs.get("changed").asInstanceOf[Long]
      stats += LpaIterStats(it, changed)
      labels = next.select(col("node"), col("label"), col("__seed"))
      converged = changed == 0L
      it += 1
    }
    und.unpersist(); nodes.unpersist(); seed.unpersist()
    (labels.select(col("node"), col("label")), stats.toSeq)
  }

  /** Incremental label propagation against a STORED label table — the
    * [[graft.functions.Dedup]] `nearDupDelta` shape for graphs: new
    * edges arrive, the stored labeling is a converged artifact, and
    * relabeling costs frontier-sized work instead of a from-scratch
    * rerun.
    *
    * Semantics (exact, not heuristic): `rounds` SYNCHRONOUS
    * warm-start rounds over the FULL edge set, initialized from
    * `storedLabels` (new nodes start at their seed label or null),
    * where each round recomputes votes ONLY for the active frontier —
    * round 1: nodes incident to a `deltaEdges` edge (the only nodes
    * whose vote multiset differs from the stored snapshot's); round
    * i>1: neighbors of nodes that changed in round i−1. Nodes outside
    * the frontier keep their label — which is EXACTLY what an
    * unrestricted warm-start round would do *when the stored labeling
    * is a fixed point of the base graph* (their vote multiset is
    * unchanged, so re-evaluation returns the same label). That
    * equality is the operator's contract and is spec-pinned by
    * running the same rounds with frontier = ALL edges. On a
    * non-converged stored labeling the result is the documented
    * delta-local repair.
    *
    * Plan shape per round: the frontier is broadcast into a semi-join
    * on the edge list's dst (map-side pruning — only frontier-incident
    * edges reach the vote aggregate), so shuffle volume is
    * frontier-sized; the full edge list is scanned once per round
    * (store it partitioned by dst to turn that into a pruned scan —
    * the ivfTopKIndexed convention). Early-stops when a round changes
    * nothing.
    */
  def labelPropagateDelta(storedLabels: DataFrame, edges: DataFrame,
      srcCol: String, dstCol: String, deltaEdges: DataFrame,
      seeds: DataFrame, seedNodeCol: String, seedLabelCol: String,
      rounds: Int, checkpointDir: Option[String] = None)
      : (DataFrame, Seq[LpaIterStats]) = {
    require(rounds >= 1, "rounds must be >= 1")
    val reliable = Iterate.configure(edges, checkpointDir)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"))
    // one scan of the caller's edge plan (explode both directions),
    // not a unionAll that runs the upstream edge-build twice
    val und = e0.select(explode(array(
        struct(col("__s"), col("__d")),
        struct(col("__d").as("__s"), col("__s").as("__d")))).as("__e"))
      .select(col("__e.__s").as("__s"), col("__e.__d").as("__d"))
      .persist(lvl)
    val nodes = und.select(col("__s").as("node")).distinct().persist(lvl)
    val seed = seeds.select(col(seedNodeCol).cast("long").as("node"),
      col(seedLabelCol).cast("long").as("__seed"))
      .groupBy(col("node")).agg(min(col("__seed")).as("__seed"))
      .persist(lvl)
    val stored = storedLabels.select(col("node").cast("long").as("node"),
      col("label").cast("long").as("__stored"))
    // warm start: stored label where present, else seed, else null.
    // Per-round frames are localCheckpoint'd, not persisted — see
    // labelPropagateConverged's note (the round-update join would
    // otherwise double the analyzed plan per round).
    var labels = Iterate.cut(nodes.join(seed, Seq("node"), "left")
      .join(stored, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__seed"), col("__stored")).as("label"),
        col("__seed")),
      reliable)
    val d0 = deltaEdges.select(col(srcCol).cast("long").as("__s"),
      col(dstCol).cast("long").as("__d"))
    // round-1 frontier: every node whose vote multiset changed = dst
    // endpoints of the expanded delta edges (i.e. both endpoints).
    // NOT cut: the frontier is consumed exactly once, as the broadcast
    // side of the next round's semi-join — an eager checkpoint here
    // paid a whole extra job (and its driver gap) per round to
    // materialize something the broadcast build computes anyway; its
    // plan stays bounded because it only references cut/persisted
    // frames, so the per-round lineage-growth rationale doesn't apply
    var frontier = d0.select(explode(array(col("__d"), col("__s")))
      .as("node")).distinct()
    val stats = scala.collection.mutable.ArrayBuffer.empty[LpaIterStats]
    var it = 0
    var done = false
    while (it < rounds && !done) {
      // votes restricted to frontier dst: broadcast semi-join prunes
      // the edge scan map-side; the aggregate is frontier-sized
      val adopted = argmaxVotes(und
        .join(broadcast(frontier.select(col("node").as("__d"))),
          Seq("__d"), "left_semi"), labels)
      // the changed count rides the cut action (Dataset.observe), so
      // the round costs ONE job — the old shape paid cut + a
      // changedNodes.count() job per round
      val obs = org.apache.spark.sql.Observation()
      val next = Iterate.cut(labels
        .select(col("node"), col("label").as("__old"), col("__seed"))
        .join(adopted, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__seed"), col("__adopt"), col("__old"))
            .as("label"),
          col("__seed"), col("__old"))
        .observe(obs, coalesce(sum(
          when(not(col("label") <=> col("__old")), 1L).otherwise(0L)),
          lit(0L)).as("changed")),
        reliable)
      // changedNodes is a cheap LAZY filter over the CUT `next` frame —
      // it resolves inside the next round's broadcast build
      val changedNodes = next
        .filter(not(col("label") <=> col("__old")))
        .select(col("node"))
      val changed = obs.get("changed").asInstanceOf[Long]
      stats += LpaIterStats(it, changed)
      labels = next.select(col("node"), col("label"), col("__seed"))
      done = changed == 0L
      it += 1
      // next frontier: neighbors of changed nodes — lazy (see the
      // round-1 frontier note): it resolves inside the next round's
      // broadcast build, over the cut `next` and the persisted `und`
      if (!done && it < rounds)
        frontier = und
          .join(broadcast(changedNodes.select(col("node").as("__s"))),
            Seq("__s"), "left_semi")
          .select(col("__d").as("node")).distinct()
    }
    und.unpersist(); nodes.unpersist(); seed.unpersist()
    (labels.select(col("node"), col("label")), stats.toSeq)
  }
}
