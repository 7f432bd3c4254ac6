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
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst")))
      .distinct().persist(lvl)
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__outdeg"))
    // out-degree is folded into the cached edge list ONCE — each
    // iteration then touches a single static relation; with the rank
    // frame node-sized relative to edges, AQE broadcasts it and the
    // only per-iteration exchange left is the partial-agg'd
    // contribution sum on dst
    val eDeg = e.join(deg, "__src")
      .select(col("__src"), col("__dst"), col("__outdeg")).persist(lvl)
    val n = nodes.count() // also materializes e
    val base = (15L * (scale / n)) / 100L
    var pr = nodes.withColumn("pr", lit(scale / n)).persist(lvl)
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
        .select(col("node"),
          (lit(base) +
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
    pr // already materialized; final frame stays cached for the caller
  }
}
