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
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst")))
      .distinct()
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__outdeg"))
    val n = nodes.count()
    val base = (15L * (scale / n)) / 100L
    var pr = nodes.withColumn("pr", lit(scale / n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (0 until iters).foreach { _ =>
      val contrib = e
        .join(pr.withColumnRenamed("node", "__src"), "__src")
        .join(deg, "__src")
        .select(col("__dst"),
          expr("pr div __outdeg").as("__c"))
        .groupBy(col("__dst"))
        .agg(sum(col("__c")).as("__m"))
      val prev = pr
      pr = nodes
        .join(contrib.withColumnRenamed("__dst", "node"), Seq("node"),
          "left")
        .select(col("node"),
          (lit(base) +
            expr(s"(85 * coalesce(__m, 0L)) div 100")).as("pr"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pr.count() // materialize before unpersisting the input lineage
      prev.unpersist()
    }
    pr
  }
}
