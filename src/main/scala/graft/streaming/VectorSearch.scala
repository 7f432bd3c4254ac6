package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Similarity

/** One-call ANN search over a manifest-committed vector store — the
  * user-facing composition of the round-15 probe path: the query
  * set's probe cells are computed driver-side from the quantizer
  * (≤ nlist values), [[VectorStore.readPartitions]] serves ONLY those
  * cells' partitions (O(probed shards) manifest bytes — see the
  * sharded-checkpoint notes on [[VectorStore.ShardTargetEntries]]),
  * and the search kernel runs over the slice. At 10⁶ live partitions
  * the whole query-side driver cost is the probed shards' JSON, never
  * the store's entry list; the executor-side scan is the probed
  * cells' parquet, never the store.
  *
  * Semantics are EXACTLY the underlying kernels'
  * ([[graft.functions.Similarity.ivfTopKIndexed]] /
  * [[graft.functions.Similarity.graphAnnTopKIndexed]]): the slice
  * contains every cell the search would probe ([[Similarity
  * .probedCells]] is the same expression the kernels explode), so the
  * results are bit-identical to running the kernel over the full
  * store read — gated by `sim_ivf_probe_read` / `sim_ann_graph_probe`
  * against the planted brute-force oracle.
  *
  * `version` < 0 (default) searches the head snapshot; a retained
  * version pins the search to exactly what that version published
  * ([[VectorStore.readPartitionsAt]]) — the plan-then-execute shape a
  * search service uses while maintenance advances the store.
  *
  * PRECONDITION: `queries` must be DETERMINISTIC (re-evaluating the
  * frame yields the same rows). The probe-cell collect and the search
  * kernel each evaluate it once; a frame built on `rand()`/
  * `sample()`/unordered `limit()` can probe one realization's cells
  * and search another's — cells missing from the slice contribute
  * zero candidates, silently truncating that query's top-k. Cache or
  * `localCheckpoint()` such a frame first (the same rule every
  * multi-pass Spark consumer has).
  */
object VectorSearch {

  /** Flat IVF top-k over the store at `dir` (an [[VectorIngest
    * .ingestBatch]]/compacted assignment store). Columns and ranking
    * equal `ivfTopKIndexed` over a full store read.
    */
  def ivfTopK(spark: SparkSession, dir: String, queries: DataFrame,
      queryId: String, queryVec: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int = 4,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      version: Long = -1L): DataFrame =
    Similarity.ivfTopKIndexed(
      probeSlice(spark, dir, queries, queryVec, centroids, nprobe,
        version),
      corpusId, corpusVec, queries, queryId, queryVec, k, centroids,
      nprobe)

  /** Graph-ANN (NSW walk) top-k over the stored graph index at `dir`
    * (an [[VectorIngest.ingestGraphBatch]]/sync-maintained store).
    * Columns and ranking equal `graphAnnTopKIndexed` over a full
    * store read.
    */
  def graphAnnTopK(spark: SparkSession, dir: String, queries: DataFrame,
      queryId: String, queryVec: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int = 4, ef: Int = 64,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      version: Long = -1L): DataFrame =
    Similarity.graphAnnTopKIndexed(
      probeSlice(spark, dir, queries, queryVec, centroids, nprobe,
        version),
      corpusId, corpusVec, queries, queryId, queryVec, k, centroids,
      nprobe, ef)

  private def probeSlice(spark: SparkSession, dir: String,
      queries: DataFrame, queryVec: String,
      centroids: Array[Array[Double]], nprobe: Int,
      version: Long): DataFrame = {
    val parts = Similarity.probedCells(queries, queryVec, centroids,
      nprobe).map(c => s"cell=$c")
    if (version < 0) VectorStore.readPartitions(spark, dir, parts)
    else VectorStore.readPartitionsAt(spark, dir, version, parts)
  }
}
