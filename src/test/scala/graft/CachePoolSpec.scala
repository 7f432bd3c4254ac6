package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-19 persist-leak fix: lazy-plan persists go through
  * CachePool so the harness can bound their lifetime to one query.
  * These specs pin the contract — results identical before and after
  * release, and releaseAll actually empties the session CacheManager
  * (the round-18 leak was CacheManager entries accumulating across
  * 246-query runs until late gates paid eviction/spill: measured
  * curate_split_containment_safe 3.6 s -> 19.3 s at 32 cores).
  */
class CachePoolSpec extends AnyFunSuite with SparkTestBase {

  private def cacheEmpty: Boolean =
    spark.sharedState.cacheManager.isEmpty

  /** Start from a clean CacheManager: suites sharing the session may
    * have left entries (tracked or not).
    */
  private def resetCache(): Unit = {
    CachePool.releaseAll()
    spark.sharedState.cacheManager.clearCache()
  }

  test("persist tracks, releaseAll empties the CacheManager, results unchanged") {
    import spark.implicits._
    resetCache()
    assert(cacheEmpty)
    val base = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
    val cached = CachePool.persist(base.groupBy("k").count())
    val self = cached.as("l").join(cached.as("r"), "k")
    val before = self.collect().toSet
    assert(!cacheEmpty, "persist must register in the CacheManager")
    val released = CachePool.releaseAll()
    assert(released >= 1)
    assert(cacheEmpty, "releaseAll must drop every tracked entry")
    // unpersisted plan recomputes — identical rows
    assert(self.collect().toSet === before)
    // second release is a no-op
    assert(CachePool.releaseAll() === 0)
  }

  test("a full minhash query leaves no cache entries after release") {
    import spark.implicits._
    resetCache()
    assert(cacheEmpty)
    val docs = (1 to 40).map(i =>
      (i.toLong, s"alpha beta gamma delta ${i % 3} epsilon zeta"))
      .toDF("doc_id", "text")
    val pairs = graft.functions.Dedup.ngramJaccardPairsLsh(
      docs, "doc_id", "text", threshold = 0.8)
    val n1 = pairs.count()
    assert(!cacheEmpty,
      "the LSH band table must be cached during the action")
    CachePool.releaseAll()
    assert(cacheEmpty)
    // recompute from scratch matches
    val pairs2 = graft.functions.Dedup.ngramJaccardPairsLsh(
      docs, "doc_id", "text", threshold = 0.8)
    assert(pairs2.count() === n1)
    CachePool.releaseAll(); ()
  }

  test("track registers an already-persisted frame for release") {
    import spark.implicits._
    resetCache()
    assert(cacheEmpty)
    val df = Seq(1, 2, 3).toDF("x")
    df.persist()
    df.count()
    CachePool.track(df)
    assert(!cacheEmpty)
    CachePool.releaseAll()
    assert(cacheEmpty)
  }
}
