package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi/anti joins on an arbitrary key — the general
  * form of the decontamination prefilter (functions.Curation), for
  * when the filtering side is too big to broadcast as a hash relation
  * but its membership fits a `numBits/8`-byte sketch.
  *
  * Plan shape (the one Spark's own runtime filter injection uses):
  * the small side aggregates DISTRIBUTED into one BloomFilterAggregate
  * sketch; only the finished sketch reaches the driver, where it
  * embeds as a foldable literal in a map-side, codegen'd
  * `might_contain` filter on the big side. The exact shuffle join then
  * sees only the sliver the sketch let through (true hits + ~fpp false
  * positives), instead of every big-side row.
  */
object BloomJoin {

  import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
  import org.apache.spark.sql.graftglue.Glue

  /** Build the membership sketch of `small[keyCol]` distributed-side;
    * returns the serialized filter plus a `might_contain` predicate
    * factory. The runtime bloom-filter conf caps are raised to the
    * requested size during the build (and restored) so the achieved
    * fpp is the one designed, not a silently clamped one.
    */
  private def buildSketch(small: DataFrame, keyCol: String,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val spark = small.sparkSession
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (prevItems, prevBits) =
      (spark.conf.get(itemsKey), spark.conf.get(bitsKey))
    try {
      spark.conf.set(itemsKey, math.max(prevItems.toLong, expectedItems))
      spark.conf.set(bitsKey, math.max(prevBits.toLong, numBits))
      small
        .select(Glue.column(new BloomFilterAggregate(
          Glue.expression(xxhash64(col(keyCol))),
          Literal(expectedItems), Literal(numBits)).toAggregateExpression())
          .as("bf"))
        .head().getAs[Array[Byte]](0)
    } finally {
      spark.conf.set(itemsKey, prevItems)
      spark.conf.set(bitsKey, prevBits)
    }
  }

  private def mightContain(sketch: Array[Byte], key: Column): Column =
    Glue.column(BloomFilterMightContain(
      Literal.create(sketch, org.apache.spark.sql.types.BinaryType),
      Glue.expression(xxhash64(key))))

  /** Semi join: rows of `big` whose key appears in `small`. The sketch
    * rejects most non-members map-side; the exact left_semi join kills
    * the false positives, so output equals a plain semi join while the
    * shuffle carries only the prefiltered sliver.
    */
  def semi(big: DataFrame, small: DataFrame, keyCol: String,
      expectedItems: Long = 4000000L, numBits: Long = 33554432L): DataFrame = {
    val sketch = buildSketch(small.select(col(keyCol)).distinct(),
      keyCol, expectedItems, numBits)
    big.filter(mightContain(sketch, col(keyCol)))
      .join(small.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
  }

  /** Anti join: rows of `big` whose key does NOT appear in `small`.
    * A Bloom REJECT is a definite non-member, so rejected rows pass
    * straight through with no shuffle at all; only the accepted sliver
    * (members + ~fpp false positives) pays the exact left_anti join
    * that rescues the false positives. Two map-side passes over `big`
    * (one per branch of the union) — both codegen'd filters on the
    * scan, no materialization.
    */
  def anti(big: DataFrame, small: DataFrame, keyCol: String,
      expectedItems: Long = 4000000L, numBits: Long = 33554432L): DataFrame = {
    val sketch = buildSketch(small.select(col(keyCol)).distinct(),
      keyCol, expectedItems, numBits)
    val hit = mightContain(sketch, col(keyCol))
    val definiteMiss = big.filter(!hit || col(keyCol).isNull)
    val rescued = big.filter(hit && col(keyCol).isNotNull)
      .join(small.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definiteMiss.unionByName(rescued)
  }
}
