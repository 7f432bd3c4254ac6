package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Scratch perf probe for the projection-recall pipeline (dev aid). */
object ProbeProj {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val noise = (x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      x.cast("double") + lit(0.04) *
        (((col("vec_id") * 31 + i * 17) % 19 - 9).cast("double") / lit(9.0))
    val noised = emb.select((col("vec_id") + 700000L).as("vec_id"),
      transform(col("embedding"), noise).as("embedding"))
    val naturals = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val aug = naturals.union(noised)
    val projCorpus = aug.select(col("vec_id"),
      Similarity.randomProject(col("embedding"), 16, 64).as("embedding"))
    val qMod = math.max(10L, emb.count() / 500L)
    val projQueries = naturals.filter(col("vec_id") % qMod === 0)
      .select(col("vec_id").as("query_id"),
        Similarity.randomProject(col("embedding"), 16, 64).as("qvec"))

    timed("projCorpus materialize")(
      projCorpus.agg(sum(element_at(col("embedding"), 1))).count())
    timed("projQueries materialize")(
      projQueries.agg(sum(element_at(col("qvec"), 1))).count())
    timed("topk over live projection")(
      Similarity.bruteForceTopK(projCorpus, "vec_id", "embedding",
        projQueries, "query_id", "qvec", 1).count())
    val pc = projCorpus.repartition(32, col("vec_id"))
    val pq = projQueries.repartition(4, col("query_id"))
    timed("topk with exchange barrier")(
      Similarity.bruteForceTopK(pc, "vec_id", "embedding",
        pq, "query_id", "qvec", 1).count())
    timed("argmax groupBy variant") {
      val c = projCorpus.select(col("vec_id"),
        col("embedding"), Similarity.norm(col("embedding")).as("__cn"))
      val q = projQueries.select(col("query_id"), col("qvec"),
        Similarity.norm(col("qvec")).as("__qn"))
      val denom = col("__cn") * col("__qn")
      c.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"),
          when(denom === 0, lit(0.0))
            .otherwise(Similarity.dot(col("embedding"), col("qvec")) / denom)
            .as("cos"))
        .groupBy(col("query_id"))
        .agg(max(struct(col("cos"), (-col("vec_id")).as("negid"))).as("__w"))
        .select(col("query_id"), (-col("__w.negid")).as("vec_id"),
          col("__w.cos").as("cos"))
        .count()
    }
    spark.stop(); sys.exit(0)
  }
}
