package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Scratch perf probe for the K=128 lazy-IMI gate (dev aid). */
object ProbeImi {
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
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    timed("warm scan")(emb.count())
    var t0 = System.nanoTime()
    val coarse = Similarity.pqBooks(emb, "vec_id", "embedding",
      m = 2, k = 128, dims = 64, stride = 3L)
    println(f"[probe] coarse pqBooks (driver)            ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    t0 = System.nanoTime()
    val fine = Similarity.pqBooks(emb, "vec_id", "embedding",
      m = 8, k = 16, dims = 64, stride = 11L)
    println(f"[probe] fine pqBooks (driver)              ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    import org.apache.spark.sql.graftglue.Glue.{column => exprCol, expression => colExpr}
    val c = emb.select(col("vec_id"),
      Similarity.pqEncodeNative(col("embedding"), fine).as("__codes"),
      coalesce(exprCol(graft.expressions.ImiCellAssign(
        colExpr(col("embedding")), coarse)), lit(-1)).as("__cell"))
    timed("corpus encode (fine+cell, native)")(
      c.agg(sum(col("__cell"))).count())
    val q = queries
      .select(col("query_id"),
        Similarity.pqLut(col("qvec"), fine).as("__lut"),
        explode(exprCol(graft.expressions.ImiProbeCells(
          colExpr(col("qvec")), coarse, 512))).as("__cell"))
    timed("query probes (lut + explode)")(
      q.agg(sum(col("__cell"))).count())
    timed("full imiTopK")(
      Similarity.imiTopK(emb, "vec_id", "embedding", queries,
        "query_id", "qvec", coarse, fine, k = 5, nprobe = 512).count())
    timed("full imiTopK again")(
      Similarity.imiTopK(emb, "vec_id", "embedding", queries,
        "query_id", "qvec", coarse, fine, k = 5, nprobe = 512).count())
    // decompose: join without score vs with score
    val joined0 = c.join(broadcast(q), Seq("__cell"))
      .filter(col("query_id") =!= col("vec_id"))
    timed("join only (no score)")(joined0.count())
    val score = (0 until 8).map { j =>
      element_at(element_at(col("__lut"), j + 1),
        element_at(col("__codes"), j + 1) + 1)
    }.reduce(_ + _)
    timed("join + score")(
      joined0.select(col("query_id"), col("vec_id"),
        score.as("dist_nano")).agg(sum("dist_nano")).count())
    Similarity.imiTopK(emb, "vec_id", "embedding", queries,
      "query_id", "qvec", coarse, fine, k = 5, nprobe = 512)
      .explain("formatted")
    spark.stop()
  }
}
