package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object ProbeSpan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s ($n)")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    timed("warm")(docs.count())
    val k = 30
    val base = docs.select(col("doc_id"), col("text"))
    val grams = base.filter(length(col("text")) >= k)
      .select(col("doc_id"),
        transform(sequence(lit(1), length(col("text")) - k + 1),
          i => struct(i.as("pos"), col("text").substr(i, lit(k)).as("gram"))).as("__gs"))
      .select(col("doc_id"), explode_outer(col("__gs")).as("__g"))
      .filter(col("__g").isNotNull)
      .select(col("doc_id"), col("__g.pos").as("__pos"), col("__g.gram").as("__gram"))
    timed("grams")(grams.count())
    val dupGrams = grams.groupBy(col("__gram"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2).select(col("__gram"))
    timed("dupGrams")(dupGrams.count())
    val surv = grams.join(dupGrams, Seq("__gram"), "left_semi")
      .select(col("doc_id"), col("__pos"))
    timed("survivors")(surv.count())
    val survC = surv.localCheckpoint()
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isNew = when(col("__pos") > coalesce(max(col("__pos") + k).over(wPrev), lit(0)), 1L).otherwise(0L)
    timed("win1 only")(survC.withColumn("__new", isNew).agg(sum("__new")).count())
    val twoWin = survC.withColumn("__new", isNew)
      .withColumn("span_idx", sum(col("__new")).over(wRun))
    timed("win1+win2")(twoWin.agg(sum("span_idx")).count())
    timed("full from checkpoint")(twoWin.groupBy(col("doc_id"), col("span_idx"))
      .agg(min(col("__pos")).as("s")).count())
    spark.stop()
  }
}
