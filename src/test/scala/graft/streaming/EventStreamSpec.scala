package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import java.nio.file.Files

class EventStreamSpec extends AnyFunSuite with SparkTestBase {

  test("streaming windowed agg over file source equals batch result") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream").toFile
    val chk = Files.createTempDirectory("graft_chk").toFile
    try {
      val batch = Seq(
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0),
        (java.sql.Timestamp.valueOf("2024-01-01 10:50:00"), "view", 5.0),
        (java.sql.Timestamp.valueOf("2024-01-01 11:10:00"), "click", 3.0))
        .toDF("ts", "event_type", "value")
      batch.write.parquet(dir.getAbsolutePath + "/part1")

      val stream = EventStream.streamingWindowedAgg(spark,
        dir.getAbsolutePath + "/part1", batch.schema,
        windowDur = "1 hour", watermark = "2 hours")
      assert(stream.isStreaming)

      val q = stream.writeStream
        .format("memory").queryName("winagg")
        .outputMode("complete")
        .option("checkpointLocation", chk.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)

      val streamed = spark.table("winagg")
        .select(col("window_start"), col("event_type"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy("window_start", "event_type")
        .collect()
      val batched = EventStream.windowedAgg(batch, "1 hour")
        .select(col("window_start"), col("event_type"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy("window_start", "event_type")
        .collect()
      assert(streamed.toSeq === batched.toSeq)
      assert(streamed.length === 3) // (10h click), (10h view), (11h click)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }
}
