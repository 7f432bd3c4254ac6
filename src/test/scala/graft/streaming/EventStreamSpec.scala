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

  test("stream-static enrichment join equals batch join") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_enrich").toFile
    val chk = Files.createTempDirectory("graft_enrich_chk").toFile
    try {
      val batch = Seq((1L, "click", 2.0), (2L, "view", 3.0),
        (3L, "click", 4.0), (9L, "click", 5.0)) // 9 has no dim row
        .toDF("user_id", "event_type", "value")
      batch.write.parquet(dir.getAbsolutePath + "/in")
      val dim = Seq((1L, "gold"), (2L, "basic"), (3L, "gold"))
        .toDF("user_id", "tier")
      val stream = spark.readStream.schema(batch.schema)
        .parquet(dir.getAbsolutePath + "/in")
      val q = EventStream.enrich(stream, dim, "user_id")
        .writeStream.format("memory").queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val streamed = spark.table("enriched")
        .orderBy("user_id").collect().toSeq
      val batched = EventStream.enrich(batch, dim, "user_id")
        .orderBy("user_id").collect().toSeq
      assert(streamed === batched)
      assert(streamed.length === 4)
      assert(streamed.last.isNullAt(3)) // user 9: left join keeps row
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("watermark drops late data in append mode, emits closed windows once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_late").toFile
    val chk = Files.createTempDirectory("graft_late_chk").toFile
    try {
      def mk(rows: (String, String, Double)*) = rows.map { case (ts, et, v) =>
        (java.sql.Timestamp.valueOf(ts), et, v)
      }.toDF("ts", "event_type", "value")
      // batch 1: one event in the 10:00 window, one at 13:30 that
      // advances the watermark to 12:30 (delay 1h), closing 10:00-11:00
      val b1 = mk(("2024-01-01 10:05:00", "click", 1.0),
        ("2024-01-01 13:30:00", "click", 7.0))
      b1.write.parquet(dir.getAbsolutePath + "/b1")
      val stream = EventStream.streamingWindowedAgg(spark,
        dir.getAbsolutePath + "/*", b1.schema,
        windowDur = "1 hour", watermark = "1 hour")
      val q = stream.writeStream
        .format("memory").queryName("lateagg")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      // batch 2: a LATE event for the closed 10:00 window (must be
      // dropped — the state was evicted) plus an on-time 13:40 event
      mk(("2024-01-01 10:20:00", "click", 100.0),
        ("2024-01-01 13:40:00", "click", 2.0))
        .write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      val out = spark.table("lateagg").collect().map(r =>
        r.getTimestamp(0).toString -> (r.getLong(2),
          r.getDecimal(3).doubleValue())).toMap
      // the 10:00 window was emitted exactly once, WITHOUT the late
      // event's value=100 — watermark semantics, not best-effort
      assert(out("2024-01-01 10:00:00.0") === ((1L, 1.0)))
      // open windows (13:00) are withheld in append mode until closed
      assert(!out.contains("2024-01-01 13:00:00.0"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming stateful dedup drops duplicates across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sdedup").toFile
    val chk = Files.createTempDirectory("graft_sdedup_chk").toFile
    try {
      // batch 1: two distinct docs + an intra-batch duplicate
      Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
        (3L, "alpha  beta   gamma")) // ws-normalized dup of 1
        .toDF("doc_id", "text")
        .write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      // one long-lived query: state persists across micro-batches
      val q = EventStream.streamingExactDedup(stream, "doc_id", "text")
        .writeStream.format("memory").queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      val after1 = spark.table("sdedup").collect()
        .map(_.getLong(0)).toSet
      assert(after1 === Set(1L, 2L)) // 3 deduped within the batch
      // batch 2: cross-batch duplicate of 2 + one genuinely new doc
      Seq((4L, "delta epsilon zeta"), (5L, "eta theta iota"))
        .toDF("doc_id", "text")
        .write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      val after2 = spark.table("sdedup").collect().map(_.getLong(0)).toSet
      assert(after2 === Set(1L, 2L, 5L)) // 4 suppressed by keyed state
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming transitions equal the batch lag-1 pairs over the prefix") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_str").toFile
    val chk = Files.createTempDirectory("graft_str_chk").toFile
    def ts(sec: Int) = java.sql.Timestamp.valueOf(
      f"2026-01-01 10:00:${sec}%02d")
    try {
      // batch 1: user 1 chains a->b->c (+ intra-batch order shuffle),
      // user 2 starts with one event (no transition yet)
      Seq((3L, 1L, "c", ts(30)), (1L, 1L, "a", ts(10)),
        (2L, 1L, "b", ts(20)), (4L, 2L, "x", ts(15)))
        .toDF("event_id", "user_id", "etype", "ts")
        .write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.streamingTransitions(stream,
          "user_id", "etype", "ts", "event_id")
        .writeStream.format("memory").queryName("stransitions")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      def got = spark.table("stransitions").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got === Map((1L, "a", "b") -> 1, (1L, "b", "c") -> 1))
      // batch 2: cross-batch chaining for both users
      Seq((5L, 1L, "a", ts(40)), (6L, 2L, "y", ts(45)),
        (7L, 2L, "x", ts(50)))
        .toDF("event_id", "user_id", "etype", "ts")
        .write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      // equals the BATCH transition pairs over the full prefix
      val all = spark.read.parquet(dir.getAbsolutePath + "/*")
      val batch = graft.operators.Sessionize.transitionMatrix(
          all, "user_id", "etype", col("ts"), "event_id")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val streamed = spark.table("stransitions").collect()
        .map(r => (r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(streamed === batch)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming path ngrams equal the batch topPaths counts over the prefix") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_spn").toFile
    val chk = Files.createTempDirectory("graft_spn_chk").toFile
    def ts(sec: Int) = java.sql.Timestamp.valueOf(
      f"2026-01-01 10:00:${sec}%02d")
    try {
      // batch 1: user 1 walks a->b->c->a (2 complete 3-paths), user 2
      // has only 2 events (no path yet)
      Seq((1L, 1L, "a", ts(10)), (2L, 1L, "b", ts(20)),
        (3L, 1L, "c", ts(30)), (4L, 1L, "a", ts(40)),
        (5L, 2L, "x", ts(15)), (6L, 2L, "y", ts(25)))
        .toDF("event_id", "user_id", "etype", "ts")
        .write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.streamingPathNgrams(stream,
          "user_id", "etype", "ts", "event_id", n = 3)
        .writeStream.format("memory").queryName("spaths")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      // batch 2: cross-batch window carry — user 2's third event
      // completes a path whose first two events arrived in batch 1
      Seq((7L, 2L, "z", ts(35)), (8L, 1L, "b", ts(50)))
        .toDF("event_id", "user_id", "etype", "ts")
        .write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("spaths").collect()
        .map(_.getString(1)).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      // batch truth: count the same length-3 paths over the prefix
      val batch = graft.operators.Sessionize.topPaths(
          spark.read.parquet(dir.getAbsolutePath + "/*"),
          "user_id", "etype", col("ts"), "event_id", n = 3, k = 100)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === batch)
      assert(streamed("x > y > z") === 1L) // the cross-batch carry
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming funnel equals the batch funnel over the prefix") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sfn").toFile
    val chk = Files.createTempDirectory("graft_sfn_chk").toFile
    val steps = Seq("signup", "activate", "purchase")
    try {
      // batch 1: user 1 reaches step 2 (events out of order in the
      // batch), user 2 reaches step 1, user 3 has ONLY a late-step
      // event (never enters the funnel — no step-1 time to gate on)
      Seq((1L, 1L, "activate", 20L), (2L, 1L, "signup", 10L),
        (3L, 2L, "signup", 15L), (4L, 3L, "purchase", 5L))
        .toDF("event_id", "user_id", "etype", "ts_us")
        .write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.streamingFunnel(stream,
          "user_id", "etype", "ts_us", steps)
        .writeStream.format("memory").queryName("sfunnel")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      // batch 2: user 1 completes, user 2 advances, user 3 signs up
      // AFTER its stray purchase (purchase stays unreachable — batch
      // semantics: step 3 needs ts >= step 2's time)
      Seq((5L, 1L, "purchase", 30L), (6L, 2L, "activate", 25L),
        (7L, 3L, "signup", 35L))
        .toDF("event_id", "user_id", "etype", "ts_us")
        .write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      // last (most-complete) emission per user == batch funnel row
      val streamed = spark.table("sfunnel").collect()
        .map(r => (r.getLong(0),
          r.getSeq[java.lang.Long](1).map(Option(_).map(_.toLong)),
          r.getLong(2)))
        .groupBy(_._1).view
        .mapValues(_.maxBy(_._2.count(_.isDefined))).toMap
      val batch = graft.operators.Sessionize.funnel(
          spark.read.parquet(dir.getAbsolutePath + "/*"),
          "user_id", col("ts_us"), "etype", steps)
        .collect()
        .map(r => r.getAs[Long]("user_id") -> (
          (1 to steps.length).map(i =>
            Option(r.getAs[java.lang.Long](s"step${i}_us")).map(_.toLong)),
          r.getAs[Long]("max_step"))).toMap
      assert(streamed.keySet === batch.keySet)
      batch.foreach { case (u, (stepsUs, maxStep)) =>
        val (_, sSteps, sMax) = streamed(u)
        assert(sSteps === stepsUs, s"user $u step times")
        assert(sMax === maxStep, s"user $u max_step")
      }
      // and the state-only carry means user 3's purchase was dropped,
      // not resurrected: max_step 1, purchase slot empty
      assert(streamed(3L)._3 === 1L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming cohort activity deltas equal the batch retention cells") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sco").toFile
    val chk = Files.createTempDirectory("graft_sco_chk").toFile
    def ts(day: String) = java.sql.Timestamp.valueOf(s"2026-01-$day 12:00:00")
    try {
      // week-sized periods; batch 1: users 1,2 first-seen in week A
      Seq((1L, ts("01")), (2L, ts("02")), (1L, ts("03")))
        .toDF("user_id", "ts")
        .write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.streamingCohortActivity(stream,
          "user_id", "ts", periodDays = 7)
        .writeStream.format("memory").queryName("scohort")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      // batch 2: user 1 returns next week (new offset), user 2 repeats
      // week A (no new delta), user 3 first-seen next week (own cohort)
      Seq((1L, ts("09")), (2L, ts("04")), (3L, ts("10")))
        .toDF("user_id", "ts")
        .write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      // one delta per first (user, offset) sighting — counts per cell
      // equal the batch retention matrix's n_active on the prefix
      val deltas = spark.table("scohort").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      assert(deltas.length === deltas.distinct.length, "duplicate deltas")
      val streamedCells = deltas.groupBy(d => (d._1, d._2)).view
        .mapValues(_.length.toLong).toMap
      val batchCells = graft.operators.Sessionize.cohortRetention(
          spark.read.parquet(dir.getAbsolutePath + "/*"),
          "user_id", col("ts"), periodDays = 7)
        .collect()
        .map(r => (r.getAs[Int]("cohort_period"),
          r.getAs[Int]("period_offset")) -> r.getAs[Long]("n_active"))
        .toMap
      assert(streamedCells === batchCells)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming IVF ingest appends assignments identical to the batch path") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_vi_src").toFile
    val idx = Files.createTempDirectory("graft_vi_idx").toFile
    val chk = Files.createTempDirectory("graft_vi_chk").toFile
    try {
      val rnd = new scala.util.Random(7)
      def vecs(ids: Range) = ids.map(i =>
        (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      val b1 = vecs(1 to 60)
      val b2 = vecs(61 to 120)
      val cents = graft.functions.Similarity.ivfCentroids(
        b1.toDF("vec_id", "embedding"), "vec_id", "embedding", 4)
      b1.toDF("vec_id", "embedding")
        .write.parquet(src.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(src.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(src.getAbsolutePath + "/*")
      val q = VectorIngest.streamingIvfIngest(stream, "vec_id", "embedding",
          cents, idx.getAbsolutePath, chk.getAbsolutePath).start()
      q.processAllAvailable()
      b2.toDF("vec_id", "embedding")
        .write.parquet(src.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      // the streamed store equals the batch assignment of all vectors
      val stored = VectorStore.read(spark, idx.getAbsolutePath)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val direct = graft.functions.Similarity.ivfAssignments(
        (b1 ++ b2).toDF("vec_id", "embedding"), "vec_id", "embedding", cents)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(stored === direct)
      // foreachBatch is at-least-once: simulate a post-restart REPLAY
      // of the second micro-batch (same batchId) — the ivf_ingest
      // channel tag skips it, leaving the store identical, no dup rows
      VectorIngest.ingestBatch(b2.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, idx.getAbsolutePath, batchId = 1L)
      val replayed = VectorStore.read(spark, idx.getAbsolutePath)
      assert(replayed.count() === 120L)
      assert(replayed.groupBy("vec_id").count()
        .filter(col("count") > 1).count() === 0L)
      // searches over the store find the streamed vectors
      val queries = b2.take(3).map { case (id, v) => (id + 100000L, v) }
        .toDF("query_id", "qvec")
      val hits = graft.functions.Similarity.ivfTopKIndexed(
          VectorStore.read(spark, idx.getAbsolutePath), "vec_id", "embedding",
          queries, "query_id", "qvec", k = 1, cents, nprobe = 4)
        .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id"))
        .toMap
      // each query is an exact copy of a streamed vector → rank-1 self
      assert(hits === Map(100061L -> 61L, 100062L -> 62L, 100063L -> 63L))
      // drift report: counts sum to corpus size, imbalance centered on 1
      val stats = VectorIngest.cellStats(VectorStore.read(spark, idx.getAbsolutePath))
        .collect()
      assert(stats.map(_.getAs[Long]("n_vecs")).sum === 120L)
      val imb = stats.map(_.getAs[Double]("imbalance"))
      assert(imb.forall(x => x > 0) && math.abs(imb.sum / imb.length - 1.0) < 0.01)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(src); rm(idx); rm(chk)
    }
  }

  test("streaming GRAPH ingest: id-ordered batches equal one fresh build; replay is a no-op") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_gi_src").toFile
    val idx = Files.createTempDirectory("graft_gi_idx").toFile
    val chk = Files.createTempDirectory("graft_gi_chk").toFile
    try {
      val rnd = new scala.util.Random(11)
      def vecs(ids: Range) = ids.map(i =>
        (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      val b1 = vecs(1 to 60)
      val b2 = vecs(61 to 120)
      val all = (b1 ++ b2).toDF("vec_id", "embedding")
      val cents = graft.functions.Similarity.ivfCentroids(
        b1.toDF("vec_id", "embedding"), "vec_id", "embedding", 4)
      b1.toDF("vec_id", "embedding")
        .write.parquet(src.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(src.getAbsolutePath + "/b1").schema
      // no maxFilesPerTrigger: each processAllAvailable drains the
      // pending write as ONE micro-batch (a multi-file parquet write
      // split into per-file batches would interleave insertion order
      // and the fresh-build equality below would not hold — batch
      // CONTENT is id-sorted by graphAnnAppend, batch BOUNDARIES must
      // respect id order for the exact-equality claim)
      val stream = spark.readStream.schema(schema)
        .parquet(src.getAbsolutePath + "/*")
      val q = VectorIngest.streamingGraphIngest(stream, "vec_id",
        "embedding", cents, idx.getAbsolutePath, chk.getAbsolutePath,
        degree = 4, efConstruction = 32).start()
      q.processAllAvailable()
      b2.toDF("vec_id", "embedding")
        .write.parquet(src.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      def snapshot() = VectorStore.read(spark, idx.getAbsolutePath)
        .select(col("cell"), col("vec_id"), col("embedding"),
          col("neighbors"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          r.getSeq[Double](2), r.getSeq[Long](3))).toSet
      val streamed = snapshot()
      // batches arrive in id order, so continued insertion reproduces
      // the fresh full build's graphs EXACTLY (same insertion order)
      val fresh = graft.functions.Similarity.graphAnnBuild(all,
          "vec_id", "embedding", cents, degree = 4, efConstruction = 32)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          r.getSeq[Double](2), r.getSeq[Long](3))).toSet
      assert(streamed === fresh)
      // at-least-once replay of batch 2: graphAnnAppend skips ids
      // already in their cells → the store is unchanged
      VectorIngest.ingestGraphBatch(b2.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, idx.getAbsolutePath,
        degree = 4, efConstruction = 32)
      assert(snapshot() === streamed)
      // searches over the streamed store: exact copies of streamed
      // vectors rank themselves first at full probe
      val queries = b2.take(3).map { case (id, v) => (id + 100000L, v) }
        .toDF("query_id", "qvec")
      val hits = graft.functions.Similarity.graphAnnTopKIndexed(
          VectorStore.read(spark, idx.getAbsolutePath), "vec_id", "embedding",
          queries, "query_id", "qvec", k = 1, cents, nprobe = 4,
          ef = 1024)
        .collect().map(r =>
          r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
      assert(hits === Map(100061L -> 61L, 100062L -> 62L, 100063L -> 63L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(src); rm(idx); rm(chk)
    }
  }

  test("removeGraphBatch: touched-cell rewrite, emptied-cell dir deletion, replay no-op") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_gr_idx").toFile
    try {
      val rnd = new scala.util.Random(17)
      val pts = (1 to 120).map(i =>
        (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      val all = pts.toDF("vec_id", "embedding")
      val cents = graft.functions.Similarity.ivfCentroids(all, "vec_id",
        "embedding", 4)
      graft.functions.Similarity.graphAnnBuild(all, "vec_id", "embedding",
          cents, degree = 4, efConstruction = 32)
        .write.mode("overwrite").partitionBy("cell")
        .parquet(idx.getAbsolutePath)
      // adopt the legacy build up front so the before/after file
      // listings compare like with like (adoption renames the cell
      // dirs under seg=adopt0 once)
      VectorStore.adopt(spark, idx.getAbsolutePath)
      val byCell = VectorStore.read(spark, idx.getAbsolutePath)
        .select(col("cell"), col("vec_id"))
        .collect().map(r => r.getInt(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // tombstones: ALL of cell 0 (must drop out of the manifest)
      // plus half of cell 1 (touched-cell rebuild); cells 2/3 entries
      // and files must not move at all
      val deadIds = byCell(0) ++ byCell(1).toSeq.sorted.take(byCell(1).size / 2)
      def listing() = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(idx).filterNot(_.getName.startsWith("_"))
          .map(f => f.getAbsolutePath ->
            (f.length(), f.lastModified())).toMap
      }
      val before = listing()
      VectorIngest.removeGraphBatch(deadIds.toSeq.toDF("vec_id"),
        "vec_id", "embedding", idx.getAbsolutePath, degree = 4,
        efConstruction = 32)
      val after = listing()
      // emptied cell has no live manifest entry (its files linger for
      // pinned readers until vacuum — snapshot isolation, not a tear)
      val live = VectorStore.snapshot(spark, idx.getAbsolutePath)
        .get.entries
      assert(!live.exists(_.endsWith("cell=0")))
      // untouched cells' files are byte-for-byte the same files, and
      // their live entries still point at the adopted originals
      val untouchedBefore = before.filter { case (p, _) =>
        p.contains("cell=2") || p.contains("cell=3") }
      val untouchedAfter = after.filter { case (p, _) =>
        p.contains("cell=2") || p.contains("cell=3") }
      assert(untouchedBefore.nonEmpty &&
        untouchedBefore.forall { case (p, v) =>
          untouchedAfter.get(p).contains(v) })
      assert(live.exists(_ == "seg=adopt0/cell=2") &&
        live.exists(_ == "seg=adopt0/cell=3"))
      // the store now equals a fresh build of the survivors
      def snapshot() = VectorStore.read(spark, idx.getAbsolutePath)
        .select(col("cell"), col("vec_id"), col("embedding"),
          col("neighbors"))
        .collect().map(r => (r.getInt(0), r.getLong(1),
          r.getSeq[Double](2), r.getSeq[Long](3))).toSet
      val fresh = graft.functions.Similarity.graphAnnBuild(
          all.filter(!col("vec_id").isin(deadIds.toSeq: _*)), "vec_id",
          "embedding", cents, degree = 4, efConstruction = 32)
        .collect().map(r => (r.getInt(0), r.getLong(1),
          r.getSeq[Double](2), r.getSeq[Long](3))).toSet
      assert(snapshot() === fresh)
      // replaying the same tombstone batch finds no matching ids and
      // touches nothing — not even file mtimes
      val post = listing()
      VectorIngest.removeGraphBatch(deadIds.toSeq.toDF("vec_id"),
        "vec_id", "embedding", idx.getAbsolutePath, degree = 4,
        efConstruction = 32)
      assert(listing() === post)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(idx)
    }
  }

  test("syncGraphBatch: insert/update/delete CDC paths, cross-cell update, replay fixpoint") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_vs_idx").toFile
    try {
      val rnd = new scala.util.Random(37)
      val pts = (1 to 90).map(i =>
        (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      val all = pts.toDF("vec_id", "embedding")
      val cents = graft.functions.Similarity.ivfCentroids(all, "vec_id",
        "embedding", 4)
      graft.functions.Similarity.graphAnnBuild(all, "vec_id",
          "embedding", cents, degree = 4, efConstruction = 32)
        .write.mode("overwrite").partitionBy("cell")
        .parquet(idx.getAbsolutePath)
      def store() = VectorStore.read(spark, idx.getAbsolutePath)
        .select(col("cell"), col("vec_id"), col("embedding"),
          col("neighbors"))
        .collect().map(r => (r.getInt(0), r.getLong(1),
          r.getSeq[Double](2), r.getSeq[Long](3))).toSet
      // CDC batch: update id 5 to the NEGATED vector (moves it to a
      // different quantizer cell), insert brand-new id 500, delete
      // id 7, tombstone absent id 999 (no-op)
      val v5new = pts(4)._2.map(-_)
      val batch = Seq(
        (5L, v5new, "upsert"),
        (500L, Array.fill(8)(0.25), "upsert"),
        (7L, Array.empty[Double], "delete"),
        (999L, Array.empty[Double], "delete"))
        .toDF("vec_id", "embedding", "op")
      VectorIngest.syncGraphBatch(batch, "vec_id", "embedding", "op",
        cents, idx.getAbsolutePath, degree = 4, efConstruction = 32)
      val after = store()
      val byId = after.groupBy(_._2)
      assert(!byId.contains(7L))                 // deleted
      assert(byId(500L).size === 1)              // inserted once
      assert(byId(5L).size === 1)                // updated, not duplicated
      assert(byId(5L).head._3.toArray.toSeq === v5new.toSeq)
      // cross-cell move: id 5's stored cell matches its NEW vector's
      // quantizer cell
      val newCell = graft.functions.Similarity.ivfAssignments(
          Seq((5L, v5new)).toDF("vec_id", "embedding"), "vec_id",
          "embedding", cents)
        .select(col("cell")).collect()(0).getInt(0)
      assert(byId(5L).head._1 === newCell)
      // replay fixpoint: applying the same batch again leaves the
      // store content identical (f(f(x)) = f(x))
      VectorIngest.syncGraphBatch(batch, "vec_id", "embedding", "op",
        cents, idx.getAbsolutePath, degree = 4, efConstruction = 32)
      assert(store() === after)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(idx)
    }
  }

  test("streaming sequence pattern: batch-boundary-spanning match counted once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_spat").toFile
    val chk = Files.createTempDirectory("graft_spat_chk").toFile
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:00:$sec%02d")
    try {
      // batch 1 ends mid-pattern: user 1 has v,c — the match completes
      // only when batch 2 delivers c,p. A per-batch-only regex would
      // count 0; the journey fold must count 1.
      Seq((1L, 1L, ts(1), "view"), (1L, 2L, ts(2), "click"),
          (2L, 3L, ts(3), "view"), (2L, 4L, ts(4), "purchase"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getAbsolutePath + "/*")
      val q = graft.streaming.EventStream.streamingSequencePattern(
          stream, "user_id", "event_type", "ts", "event_id",
          (t: String) => t match {
            case "view" => "v"; case "click" => "c"
            case "purchase" => "p"; case _ => "e"
          }, "vc*p")
        .writeStream.format("memory").queryName("spat")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      Seq((1L, 5L, ts(5), "click"), (1L, 6L, ts(6), "purchase"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("spat").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      // user 1: batch-1 emission (2 events, 0 matches — pattern still
      // open), batch-2 emission (4 events, the spanning match found)
      assert(rows.toSet === Set((1L, 2, 0), (2L, 2, 1), (1L, 4, 1)))
      // final state equals the batch operator over the full prefix
      val all = spark.read.parquet(dir.getAbsolutePath + "/*")
      val batch = graft.operators.Sessionize.sequencePattern(all,
          "user_id",
          when(col("event_type") === "view", lit("v"))
            .when(col("event_type") === "click", lit("c"))
            .when(col("event_type") === "purchase", lit("p"))
            .otherwise(lit("e")),
          col("ts"), "event_id", "vc*p")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .toSet
      val finals = rows.groupBy(_._1).values
        .map(_.maxBy(_._2)).filter(_._3 > 0).toSet
      assert(finals === batch)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming quota sample: cross-batch eviction converges to the batch sample") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_squota").toFile
    val chk = Files.createTempDirectory("graft_squota_chk").toFile
    try {
      // cap = 3 over one stratum; ids chosen so batch 2 delivers at
      // least one id whose salted hash beats a batch-1 pick (with 40
      // ids across the two batches, eviction is guaranteed somewhere)
      val b1 = (1L to 20L).map(i => (i, "web"))
      val b2 = (21L to 40L).map(i => (i, "web")) ++ Seq((41L, "books"))
      b1.toDF("doc_id", "source").coalesce(1)
        .write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = graft.streaming.EventStream.streamingQuotaSample(
          stream, "doc_id", "source", cap = 3)
        .writeStream.format("memory").queryName("squota")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      val after1 = spark.table("squota").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      b2.toDF("doc_id", "source").coalesce(1)
        .write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("squota").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // final per stratum = rows at that stratum's max seen
      val finals = rows.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
        val mx = xs.map(_._4).max
        xs.filter(_._4 == mx).toSeq
      }.map(t => (t._1, t._2, t._3)).toSet
      val batch = graft.functions.Curation.quotaSample(
          (b1 ++ b2).toDF("doc_id", "source"), "doc_id", "source",
          cap = 3)
        .collect()
        .map(r => (r.getString(1), r.getLong(0), r.getLong(2))).toSet
      assert(finals === batch)
      // the eviction actually happened: batch-1's web picks are not
      // all in the final set (otherwise this spec tests nothing)
      val web1 = after1.filter(_._1 == "web").map(_._2)
      val webF = finals.filter(_._1 == "web").map(_._2)
      assert(web1.nonEmpty && !web1.subsetOf(webF))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming weighted sample: per-shard top-k union reduces to the batch sample") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_swsmp").toFile
    val chk = Files.createTempDirectory("graft_swsmp_chk").toFile
    try {
      val b1 = (1L to 30L).map(i => (i, 10L + i % 7))
      val b2 = (31L to 60L).map(i => (i, 10L + i % 7))
      b1.toDF("doc_id", "w").coalesce(1)
        .write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = graft.streaming.EventStream.streamingWeightedSample(
          stream, "doc_id", "w", k = 5, shards = 3)
        .writeStream.format("memory").queryName("swsmp")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      b2.toDF("doc_id", "w").coalesce(1)
        .write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("swsmp").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4)))
      // latest per shard → global top-5 by (key desc, id)
      val finals = rows.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
        val mx = xs.map(_._5).max
        xs.filter(_._5 == mx).toSeq
      }
      val picked = finals.sortBy(t => (-t._4, t._2)).take(5)
        .map(t => (t._2, t._3)).toSet
      val batch = graft.functions.Curation.weightedSample(
          (b1 ++ b2).toDF("doc_id", "w"), "doc_id", "w", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(picked === batch)
      // state boundedness: no shard ever emitted more than k rows per
      // batch (emission size = state size)
      assert(rows.groupBy(t => (t._1, t._5)).values
        .forall(_.length <= 5))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("multi-pattern streaming matcher equals one engine per pattern") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_spatm").toFile
    val chk = Files.createTempDirectory("graft_spatm_chk").toFile
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:00:$sec%02d")
    try {
      // user 1 completes BOTH patterns, the second spanning the batch
      // boundary; user 2 completes only the signup run
      Seq((1L, 1L, ts(1), "view"), (1L, 2L, ts(2), "click"),
          (1L, 3L, ts(3), "purchase"), (1L, 4L, ts(4), "signup"),
          (2L, 5L, ts(5), "signup"), (2L, 6L, ts(6), "view"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = graft.streaming.EventStream.streamingSequencePatternMulti(
          stream, "user_id", "event_type", "ts", "event_id",
          (t: String) => t match {
            case "view" => "v"; case "click" => "c"
            case "purchase" => "p"; case "signup" => "s"
            case _ => "e"
          }, Seq(("vp", "vc*p"), ("sp", "s[vce]*p")))
        .writeStream.format("memory").queryName("spatm")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      Seq((1L, 7L, ts(7), "click"), (1L, 8L, ts(8), "purchase"),
          (2L, 9L, ts(9), "purchase"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      val finals = spark.table("spatm").collect()
        .map(r => ((r.getLong(0), r.getString(1)), (r.getInt(2), r.getInt(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      // journeys: user1 = v c p s c p; user2 = s v p
      // vp (vc*p): user1 vcp → 1; user2 "vp" (zero clicks) → 1
      // sp (s[vce]*p): user1 s c p → 1; user2 s v p → 1
      assert(finals((1L, "vp")) === ((6, 1)))
      assert(finals((1L, "sp")) === ((6, 1)))
      assert(finals((2L, "sp")) === ((3, 1)))
      assert(finals((2L, "vp")) === ((3, 1)))
      // parity with one single-pattern engine per pattern over the
      // full prefix
      val all = spark.read.parquet(dir.getAbsolutePath + "/*")
      Seq(("vp", "vc*p"), ("sp", "s[vce]*p")).foreach { case (nm, pat) =>
        val single = graft.operators.Sessionize.sequencePattern(all,
            "user_id",
            when(col("event_type") === "view", lit("v"))
              .when(col("event_type") === "click", lit("c"))
              .when(col("event_type") === "purchase", lit("p"))
              .when(col("event_type") === "signup", lit("s"))
              .otherwise(lit("e")),
            col("ts"), "event_id", pat)
          .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2))))
          .toMap
        single.foreach { case (u, v) => assert(finals((u, nm)) === v) }
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("removeIvfBatch: touched-partition rewrite, emptied dirs deleted, replay no-op") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_ivfr_idx").toFile
    try {
      val rnd = new scala.util.Random(43)
      val pts = (1 to 120).map(i =>
        (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      val all = pts.toDF("vec_id", "embedding")
      val cents = graft.functions.Similarity.ivfCentroids(all, "vec_id",
        "embedding", 4)
      (0 until 2).foreach { b =>
        VectorIngest.ingestBatch(
          all.filter(pmod(col("vec_id"), lit(2)) === b),
          "vec_id", "embedding", cents, idx.getAbsolutePath, b.toLong)
      }
      def rows() = VectorStore.read(spark, idx.getAbsolutePath)
        .select(col("vec_id"), col("cell"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      def listing() = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(idx).filterNot(_.getName.startsWith("_"))
          .map(f => f.getAbsolutePath ->
            (f.length(), f.lastModified())).toMap
      }
      val before = rows()
      // tombstones: every EVEN id (= all of ingest_batch 0) plus two
      // odd ids — batch 0's partitions must empty and their dirs go;
      // batch 1 rewrites only the cells containing ids 1 and 3
      val deadIds = pts.map(_._1).filter(_ % 2 == 0) ++ Seq(1L, 3L)
      val cellsOf13 = VectorStore.read(spark, idx.getAbsolutePath)
        .filter(col("vec_id").isin(1L, 3L))
        .select(col("cell")).collect().map(_.getInt(0)).toSet
      val untouchedCells = (0 until 4).toSet -- cellsOf13
      val beforeFiles = listing()
      VectorIngest.removeIvfBatch(deadIds.toDF("vec_id"), "vec_id",
        idx.getAbsolutePath)
      assert(rows() === before.filterNot(r => deadIds.contains(r._1)))
      // batch 0 is gone entirely from the live manifest
      assert(!VectorStore.snapshot(spark, idx.getAbsolutePath).get
        .entries.exists(_.contains("ingest_batch=0/")))
      // batch 1's untouched cells kept their exact files
      val untouchedBefore = beforeFiles.filter { case (p, _) =>
        p.contains("ingest_batch=1") &&
          untouchedCells.exists(c => p.contains(s"cell=$c")) }
      assert(untouchedBefore.nonEmpty)
      val after = listing()
      untouchedBefore.foreach { case (p, v) => assert(after.get(p).contains(v)) }
      // replay: same tombstones again touch nothing
      val post = listing()
      VectorIngest.removeIvfBatch(deadIds.toDF("vec_id"), "vec_id",
        idx.getAbsolutePath)
      assert(listing() === post)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(idx)
    }
  }

  test("compactIvfStore: rows preserved, one file per cell, protected batch replayable") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_ivfc_idx").toFile
    try {
      val rnd = new scala.util.Random(29)
      val pts = (1 to 160).map(i =>
        (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
      val all = pts.toDF("vec_id", "embedding")
      val cents = graft.functions.Similarity.ivfCentroids(all, "vec_id",
        "embedding", 4)
      (0 until 4).foreach { b =>
        VectorIngest.ingestBatch(
          all.filter(pmod(col("vec_id"), lit(4)) === b),
          "vec_id", "embedding", cents, idx.getAbsolutePath, b.toLong)
      }
      def rows() = VectorStore.read(spark, idx.getAbsolutePath)
        .select(col("vec_id"), col("cell"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val before = rows()
      assert(before.size === 160)
      // pre-compaction: file count grows with batch count (~4 per cell)
      val filesBefore = VectorIngest.storeFileStats(spark,
          idx.getAbsolutePath)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(filesBefore.values.sum > filesBefore.size)
      VectorIngest.compactIvfStore(spark, idx.getAbsolutePath,
        protectLast = 1)
      // batches 0..2 folded into the -1 base; batch 3's entries intact
      def liveBatches() = VectorStore
        .snapshot(spark, idx.getAbsolutePath).get.entries
        .map(e => "ingest_batch=(-?\\d+)".r.findFirstMatchIn(e)
          .get.group(1).toLong)
        .distinct.sorted
      assert(liveBatches() === Seq(-1L, 3L))
      assert(rows() === before)
      // base segment: exactly one file per cell it holds (the live
      // per-cell file counts minus batch 3's contribution)
      val baseEntries = VectorStore
        .snapshot(spark, idx.getAbsolutePath).get.entries
        .filter(_.contains("ingest_batch=-1/"))
      assert(baseEntries.nonEmpty && baseEntries.forall { e =>
        new java.io.File(idx, e).listFiles()
          .count(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith(".")) === 1
      })
      // re-compacting with nothing new to fold is a no-op
      def listing() = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(idx).filterNot(_.getName.startsWith("_"))
          .map(f => f.getAbsolutePath ->
            (f.length(), f.lastModified())).toMap
      }
      val stable = listing()
      VectorIngest.compactIvfStore(spark, idx.getAbsolutePath,
        protectLast = 1)
      assert(listing() === stable)
      // the protected batch stays replayable: an at-least-once replay
      // of batch 3 overwrites its own partition, store content unchanged
      VectorIngest.ingestBatch(
        all.filter(pmod(col("vec_id"), lit(4)) === 3),
        "vec_id", "embedding", cents, idx.getAbsolutePath, 3L)
      assert(rows() === before)
      // offline compaction (stream stopped): protectLast = 0 folds the
      // remaining batch into the base too
      VectorIngest.compactIvfStore(spark, idx.getAbsolutePath,
        protectLast = 0)
      assert(liveBatches() === Seq(-1L))
      assert(rows() === before)
      // vacuum reclaims the superseded segments from disk; the live
      // content is untouched
      val segsBefore = Option(idx.listFiles).toSeq.flatten
        .count(_.getName.startsWith("seg="))
      val reclaimed = VectorStore.vacuum(spark, idx.getAbsolutePath,
        keep = 1)
      assert(reclaimed > 0 && reclaimed < segsBefore)
      assert(rows() === before)
      // searches over the fully compacted store are unaffected: an
      // exact copy of a stored vector ranks itself first at full probe
      val queries = pts.take(2).map { case (id, v) => (id + 9000L, v) }
        .toDF("query_id", "qvec")
      val hits = graft.functions.Similarity.ivfTopKIndexed(
          VectorStore.read(spark, idx.getAbsolutePath), "vec_id", "embedding",
          queries, "query_id", "qvec", k = 1, cents, nprobe = 4)
        .collect().map(r =>
          r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
      assert(hits === Map(9001L -> 1L, 9002L -> 2L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(idx)
    }
  }

  test("TTL dedup: duplicates drop within the horizon, state expires after it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ttl").toFile
    val chk = Files.createTempDirectory("graft_ttl_chk").toFile
    def ts(m: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $m:00")
    try {
      Seq((1L, "alpha beta gamma", ts("10:00")),
        (2L, "delta epsilon zeta", ts("10:00")))
        .toDF("doc_id", "text", "ts")
        .write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.streamingExactDedupTtl(stream, "doc_id", "text",
          "ts", ttlMs = 30L * 60 * 1000, watermarkDelay = "10 minutes")
        .writeStream.format("memory").queryName("ttldedup")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      def ids = spark.table("ttldedup").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L))
      // in-horizon duplicate suppressed; high-ts row drags the
      // watermark to 11:50, past doc 1's timeout (10:05 + 30 min)
      Seq((3L, "alpha beta gamma", ts("10:05")),
        (9L, "zz yy xx", ts("12:00")))
        .toDF("doc_id", "text", "ts")
        .write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      assert(ids === Set(1L, 2L, 9L))
      // a batch with no rows for the fingerprint lets the timeout
      // fire: state for doc 1's content is evicted here
      Seq((10L, "unrelated filler doc", ts("12:05")))
        .toDF("doc_id", "text", "ts")
        .write.parquet(dir.getAbsolutePath + "/b3")
      q.processAllAvailable()
      assert(ids === Set(1L, 2L, 9L, 10L))
      // past the horizon the same content passes again (bounded-state
      // contract: exact dedup WITHIN the TTL, re-admission after)
      Seq((11L, "alpha beta gamma", ts("12:10")))
        .toDF("doc_id", "text", "ts")
        .write.parquet(dir.getAbsolutePath + "/b4")
      q.processAllAvailable()
      q.stop()
      assert(ids === Set(1L, 2L, 9L, 10L, 11L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("pattern TTL: dormant user evicts with exact final emission, re-arrival restarts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pttl").toFile
    val chk = Files.createTempDirectory("graft_pttl_chk").toFile
    def ts(m: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $m:00")
    val charOf = (t: String) => t match {
      case "view" => "v"; case "click" => "c"; case "purchase" => "p"
      case _ => "e"
    }
    try {
      // user 1 completes a match then goes dormant; user 2 keeps the
      // stream (and the watermark) moving
      Seq((1L, 1L, ts("10:00"), "view"), (1L, 2L, ts("10:01"), "click"),
          (1L, 3L, ts("10:02"), "purchase"), (2L, 4L, ts("10:02"), "view"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.streamingSequencePatternTtl(
          stream, "user_id", "event_type", "ts", "event_id",
          charOf, "vc*p", ttlMs = 30L * 60 * 1000,
          watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName("pttl")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      // advance the watermark past user 1's timeout (10:02 + 30 min)
      Seq((2L, 5L, ts("12:00"), "purchase"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      // a further batch runs with the advanced watermark: user 1's
      // state times out here and must RE-EMIT its final (3, 1) row
      Seq((2L, 6L, ts("12:05"), "view"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b3")
      q.processAllAvailable()
      val afterEvict = spark.table("pttl").collect()
        .filter(_.getLong(0) == 1L).map(r => (r.getInt(1), r.getInt(2)))
      assert(afterEvict.toSeq.sorted === Seq((3, 1), (3, 1)),
        s"expected batch emission + identical eviction re-emission, got ${afterEvict.toSeq}")
      // re-arrival after eviction starts a FRESH journey — n_events
      // restarts (a surviving state would have counted 5)
      Seq((1L, 7L, ts("12:10"), "view"), (1L, 8L, ts("12:11"), "purchase"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b4")
      q.processAllAvailable()
      q.stop()
      val u1 = spark.table("pttl").collect()
        .filter(_.getLong(0) == 1L).map(r => (r.getInt(1), r.getInt(2)))
      assert(u1.toSeq.sorted === Seq((2, 1), (3, 1), (3, 1)),
        s"expected a restarted (2,1) journey after eviction, got ${u1.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("weighted-sample TTL: idle shard finalizes and resets; multi-pattern TTL evicts per pattern") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wttl").toFile
    val chk = Files.createTempDirectory("graft_wttl_chk").toFile
    val chk2 = Files.createTempDirectory("graft_wttl_chk2").toFile
    def ts(m: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $m:00")
    try {
      // TWO shards: the sliding TTL refreshes on ANY arrival in the
      // shard, so the idle/evict story needs rows that land in the
      // OTHER shard to advance the watermark — discover the routing
      // (pmod(xxhash64(id), 2)) at runtime
      def shardOf(id: Long): Long = spark.range(1)
        .select(pmod(xxhash64(lit(id)), lit(2L))).collect()(0).getLong(0)
      val s0 = (1L to 60L).filter(shardOf(_) == 0L)
      val s1 = (1L to 60L).filter(shardOf(_) == 1L)
      val (a1, a2, a3) = (s0(0), s0(1), s0(2))
      Seq((a1, 5L, ts("10:00")), (a2, 9L, ts("10:01")))
        .toDF("doc_id", "w", "ts")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.streamingWeightedSampleTtl(
          stream, "doc_id", "w", "ts", k = 2, ttlMs = 30L * 60 * 1000,
          shards = 2, watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName("wttl")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      def shard0Rows = spark.table("wttl").collect()
        .filter(_.getLong(0) == 0L)
        .map(r => (r.getLong(1), r.getLong(4)))
      assert(shard0Rows.map(_._1).toSet === Set(a1, a2) &&
        shard0Rows.forall(_._2 == 2L))
      // shard-1 traffic advances the watermark past shard 0's timeout…
      Seq((s1(0), 1L, ts("12:00"))).toDF("doc_id", "w", "ts")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      // …and the next trigger fires it: the final reservoir RE-EMITS
      Seq((s1(1), 1L, ts("12:05"))).toDF("doc_id", "w", "ts")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b3")
      q.processAllAvailable()
      // a shard-0 arrival after eviction starts a FRESH reservoir
      Seq((a3, 1L, ts("12:10"))).toDF("doc_id", "w", "ts")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b4")
      q.processAllAvailable()
      q.stop()
      val rows = shard0Rows
      assert(rows.count(_._2 == 2L) === 4,
        s"expected the seen=2 emission + its eviction re-emission, got ${rows.toSeq}")
      assert(rows.filter(_._2 == 1L).map(_._1).toSet === Set(a3),
        "post-eviction shard must restart with only the new row")

      // multi-pattern TTL: the evicted user re-emits one final row
      // PER PATTERN, then restarts fresh
      Seq((1L, 1L, ts("10:00"), "view"), (1L, 2L, ts("10:01"), "purchase"),
          (2L, 3L, ts("10:01"), "signup"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/m1")
      val mschema = spark.read.parquet(dir.getAbsolutePath + "/m1").schema
      val mstream = spark.readStream.schema(mschema)
        .parquet(dir.getAbsolutePath + "/m*")
      val q2 = EventStream.streamingSequencePatternMultiTtl(
          mstream, "user_id", "event_type", "ts", "event_id",
          (t: String) => t match {
            case "view" => "v"; case "click" => "c"
            case "purchase" => "p"; case "signup" => "s"; case _ => "e"
          }, Seq(("vp", "vc*p"), ("sp", "s[vce]*p")),
          ttlMs = 30L * 60 * 1000, watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName("mttl")
        .outputMode("append")
        .option("checkpointLocation", chk2.getAbsolutePath)
        .start()
      q2.processAllAvailable()
      Seq((2L, 4L, ts("12:00"), "view"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/m2")
      q2.processAllAvailable()
      Seq((2L, 5L, ts("12:05"), "purchase"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/m3")
      q2.processAllAvailable()
      q2.stop()
      val u1 = spark.table("mttl").collect()
        .filter(_.getLong(0) == 1L)
        .map(r => (r.getString(1), r.getInt(2), r.getInt(3)))
      // user 1: batch emission (vp: 2 events 1 match; sp: 0 matches)
      // + the identical eviction re-emission for BOTH patterns
      assert(u1.count(t => t._1 == "vp" && t._2 == 2 && t._3 == 1) === 2,
        s"vp must emit batch + eviction rows, got ${u1.toSeq}")
      assert(u1.count(t => t._1 == "sp" && t._2 == 2 && t._3 == 0) === 2,
        s"sp must emit batch + eviction rows, got ${u1.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk); rm(chk2)
    }
  }

  test("quota TTL: idle stratum re-emits final picks on eviction and restarts after") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_qttl").toFile
    val chk = Files.createTempDirectory("graft_qttl_chk").toFile
    def ts(m: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $m:00")
    try {
      Seq((1L, "a", ts("10:00")), (2L, "a", ts("10:00")),
          (3L, "a", ts("10:01")))
        .toDF("doc_id", "source", "ts")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.streamingQuotaSampleTtl(
          stream, "doc_id", "source", "ts", cap = 2,
          ttlMs = 30L * 60 * 1000, watermarkDelay = "1 minute")
        .writeStream.format("memory").queryName("qttl")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      val firstPicks = spark.table("qttl").collect()
        .filter(_.getString(0) == "a")
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(firstPicks.size === 2 && firstPicks.forall(_._3 == 3L))
      // stratum "b" advances the watermark past a's timeout…
      Seq((10L, "b", ts("12:00")))
        .toDF("doc_id", "source", "ts")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      // …and the next batch fires it: a's final pick set re-emits
      Seq((11L, "b", ts("12:05")))
        .toDF("doc_id", "source", "ts")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b3")
      q.processAllAvailable()
      val aRows = spark.table("qttl").collect()
        .filter(_.getString(0) == "a")
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(aRows.length === 4 && aRows.toSet === firstPicks,
        s"eviction must re-emit the final pick rows verbatim, got ${aRows.toSeq}")
      // a re-arriving stratum starts a fresh quota (seen resets)
      Seq((20L, "a", ts("12:10")))
        .toDF("doc_id", "source", "ts")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b4")
      q.processAllAvailable()
      q.stop()
      val fresh = spark.table("qttl").collect()
        .filter(r => r.getString(0) == "a" && r.getLong(3) == 1L)
        .map(r => (r.getLong(1), r.getLong(2)))
      assert(fresh.toSeq === Seq((20L, 1L)),
        "post-eviction stratum must restart with seen = 1")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("keyed-state versioning: v-current checkpoint restores, mismatches reject loudly") {
    import spark.implicits._
    // the reject paths, directly
    val st = PikeEngine.initial
    val eOld = intercept[IllegalStateException](
      KeyedState.checked(st, 1, "specOp"))
    assert(eOld.getMessage.contains("fresh checkpoint"))
    val eNew = intercept[IllegalStateException](
      KeyedState.checked(st, KeyedState.Ver + 1, "specOp"))
    assert(eNew.getMessage.contains("newer"))
    assert(KeyedState.checked(st, st.ver, "specOp") eq st)
    // a v-current checkpoint restores across a query RESTART: the
    // second query continues the first's PikeState (n_events
    // accumulates) — proving the carried version round-trips the
    // state store and passes the check on read
    val dir = Files.createTempDirectory("graft_vres").toFile
    val chk = Files.createTempDirectory("graft_vres_chk").toFile
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:00:$sec%02d")
    val charOf = (t: String) => t match {
      case "view" => "v"; case "click" => "c"; case "purchase" => "p"
      case _ => "e"
    }
    try {
      Seq((1L, 1L, ts(1), "view"), (1L, 2L, ts(2), "click"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      // memory sinks cannot recover a checkpoint — collect through a
      // foreachBatch sink (which can) into a shared buffer instead
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int)]
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema)
          .parquet(dir.getAbsolutePath + "/*")
        val q = EventStream.streamingSequencePattern(
            stream, "user_id", "event_type", "ts", "event_id",
            charOf, "vc*p")
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", chk.getAbsolutePath)
          .foreachBatch {
            (b: org.apache.spark.sql.DataFrame, _: Long) =>
              b.collect().foreach(r =>
                emitted.add((r.getInt(1), r.getInt(2))))
          }
          .start()
        q.processAllAvailable()
        q.stop()
      }
      runOnce()
      assert(emitted.toArray.toSeq === Seq((2, 0)))
      emitted.clear()
      Seq((1L, 3L, ts(3), "purchase"))
        .toDF("user_id", "event_id", "ts", "event_type")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b2")
      runOnce()
      // the restarted query only processed b2 (1 event) but the
      // restored state carries b1's 2 events: 3 total, 1 match
      assert(emitted.toArray.toSeq === Seq((3, 1)),
        s"restored state must continue the journey, got ${emitted.toArray.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming interval join equals batch result with bounded state") {
    import spark.implicits._
    val ldir = Files.createTempDirectory("graft_sj_l").toFile
    val rdir = Files.createTempDirectory("graft_sj_r").toFile
    val chk = Files.createTempDirectory("graft_sj_chk").toFile
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
      val clicks = Seq(
        (1L, 100L, ts("10:00")), (1L, 101L, ts("11:00")),
        (2L, 102L, ts("10:10"))).toDF("user_id", "click_id", "cts")
      val purchases = Seq(
        (1L, 200L, ts("10:20")), // matches click 100 (within 30 min)
        (1L, 201L, ts("11:45")), // outside both windows
        (2L, 202L, ts("10:05")), // BEFORE click 102 → no match
        (2L, 203L, ts("10:39"))) // matches click 102 (29 min after)
        .toDF("user_id", "purchase_id", "pts")
      clicks.write.parquet(ldir.getAbsolutePath + "/b")
      purchases.write.parquet(rdir.getAbsolutePath + "/b")

      val w = expr("INTERVAL 30 MINUTES")
      val ls = spark.readStream.schema(clicks.schema)
        .parquet(ldir.getAbsolutePath + "/b").withWatermark("cts", "2 hours")
      val rs = spark.readStream.schema(purchases.schema)
        .parquet(rdir.getAbsolutePath + "/b").withWatermark("pts", "2 hours")
      val joined = EventStream.intervalJoin(ls, rs, "user_id",
        "cts", "pts", w)
      assert(joined.isStreaming)
      val q = joined.writeStream.format("memory").queryName("sjoin")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)

      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select(col("click_id"), col("purchase_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamed = pairs(spark.table("sjoin"))
      val batched = pairs(EventStream.intervalJoin(
        clicks, purchases, "user_id", "cts", "pts", w))
      assert(streamed === batched)
      assert(streamed === Set((100L, 200L), (102L, 203L)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(ldir); rm(rdir); rm(chk)
    }
  }

  test("continuous sync propagates CDC deletes to a real JDBC target") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftstreamdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE cdc_t (id BIGINT NOT NULL PRIMARY KEY, v DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO cdc_t VALUES (?, ?)")
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).foreach { case (id, v) =>
      ps.setLong(1, id); ps.setDouble(2, v); ps.executeUpdate()
    }
    ps.close()
    val dir = Files.createTempDirectory("graft_cdc").toFile
    val chk = Files.createTempDirectory("graft_cdc_chk").toFile
    try {
      // CDC batch: upsert id=2 (new value), insert id=4, DELETE id=3
      val cdc = Seq(
        (2L, 20.0, "update"), (4L, 4.0, "insert"), (3L, 0.0, "delete"))
        .toDF("id", "v", "op")
      cdc.write.parquet(dir.getAbsolutePath + "/batch1")
      val stream = spark.readStream.schema(cdc.schema)
        .parquet(dir.getAbsolutePath + "/batch1")
      val q = EventStream.continuousSyncWriter(stream, Seq("id"),
        graft.operators.DiffSync.SyncTarget(url, "cdc_t", "", "",
          dialect = "generic"),
        chk.getAbsolutePath, opCol = Some("op"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val rs = conn.createStatement()
        .executeQuery("SELECT id, v FROM cdc_t ORDER BY id")
      val buf = scala.collection.mutable.Buffer[(Long, Double)]()
      while (rs.next()) buf += ((rs.getLong(1), rs.getDouble(2)))
      // deleted row 3 is GONE; 2 updated; 4 inserted; 1 untouched
      assert(buf.toSeq === Seq((1L, 1.0), (2L, 20.0), (4L, 4.0)))
    } finally {
      conn.close()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming near-dup candidates equal the batch band self-join") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snd").toFile
    val chk = Files.createTempDirectory("graft_snd_chk").toFile
    try {
      def doc(i: Long, tail: String) =
        (i, s"alpha bravo charlie delta echo foxtrot golf $tail")
      // twins WITHIN batch 1 (1,2), ACROSS batches (3 <-> 11), and
      // WITHIN batch 2 (12,13); everything else unique
      val b1 = Seq(doc(1, "twin one"), doc(2, "twin one"),
        doc(3, "cross twin"), doc(4, "unique four"), doc(5, "unique five"))
        .toDF("doc_id", "text")
      val b2 = Seq(doc(11, "cross twin"), doc(12, "late twin"),
        doc(13, "late twin"), doc(14, "unique fourteen"))
        .toDF("doc_id", "text")
      b1.write.parquet(dir.getAbsolutePath + "/b1")
      val stream = spark.readStream.schema(b1.schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.streamingNearDupCandidates(
          stream, "doc_id", "text")
        .writeStream.format("memory").queryName("snd")
        .outputMode("append")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      b2.write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("snd").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch truth: the band self-join over the full prefix
      val batchPairs = graft.functions.Dedup.minhashCandidates(
          b1.unionByName(b2), "doc_id", "text",
          numHashes = 16, bands = 8, ngramN = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batchPairs)
      // the planted twins all surface, across batch boundaries too
      assert(Set((1L, 2L), (3L, 11L), (12L, 13L)).subsetOf(streamed))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("streaming token counts feed the batch drift scorer exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sdrift").toFile
    val chk = Files.createTempDirectory("graft_sdrift_chk").toFile
    try {
      val ref = Seq((1L, "alpha alpha beta gamma"),
        (2L, "alpha beta")).toDF("id", "text")
      // batch 1 / batch 2 of the live stream
      Seq((10L, "beta beta delta")).toDF("id", "text")
        .write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")
      val q = EventStream.streamingTokenCounts(stream, "text")
        .writeStream.format("memory").queryName("sdrift")
        .outputMode("update")
        .option("checkpointLocation", chk.getAbsolutePath)
        .start()
      q.processAllAvailable()
      Seq((11L, "delta delta gamma"), (12L, "beta"))
        .toDF("id", "text")
        .write.parquet(dir.getAbsolutePath + "/b2")
      q.processAllAvailable()
      q.stop()
      // latest count per token (monotone -> max) == prefix wordcount
      val live = spark.table("sdrift")
        .groupBy(col("token")).agg(max(col("cnt")).as("cnt"))
      val prefix = spark.read.parquet(dir.getAbsolutePath + "/*")
      val expectCounts = graft.operators.Profile
        .tokenCounts(prefix, "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val liveCounts = live.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(liveCounts === expectCounts)
      // and the scorer over (stored reference, live counts) == the
      // batch operator end to end
      val viaStream = graft.operators.Profile.scoreDriftCounts(
          graft.operators.Profile.tokenCounts(ref, "text"), live, k = 10)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      val viaBatch = graft.operators.Profile.tokenDriftMovers(
          ref, prefix, "text", k = 10)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      assert(viaStream === viaBatch)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("quota restart with a SMALLER cap trims restored state to the new cap") {
    // the round-16 heap merge must keep the old sort-take semantics:
    // a checkpoint written at cap=10 restored into a cap=5 query
    // trims held state on the first merge (the heap otherwise only
    // caps NEW admissions and would emit 10 picks forever)
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_qcap").toFile
    val chk = Files.createTempDirectory("graft_qcap_chk").toFile
    try {
      (1L to 12L).map(i => (i, "s")).toDF("id", "stratum")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val emitted =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
      def runOnce(cap: Int): Unit = {
        val stream = spark.readStream.schema(schema)
          .parquet(dir.getAbsolutePath + "/*")
        val q = EventStream.streamingQuotaSample(stream, "id", "stratum",
            cap = cap)
          .writeStream.outputMode("append")
          .option("checkpointLocation", chk.getAbsolutePath)
          .foreachBatch {
            (b: org.apache.spark.sql.DataFrame, _: Long) =>
              b.collect().foreach(r =>
                emitted.add((r.getLong(1), r.getLong(3))))
          }
          .start()
        q.processAllAvailable()
        q.stop()
      }
      runOnce(cap = 10)
      assert(emitted.size === 10)
      emitted.clear()
      Seq((100L, "s")).toDF("id", "stratum")
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b2")
      runOnce(cap = 5)
      val picks = emitted.toArray.map(_.asInstanceOf[(Long, Long)])
      assert(picks.length === 5,
        s"restored cap-10 state must trim to the new cap 5, got ${picks.length}")
      assert(picks.forall(_._2 === 13L), "seen must count all 13 rows")
      // and the picks equal the batch operator over the whole prefix
      // at the new cap (the 5 global smallest are necessarily inside
      // the held 10-smallest-of-12 plus the new arrival)
      val oracle = graft.functions.Curation.quotaSample(
          (1L to 12L).map(i => (i, "s")).toDF("id", "stratum")
            .unionByName(Seq((100L, "s")).toDF("id", "stratum")),
          "id", "stratum", cap = 5)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(picks.map(_._1).toSet === oracle)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk)
    }
  }

  test("hot key: 10^6 events for ONE key in one micro-batch — bounded ops fold, order ops complete") {
    // The round-16 per-key-per-batch memory contract: (a) fold-shaped
    // ops (quota/weighted/dedup/cohort/neardup) process a million-row
    // key in O(cap) task memory — exact vs the batch oracle; (b) the
    // order-requiring ops (transitions et al.) buffer the key's batch
    // (stated contract), array-packed, and complete with exact output.
    import spark.implicits._
    val n = 1000000L
    val dir = Files.createTempDirectory("graft_hot").toFile
    val chk1 = Files.createTempDirectory("graft_hot_c1").toFile
    val chk2 = Files.createTempDirectory("graft_hot_c2").toFile
    try {
      // one user, 10^6 events, unique event ids, event time spread
      spark.range(n).select(
          lit(7L).as("user_id"),
          col("id").as("event_id"),
          timestamp_seconds(lit(1700000000L) + col("id") / 100).as("ts"),
          when(pmod(col("id"), lit(3)) === 0, "view")
            .when(pmod(col("id"), lit(3)) === 1, "click")
            .otherwise("purchase").as("event_type"),
          lit("s").as("stratum"))
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      def stream() = spark.readStream.schema(schema)
        .parquet(dir.getAbsolutePath + "/*")

      // (a) quota: one stratum, cap 5 — O(cap) fold over 10^6 rows
      val q1 = EventStream.streamingQuotaSample(stream(), "event_id",
          "stratum", cap = 5)
        .writeStream.format("memory").queryName("hot_quota")
        .outputMode("append")
        .option("checkpointLocation", chk1.getAbsolutePath).start()
      q1.processAllAvailable(); q1.stop()
      val picks = spark.table("hot_quota").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(picks.length === 5)
      assert(picks.forall(_._3 === n), "seen must count every row")
      val oracle = graft.functions.Curation.quotaSample(
          spark.read.parquet(dir.getAbsolutePath + "/b1"),
          "event_id", "stratum", cap = 5)
        .select(col("event_id")).collect().map(_.getLong(0)).toSet
      assert(picks.map(_._1).toSet === oracle,
        "streamed hot-stratum picks must equal the batch quotaSample")

      // (b) transitions: order-requiring — since round 17 the sort is
      // CAPPED-MEMORY: chunkRows forced far below the batch size, so
      // the million-row key MUST take the spill-run/merge path
      // (asserted via the spill counter) and still emit exactly n-1
      // pairs in exact (ts, eid) order
      spark.conf.set(BatchSorter.ChunkRowsConf, "65536")
      val spillsBefore = BatchSorter.spillSorts.get()
      val counted = new java.util.concurrent.atomic.AtomicLong(0)
      val wrong = new java.util.concurrent.atomic.AtomicLong(0)
      val q2 = EventStream.streamingTransitions(stream(), "user_id",
          "event_type", "ts", "event_id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk2.getAbsolutePath)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          counted.addAndGet(b.count())
          // event_id order is view,click,purchase cyclic — every
          // from->to pair must follow that cycle
          wrong.addAndGet(b.filter(
            !(col("from_type") === "view" && col("to_type") === "click") &&
            !(col("from_type") === "click" && col("to_type") === "purchase") &&
            !(col("from_type") === "purchase" && col("to_type") === "view"))
            .count())
          ()
        }.start()
      q2.processAllAvailable(); q2.stop()
      assert(counted.get() === n - 1,
        s"hot key must emit exactly ${n - 1} transitions")
      assert(wrong.get() === 0L,
        "every transition must follow the cyclic event order — the " +
          "(ts, eid) sort held through the spilled runs")
      assert(BatchSorter.spillSorts.get() > spillsBefore,
        "the million-row key at chunkRows=65536 must take the " +
          "capped-memory spill path, not the in-memory fast path")
      // every spill run file is reclaimed once its stream drains
      val leftover = Option(new java.io.File(
          System.getProperty("java.io.tmpdir")).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("graft_keysort_"))
      assert(leftover.isEmpty,
        s"spill runs must be deleted on exhaustion: ${leftover.toSeq}")
    } finally {
      spark.conf.unset(BatchSorter.ChunkRowsConf)
      spark.sql("DROP VIEW IF EXISTS hot_quota")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chk1); rm(chk2)
    }
  }

  test("chunked Pike feed: hundreds of flushes equal one feed (FeedChunkChars forced tiny)") {
    // the round-17 pattern ops feed the Pike VM in bounded char
    // chunks; the incremental-feed ENGINE parity is PikeRegexSpec's,
    // but the operator-side flush loop (buffer fill -> feed -> reset,
    // hundreds of times in one micro-batch) deserves its own pin:
    // a 5000-event single-user batch with an 8-char flush threshold
    // must produce the exact (n_events, n_matches) the default
    // threshold (one flush) produces.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_feedchunk").toFile
    val chkA = Files.createTempDirectory("graft_feedchunk_ca").toFile
    val chkB = Files.createTempDirectory("graft_feedchunk_cb").toFile
    val oldChunk = EventStream.FeedChunkChars
    try {
      val n = 5000L
      spark.range(n).select(
          lit(1L).as("user_id"),
          col("id").as("event_id"),
          timestamp_seconds(lit(1700000000L) + col("id")).as("ts"),
          when(pmod(col("id"), lit(7)) === 0, "view")
            .when(pmod(col("id"), lit(7)) < 5, "click")
            .otherwise("purchase").as("event_type"))
        .coalesce(1).write.parquet(dir.getAbsolutePath + "/b1")
      val schema = spark.read.parquet(dir.getAbsolutePath + "/b1").schema
      val charOf = (t: String) => t match {
        case "view" => "v"; case "click" => "c"; case _ => "p"
      }
      def runOnce(chk: java.io.File, name: String): (Int, Int) = {
        val q = EventStream.streamingSequencePattern(
            spark.readStream.schema(schema)
              .parquet(dir.getAbsolutePath + "/*"),
            "user_id", "event_type", "ts", "event_id", charOf,
            "vc+p")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", chk.getAbsolutePath).start()
        q.processAllAvailable(); q.stop()
        val r = spark.table(name).collect().last
        (r.getInt(1), r.getInt(2))
      }
      val oneFeed = runOnce(chkA, "feed_default")
      assert(oneFeed._1 === n.toInt, "every event must be consumed")
      assert(oneFeed._2 > 0, "fixture must actually match the pattern")
      EventStream.FeedChunkChars = 8 // ~625 flushes over the batch
      val manyFlushes = runOnce(chkB, "feed_tiny")
      assert(manyFlushes === oneFeed,
        "multi-flush chunked feed must equal the single-feed result")
    } finally {
      EventStream.FeedChunkChars = oldChunk
      spark.sql("DROP VIEW IF EXISTS feed_default")
      spark.sql("DROP VIEW IF EXISTS feed_tiny")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(chkA); rm(chkB)
    }
  }

  test("BatchSorter: spilled merge is bit-identical to the in-memory sort; onRow sees every row once") {
    val rnd = new scala.util.Random(42)
    val rows: Seq[(Long, String, Long, Long)] = (1 to 100000).map { i =>
      (7L, s"t${rnd.nextInt(5)}", rnd.nextInt(5000).toLong, i.toLong)
    }
    val ord = Ordering.by[(Long, String, Long, Long), (Long, Long)](
      r => (r._3, r._4))
    def w(o: java.io.DataOutputStream,
        r: (Long, String, Long, Long)): Unit = {
      o.writeLong(r._1)
      val b = r._2.getBytes("UTF-8"); o.writeInt(b.length); o.write(b)
      o.writeLong(r._3); o.writeLong(r._4)
    }
    def rd(i: java.io.DataInputStream): (Long, String, Long, Long) = {
      val a = i.readLong()
      val b = new Array[Byte](i.readInt()); i.readFully(b)
      (a, new String(b, "UTF-8"), i.readLong(), i.readLong())
    }
    val expect = rows.sorted(ord)
    // fast path (fits)
    var seen = 0L
    val inMem = BatchSorter.sorted(rows.iterator, 1 << 20,
      (_: (Long, String, Long, Long)) => seen += 1, w, rd)(
      ord, implicitly).toSeq
    assert(seen === rows.length.toLong)
    assert(inMem === expect)
    // spill path (97 runs of 1031) — same result, counter fires
    val before = BatchSorter.spillSorts.get()
    seen = 0L
    val spilled = BatchSorter.sorted(rows.iterator, 1031,
      (_: (Long, String, Long, Long)) => seen += 1, w, rd)(
      ord, implicitly).toSeq
    assert(seen === rows.length.toLong)
    assert(BatchSorter.spillSorts.get() === before + 1)
    assert(spilled === expect,
      "ties on (ts, eid) are impossible (eid unique), so the merged " +
        "run order must equal the in-memory sort exactly")
  }

  test("BatchSorter: spill-dir resolution follows Spark's local-dir precedence (hermetic)") {
    // round-19 (verdict item 2): the old form of this test read the
    // REAL env (fails wherever SPARK_LOCAL_DIRS is set) and mutated
    // the shared SparkEnv conf mid-suite (races sibling suites in the
    // same JVM). The resolver is now a pure function of its sources —
    // assert the precedence chain with injected values only.
    def res(env: Map[String, String], conf: Option[String]) =
      BatchSorter.resolveSpillDirs(env.get, conf, "/fallback_tmp").toSeq
    // YARN container: LOCAL_DIRS wins
    assert(res(Map("CONTAINER_ID" -> "c1", "LOCAL_DIRS" -> "/y1,/y2",
      "SPARK_LOCAL_DIRS" -> "/s1"), Some("/c1")) === Seq("/y1", "/y2"))
    // no container: SPARK_LOCAL_DIRS beats conf
    assert(res(Map("SPARK_LOCAL_DIRS" -> "/s1, /s2"), Some("/c1")) ===
      Seq("/s1", "/s2"))
    // conf beats tmpdir
    assert(res(Map.empty, Some("/c1,/c2")) === Seq("/c1", "/c2"))
    // nothing configured: tmpdir
    assert(res(Map.empty, None) === Seq("/fallback_tmp"))
    // blank entries collapse to the fallback
    assert(res(Map("SPARK_LOCAL_DIRS" -> " , "), None) ===
      Seq("/fallback_tmp"))
  }

  test("BatchSorter: run files land under the configured spill disks, round-robin, and are deleted at exhaustion") {
    // round-18 verdict item 2: spills previously went to
    // java.io.tmpdir — on k8s/standalone often a small root-volume
    // /tmp, not the disks Spark sizes for shuffle spill. Hermetic via
    // the spillDirsOverride seam: no env reads, no shared-conf
    // mutation (precedence is covered by the resolver test above).
    val diskA = java.nio.file.Files.createTempDirectory("graft_ld_a")
    val diskB = java.nio.file.Files.createTempDirectory("graft_ld_b")
    BatchSorter.spillDirsOverride =
      Some(Array(diskA.toString, diskB.toString))
    try {
      assert(BatchSorter.spillDirs().toSeq ===
        Seq(diskA.toString, diskB.toString))
      val ord = Ordering.by[(Long, Long), (Long, Long)](identity)
      def w(o: java.io.DataOutputStream, r: (Long, Long)): Unit = {
        o.writeLong(r._1); o.writeLong(r._2)
      }
      def rd(i: java.io.DataInputStream): (Long, Long) =
        (i.readLong(), i.readLong())
      val rows = (1 to 10000).map(i => (7L, i.toLong)).reverseIterator
      val merged = BatchSorter.sorted(rows, 1000,
        (_: (Long, Long)) => (), w, rd)(ord, implicitly)
      def runFiles(d: java.nio.file.Path): Seq[java.io.File] = {
        val sub = new java.io.File(d.toFile, "graft_keysort")
        Option(sub.listFiles).map(_.toSeq).getOrElse(Seq.empty)
          .filter(_.getName.endsWith(".run"))
      }
      // 10 sorted runs spilled, merge not yet exhausted: the run
      // files exist and sit on BOTH configured disks (round-robin),
      // none under java.io.tmpdir's root
      val (onA, onB) = (runFiles(diskA), runFiles(diskB))
      assert(onA.size + onB.size === 10,
        s"10 runs expected, found ${onA.size}+${onB.size}")
      assert(onA.nonEmpty && onB.nonEmpty,
        "round-robin must spread runs across both configured disks")
      assert(merged.toSeq === (1 to 10000).map(i => (7L, i.toLong)),
        "merge across both disks must be bit-identical")
      assert(runFiles(diskA).isEmpty && runFiles(diskB).isEmpty,
        "every run file must be deleted at stream exhaustion")
    } finally {
      BatchSorter.spillDirsOverride = None
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(diskA.toFile); rm(diskB.toFile)
    }
  }
}
