package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import java.nio.file.Files

/** The manifest commit protocol's isolation contract: a reader pinned
  * to the snapshot it opened is immune to any number of concurrent
  * maintenance commits — it sees the OLD version or (re-opened) the
  * NEW one, never a mix — and the store's version history behaves like
  * a minimal table format (atomic publish, tag-deduped streamed
  * commits, vacuum as the only file reclaimer).
  */
class VectorStoreSpec extends AnyFunSuite with SparkTestBase {

  /** Create the `seg=` dirs a synthetic commit's adds reference —
    * commit verifies its add dirs exist on disk before publishing
    * (round 17, the vacuum-race guard), which a real writeSegment
    * caller's adds satisfy by construction.
    */
  private def seedSegs(idx: java.io.File, entries: Seq[String])
      : Seq[String] = {
    entries.foreach(e => new java.io.File(idx, e.split("/")(0)).mkdirs())
    entries
  }

  private def withDir(f: java.io.File => Unit): Unit = {
    val d = Files.createTempDirectory("graft_vstore").toFile
    try f(d)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete()
      }
      rm(d)
    }
  }

  private def buildStore(dir: String, n: Int = 90, seed: Int = 5)
      : Array[Array[Double]] = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val pts = (1 to n).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
    val all = pts.toDF("vec_id", "embedding")
    val cents = graft.functions.Similarity.ivfCentroids(all, "vec_id",
      "embedding", 4)
    graft.functions.Similarity.graphAnnBuild(all, "vec_id", "embedding",
        cents, degree = 4, efConstruction = 32)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(dir)
    cents
  }

  test("a pinned reader sees the version it opened across a sync commit") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      val cents = buildStore(dir)
      VectorStore.adopt(spark, dir)
      val v1 = VectorStore.version(spark, dir)
      // the pinned snapshot: resolved ONCE here, evaluated only later
      val pinned = VectorStore.read(spark, dir)
      val expectBefore = pinned.select(col("vec_id")).collect()
        .map(_.getLong(0)).toSet
      // a full sync commits while the pinned frame is still unevaluated:
      // update id 5 (cross-cell negation), insert 500, delete 7
      val v5new = pinned.filter(col("vec_id") === 5L)
        .select(col("embedding")).collect()(0)
        .getSeq[Double](0).map(-_).toArray
      val batch = Seq(
        (5L, v5new, "upsert"),
        (500L, Array.fill(8)(0.25), "upsert"),
        (7L, Array.empty[Double], "delete"))
        .toDF("vec_id", "embedding", "op")
      VectorIngest.syncGraphBatch(batch, "vec_id", "embedding", "op",
        cents, dir, degree = 4, efConstruction = 32)
      assert(VectorStore.version(spark, dir) === v1 + 1)
      // the reader opened before the sync still sees the OLD world —
      // id 7 alive, id 500 absent, id 5 un-negated — because its files
      // were never rewritten, only superseded
      val pinnedIds = pinned.select(col("vec_id")).collect()
        .map(_.getLong(0)).toSet
      assert(pinnedIds === expectBefore)
      assert(pinnedIds.contains(7L) && !pinnedIds.contains(500L))
      val pinned5 = pinned.filter(col("vec_id") === 5L)
        .select(col("embedding")).collect()(0).getSeq[Double](0)
      assert(pinned5 === v5new.map(-_).toSeq)
      // a fresh read sees the NEW world, atomically
      val fresh = VectorStore.read(spark, dir)
      val freshIds = fresh.select(col("vec_id")).collect()
        .map(_.getLong(0)).toSet
      assert(!freshIds.contains(7L) && freshIds.contains(500L))
      assert(fresh.filter(col("vec_id") === 5L)
        .select(col("embedding")).collect()(0).getSeq[Double](0)
        === v5new.toSeq)
      // and the old version is still materialized on disk until vacuum
      assert(pinned.count() === expectBefore.size.toLong)
      VectorStore.vacuum(spark, dir, keep = 1)
      assert(VectorStore.read(spark, dir)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        === freshIds)
    }
  }

  test("streamed channel tags dedupe at-least-once replays wholesale") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      val cents = buildStore(dir, n = 60, seed = 9)
      val batch = Seq((201L, Array.fill(8)(0.3), "upsert"))
        .toDF("vec_id", "embedding", "op")
      VectorIngest.syncGraphBatch(batch, "vec_id", "embedding", "op",
        cents, dir, degree = 4, efConstruction = 32,
        tag = Some(("vector_sync", 4L)))
      val v = VectorStore.version(spark, dir)
      // same batchId replayed: skipped before any work — no version
      VectorIngest.syncGraphBatch(batch, "vec_id", "embedding", "op",
        cents, dir, degree = 4, efConstruction = 32,
        tag = Some(("vector_sync", 4L)))
      assert(VectorStore.version(spark, dir) === v)
      // an EARLIER batchId (late replay after restart) also skips
      VectorIngest.syncGraphBatch(batch, "vec_id", "embedding", "op",
        cents, dir, degree = 4, efConstruction = 32,
        tag = Some(("vector_sync", 3L)))
      assert(VectorStore.version(spark, dir) === v)
      // the next batchId commits
      VectorIngest.syncGraphBatch(
        Seq((202L, Array.fill(8)(0.31), "upsert"))
          .toDF("vec_id", "embedding", "op"),
        "vec_id", "embedding", "op", cents, dir, degree = 4,
        efConstruction = 32, tag = Some(("vector_sync", 5L)))
      assert(VectorStore.version(spark, dir) === v + 1)
      assert(VectorStore.lastTag(spark, dir, "vector_sync") === Some(5L))
    }
  }

  test("delta manifests: every version resolves exactly, across checkpoints and a legacy base") {
    withDir { idx =>
      val dir = idx.getAbsolutePath
      // handcraft a PRE-round-15 self-contained v1 manifest (full
      // entries list, no adds/drops) — the back-compat base
      val md = new java.io.File(idx, "_manifests"); md.mkdirs()
      val v1 = """{"version":1,"entries":["seg=old/cell=0","seg=old/cell=1"],"tags":{},"schema":"{}"}"""
      java.nio.file.Files.writeString(
        new java.io.File(md, "v000000000001.json").toPath, v1)
      // a model replay next to 24 delta commits (crossing the v10 and
      // v20 checkpoint boundaries)
      var model = Vector(Seq("seg=old/cell=0", "seg=old/cell=1"))
      (2 to 25).foreach { v =>
        val add = Seq(s"seg=s$v/cell=${v % 4}")
        val drop =
          if (v % 3 == 0) Seq(model.last(v % model.last.length)) else Seq.empty
        val got = VectorStore.commit(spark, dir, drop, seedSegs(idx, add))
        assert(got === v.toLong)
        model = model :+
          (model.last.filterNot(drop.toSet) ++ add).distinct.sorted
      }
      // checkpoints exist exactly at the interval versions
      val names = Option(md.list()).get.toSet
      assert(names.contains("v000000000010.ckpt.json"))
      assert(names.contains("v000000000020.ckpt.json"))
      assert(!names.contains("v000000000015.ckpt.json"))
      // every version time-travels to the model exactly
      (1 to 25).foreach { v =>
        val snap = VectorStore.snapshotAt(spark, dir, v).get
        assert(snap.entries === model(v - 1),
          s"v$v resolution diverged from the model")
      }
    }
  }

  test("vacuum: age floor retains young versions; floor checkpoint keeps the chain resolvable") {
    withDir { idx =>
      val dir = idx.getAbsolutePath
      (1 to 7).foreach { v =>
        new java.io.File(idx, s"seg=s$v").mkdirs()
        VectorStore.commit(spark, dir, Seq.empty,
          Seq(s"seg=s$v/cell=0"), None, "{}")
      }
      // everything is seconds old: a 1-hour age floor protects ALL
      // versions regardless of keep=1
      assert(VectorStore.vacuum(spark, dir, keep = 1,
        minAgeMs = 3600000L) === 0)
      (1 to 7).foreach { v =>
        assert(VectorStore.snapshotAt(spark, dir, v).isDefined)
      }
      // without the age floor, keep=2 retains v6..v7 and must write a
      // checkpoint at the floor (v6 is a delta) before dropping v1-v5
      VectorStore.vacuum(spark, dir, keep = 2)
      val md = new java.io.File(idx, "_manifests")
      assert(Option(md.list()).get.toSet.contains("v000000000006.ckpt.json"))
      intercept[IllegalArgumentException](
        VectorStore.snapshotAt(spark, dir, 5))
      assert(VectorStore.snapshotAt(spark, dir, 6).get.entries
        === (1 to 6).map(v => s"seg=s$v/cell=0"))
      assert(VectorStore.snapshotAt(spark, dir, 7).get.entries
        === (1 to 7).map(v => s"seg=s$v/cell=0"))
      // and a fresh commit on the vacuumed chain still works
      VectorStore.commit(spark, dir, Seq("seg=s1/cell=0"),
        seedSegs(idx, Seq("seg=s8/cell=0")))
      assert(VectorStore.snapshot(spark, dir).get.entries
        === ((2 to 8).map(v => s"seg=s$v/cell=0")))
    }
  }

  test("readChanges: row-level change feed reads only changed partitions, survivors cancel") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      val cents = Array(Array.fill(4)(-1.0), Array.fill(4)(1.0))
      val base = (1L to 40L).map(i =>
        (i, Array.fill(4)(if (i % 2 == 0) 0.9 else -0.9)))
      VectorIngest.ingestBatch(base.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, dir, batchId = 0L)
      val v1 = VectorStore.version(spark, dir)
      // delete a stripe: the touched partitions REWRITE (survivors
      // re-land byte-identical in a fresh segment) — the feed must
      // report ONLY the tombstoned rows, as removes
      val dead = Seq(4L, 8L, 12L).toDF("vec_id")
      VectorIngest.removeIvfBatch(dead, "vec_id", dir)
      val v2 = VectorStore.version(spark, dir)
      val c12 = VectorStore.readChanges(spark, dir, v1, v2)
        .select(col("_change_type"), col("vec_id"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(c12.toSet === Set(("remove", 4L), ("remove", 8L),
        ("remove", 12L)), s"got ${c12.toSeq}")
      // append a batch: inserts only
      VectorIngest.ingestBatch(
        Seq((100L, Array.fill(4)(0.8))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, dir, batchId = 1L)
      val v3 = VectorStore.version(spark, dir)
      val c23 = VectorStore.readChanges(spark, dir, v2, v3)
        .select(col("_change_type"), col("vec_id"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(c23.toSet === Set(("insert", 100L)))
      // spanning feed composes: v1 -> v3 = the deletes + the insert
      val c13 = VectorStore.readChanges(spark, dir, v1, v3)
        .select(col("_change_type"), col("vec_id"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(c13.toSet === Set(("remove", 4L), ("remove", 8L),
        ("remove", 12L), ("insert", 100L)))
      // same-version feed is empty; inverted range rejects
      assert(VectorStore.readChanges(spark, dir, v3, v3).count() === 0L)
      intercept[IllegalArgumentException](
        VectorStore.readChanges(spark, dir, v3, v1))
      // the documented consumer loop, executed: a replica pinned at v1
      // plus the v1->v3 feed equals a fresh read of v3 — incremental
      // replica sync without re-scanning the store
      val feed = VectorStore.readChanges(spark, dir, v1, v3)
      val replica = VectorStore.readAt(spark, dir, v1)
        .exceptAll(feed.filter(col("_change_type") === "remove")
          .drop("_change_type"))
        .unionByName(feed.filter(col("_change_type") === "insert")
          .drop("_change_type"))
      assert(replica.exceptAll(VectorStore.read(spark, dir)).count() === 0L
        && VectorStore.read(spark, dir).exceptAll(replica).count() === 0L,
        "feed-driven replica must converge to the fresh read")
      // an UPDATE (graph store: re-link id 2 with a negated vector)
      // surfaces as a remove+insert pair for that id
      val gdir = idx.getAbsolutePath + "/graph"
      val gBase = (1L to 20L).map(i =>
        (i, Array.fill(4)(if (i % 2 == 0) 0.9 else -0.9)))
      VectorIngest.ingestGraphBatch(gBase.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, gdir, degree = 4,
        efConstruction = 16)
      val gv1 = VectorStore.version(spark, gdir)
      VectorIngest.syncGraphBatch(
        Seq((2L, Array.fill(4)(-0.7), "upsert"))
          .toDF("vec_id", "embedding", "op"),
        "vec_id", "embedding", "op", cents, gdir, degree = 4,
        efConstruction = 16)
      val gc = VectorStore.readChanges(spark, gdir, gv1,
          VectorStore.version(spark, gdir))
        .filter(col("vec_id") === 2L)
        .select(col("_change_type")).collect().map(_.getString(0))
      assert(gc.sorted.toSeq === Seq("insert", "remove"),
        s"an update must feed as a remove+insert pair, got ${gc.toSeq}")
    }
  }

  test("versionStats: retained-window audit flags versions whose segments vanished") {
    withDir { idx =>
      val dir = idx.getAbsolutePath
      (1 to 12).foreach { v =>
        new java.io.File(idx, s"seg=s$v").mkdirs()
        VectorStore.commit(spark, dir, Seq.empty,
          Seq(s"seg=s$v/cell=0"), None, "{}")
      }
      VectorStore.vacuum(spark, dir, keep = 3)
      val rows = VectorStore.versionStats(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getInt(4),
          r.getBoolean(5)))
      // retained window = v10..v12; all segments present; v10 is the
      // floor checkpoint (the interval checkpoint landed there too)
      assert(rows.map(_._1).toSeq === Seq(10L, 11L, 12L))
      assert(rows.forall(_._3 == 0),
        "fresh retained versions must have no missing segments")
      assert(rows.find(_._1 == 10L).get._4, "floor must be checkpointed")
      assert(rows.map(_._2).toSeq === Seq(10, 11, 12)) // n_entries
      // simulate damage a pinned reader would hit: remove a segment
      // dir referenced by every retained version
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(idx, "seg=s3"))
      val damaged = VectorStore.versionStats(spark, dir).collect()
        .map(r => (r.getLong(0), r.getInt(4)))
      assert(damaged.forall(_._2 == 1),
        s"the audit must flag the vanished segment, got ${damaged.toSeq}")
    }
  }

  test("optimistic concurrency: disjoint racing commits both land, equal to serial") {
    withDir { idx =>
      val dir = idx.getAbsolutePath
      val e = (1 to 8).map(i => s"seg=base/cell=$i")
      VectorStore.commit(spark, dir, Seq.empty, seedSegs(idx, e), None, "{}")
      // many rounds of two genuinely concurrent committers with
      // DISJOINT drops: a publish race must rebase the loser, and the
      // result must equal serial application in either order
      (1 to 6).foreach { round =>
        val before = VectorStore.snapshot(spark, dir).get
        val a = (s"seg=a$round/cell=1", before.entries.head)
        val b = (s"seg=b$round/cell=2", before.entries.last)
        seedSegs(idx, Seq(a._1, b._1))
        val start = new java.util.concurrent.CountDownLatch(1)
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
        val ts = Seq(
          new Thread(() => {
            start.await()
            try VectorStore.commit(spark, dir, Seq(a._2), Seq(a._1),
              baseVersion = before.version)
            catch { case t: Throwable => errs.add(t) }
            ()
          }),
          new Thread(() => {
            start.await()
            try VectorStore.commit(spark, dir, Seq(b._2), Seq(b._1),
              baseVersion = before.version)
            catch { case t: Throwable => errs.add(t) }
            ()
          }))
        ts.foreach(_.start()); start.countDown(); ts.foreach(_.join())
        assert(errs.isEmpty, s"round $round: ${errs.toArray.toSeq}")
        val after = VectorStore.snapshot(spark, dir).get
        assert(after.version === before.version + 2,
          "both commits must land as two versions")
        val expect = (before.entries.toSet - a._2 - b._2 + a._1 + b._1)
        assert(after.entries.toSet === expect,
          s"round $round: racing result must equal serial application")
      }
    }
  }

  test("optimistic concurrency: overlapping drops fail the later commit loudly") {
    withDir { idx =>
      val dir = idx.getAbsolutePath
      val e = Seq("seg=base/cell=1", "seg=base/cell=2")
      VectorStore.commit(spark, dir, Seq.empty, seedSegs(idx, e), None, "{}")
      val base = VectorStore.version(spark, dir)
      // writer 1 rewrites cell 1 and lands first
      VectorStore.commit(spark, dir, Seq("seg=base/cell=1"),
        seedSegs(idx, Seq("seg=w1/cell=1")), baseVersion = base)
      // writer 2 planned against the SAME base and also rewrote
      // cell 1 — without the plan-base check this would land as a
      // silent duplicate of cell 1 (no publish race: it commits after
      // writer 1, so the drop is simply no longer live)
      val ex = intercept[IllegalStateException](
        VectorStore.commit(spark, dir, Seq("seg=base/cell=1"),
          seedSegs(idx, Seq("seg=w2/cell=1")), baseVersion = base))
      assert(ex.getMessage.contains("conflict"))
      // the store holds writer 1's world, untouched by the loser
      val entries = VectorStore.snapshot(spark, dir).get.entries.toSet
      assert(entries === Set("seg=w1/cell=1", "seg=base/cell=2"))
      // …and a re-planned retry (fresh base) succeeds
      VectorStore.commit(spark, dir, Seq("seg=w1/cell=1"),
        seedSegs(idx, Seq("seg=w2/cell=1")),
        baseVersion = VectorStore.version(spark, dir))
      assert(VectorStore.snapshot(spark, dir).get.entries.toSet
        === Set("seg=w2/cell=1", "seg=base/cell=2"))
    }
  }

  test("a tagged delete-only first batch against a missing store commits nothing") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath + "/nonexistent"
      val cents = Array(Array.fill(8)(0.0), Array.fill(8)(1.0))
      // deletes against a store that does not exist: the tag-advancing
      // commit must be SKIPPED — an entries-less, schema-less manifest
      // would make VectorStore.read throw "empty store with no
      // recorded schema" where a missing store should read as missing
      val tomb = Seq((7L, Array.empty[Double], "delete"))
        .toDF("vec_id", "embedding", "op")
      VectorIngest.syncGraphBatch(tomb, "vec_id", "embedding", "op",
        cents, dir, degree = 4, efConstruction = 32,
        tag = Some(("vector_sync", 1L)))
      assert(VectorStore.snapshot(spark, dir).isEmpty,
        "a no-op sync against a missing store must not publish a manifest")
      assert(!VectorIngest.storeHasData(spark, dir))
      // the first real upsert bootstraps the store with a schema…
      VectorIngest.syncGraphBatch(
        Seq((1L, Array.fill(8)(0.5), "upsert"))
          .toDF("vec_id", "embedding", "op"),
        "vec_id", "embedding", "op", cents, dir, degree = 4,
        efConstruction = 32, tag = Some(("vector_sync", 2L)))
      assert(VectorStore.read(spark, dir).count() === 1L)
      // …and from then on a tagged empty sync still advances the mark
      VectorIngest.syncGraphBatch(tomb, "vec_id", "embedding", "op",
        cents, dir, degree = 4, efConstruction = 32,
        tag = Some(("vector_sync", 3L)))
      assert(VectorStore.lastTag(spark, dir, "vector_sync") === Some(3L))
      assert(VectorStore.read(spark, dir).count() === 1L)
    }
  }

  test("adoption is idempotent and preserves content exactly") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      buildStore(dir, n = 50, seed = 13)
      val legacy = spark.read.parquet(dir)
        .select(col("cell"), col("vec_id")).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
      val s1 = VectorStore.adopt(spark, dir)
      val s2 = VectorStore.adopt(spark, dir) // second adopt: no-op
      assert(s1.get.version === s2.get.version)
      val adopted = VectorStore.read(spark, dir)
        .select(col("cell"), col("vec_id")).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(adopted === legacy)
      // all entries live under the adoption segment
      assert(s1.get.entries.forall(_.startsWith("seg=adopt0/")))
    }
  }

  test("probe reads: legacy empty probe returns a schema'd empty frame; a manifest dir with no version reads as legacy") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      buildStore(dir, n = 40, seed = 7) // legacy: no _manifests
      // a cell that exists
      val have = VectorStore.read(spark, dir)
        .select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
      val hit = VectorStore.readPartitions(spark, dir,
        Seq(s"cell=${have.head}"))
      assert(hit.count() > 0 &&
        hit.columns.toSet === Set("cell", "vec_id", "embedding",
          "neighbors"))
      // an absent cell is a normal probe result: zero rows, store's
      // own schema, no 'empty store with no recorded schema' throw
      val miss = VectorStore.readPartitions(spark, dir, Seq("cell=99"))
      assert(miss.count() === 0L)
      assert(miss.schema === hit.schema)
      // a _manifests dir holding no committed version (first commit
      // crashed pre-publish) must read as legacy, like snapshot()
      val md = new java.io.File(idx, "_manifests")
      assert(md.mkdir())
      java.nio.file.Files.writeString(
        new java.io.File(md, "_tmp_crashed").toPath, "{}")
      assert(VectorStore.liveEntries(spark, dir,
        Seq(s"cell=${have.head}")).nonEmpty)
      assert(VectorStore.readPartitions(spark, dir,
        Seq(s"cell=${have.head}")).count() === hit.count())
    }
  }

  test("readWhere prunes at the manifest level, same rows as a filtered read") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      buildStore(dir, n = 80, seed = 31)
      VectorStore.adopt(spark, dir)
      val full = VectorStore.read(spark, dir)
      val cells = full.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).sorted
      val probe = cells.take(2).toSet
      val pruned = VectorStore.readWhere(spark, dir, e =>
        probe.exists(c => e.endsWith(s"cell=$c")))
      val viaFilter = full
        .filter(col("cell").isin(probe.toSeq.map(Integer.valueOf): _*))
      assert(pruned.select(col("vec_id")).collect().map(_.getLong(0))
        .toSet ===
        viaFilter.select(col("vec_id")).collect().map(_.getLong(0))
          .toSet)
      // and it genuinely reads fewer entries: only the probed cells'
      // partition dirs appear in the pruned plan's input files
      val files = pruned.inputFiles
      assert(files.nonEmpty && files.forall(f =>
        probe.exists(c => f.contains(s"cell=$c/"))))
    }
  }

  test("a torn or garbage manifest fails loudly, never reads as empty") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      buildStore(dir, n = 40, seed = 41)
      VectorStore.adopt(spark, dir)
      val v = VectorStore.version(spark, dir)
      // a torn write (crashed NON-atomic copy, bitrot, a stray file):
      // highest-numbered manifest is empty garbage. Readers and
      // maintenance ops must FAIL, not treat the store as empty (a
      // remove would silently no-op, a search would return nothing)
      val torn = new java.io.File(idx,
        f"_manifests/v${v + 1}%012d.json")
      assert(torn.createNewFile())
      intercept[IllegalStateException](VectorStore.read(spark, dir))
      val tomb = Seq(1L).toDF("vec_id")
      intercept[IllegalStateException](
        VectorIngest.removeGraphBatch(tomb, "vec_id", "embedding",
          dir, degree = 4, efConstruction = 32))
      // version-field mismatch (renamed manifest) is equally corrupt
      val renamed = new java.io.File(idx,
        f"_manifests/v${v + 2}%012d.json")
      java.nio.file.Files.copy(
        new java.io.File(idx, f"_manifests/v$v%012d.json").toPath,
        renamed.toPath)
      intercept[IllegalStateException](VectorStore.read(spark, dir))
      // remove the debris → the store serves v again and ops commit
      assert(torn.delete() && renamed.delete())
      assert(VectorStore.version(spark, dir) === v)
      VectorIngest.removeGraphBatch(tomb, "vec_id", "embedding", dir,
        degree = 4, efConstruction = 32)
      assert(VectorStore.version(spark, dir) === v + 1)
      assert(VectorStore.read(spark, dir).filter(col("vec_id") === 1L)
        .collect().isEmpty)
    }
  }

  test("lifecycle fuzz: random op sequences track a content model exactly") {
    import spark.implicits._
    // randomized ingest/sync/remove/vacuum sequences against the GRAPH
    // store, with a driver-side model of the expected id->vector map;
    // after every op the store content must equal the model and a
    // reader pinned before the op must still see the pre-op content
    // (its segments survive until vacuum). The same fuzz discipline
    // that caught the Pike bucket leak, aimed at the commit protocol.
    val rnd = new scala.util.Random(20260815L)
    def vec(id: Long, v: Int): Array[Double] =
      Array.tabulate(4)(d => ((id * 31 + d * 17 + v * 7) % 19 - 9) / 9.0)
    withDir { idx =>
      val dir = idx.getAbsolutePath
      val model = scala.collection.mutable.HashMap.empty[Long, Int] // id -> version
      val init = (1L to 40L).map(i => (i, vec(i, 0)))
      init.foreach { case (i, _) => model(i) = 0 }
      val all = init.toDF("vec_id", "embedding")
      val cents = graft.functions.Similarity.ivfCentroids(all, "vec_id",
        "embedding", 2)
      graft.functions.Similarity.graphAnnBuild(all, "vec_id",
          "embedding", cents, degree = 4, efConstruction = 16)
        .write.mode("overwrite").partitionBy("cell").parquet(dir)
      VectorStore.adopt(spark, dir)
      def content(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
        df.select(col("vec_id"), col("embedding")).collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      def modelContent: Map[Long, Seq[Double]] =
        model.toMap.map { case (i, v) => i -> vec(i, v).toSeq }
      var nextId = 41L
      (1 to 12).foreach { step =>
        val before = content(VectorStore.read(spark, dir))
        val pinned = VectorStore.read(spark, dir) // resolved now
        rnd.nextInt(4) match {
          case 0 => // ingest fresh ids
            val ids = (0 until 1 + rnd.nextInt(3)).map(_ => {
              val i = nextId; nextId += 1; model(i) = 0; i })
            VectorIngest.ingestGraphBatch(
              ids.map(i => (i, vec(i, 0))).toDF("vec_id", "embedding"),
              "vec_id", "embedding", cents, dir, degree = 4,
              efConstruction = 16)
          case 1 => // mixed CDC sync: update some, delete some, insert one
            val live = model.keys.toSeq.sorted
            val ups = rnd.shuffle(live).take(1 + rnd.nextInt(2))
              .map { i => model(i) = model(i) + 1; (i, vec(i, model(i)), "upsert") }
            val dels = rnd.shuffle(live.filterNot(ups.map(_._1).contains))
              .take(rnd.nextInt(2))
              .map { i => model.remove(i); (i, Array.empty[Double], "delete") }
            val ins = { val i = nextId; nextId += 1; model(i) = 0
              Seq((i, vec(i, 0), "upsert")) }
            VectorIngest.syncGraphBatch(
              (ups ++ dels ++ ins).toDF("vec_id", "embedding", "op"),
              "vec_id", "embedding", "op", cents, dir, degree = 4,
              efConstruction = 16)
          case 2 => // tombstones (some absent — no-ops)
            val live = model.keys.toSeq.sorted
            val dead = rnd.shuffle(live).take(rnd.nextInt(3)) :+ 999999L
            dead.filter(_ != 999999L).foreach(model.remove)
            VectorIngest.removeGraphBatch(dead.toDF("vec_id"),
              "vec_id", "embedding", dir, degree = 4,
              efConstruction = 16)
          case 3 => // maintenance: vacuum keeps the current version only
            VectorStore.vacuum(spark, dir, keep = 2)
        }
        val after = content(VectorStore.read(spark, dir))
        assert(after === modelContent, s"step $step content diverged")
        // the pinned pre-op reader still serves the pre-op content
        // (vacuum keep=2 protects the immediately-prior version)
        assert(content(pinned) === before, s"step $step pinned reader torn")
      }
      // the store still equals a fresh build of the survivors (the
      // remove/sync construction guarantee, end of the random walk)
      val survivors = model.keys.toSeq.sorted
        .map(i => (i, vec(i, model(i)))).toDF("vec_id", "embedding")
      val fresh = graft.functions.Similarity.graphAnnBuild(survivors,
          "vec_id", "embedding", cents, degree = 4, efConstruction = 16)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2),
          r.getSeq[Long](3))).toSet
      val stored = VectorStore.read(spark, dir)
        .select(col("cell"), col("vec_id"), col("embedding"),
          col("neighbors"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2),
          r.getSeq[Long](3))).toSet
      assert(stored === fresh)
    }
  }

  test("time travel: readAt serves any unvacuumed version verbatim") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      buildStore(dir, n = 30, seed = 51)
      VectorStore.adopt(spark, dir)
      val v1 = VectorStore.version(spark, dir)
      val ids1 = VectorStore.read(spark, dir)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      VectorIngest.removeGraphBatch(Seq(1L, 2L).toDF("vec_id"),
        "vec_id", "embedding", dir, degree = 4, efConstruction = 32)
      val v2 = VectorStore.version(spark, dir)
      assert(v2 === v1 + 1)
      // both versions readable, each exactly as published
      assert(VectorStore.readAt(spark, dir, v1)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        === ids1)
      assert(VectorStore.readAt(spark, dir, v2)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        === ids1 -- Set(1L, 2L))
      // vacuum drops v1; time travel to it now errors loudly
      VectorStore.vacuum(spark, dir, keep = 1)
      intercept[IllegalArgumentException](
        VectorStore.readAt(spark, dir, v1))
      assert(VectorStore.readAt(spark, dir, v2).count()
        === (ids1.size - 2).toLong)
    }
  }

  test("readPartitionsAt: pinned probe serves the probed cells of that version only") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      buildStore(dir, n = 30, seed = 52)
      VectorStore.adopt(spark, dir)
      val v1 = VectorStore.version(spark, dir)
      // pick the cell that holds vec_id 1, so the remove below
      // rewrites exactly the probed partition
      val cell1 = VectorStore.read(spark, dir)
        .filter(col("vec_id") === 1L)
        .select(col("cell")).collect()(0).getInt(0)
      def probeIds(v: Long): Set[Long] =
        VectorStore.readPartitionsAt(spark, dir, v, Seq(s"cell=$cell1"))
          .select(col("cell"), col("vec_id")).collect()
          .map(r => { assert(r.getInt(0) === cell1); r.getLong(1) })
          .toSet
      val pinned = probeIds(v1)
      assert(pinned.contains(1L))
      VectorIngest.removeGraphBatch(Seq(1L).toDF("vec_id"),
        "vec_id", "embedding", dir, degree = 4, efConstruction = 32)
      val v2 = VectorStore.version(spark, dir)
      // the pin still serves the OLD cell content; the head and the
      // pinned v2 probe agree on the new one
      assert(probeIds(v1) === pinned)
      assert(probeIds(v2) === pinned - 1L)
      assert(VectorStore.readPartitions(spark, dir, Seq(s"cell=$cell1"))
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        === pinned - 1L)
      // a probe of a version the store never had errors like readAt
      intercept[IllegalArgumentException](
        VectorStore.readPartitionsAt(spark, dir, v2 + 10,
          Seq(s"cell=$cell1")))
      VectorStore.vacuum(spark, dir, keep = 1)
      intercept[IllegalArgumentException](probeIds(v1))
      assert(probeIds(v2) === pinned - 1L)
    }
  }

  test("sharded checkpoints: exact at every version; untouched shards reuse files; growth reshards") {
    val oldTarget = VectorStore.ShardTargetEntries
    VectorStore.ShardTargetEntries = 2 // toy store goes multi-shard
    try withDir { idx =>
      val dir = idx.getAbsolutePath
      val md = new java.io.File(idx, "_manifests")
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      def ckpt(v: Int) = om.readTree(java.nio.file.Files.readAllBytes(
        new java.io.File(md, f"v$v%012d.ckpt.json").toPath))
      def shardFiles(n: com.fasterxml.jackson.databind.JsonNode) =
        (0 until n.get("shards").size())
          .map(i => n.get("shards").get(i).asText())
          .filter(_.nonEmpty).toSet
      var model = Vector.empty[Seq[String]]
      var cur = Seq.empty[String]
      def step(drops: Seq[String], adds: Seq[String]): Unit = {
        VectorStore.commit(spark, dir, drops, seedSegs(idx, adds), None,
          if (model.isEmpty) "{}" else "")
        cur = (cur.filterNot(drops.toSet) ++ adds).distinct.sorted
        model = model :+ cur
      }
      // phase 1 (v1..v10): 20 distinct cells → v10 checkpoint sharded
      (1 to 10).foreach { v =>
        step(Seq.empty, Seq(s"seg=a$v/cell=$v", s"seg=a$v/cell=${v + 100}"))
      }
      val ck10 = ckpt(10)
      assert(ck10.has("shards") && !ck10.has("entries"),
        "v10 checkpoint should be a manifest list")
      assert(ck10.get("nshards").asInt() >= 4)
      // phase 2 (v11..v20): every delta touches ONLY cell=999 — the
      // v20 checkpoint must reuse every other shard file verbatim
      step(Seq.empty, Seq("seg=b11/cell=999"))
      (12 to 20).foreach { v =>
        step(Seq(s"seg=b${v - 1}/cell=999"), Seq(s"seg=b$v/cell=999"))
      }
      val ck20 = ckpt(20)
      assert(ck20.get("nshards").asInt() === ck10.get("nshards").asInt())
      val fresh = shardFiles(ck20) -- shardFiles(ck10)
      assert(fresh.size <= 1,
        s"only cell=999's shard may be rewritten, got ${fresh.size} fresh files")
      assert((shardFiles(ck10) -- shardFiles(ck20)).size <= 1)
      // phase 3 (v21..v30): bulk growth past 2×target×K doubles K
      (21 to 30).foreach { v =>
        step(Seq.empty, (1 to 10).map(i => s"seg=c$v/cell=${v * 100 + i}"))
      }
      val ck30 = ckpt(30)
      assert(ck30.get("nshards").asInt() > ck20.get("nshards").asInt(),
        "live count outgrew the shard capacity — v30 must reshard")
      // every version resolves to the model exactly, across inline
      // deltas, reused shards and the reshard boundary
      (1 to 30).foreach { v =>
        assert(VectorStore.snapshotAt(spark, dir, v).get.entries
          === model(v - 1), s"v$v resolution diverged from the model")
      }
      // probe listing = filtered full resolution (and sorted)
      val all = VectorStore.snapshot(spark, dir).get.entries
      val probe = Seq("cell=5", "cell=105", "cell=999", "cell=2101")
      assert(VectorStore.liveEntries(spark, dir, probe)
        === all.filter(e =>
          probe.contains(e.substring(e.lastIndexOf('/') + 1))))
      // vacuum: young unreferenced shards survive; stale ones reclaim.
      // keep=2 retains v29/v30 and writes a floor checkpoint at v29 —
      // both retained checkpoints' shards count as referenced
      VectorStore.vacuum(spark, dir, keep = 2)
      val live = shardFiles(ckpt(29)) ++ shardFiles(ckpt(30))
      val allSh = Option(md.list()).get.filter(n =>
        n.startsWith("sh_") && n.endsWith(".json")).toSet
      assert(live.subsetOf(allSh))
      assert(allSh.size > live.size,
        "expected unreferenced shard files from dropped checkpoints")
      // age them and vacuum again — only referenced shards remain
      allSh.foreach { n =>
        val f = new java.io.File(md, n)
        assert(f.setLastModified(System.currentTimeMillis() - 7200000L))
      }
      VectorStore.vacuum(spark, dir, keep = 2)
      val shAfter = Option(md.list()).get.filter(n =>
        n.startsWith("sh_") && n.endsWith(".json")).toSet
      assert(shAfter === live,
        "stale unreferenced shard files must be reclaimed, referenced kept")
      assert(VectorStore.snapshot(spark, dir).get.entries === model.last)
    } finally VectorStore.ShardTargetEntries = oldTarget
  }

  test("empty store keeps its schema; vacuum refuses keep=0") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      buildStore(dir, n = 20, seed = 21)
      VectorStore.adopt(spark, dir)
      val allIds = VectorStore.read(spark, dir)
        .select(col("vec_id")).collect().map(_.getLong(0))
      VectorIngest.removeGraphBatch(allIds.toSeq.toDF("vec_id"),
        "vec_id", "embedding", dir, degree = 4, efConstruction = 32)
      val empty = VectorStore.read(spark, dir)
      assert(empty.count() === 0L)
      assert(Seq("cell", "vec_id", "embedding", "neighbors")
        .forall(empty.columns.contains))
      intercept[IllegalArgumentException](
        VectorStore.vacuum(spark, dir, keep = 0))
    }
  }

  test("shard-routing hash is format-owned: inlined murmur3 == stdlib bit layout + frozen goldens") {
    val seed = 0x5f3a1c9b
    // goldens freeze the ON-DISK routing: even a coordinated change
    // of the inline implementation AND the stdlib cannot slip through
    val golden = Seq(
      "" -> 104326234, "a" -> -309600657, "cell=3" -> 1404341400,
      "cell=999" -> -308070631, "ingest_batch=712" -> -142484281,
      "seg=abc/cell=17" -> -658444546)
    golden.foreach { case (s, h) =>
      assert(VectorStore.murmur3String(s, seed) === h,
        s"inlined murmur3('$s') drifted from the round-15 shard layout")
    }
    // and the inline impl must keep matching the CURRENT stdlib (so a
    // future Scala upgrade changing stringHash is caught here as a
    // loud parity failure, not adopted as silent misrouting)
    val rnd = new scala.util.Random(42)
    val cases = golden.map(_._1) ++ Seq("αβγ≠", " x￿") ++
      (1 to 500).map(_ => rnd.nextString(rnd.nextInt(40)))
    cases.foreach { s =>
      assert(VectorStore.murmur3String(s, seed) ===
        scala.util.hashing.MurmurHash3.stringHash(s, seed), s"'$s'")
    }
  }

  test("a commit whose add segment was reclaimed fails loudly pre-publish; orphanAgeMs widens the window") {
    withDir { idx =>
      val dir = idx.getAbsolutePath
      VectorStore.commit(spark, dir, Seq.empty,
        seedSegs(idx, Seq("seg=base/cell=1")), None, "{}")
      // a slow writer's finished-but-uncommitted segment, 2h old
      val slow = new java.io.File(idx, "seg=slow")
      slow.mkdirs()
      val f = new java.io.File(slow, "part-0.parquet")
      java.nio.file.Files.writeString(f.toPath, "x")
      Seq(slow, f).foreach(x =>
        assert(x.setLastModified(System.currentTimeMillis() - 7200000L)))
      // sized-up orphan window: the in-flight segment SURVIVES…
      assert(VectorStore.vacuum(spark, dir, keep = 1,
        orphanAgeMs = 24L * 3600000L) === 0)
      assert(slow.exists())
      // …and its commit lands
      VectorStore.commit(spark, dir, Seq.empty, Seq("seg=slow/cell=2"))
      assert(VectorStore.snapshot(spark, dir).get.entries
        === Seq("seg=base/cell=1", "seg=slow/cell=2"))
      // the OTHER arm: an aged-out orphan reclaimed by the default
      // window makes the late commit fail LOUDLY BEFORE publishing —
      // never a committed version referencing deleted files
      val slow2 = new java.io.File(idx, "seg=slow2")
      slow2.mkdirs()
      assert(slow2.setLastModified(System.currentTimeMillis() - 7200000L))
      assert(VectorStore.vacuum(spark, dir, keep = 1) === 1)
      assert(!slow2.exists())
      val vBefore = VectorStore.version(spark, dir)
      val ex = intercept[IllegalStateException](
        VectorStore.commit(spark, dir, Seq.empty, Seq("seg=slow2/cell=3")))
      assert(ex.getMessage.contains("not on disk") &&
        ex.getMessage.contains("orphanAgeMs"))
      assert(VectorStore.version(spark, dir) === vBefore,
        "the failed commit must publish nothing")
    }
  }

  test("a commit planned against a vacuumed base fails with the re-plan error and publishes nothing") {
    withDir { idx =>
      val dir = idx.getAbsolutePath
      (1 to 6).foreach { v =>
        VectorStore.commit(spark, dir,
          if (v <= 1) Seq.empty else Seq(s"seg=a${v - 1}/cell=1"),
          seedSegs(idx, Seq(s"seg=a$v/cell=1")), None,
          if (v == 1) "{}" else "")
      }
      // a maintenance op PLANS against v2: its drop was live there
      val planBase = 2L
      // the store advances and a vacuum reclaims v2's manifest
      VectorStore.vacuum(spark, dir, keep = 2)
      val vBefore = VectorStore.version(spark, dir)
      val entriesBefore = VectorStore.snapshot(spark, dir).get.entries
      val ex = intercept[IllegalStateException](
        VectorStore.commit(spark, dir, drop = Seq("seg=a2/cell=1"),
          add = seedSegs(idx, Seq("seg=late/cell=1")),
          baseVersion = planBase))
      assert(ex.getMessage.contains("vacuumed"),
        s"expected the loud re-plan error, got: ${ex.getMessage}")
      // and NOTHING published: no version advance, no phantom entries
      assert(VectorStore.version(spark, dir) === vBefore)
      assert(VectorStore.snapshot(spark, dir).get.entries === entriesBefore)
      // re-planning against the current head (the prescribed recovery)
      // then succeeds
      val head = VectorStore.snapshot(spark, dir).get
      val v2 = VectorStore.commit(spark, dir, drop = head.entries,
        add = seedSegs(idx, Seq("seg=replanned/cell=1")),
        baseVersion = head.version)
      assert(v2 === vBefore + 1)
      assert(VectorStore.snapshot(spark, dir).get.entries ===
        Seq("seg=replanned/cell=1"))
    }
  }

  test("a checkpoint write survives a concurrent vacuum GC'ing its stale base's shards") {
    // The round-16 ADVICE race: a writer lists manifests, then a
    // vacuum cycle (or two) publishes a floor checkpoint and GCs the
    // shards of the below-floor checkpoint the writer's STALE listing
    // picked as its base. The already-published commit must not fail
    // on the optimization write: writeCheckpoint retries from a fresh
    // listing (which resolves from the floor checkpoint).
    val oldTarget = VectorStore.ShardTargetEntries
    VectorStore.ShardTargetEntries = 2
    try withDir { idx =>
      val dir = idx.getAbsolutePath
      val md = new java.io.File(idx, "_manifests")
      def age(): Unit = Option(md.listFiles()).get.foreach { f =>
        assert(f.setLastModified(System.currentTimeMillis() - 7200000L))
      }
      (1 to 19).foreach { v =>
        VectorStore.commit(spark, dir, Seq.empty,
          seedSegs(idx, Seq(s"seg=a$v/cell=$v")), None,
          if (v == 1) "{}" else "")
      }
      def v10Shards(): Set[String] = {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val f = new java.io.File(md, "v000000000010.ckpt.json")
        if (!f.exists()) Set.empty
        else {
          val n = om.readTree(java.nio.file.Files.readAllBytes(f.toPath))
          (0 until n.get("shards").size())
            .map(i => n.get("shards").get(i).asText())
            .filter(_.nonEmpty).toSet
        }
      }
      val baseShards = v10Shards()
      assert(baseShards.nonEmpty, "v10 must be a sharded checkpoint")
      @volatile var shardsGoneAtHook = false
      VectorStore.ckptListingHook = () => {
        VectorStore.ckptListingHook = () => () // disarm: inner
        // writeCheckpoint calls (vacuum's floor write, the retry)
        // must run clean
        // vacuum cycle 1: publishes the floor checkpoint at v20,
        // deletes manifests/ckpts below it; v10's shards survive this
        // cycle (still referenced by the start-of-vacuum listing)
        age(); VectorStore.vacuum(spark, dir, keep = 1)
        // vacuum cycle 2: v10's ckpt is no longer listed, its shards
        // age out — exactly the on-disk state the racing writer's
        // stale listing now points into
        age(); VectorStore.vacuum(spark, dir, keep = 1)
        // only the shards the floor checkpoint REWROTE lose their v10
        // files (untouched ones carry over into v20's checkpoint by
        // name and stay referenced) — and the writer's stale reuse
        // path reads exactly the rewritten (touched) ones, so any
        // gone shard means the FNF retry must fire
        shardsGoneAtHook = baseShards.exists(n =>
          !new java.io.File(md, n).exists())
      }
      val retriesBefore = VectorStore.ckptRetryCount.get()
      try {
        // v20: the commit publishes, then its checkpoint write races
        // the vacuum cycles injected by the hook — must NOT throw
        VectorStore.commit(spark, dir, Seq.empty,
          seedSegs(idx, Seq("seg=a20/cell=20")))
        assert(shardsGoneAtHook,
          "race precondition: some stale base shard must be gone " +
            "before the writer resolves")
        assert(VectorStore.ckptRetryCount.get() > retriesBefore,
          "the FNF recovery path must actually have fired")
        val snap = VectorStore.snapshot(spark, dir).get
        assert(snap.version === 20L)
        assert(snap.entries ===
          (1 to 20).map(v => s"seg=a$v/cell=$v").sorted)
        // the store stays fully usable: probe reads resolve through
        // whatever checkpoint state the race left behind
        assert(VectorStore.liveEntries(spark, dir, Seq("cell=7"))
          === Seq("seg=a7/cell=7"))
      } finally VectorStore.ckptListingHook = () => ()
    } finally VectorStore.ShardTargetEntries = oldTarget
  }
}
