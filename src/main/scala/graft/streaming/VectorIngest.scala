package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.functions.Similarity

/** Streaming ANN index maintenance — the continuous twin of
  * [[graft.functions.Similarity.ivfAssignments]]'s batch append path:
  * arriving vectors assign against the FROZEN quantizer (map-only per
  * micro-batch; the codegen'd NearestCell argmin) and append to the
  * stored assignment table. History never recomputes; searches via
  * `ivfTopKIndexed` over the store see each batch as soon as its
  * manifest version publishes.
  *
  * Every maintenance op here commits through [[VectorStore]]'s
  * manifest protocol (round 14): writes land in fresh immutable
  * segments, a single atomic manifest rename publishes the version,
  * readers pin the snapshot they opened, and streamed batches carry a
  * channel tag so at-least-once replays skip wholesale. No op deletes
  * or rewrites a referenced file — [[VectorStore.vacuum]] reclaims
  * superseded segments from the maintenance cadence.
  *
  * Retraining is deliberately out of band: the quantizer is immutable
  * here (the standard IVF contract — reassigning history is a batch
  * rebuild), so the ingest job stays stateless. [[cellStats]] is the
  * drift monitor that tells you WHEN to rebuild: cell-count imbalance
  * growing past the build-time profile means the data distribution
  * moved away from the centroids.
  */
object VectorIngest {

  /** cell id at the tail of a graph-store manifest entry
    * (`seg=X/cell=3`).
    */
  private val CellEntry = ".*cell=(-?\\d+)$".r
  /** (ingest_batch, cell) at the tail of an IVF-store entry. */
  private val BatchCellEntry = ".*ingest_batch=(-?\\d+)/cell=(-?\\d+)$".r

  private def entryCell(e: String): Int = e match {
    case CellEntry(c) => c.toInt
    case _ => throw new IllegalStateException(s"malformed store entry $e")
  }
  private def entryBatchCell(e: String): (Long, Int) = e match {
    case BatchCellEntry(b, c) => (b.toLong, c.toInt)
    case _ => throw new IllegalStateException(s"malformed store entry $e")
  }

  /** Replay guard shared by the streamed channels: true when this
    * (channel, batchId) is already folded into the store.
    */
  private def alreadyApplied(spark: SparkSession, dir: String,
      tag: Option[(String, Long)]): Boolean =
    tag.exists { case (ch, id) =>
      VectorStore.lastTag(spark, dir, ch).exists(id <= _)
    }

  /** One micro-batch's committed write: assignments land in a fresh
    * segment under `ingest_batch=<batchId>/cell=<cell>` partitions and
    * ONE manifest rename publishes them. Replay (foreachBatch is
    * at-least-once — after a failure/restart the last uncommitted
    * batch re-runs) is skipped by the `ivf_ingest` channel tag: a
    * batchId at or below the store's high-water mark commits nothing,
    * so a duplicated vec_id can never occupy multiple top-k slots in
    * `ivfTopKIndexed`.
    */
  def ingestBatch(batch: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], indexDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    // add-only: the snapshot's entries are never consulted, so skip
    // the O(live) resolution adopt() would do on an existing manifest
    // store — only a manifest-less (legacy/first-batch) dir adopts.
    // ONE head read serves both the presence probe and the replay
    // guard, so the whole per-batch driver cost is one _manifests
    // listing + one small JSON parse, flat in live-partition count.
    val head = VectorStore.headTags(spark, indexDir)
    if (head.isEmpty) VectorStore.adopt(spark, indexDir)
    val tag = Some(("ivf_ingest", batchId))
    if (head.exists(_.get("ivf_ingest").exists(batchId <= _))) return
    val assigned = Similarity
      .ivfAssignments(batch, idCol, vecCol, centroids)
      .withColumn("ingest_batch", lit(batchId))
    val add = VectorStore.writeSegment(assigned, indexDir,
      Seq("ingest_batch", "cell"))
    VectorStore.commit(spark, indexDir, Seq.empty, add, tag,
      assigned.schema.json)
    ()
  }

  /** foreachBatch writer: assign each micro-batch against `centroids`
    * and commit to the manifest store at `indexDir`, partitioned by
    * (ingest_batch, cell) so `ivfTopKIndexed` probes become pruned
    * scans of nprobe/nlist of the live entries; batch replays are
    * tag-skipped (see [[ingestBatch]]).
    */
  def streamingIvfIngest(stream: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], indexDir: String,
      checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, idCol, vecCol, centroids, indexDir, batchId)
      }

  /** Uncommitted ingest plan against an explicit snapshot overlay:
    * rewrite the touched cells (stored slice + delta through
    * [[graft.functions.Similarity.graphAnnAppend]]'s search-and-link)
    * into a fresh segment. Returns (entriesToDrop, entriesToAdd,
    * schemaJson) for the caller's single commit.
    */
  /** The distinct quantizer cells a batch's points land in — ≤ nlist
    * values, driver-bounded. The planner's probe set: with the
    * manifest's shard-pruned listing, everything downstream of this
    * is O(touched cells), never O(store).
    */
  private def touchedCells(batch: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Double]]): Set[Int] =
    Similarity.ivfAssignments(
        batch.select(col(idCol),
          transform(col(vecCol), x => x.cast("double")).as(vecCol)),
        idCol, vecCol, centroids)
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSet

  private def ingestGraphPlan(batch: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Double]], indexDir: String,
      entries: Seq[String], schemaJson: String, degree: Int,
      efConstruction: Int, touched: Set[Int])
      : (Seq[String], Seq[String], String) = {
    val spark = batch.sparkSession
    val stored =
      if (entries.nonEmpty || schemaJson.nonEmpty)
        VectorStore.readEntries(spark, indexDir,
            entries.filter(e => touched(entryCell(e))), schemaJson)
          .select(col("cell"), col(idCol), col(vecCol), col("neighbors"))
      else {
        import spark.implicits._
        Seq.empty[(Int, Long, Seq[Double], Seq[Long])]
          .toDF("cell", idCol, vecCol, "neighbors")
      }
    val appended = Similarity.graphAnnAppend(stored, batch, idCol,
      vecCol, centroids, degree, efConstruction)
    val add = VectorStore.writeSegment(appended, indexDir, Seq("cell"))
    val drop = entries.filter(e => touched(entryCell(e)))
    (drop, add, appended.schema.json)
  }

  /** One micro-batch into the STORED GRAPH index
    * ([[graft.functions.Similarity.graphAnnBuild]]'s table at
    * `indexDir`, partitioned by cell): only the cells the batch's
    * points land in are READ (pruned to their manifest entries),
    * appended via the NSW search-and-link insertion and committed as
    * a fresh segment + one manifest rename — untouched cells' entries
    * carry over verbatim, and a reader holding the previous snapshot
    * keeps its files. A missing/empty `indexDir` bootstraps: appending
    * into nothing IS the fresh cell build (decided by
    * [[VectorStore.adopt]]'s explicit filesystem probe, never by
    * catching analysis errors — schema drift must FAIL the batch).
    * Replay safety: a streamed call passes `tag` and is skipped at or
    * below the channel's high-water mark; an untagged replay is
    * content-idempotent (graphAnnAppend skips delta ids already
    * present in a cell).
    */
  def ingestGraphBatch(batch: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], indexDir: String,
      degree: Int = 8, efConstruction: Int = 64,
      tag: Option[(String, Long)] = None): Unit = {
    val spark = batch.sparkSession
    // steady state does NOT resolve the store's entry list: one head
    // read (version + tags + schema), then a PINNED probe listing of
    // just the touched cells — the streamed graph-CDC hot path is
    // O(touched cells) driver-side at any live-partition count, like
    // the flat-IVF ingest. Only a manifest-less dir pays adopt's
    // one-time full resolution (bootstrap).
    val head = VectorStore.headMeta(spark, indexDir)
    val adopted =
      if (head.isEmpty) VectorStore.adopt(spark, indexDir) else None
    val (version, tags, schemaJson) = head
      .orElse(adopted.map(s => (s.version, s.tags, s.schemaJson)))
      .getOrElse((-1L, Map.empty[String, Long], ""))
    if (tag.exists { case (ch, id) => tags.get(ch).exists(id <= _) })
      return
    val touched = touchedCells(batch, idCol, vecCol, centroids)
    val scoped = adopted.map(
        _.entries.filter(e => touched(entryCell(e))))
      .getOrElse {
        if (version < 0) Seq.empty
        // pinned at the head we read above: a commit racing in
        // between cannot skew this listing off our baseVersion anchor
        else VectorStore.liveEntriesAt(spark, indexDir, version,
          touched.toSeq.sorted.map(c => s"cell=$c"))
      }
    val (drop, add, schema) = ingestGraphPlan(batch, idCol, vecCol,
      centroids, indexDir, scoped, schemaJson, degree,
      efConstruction, touched)
    // baseVersion = the version this plan was computed against:
    // commit conflict-checks the drops against it, so a concurrent
    // maintenance op that rewrote the same cells between our plan and
    // our publish fails this commit loudly instead of landing a
    // silent duplicate of those cells
    VectorStore.commit(spark, indexDir, drop, add, tag, schema,
      baseVersion = version)
    ()
  }

  /** True iff `dir` exists and holds at least one non-hidden entry —
    * the explicit store-presence probe (manifest stores count through
    * their live entries). An empty directory (e.g. pre-created by an
    * orchestrator) counts as "no store yet".
    */
  private[streaming] def storeHasData(
      spark: SparkSession, dir: String): Boolean =
    VectorStore.snapshot(spark, dir) match {
      case Some(s) => s.entries.nonEmpty
      case None =>
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.exists(p) && fs.listStatus(p).exists { st =>
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
    }

  /** Uncommitted remove plan against an explicit snapshot overlay —
    * see [[removeGraphBatch]] for semantics. Returns (drop, add).
    */
  private def removeGraphPlan(tombstones: DataFrame, idCol: String,
      vecCol: String, indexDir: String, entries: Seq[String],
      schemaJson: String, degree: Int, efConstruction: Int)
      : (Seq[String], Seq[String]) = {
    val spark = tombstones.sparkSession
    if (entries.isEmpty) return (Seq.empty, Seq.empty)
    val store = VectorStore.readEntries(spark, indexDir, entries,
      schemaJson)
    val dead = tombstones.select(col(idCol).cast("long").as(idCol))
      .distinct()
    val touched = store
      .select(col("cell"), col(idCol).cast("long").as(idCol))
      .join(broadcast(dead), Seq(idCol), "left_semi")
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSet // ≤ nlist values — driver-bounded
    if (touched.isEmpty) return (Seq.empty, Seq.empty)
    val slice = VectorStore.readEntries(spark, indexDir,
        entries.filter(e => touched(entryCell(e))), schemaJson)
      .select(col("cell"), col(idCol), col(vecCol), col("neighbors"))
    val rebuilt = graft.functions.Similarity
      .graphAnnRemove(slice, dead, idCol, vecCol, degree, efConstruction)
    val add = VectorStore.writeSegment(rebuilt, indexDir, Seq("cell"))
    val drop = entries.filter(e => touched(entryCell(e)))
    (drop, add)
  }

  /** Apply DELETE tombstones to the stored graph index at `indexDir`
    * — [[ingestGraphBatch]] in reverse, completing the store's CDC
    * lifecycle (create/insert/delete). Only the cells containing a
    * tombstoned id are read and rewritten
    * ([[graft.functions.Similarity.graphAnnRemove]] rebuilds each
    * over its survivors in id order, so the store stays byte-equal to
    * a fresh build of the survivors); untouched cells' manifest
    * entries carry over. A touched cell whose members ALL die simply
    * drops out of the manifest — no directory deletes, no torn reads.
    * Idempotent: replaying the same tombstone batch finds no matching
    * ids, touches no cells, and commits nothing.
    */
  def removeGraphBatch(tombstones: DataFrame, idCol: String,
      vecCol: String, indexDir: String, degree: Int = 8,
      efConstruction: Int = 64): Unit = {
    val spark = tombstones.sparkSession
    val snap = VectorStore.adopt(spark, indexDir)
    if (snap.isEmpty) return
    val (drop, add) = removeGraphPlan(tombstones, idCol, vecCol,
      indexDir, snap.get.entries, snap.get.schemaJson, degree,
      efConstruction)
    if (drop.isEmpty && add.isEmpty) return
    VectorStore.commit(spark, indexDir, drop, add,
      baseVersion = snap.get.version)
    ()
  }

  /** foreachBatch writer for continuous GRAPH-index maintenance — the
    * graph twin of [[streamingIvfIngest]]: searches via
    * `graphAnnTopKIndexed` over [[VectorStore.read]] see each batch as
    * soon as its manifest version publishes. The quantizer stays
    * frozen (the IVF contract); [[cellStats]] over the graph table is
    * the same retrain signal.
    */
  def streamingGraphIngest(stream: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Double]], indexDir: String,
      checkpoint: String, degree: Int = 8, efConstruction: Int = 64,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestGraphBatch(batch, idCol, vecCol, centroids, indexDir,
          degree, efConstruction, Some(("graph_ingest", batchId)))
      }

  /** Apply DELETE tombstones to the stored IVF assignment table at
    * `indexDir` — the flat-store twin of [[removeGraphBatch]],
    * completing the IVF store's lifecycle next to [[ingestBatch]] and
    * [[compactIvfStore]]. Only the (ingest_batch, cell) partitions
    * that actually CONTAIN a tombstoned id are rewritten (an IVF
    * posting row is self-contained, so a rewrite is just the
    * partition's survivors — no graph relink); partitions whose
    * members all die drop out of the manifest. Replaying the same
    * tombstone batch finds no matching ids and commits nothing.
    */
  def removeIvfBatch(tombstones: DataFrame, idCol: String,
      indexDir: String): Unit = {
    val spark = tombstones.sparkSession
    val snap = VectorStore.adopt(spark, indexDir)
    if (snap.isEmpty || snap.get.entries.isEmpty) return
    val entries = snap.get.entries
    val store = VectorStore.readEntries(spark, indexDir, entries,
      snap.get.schemaJson)
    val dead = tombstones
      .select(col(idCol).cast(store.schema(idCol).dataType).as(idCol))
      .distinct()
    val touched = store
      .join(broadcast(dead), Seq(idCol), "left_semi")
      .select(col("ingest_batch").cast("long").as("b"), col("cell"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    if (touched.isEmpty) return
    // rewrite only the touched partitions' survivors: the manifest
    // names partitions outright, so the touched slice is an exact
    // entry-list read (no isin pruning gymnastics needed), and the
    // anti-join drops the dead ids
    val drop = entries.filter(e => touched(entryBatchCell(e)))
    val slice = VectorStore.readEntries(spark, indexDir, drop,
      snap.get.schemaJson)
    val survivors = slice.join(broadcast(dead), Seq(idCol), "left_anti")
    val add = VectorStore.writeSegment(survivors, indexDir,
      Seq("ingest_batch", "cell"))
    VectorStore.commit(spark, indexDir, drop, add,
      baseVersion = snap.get.version)
    ()
  }

  /** Apply ONE mixed CDC batch (upserts + deletes) to the stored
    * graph index — the [[graft.operators.DiffSync]] sync loop aimed
    * at the vector store instead of a JDBC table, completing the
    * store's CRUD symmetry: an upsert of a new id INSERTS, an upsert
    * of an existing id UPDATES (the old node leaves its cell graph,
    * the new vector search-and-link inserts — possibly into a
    * DIFFERENT cell if the vector moved across a quantizer boundary),
    * and `op = "delete"` removes. Two deterministic store passes —
    * first remove every id the batch mentions (tombstones AND
    * upserted ids), then insert the upserts over the removal's
    * overlay — land in ONE manifest commit, so a concurrent reader
    * sees the whole sync or none of it, never the removed-but-not-
    * reinserted middle. Re-applying the same batch repeats the
    * identical two steps from the same resulting state (f(f(x)) =
    * f(x)); streamed calls pass `tag` and replay skips wholesale.
    *
    * CONTRACT (the [[graft.operators.Scd2.applyCdc]] convention): at
    * most one change row per id per batch — a raw feed collapses
    * first via [[graft.operators.Scd2.collapseCdc]].
    */
  def syncGraphBatch(batch: DataFrame, idCol: String, vecCol: String,
      opCol: String, centroids: Array[Array[Double]], indexDir: String,
      degree: Int = 8, efConstruction: Int = 64,
      tag: Option[(String, Long)] = None): Unit = {
    val spark = batch.sparkSession
    val snap = VectorStore.adopt(spark, indexDir)
    if (alreadyApplied(spark, indexDir, tag)) return
    val entries0 = snap.map(_.entries).getOrElse(Seq.empty)
    val schema0 = snap.map(_.schemaJson).getOrElse("")
    val touched = batch.select(col(idCol))
    val (drop1, add1) = removeGraphPlan(touched, idCol, vecCol,
      indexDir, entries0, schema0, degree, efConstruction)
    val overlay = entries0.filterNot(drop1.toSet) ++ add1
    val ups = batch.filter(col(opCol) =!= "delete")
      .select(col(idCol), col(vecCol))
    val (drop2, add2, schema2) =
      if (ups.isEmpty) (Seq.empty[String], Seq.empty[String], schema0)
      else ingestGraphPlan(ups, idCol, vecCol, centroids, indexDir,
        overlay, schema0, degree, efConstruction,
        touchedCells(ups, idCol, vecCol, centroids))
    // a no-op sync against a NONEXISTENT store must not commit: a
    // tag-only manifest would carry empty entries and empty schema,
    // making VectorStore.read throw ("empty store with no recorded
    // schema") where a missing store reads as missing. Replay safety
    // is unaffected — re-running the same delete-only batch against
    // the still-missing store is itself a no-op. Once a store EXISTS,
    // a tagged empty sync still commits to advance the channel
    // high-water mark (cheap, and keeps replay-skip exact).
    if (drop1.isEmpty && add1.isEmpty && drop2.isEmpty && add2.isEmpty
        && (tag.isEmpty || snap.isEmpty)) return
    // one commit for the whole sync: entries = E0 − drop1 + add1 −
    // drop2 + add2. drop2 may well include add1 entries (a cell both
    // rebuilt by the remove and rewritten by the insert) — those must
    // NOT be re-added, so add1 is filtered by drop2 before the commit
    // appends it
    val drop2Set = drop2.toSet
    VectorStore.commit(spark, indexDir, drop1 ++ drop2,
      add1.filterNot(drop2Set) ++ add2, tag, schema2,
      baseVersion = snap.map(_.version).getOrElse(-1L))
    ()
  }

  /** foreachBatch writer for the CONTINUOUS CDC sync of the graph
    * index — the vector-store twin of
    * [[graft.streaming.EventStream.continuousSyncWriter]]: a stream
    * of (id, vector, op ∈ upsert/delete) rows keeps the stored index
    * current, batch by batch, through [[syncGraphBatch]]'s
    * remove-then-insert single commit. Searches see each batch as
    * soon as its manifest version publishes; replays skip on the
    * `vector_sync` channel tag.
    */
  def streamingVectorSync(stream: DataFrame, idCol: String,
      vecCol: String, opCol: String,
      centroids: Array[Array[Double]], indexDir: String,
      checkpoint: String, degree: Int = 8, efConstruction: Int = 64,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        syncGraphBatch(batch, idCol, vecCol, opCol, centroids,
          indexDir, degree, efConstruction,
          Some(("vector_sync", batchId)))
      }

  /** Compact the streamed IVF assignment store — the small-files
    * maintenance op: [[ingestBatch]] accumulates one
    * `ingest_batch=<N>/cell=<c>/` partition pair per micro-batch
    * forever, which at streaming cadence is the classic small-files
    * failure (a year of 10-second triggers is ~3M batch partitions)
    * long before 100 TB. This folds every batch below a watermark
    * into ONE canonical base segment (`ingest_batch=-1`, clustered by
    * cell — one file per cell after the repartition) and commits the
    * swap atomically, so the live entry count returns to ~nlist no
    * matter how many batches streamed in, while `ivfTopKIndexed`
    * reads the same rows through the same pruned cell scan. Folded
    * segments stay on disk for pinned readers until
    * [[VectorStore.vacuum]].
    *
    * `protectLast` batch partitions (highest ids) are left unfolded:
    * the channel tag already skips replayed batch ids, but an
    * UNTAGGED caller replaying a folded id would double its rows —
    * the default 1 keeps the only batch a restart can replay as the
    * overwrite target. Safe to run from a maintenance cadence racing
    * the ingest stream (round 15): the commit carries its plan-base
    * version, so a compaction whose folded partitions were rewritten
    * mid-flight fails the conflict check and just re-runs — like any
    * LSM compaction under optimistic concurrency.
    */
  def compactIvfStore(spark: SparkSession,
      indexDir: String, protectLast: Int = 1): Unit = {
    val snap = VectorStore.adopt(spark, indexDir)
    if (snap.isEmpty || snap.get.entries.isEmpty) return
    val entries = snap.get.entries
    val byBatch = entries.map(e => (entryBatchCell(e)._1, e))
    val batchIds = byBatch.map(_._1).distinct.sorted
    val protect = batchIds.filter(_ >= 0).takeRight(protectLast).toSet
    val fold = batchIds.filterNot(protect)
    // nothing to fold beyond an already-compacted base → no-op
    if (fold.isEmpty || fold.forall(_ < 0)) return
    val foldSet = fold.toSet
    val drop = byBatch.filter(t => foldSet(t._1)).map(_._2)
    val folded = VectorStore.readEntries(spark, indexDir, drop,
        snap.get.schemaJson)
      .withColumn("ingest_batch", lit(-1L))
      .repartition(col("cell"))
    val add = VectorStore.writeSegment(folded, indexDir,
      Seq("ingest_batch", "cell"))
    VectorStore.commit(spark, indexDir, drop, add,
      baseVersion = snap.get.version)
    ()
  }

  /** Per-cell FILE audit of a store directory (IVF batch store or
    * graph cell store) — the physical-layout half of [[cellStats]]'s
    * occupancy audit, and the signal that says WHEN to run
    * [[compactIvfStore]]: n_files growing linearly with batch count
    * while n_vecs stays flat is the small-files failure in progress.
    * Manifest-aware: counts only the LIVE entries' files (superseded
    * segments awaiting vacuum are maintenance debt, not read-path
    * cost); falls back to a raw recursive walk for legacy stores.
    * Driver-side filesystem listing — file METADATA, bounded by live
    * file count (exactly the quantity this audit exists to keep
    * small), never data.
    */
  def storeFileStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    def dataFilesIn(d: org.apache.hadoop.fs.Path, cell: Int): Unit =
      fs.listStatus(d).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith("."))
          buf += ((cell, st.getLen))
      }
    VectorStore.snapshot(spark, dir) match {
      case Some(s) =>
        s.entries.foreach { e =>
          val cell = e match {
            case BatchCellEntry(_, c) => c.toInt
            case CellEntry(c) => c.toInt
            case _ => Int.MinValue
          }
          dataFilesIn(new org.apache.hadoop.fs.Path(p, e), cell)
        }
      case None =>
        val cellRe = ".*/cell=(-?\\d+)/[^/]+$".r
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val st = it.next()
          val path = st.getPath.toString
          val name = st.getPath.getName
          if (!name.startsWith("_") && !name.startsWith(".")) {
            path match {
              case cellRe(c) => buf += ((c.toInt, st.getLen))
              case _ =>
            }
          }
        }
    }
    buf.groupBy(_._1).toSeq
      .map { case (c, xs) => (c, xs.size.toLong, xs.map(_._2).sum) }
      .sortBy(_._1)
      .toDF("cell", "n_files", "bytes")
  }

  /** Per-cell occupancy of an assignment table plus the imbalance
    * factor (cell count / mean count) — the retrain trigger signal.
    * One partial-agg'd groupBy on the compact cell id; the mean joins
    * back as a 1-row broadcast.
    */
  def cellStats(index: DataFrame, cellCol: String = "cell"): DataFrame = {
    val counts = index.groupBy(col(cellCol)).agg(count(lit(1)).as("n_vecs"))
    val mean = counts.agg(avg(col("n_vecs")).as("__mean"))
    counts.crossJoin(broadcast(mean))
      .select(col(cellCol), col("n_vecs"),
        graft.functions.TextAnalysis.q4(
          col("n_vecs").cast("double") / col("__mean")).as("imbalance"))
  }
}
