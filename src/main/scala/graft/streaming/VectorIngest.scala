package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.functions.Similarity

/** Streaming ANN index maintenance — the continuous twin of
  * [[graft.functions.Similarity.ivfAssignments]]'s batch append path:
  * arriving vectors assign against the FROZEN quantizer (map-only per
  * micro-batch; the codegen'd NearestCell argmin) and append to the
  * stored assignment table. History never recomputes; searches via
  * `ivfTopKIndexed` over the store see each batch as soon as its
  * files commit.
  *
  * Retraining is deliberately out of band: the quantizer is immutable
  * here (the standard IVF contract — reassigning history is a batch
  * rebuild), so the ingest job stays stateless. [[cellStats]] is the
  * drift monitor that tells you WHEN to rebuild: cell-count imbalance
  * growing past the build-time profile means the data distribution
  * moved away from the centroids.
  */
object VectorIngest {

  /** One micro-batch's idempotent write: assignments land under
    * `ingest_batch=<batchId>/cell=<cell>/` via DYNAMIC partition
    * overwrite, so a replayed batch (foreachBatch is at-least-once —
    * after a failure/restart the last uncommitted batch re-runs)
    * REPLACES its own partitions instead of appending duplicate rows.
    * Without this, a duplicated vec_id would occupy multiple top-k
    * slots in `ivfTopKIndexed` (row_number over (cos, id)) and
    * displace legitimate neighbors. Only the replayed batch's
    * partitions are touched — history partitions are never rewritten.
    */
  def ingestBatch(batch: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], indexDir: String,
      batchId: Long): Unit =
    Similarity.ivfAssignments(batch, idCol, vecCol, centroids)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "cell").parquet(indexDir)

  /** foreachBatch writer: assign each micro-batch against `centroids`
    * and write to the parquet assignment table at `indexDir`,
    * partitioned by (ingest_batch, cell) so `ivfTopKIndexed` probes
    * become pruned scans of nprobe/nlist of the files and batch
    * replays stay idempotent (see [[ingestBatch]]).
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

  /** One micro-batch into the STORED GRAPH index
    * ([[graft.functions.Similarity.graphAnnBuild]]'s table at
    * `indexDir`, partitioned by cell): only the cells the batch's
    * points land in are READ (partition-pruned scan), appended via
    * the NSW search-and-link insertion
    * ([[graft.functions.Similarity.graphAnnAppend]]) and REWRITTEN
    * through dynamic partition overwrite — untouched cells' files
    * never move. Idempotent under foreachBatch's at-least-once
    * replay twice over: a replayed batch rewrites its own cell
    * partitions, and graphAnnAppend skips delta ids already present
    * in a cell. A missing/empty `indexDir` bootstraps: appending into
    * nothing IS the fresh cell build. Bootstrap is decided by an
    * EXPLICIT filesystem existence check, never by catching analysis
    * errors — a schema drift or wrong column name must FAIL the
    * batch, not silently start an empty store and dynamic-overwrite
    * (= drop) the touched cells' existing members.
    */
  def ingestGraphBatch(batch: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], indexDir: String,
      degree: Int = 8, efConstruction: Int = 64): Unit = {
    val spark = batch.sparkSession
    val touched = Similarity.ivfAssignments(
        batch.select(col(idCol),
          transform(col(vecCol), x => x.cast("double")).as(vecCol)),
        idCol, vecCol, centroids)
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0)) // ≤ nlist values — driver-bounded
    val stored =
      if (storeHasData(spark, indexDir))
        spark.read.parquet(indexDir)
          .filter(col("cell").isin(touched.map(Integer.valueOf): _*))
          .select(col("cell"), col(idCol), col(vecCol), col("neighbors"))
      else {
        import spark.implicits._
        Seq.empty[(Int, Long, Seq[Double], Seq[Long])]
          .toDF("cell", idCol, vecCol, "neighbors")
      }
    // Eagerly materialize BEFORE the write: this job reads indexDir
    // and dynamic-overwrites the same path. Without the checkpoint
    // that is safe only because partitionOverwriteMode=dynamic stages
    // files until commit (and the typed-cogroup boundary hides the
    // source relation from Spark's verifyNotReadPath self-overwrite
    // check) — a refactor to static overwrite, or a Spark upgrade
    // that tightens the check through typed plans, would delete the
    // partitions before reading them. localCheckpoint severs the
    // lineage so the write job never touches the source files.
    Similarity.graphAnnAppend(stored, batch, idCol, vecCol, centroids,
        degree, efConstruction)
      .localCheckpoint(true)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(indexDir)
  }

  /** True iff `dir` exists and holds at least one non-hidden entry —
    * the explicit store-presence probe [[ingestGraphBatch]] uses to
    * decide bootstrap vs read. An empty directory (e.g. pre-created
    * by an orchestrator) counts as "no store yet".
    */
  private[streaming] def storeHasData(
      spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Apply DELETE tombstones to the stored graph index at `indexDir`
    * — [[ingestGraphBatch]] in reverse, completing the store's CDC
    * lifecycle (create/insert/delete). Only the cells containing a
    * tombstoned id are read and rewritten
    * ([[graft.functions.Similarity.graphAnnRemove]] rebuilds each
    * over its survivors in id order, so the store stays byte-equal to
    * a fresh build of the survivors); untouched cells' files never
    * move. A touched cell whose members ALL die produces no output
    * rows — dynamic partition overwrite would leave its stale files
    * in place, so those cell directories are deleted explicitly
    * after the write. Idempotent: replaying the same tombstone batch
    * finds no matching ids, touches no cells, and returns without
    * writing.
    */
  def removeGraphBatch(tombstones: DataFrame, idCol: String,
      vecCol: String, indexDir: String, degree: Int = 8,
      efConstruction: Int = 64): Unit = {
    val spark = tombstones.sparkSession
    if (!storeHasData(spark, indexDir)) return
    val store = spark.read.parquet(indexDir)
    val dead = tombstones.select(col(idCol).cast("long").as(idCol))
      .distinct()
    val touched = store
      .select(col("cell"), col(idCol).cast("long").as(idCol))
      .join(broadcast(dead), Seq(idCol), "left_semi")
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0)) // ≤ nlist values — driver-bounded
    if (touched.isEmpty) return
    val slice = store
      .filter(col("cell").isin(touched.map(Integer.valueOf): _*))
      .select(col("cell"), col(idCol), col(vecCol), col("neighbors"))
    // localCheckpoint for the same reason as ingestGraphBatch: this
    // job reads indexDir and dynamic-overwrites the same path.
    val rebuilt = graft.functions.Similarity
      .graphAnnRemove(slice, dead, idCol, vecCol, degree, efConstruction)
      .localCheckpoint(true)
    rebuilt.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(indexDir)
    val survived = rebuilt.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSet
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(survived).foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(p, s"cell=$c"), true)
      ()
    }
  }

  /** foreachBatch writer for continuous GRAPH-index maintenance — the
    * graph twin of [[streamingIvfIngest]]: searches via
    * `graphAnnTopKIndexed` over the store see each batch as soon as
    * its cell partitions commit. The quantizer stays frozen (the IVF
    * contract); [[cellStats]] over the graph table is the same
    * retrain signal.
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestGraphBatch(batch, idCol, vecCol, centroids, indexDir,
          degree, efConstruction)
      }

  /** Apply DELETE tombstones to the stored IVF assignment table at
    * `indexDir` — the flat-store twin of [[removeGraphBatch]],
    * completing the IVF store's lifecycle next to [[ingestBatch]] and
    * [[compactIvfStore]]. Only the (ingest_batch, cell) partitions
    * that actually CONTAIN a tombstoned id are rewritten (an IVF
    * posting row is self-contained, so a rewrite is just the
    * partition's survivors — no graph relink); partitions whose
    * members all die are deleted explicitly, since dynamic overwrite
    * cannot remove a partition with no output rows. Replaying the
    * same tombstone batch finds no matching ids and returns without
    * writing.
    */
  def removeIvfBatch(tombstones: DataFrame, idCol: String,
      indexDir: String): Unit = {
    val spark = tombstones.sparkSession
    if (!storeHasData(spark, indexDir)) return
    val store = spark.read.parquet(indexDir)
    val dead = tombstones
      .select(col(idCol).cast(store.schema(idCol).dataType).as(idCol))
      .distinct()
    val touched = store
      .join(broadcast(dead), Seq(idCol), "left_semi")
      .select(col("ingest_batch").cast("long").as("b"), col("cell"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    if (touched.isEmpty) return
    val touchedSet = touched.toSet
    // rewrite only the touched partitions' survivors. Two-stage
    // selection: isin on the batch ids and cell ids separately (both
    // convert to InSet and PRUNE the partitioned scan — an OR-chain
    // of pair conjunctions would neither convert nor prune, and its
    // plan text grows with the tombstone footprint), then a broadcast
    // semi-join on the exact (batch, cell) pairs trims the isin
    // cross-product back to the truly touched partitions so no
    // untouched partition gets churned by an identical rewrite.
    val spark2 = tombstones.sparkSession
    import spark2.implicits._
    val pairs = broadcast(touched.toSeq.toDF("__tb", "__tc"))
    val slice = store
      .filter(col("ingest_batch").cast("long")
          .isin(touched.map(t => java.lang.Long.valueOf(t._1)): _*) &&
        col("cell").isin(touched.map(t => Integer.valueOf(t._2)): _*))
      .join(pairs, col("ingest_batch").cast("long") === col("__tb") &&
        col("cell") === col("__tc"), "left_semi")
    val survivors = slice.join(broadcast(dead), Seq(idCol), "left_anti")
      .localCheckpoint(true) // read+overwrite same path — pin first
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "cell").parquet(indexDir)
    val kept = survivors
      .select(col("ingest_batch").cast("long"), col("cell"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val emptied = touchedSet.diff(kept)
    emptied.foreach { case (b, c) =>
      fs.delete(
        new org.apache.hadoop.fs.Path(p, s"ingest_batch=$b/cell=$c"),
        true)
      ()
    }
    // a batch whose every cell dir went away leaves an empty parent
    // dir behind — remove it too (an empty partition dir is harmless
    // to parquet reads but reads as a live batch to any listing)
    emptied.map(_._1).foreach { b =>
      val bp = new org.apache.hadoop.fs.Path(p, s"ingest_batch=$b")
      if (fs.exists(bp) && !fs.listStatus(bp).exists { st =>
            val n = st.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          }) { fs.delete(bp, true); () }
    }
  }

  /** Apply ONE mixed CDC batch (upserts + deletes) to the stored
    * graph index — the [[graft.operators.DiffSync]] sync loop aimed
    * at the vector store instead of a JDBC table, completing the
    * store's CRUD symmetry: an upsert of a new id INSERTS, an upsert
    * of an existing id UPDATES (the old node leaves its cell graph,
    * the new vector search-and-link inserts — possibly into a
    * DIFFERENT cell if the vector moved across a quantizer boundary),
    * and `op = "delete"` removes. Two deterministic store passes:
    * first remove every id the batch mentions (tombstones AND
    * upserted ids — [[removeGraphBatch]]'s touched-cell rebuild),
    * then insert the upserts ([[ingestGraphBatch]]). Re-applying the
    * same batch repeats the identical two steps from the same
    * resulting state, so replay is idempotent in the strong sense
    * f(f(x)) = f(x).
    *
    * CONTRACT (the [[graft.operators.Scd2.applyCdc]] convention): at
    * most one change row per id per batch — a raw feed collapses
    * first via [[graft.operators.Scd2.collapseCdc]].
    */
  def syncGraphBatch(batch: DataFrame, idCol: String, vecCol: String,
      opCol: String, centroids: Array[Array[Double]], indexDir: String,
      degree: Int = 8, efConstruction: Int = 64): Unit = {
    val touched = batch.select(col(idCol))
    removeGraphBatch(touched, idCol, vecCol, indexDir, degree,
      efConstruction)
    val ups = batch.filter(col(opCol) =!= "delete")
      .select(col(idCol), col(vecCol))
    if (!ups.isEmpty)
      ingestGraphBatch(ups, idCol, vecCol, centroids, indexDir,
        degree, efConstruction)
  }

  /** foreachBatch writer for the CONTINUOUS CDC sync of the graph
    * index — the vector-store twin of
    * [[graft.streaming.EventStream.continuousSyncWriter]]: a stream
    * of (id, vector, op ∈ upsert/delete) rows keeps the stored index
    * current, batch by batch, through [[syncGraphBatch]]'s
    * remove-then-insert. Searches via `graphAnnTopKIndexed` see each
    * batch as soon as its cell partitions commit.
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        syncGraphBatch(batch, idCol, vecCol, opCol, centroids,
          indexDir, degree, efConstruction)
      }

  /** Compact the streamed IVF assignment store — the small-files
    * maintenance op: [[ingestBatch]] accumulates one
    * `ingest_batch=<N>/cell=<c>/` partition pair per micro-batch
    * forever, which at streaming cadence is the classic small-files
    * failure (a year of 10-second triggers is ~3M batch partitions)
    * long before 100 TB. This folds every batch below a watermark
    * into ONE canonical base segment `ingest_batch=-1/cell=<c>/`,
    * clustered by cell (one file per cell after the repartition), and
    * deletes the folded batch directories — so file count returns to
    * ~nlist no matter how many batches streamed in, while
    * `ivfTopKIndexed` reads the same rows through the same pruned
    * cell scan.
    *
    * `protectLast` batch partitions (highest ids) are left in place:
    * foreachBatch is at-least-once, and a replayed batch id that was
    * already folded into the base would re-create its partition with
    * duplicate rows — replay idempotence relies on the batch's OWN
    * partition being the overwrite target. The default 1 protects the
    * only batch a restart can replay; pass 0 when the stream is
    * stopped (offline compaction). Not concurrency-safe with a live
    * ingest writing the same batch ids it folds — run it from the
    * maintenance cadence between triggers, like any LSM compaction.
    */
  def compactIvfStore(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, protectLast: Int = 1): Unit = {
    if (!storeHasData(spark, indexDir)) return
    val raw = spark.read.parquet(indexDir)
    val batchIds = raw.select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val protect = batchIds.filter(_ >= 0).takeRight(protectLast).toSet
    val fold = batchIds.filterNot(protect)
    // nothing to fold beyond an already-compacted base → no-op
    if (fold.isEmpty || fold.forall(_ < 0)) return
    // protect holds the HIGHEST batch ids, so "fold" is exactly
    // everything at or below its own max — one range predicate, no
    // giant IN list over thousands of batch ids
    val watermark = fold.max
    // localCheckpoint: reads indexDir (the -1 base partitions) and
    // dynamic-overwrites the same path — same hazard as
    // ingestGraphBatch, same lineage cut before the write
    val folded = raw.filter(col("ingest_batch").cast("long") <= watermark)
      .withColumn("ingest_batch", lit(-1L))
      .repartition(col("cell"))
      .localCheckpoint(true)
    folded.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "cell").parquet(indexDir)
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fold.filter(_ >= 0).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(p, s"ingest_batch=$b"),
        true)
      ()
    }
  }

  /** Per-cell FILE audit of a store directory (IVF batch store or
    * graph cell store) — the physical-layout half of [[cellStats]]'s
    * occupancy audit, and the signal that says WHEN to run
    * [[compactIvfStore]]: n_files growing linearly with batch count
    * while n_vecs stays flat is the small-files failure in progress.
    * Driver-side filesystem listing — file METADATA, bounded by file
    * count (exactly the quantity this audit exists to keep small),
    * never data.
    */
  def storeFileStats(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellRe = ".*/cell=(-?\\d+)/[^/]+$".r
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
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
