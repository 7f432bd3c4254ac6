package graft.streaming

import org.apache.spark.sql.SparkSession

/** Bounded-memory (ts, id)-ordered iteration over ONE key's
  * micro-batch — round 17, retiring the round-16 "stated contract".
  *
  * The ORDER-REQUIRING keyed streaming ops (transitions, path-ngrams,
  * sequence patterns) must process a key's events in the batch twin's
  * window order, but `flatMapGroupsWithState` hands them an
  * ARBITRARY-ORDER, SINGLE-PASS iterator — within-group order does not
  * survive the shuffle, so a chunked in-order fold without a sort is
  * impossible (there is no second pass to fetch an earlier-timestamped
  * row that arrives late in the iterator). Round 16 therefore sorted
  * the whole batch in task memory and STATED the O(key's batch) bound
  * as a contract ("size the trigger"). This object removes the cliff
  * instead: batches up to `chunkRows` take the exact same in-memory
  * array sort as before (zero overhead — every driver gate and every
  * sanely sized trigger lands here); larger batches spill sorted runs
  * of `chunkRows` to executor-local disk and merge-iterate them with a
  * k-way heap — the same sorted-run/merge shape Spark's own
  * ExternalSorter uses, giving O(chunkRows) task memory however many
  * rows one hot key receives in one trigger. Output order is
  * bit-identical to the full in-memory sort (the (ts_us, event_id)
  * keys are unique, so run boundaries cannot reorder ties).
  *
  * Run files land under SPARK'S CONFIGURED LOCAL DIRS (round 18 —
  * previously `java.io.tmpdir`): on YARN those are the container
  * dirs, on k8s/standalone the volumes `spark.local.dir` points at —
  * the disks Spark actually sizes for shuffle spill. `java.io.tmpdir`
  * is only the fallback when no Spark env/conf is present (driver-side
  * unit tests): on k8s it is typically a small root-volume `/tmp`,
  * and a pathological hot key spilling there could fill the root disk
  * instead of the spill disks. Each run file is deleted the moment
  * its stream exhausts, with a task-completion listener as the abort
  * backstop.
  */
private[graft] object BatchSorter {

  /** Resolve the spill directories the way Spark's own
    * Utils.getConfiguredLocalDirs does for the non-YARN case (that
    * method is private[spark]): container LOCAL_DIRS when running
    * under YARN, else SPARK_LOCAL_DIRS, else `spark.local.dir` from
    * the live SparkEnv's conf, else `java.io.tmpdir`. Multiple dirs
    * round-robin per run file so one hot key's runs spread across the
    * spill disks like shuffle blocks do.
    */
  private[streaming] def resolveSpillDirs(env: String => Option[String],
      confLocalDir: => Option[String], tmpDir: String): Array[String] = {
    val raw =
      (if (env("CONTAINER_ID").isDefined) env("LOCAL_DIRS") else None)
        .orElse(env("SPARK_LOCAL_DIRS"))
        .orElse(confLocalDir)
        .getOrElse(tmpDir)
    val dirs = raw.split(",").map(_.trim).filter(_.nonEmpty)
    if (dirs.isEmpty) Array(tmpDir) else dirs
  }

  /** Test seam: the real resolution reads process-global state (env
    * vars, the shared SparkEnv conf) that a test suite running in a
    * shared JVM can neither control nor mutate safely (round-18
    * verdict: the spill-locality test failed on hosts with
    * SPARK_LOCAL_DIRS set and raced sibling suites via the shared
    * conf). Tests set this instead; production never touches it.
    */
  @volatile private[streaming] var spillDirsOverride: Option[Array[String]] =
    None

  private[streaming] def spillDirs(): Array[String] =
    spillDirsOverride.getOrElse(resolveSpillDirs(
      sys.env.get,
      Option(org.apache.spark.SparkEnv.get)
        .flatMap(e => e.conf.getOption("spark.local.dir")),
      System.getProperty("java.io.tmpdir")))

  private val runFileSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private def newRunFile(): java.io.File = {
    val dirs = spillDirs()
    val pick = (runFileSeq.getAndIncrement() % dirs.length).toInt
    val d = new java.io.File(dirs(pick), "graft_keysort")
    d.mkdirs()
    java.io.File.createTempFile("graft_keysort_", ".run", d)
  }

  /** In-memory threshold AND spill-run size, in rows. 2²¹ rows of
    * event tuples is tens of MB of task memory — comfortably inside
    * an executor core's share while large enough that spilling is
    * reserved for genuinely pathological hot keys.
    */
  val DefaultChunkRows: Int = 1 << 21

  /** Session conf key overriding [[DefaultChunkRows]] — read ONCE at
    * operator construction (driver side) and captured in the executor
    * closure, like every other per-op parameter.
    */
  val ChunkRowsConf = "graft.stream.sortChunkRows"

  def chunkRows(spark: SparkSession): Int = {
    val v = spark.conf.getOption(ChunkRowsConf)
      .map(_.toInt).getOrElse(DefaultChunkRows)
    require(v > 0, s"$ChunkRowsConf must be positive, got $v")
    v
  }

  /** Test-observable count of sorts that took the spill path (the
    * hot-key spec asserts the capped-memory path actually ran rather
    * than passing through the in-memory fast path vacuously).
    */
  val spillSorts = new java.util.concurrent.atomic.AtomicLong(0)

  /** Sort `rows` by `ord` in O(min(n, chunk)) task memory. `onRow`
    * observes every row exactly once during ingestion — TTL operators
    * fold their max-event-time (and transitions its final state)
    * there, so no second pass over the data is ever needed.
    */
  def sorted[T <: AnyRef](rows: Iterator[T], chunk: Int,
      onRow: T => Unit,
      write: (java.io.DataOutputStream, T) => Unit,
      read: java.io.DataInputStream => T)(
      implicit ord: Ordering[T],
      ct: scala.reflect.ClassTag[T]): Iterator[T] = {
    val cmp = ord.asInstanceOf[java.util.Comparator[AnyRef]]
    // the buffer GROWS geometrically toward `chunk` instead of being
    // allocated at full chunk size upfront: this function runs once
    // per KEY GROUP per micro-batch, and a 2²¹-slot array per 3-row
    // group is ~16 MB of allocation churn per key — at 20k keys/batch
    // that alone throttled the churn sweep to GC (caught live, round
    // 17). Small groups now cost O(group); only a group that actually
    // fills the chunk pays the full allocation.
    var buf = ct.newArray(math.min(chunk, 64))
    var m = 0
    while (m < chunk && rows.hasNext) {
      if (m == buf.length) {
        val nb = ct.newArray(math.min(chunk.toLong, buf.length * 2L).toInt)
        System.arraycopy(buf, 0, nb, 0, m)
        buf = nb
      }
      val r = rows.next(); onRow(r); buf(m) = r; m += 1
    }
    if (!rows.hasNext) { // fits: the round-16 in-place array sort
      java.util.Arrays.sort(buf.asInstanceOf[Array[AnyRef]], 0, m, cmp)
      return buf.iterator.take(m)
    }

    spillSorts.incrementAndGet()
    val files = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
    // abort backstop registered BEFORE the first spill (the listener
    // holds the buffer by reference, so later-added runs are covered):
    // a task dying mid-spill or mid-merge must not leak run files
    // until JVM exit
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => files.foreach(_.delete())))
    def spillRun(len: Int): Unit = {
      java.util.Arrays.sort(buf.asInstanceOf[Array[AnyRef]], 0, len, cmp)
      val f = newRunFile()
      files += f
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 16))
      try {
        out.writeInt(len)
        var i = 0
        while (i < len) { write(out, buf(i)); i += 1 }
      } finally out.close()
    }
    spillRun(m)
    while (rows.hasNext) {
      m = 0
      while (m < chunk && rows.hasNext) {
        val r = rows.next(); onRow(r); buf(m) = r; m += 1
      }
      if (m > 0) spillRun(m)
    }
    final class Run(f: java.io.File) {
      private val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(
          new java.io.FileInputStream(f), 1 << 16))
      private var remaining = in.readInt()
      var head: T = _
      def advance(): Boolean =
        if (remaining <= 0) { in.close(); f.delete(); false }
        else { head = read(in); remaining -= 1; true }
    }
    val heap = new scala.collection.mutable.PriorityQueue[Run]()(
      Ordering.by[Run, T](_.head)(ord).reverse)
    files.foreach { f =>
      val r = new Run(f)
      if (r.advance()) heap.enqueue(r)
    }
    new Iterator[T] {
      def hasNext: Boolean = heap.nonEmpty
      def next(): T = {
        val r = heap.dequeue()
        val out = r.head
        if (r.advance()) heap.enqueue(r)
        out
      }
    }
  }
}
