package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage management for ITERATIVE operators (round 16).
  *
  * Every per-round frame of an unbounded loop must cut lineage or the
  * analyzed plan doubles per round (the standing round-8 trap). The
  * default cut is `localCheckpoint()` — eager and fast, but its
  * blocks live on EXECUTOR-LOCAL storage: on a real cluster, losing
  * one executor after round 1 makes every later round's recompute
  * impossible and fails the whole job — acceptable for short loops,
  * not for a long CC/LPA job over a 100 TB-derived edge set. Passing
  * a `checkpointDir` switches every cut to a RELIABLE
  * `checkpoint()` against that directory (HDFS/object store): each
  * round's frame is then re-readable by any executor, so task
  * retries and executor loss recover instead of failing the job —
  * at the cost of one distributed write of the (node-sized) frame
  * per round, measured in the ScaleSmoke `ckpt` mode.
  *
  * Ownership: Spark does not delete reliable checkpoint files
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` is off by
  * default) — point `checkpointDir` at a job-scoped location and
  * reclaim it when the job's outputs are durable, exactly like any
  * scratch dir.
  *
  * SESSION-GLOBAL constraint (Spark's model, not ours): a
  * SparkContext has ONE reliable checkpoint dir —
  * `setCheckpointDir` is last-writer-wins, and `RDD.checkpoint`
  * always writes under the context's current dir. Two CONCURRENT
  * iterative operators on one session passing DIFFERENT dirs will
  * interleave their round files under whichever dir was set last;
  * safe, but cleanup then must wait for both. The rule: concurrent
  * operators on one session share one checkpoint dir, and the dir is
  * reclaimed only after every operator using it has quiesced — the
  * same discipline GraphX/GraphFrames checkpointing requires.
  */
private[graft] object Iterate {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Set the session's reliable checkpoint dir when requested; returns
    * whether cuts should be reliable. One call per operator
    * invocation (each `setCheckpointDir` call creates a fresh
    * UUID-scoped subdir — calling per ROUND would spray directories).
    *
    * OBSERVABLE HANDOFF (round 17): when this call REDIRECTS a
    * session whose checkpoint dir already pointed somewhere else, the
    * last-writer-wins takeover is logged — the documented shared-dir
    * rule (class doc) was otherwise invisible at runtime, and an
    * operator silently stealing the dir from a concurrent one is
    * exactly the surprise the rule warns about.
    */
  def configure(df: DataFrame, checkpointDir: Option[String]): Boolean = {
    checkpointDir.foreach(
      setCheckpointDirWithTakeoverWarn(df.sparkSession.sparkContext, _))
    checkpointDir.isDefined
  }

  /** The warn-then-set shared by [[configure]] and
    * [[withJobScopedCheckpointDir]] (round 18 — the helper previously
    * called `setCheckpointDir` directly, so the one redirect path the
    * observability was added for stayed invisible when entered via the
    * helper).
    */
  /** Test-observable count of takeover warnings (the spill-counter
    * pattern: specs assert the warn path RAN, not log output).
    */
  private[graft] val takeoverWarns =
    new java.util.concurrent.atomic.AtomicLong(0)

  private def setCheckpointDirWithTakeoverWarn(
      sc: org.apache.spark.SparkContext, d: String): Unit = {
    // getCheckpointDir returns the FULLY-QUALIFIED UUID-scoped SUBDIR
    // a previous setCheckpointDir(root) created (file:/… — Spark
    // stores fs.getFileStatus(...).getPath), so the root must be
    // qualified through the same FileSystem before comparing — a bare
    // /tmp/ck root never prefix-matches file:/tmp/ck/<uuid> and every
    // same-root re-configure would false-positively warn.
    val root = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(sc.hadoopConfiguration).makeQualified(p)
        .toString.stripSuffix("/")
    }
    // same root ⇒ child path. The comparison is component-bounded
    // (== or root + "/"): a raw startsWith would treat a previous dir
    // /tmp/ck2/<uuid> as "same root" as /tmp/ck and silently suppress
    // the takeover warning.
    sc.getCheckpointDir.map(_.stripSuffix("/"))
      .filterNot(p => p == root || p.startsWith(root + "/"))
      .foreach { prev =>
        takeoverWarns.incrementAndGet()
        log.warn(s"Iterate: session checkpoint dir moves $prev -> " +
          s"$root (setCheckpointDir is last-writer-wins and " +
          "session-global; a concurrent iterative operator that set " +
          "the previous dir will write its remaining rounds under " +
          "the new one — reclaim either dir only after every " +
          "operator using it has quiesced, or scope the job with " +
          "Iterate.withJobScopedCheckpointDir)")
      }
    sc.setCheckpointDir(d)
  }

  /** Live-user refcount per scratch dir (driver-JVM-local — which is
    * exactly where Spark's one-checkpoint-dir-per-context constraint
    * lives).
    */
  private val users = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]

  /** Job-scoped reliable-checkpoint scratch (round 17 — closing the
    * documented-but-manual ownership rule): enters `dir` as the
    * session's checkpoint dir for the duration of `body` and reclaims
    * it (recursive delete) only when the LAST concurrent user leaves.
    * Spark never deletes reliable checkpoint files itself
    * (`spark.cleaner.referenceTracking.cleanCheckpoints` is off by
    * default), so without this every `checkpointDir` caller had to
    * hand-roll "delete after ALL iterative ops quiesced".
    *
    * Concurrent operators SHARING one dir refcount it — each body
    * completes with its round files intact, and the delete happens
    * after the last one returns. Point `dir` at a scratch location
    * THIS JOB owns (never a shared parent: reclamation deletes the
    * whole dir). Coordination is per driver JVM; two drivers must not
    * share a scratch dir (they never can safely — the session-global
    * constraint is per context anyway).
    */
  def withJobScopedCheckpointDir[T](spark: org.apache.spark.sql.SparkSession,
      dir: String)(body: => T): T = {
    // Enter and exit each run inside `users.compute(dir, …)` — the
    // ConcurrentHashMap serializes computes PER KEY, which closes the
    // round-17 TOCTOU: with a bare decrementAndGet()==0 followed by
    // the delete, a joiner could computeIfAbsent+increment between
    // the last leaver's decrement and its recursive delete and start
    // checkpointing into a dir that is then deleted under it —
    // exactly the premature reclaim this API promises to prevent.
    // Now a joiner racing the last leaver either lands BEFORE the
    // exit-compute (count 1→2, no reclaim — the dir survives for the
    // joiner, whose own exit reclaims) or blocks on the key until the
    // delete finishes and enters a fresh scope (setCheckpointDir
    // recreates the dir). Holding the bin lock across the recursive
    // delete is deliberate: blocking a same-dir joiner for the
    // delete's duration IS the correct semantics, and scratch dirs
    // are few (one per job), so the lock is uncontended otherwise.
    users.compute(dir, (_, n) =>
      if (n == null) new java.util.concurrent.atomic.AtomicInteger(1)
      else { n.incrementAndGet(); n })
    try {
      setCheckpointDirWithTakeoverWarn(spark.sparkContext, dir)
      body
    } finally {
      users.compute(dir, (_, n) =>
        if (n == null) null // impossible: only this exit removes entries
        else if (n.decrementAndGet() > 0) n
        else {
          // last leaver: reclaim while still holding the key's compute.
          // If the delete throws, the entry stays at 0 (compute aborts)
          // and the NEXT scope on this dir retries the reclaim at its
          // own exit — loud, not leaked-forever.
          val p = new org.apache.hadoop.fs.Path(dir)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          null // removes the entry
        })
      ()
    }
  }

  /** Eagerly cut `df`'s lineage — reliably when `reliable` (see class
    * doc), else executor-local.
    */
  def cut(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint() else df.localCheckpoint()
}
