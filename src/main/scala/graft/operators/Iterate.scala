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

  /** Set the session's reliable checkpoint dir when requested; returns
    * whether cuts should be reliable. One call per operator
    * invocation (each `setCheckpointDir` call creates a fresh
    * UUID-scoped subdir — calling per ROUND would spray directories).
    */
  def configure(df: DataFrame, checkpointDir: Option[String]): Boolean = {
    checkpointDir.foreach(d =>
      df.sparkSession.sparkContext.setCheckpointDir(d))
    checkpointDir.isDefined
  }

  /** Eagerly cut `df`'s lineage — reliably when `reliable` (see class
    * doc), else executor-local.
    */
  def cut(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint() else df.localCheckpoint()
}
