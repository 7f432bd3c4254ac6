package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** The single primitive [[VectorStore]]'s optimistic-concurrency
  * protocol rests on: publish a finished temp file under its final
  * versioned name IFF that name does not exist yet, atomically, with
  * a truthful win/lose answer. Everything else in the store — commit
  * rebasing, conflict detection, sharded checkpoints, vacuum — is
  * correct only if two racing publishes of one `v<n>.json` see
  * exactly one `true`.
  *
  * Why a trait (round 16, the Delta-LogStore move): no single
  * filesystem call is a no-overwrite atomic publish everywhere.
  * POSIX `rename(2)` silently clobbers an existing target;
  * `link(2)` is atomic and fails `EEXIST` — so `file:` stores get
  * [[CommitGuard.PosixLink]]. HDFS-class stores make non-overwrite
  * `rename` atomic at the NameNode — [[CommitGuard.AtomicRename]].
  * Object stores split (round 17): ADLS Gen2 (`abfs`/`abfss`) has an
  * atomic contract-refusing rename and rides [[AtomicRename]]; GCS
  * (`gs`) commits a no-overwrite create atomically at close and rides
  * [[CommitGuard.AtomicCreate]] in-tree. Where neither holds (plain
  * `s3a` before Hadoop 3.4.1 conditional writes), the only
  * correct publish is a conditional put (`If-None-Match: *`) or an
  * external coordinator (the DynamoDB LogStore pattern) — which
  * cannot be written here without the store's SDK, so there is
  * deliberately NO default. An unregistered scheme REFUSES to commit
  * loudly
  * ([[CommitGuard.forScheme]]) instead of degrading to
  * check-then-rename, which passes every test and then silently
  * loses racing commits in production — the one failure mode the
  * engine's die-on-error discipline (the reference dies on all error
  * conditions rather than continue wrong — sqlserver2pgsql.pl:7–8)
  * exists to prevent. CommitGuardSpec proves the degradation is
  * real: a filesystem whose rename clobbers loses an update under
  * the legacy check-then-rename, and the same race through a
  * conditional-put-shaped guard serializes.
  *
  * Deployments register their store's guard once at boot:
  * {{{ CommitGuard.register("s3a", MyConditionalPutGuard) }}}
  */
trait CommitGuard {

  /** Publish `tmp` (a finished, closed file) as `target` iff `target`
    * does not exist. Returns true when this writer won the name;
    * false when the target already existed (another writer won).
    *
    * Contract:
    *  - ATOMIC: concurrent publishes of one target see exactly one
    *    `true`; a reader listing the directory sees the old state or
    *    the complete new file, never a torn write.
    *  - NO OVERWRITE, EVER: an existing target must never be
    *    replaced, even by identical content.
    *  - `tmp` may remain on disk after either outcome; the caller
    *    ([[VectorStore]]) removes it.
    */
  def publish(fs: FileSystem, tmp: Path, target: Path): Boolean
}

object CommitGuard {

  /** `file:` — POSIX `link(2)`: atomic, fails `EEXIST`, no
    * check-then-act window. Plain rename is NOT safe here (rename(2)
    * silently clobbers), which is why this exists.
    */
  object PosixLink extends CommitGuard {
    def publish(fs: FileSystem, tmp: Path, target: Path): Boolean =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
  }

  /** HDFS-class stores: `FileSystem.rename` is atomic at the
    * NameNode and refuses an existing destination, so the rename
    * itself is the decider — the `exists` probe is only a fast path
    * that skips the RPC when the race is already lost.
    */
  object AtomicRename extends CommitGuard {
    def publish(fs: FileSystem, tmp: Path, target: Path): Boolean =
      !fs.exists(target) && fs.rename(tmp, target)
  }

  /** Object stores whose no-overwrite CREATE commits ATOMICALLY AT
    * CLOSE (round 17 — turns the round-16 "refuses" into "works"
    * where no SDK code is needed): publish =
    * `fs.create(target, overwrite = false)` + stream `tmp`'s bytes +
    * `close()`. The object becomes visible only when the close-time
    * conditional upload succeeds, so a loser learns it lost at create
    * (the connector's upfront existence check) or at close (the
    * store's precondition), and a reader NEVER sees a torn manifest —
    * the same guarantee the rename-based guards give.
    *
    *  - `gs` (GCS connector, registered by default): the upload
    *    commits at `close()` with an if-generation-match=0
    *    precondition — the Delta GCSLogStore publish. A tight race
    *    that slips past the upfront existence check surfaces at close
    *    as the store's 412-precondition IOException, which this guard
    *    cannot name without the SDK — it propagates LOUDLY (the
    *    commit aborts; nothing is lost silently and a retry rebases)
    *    rather than mapping every IOException ambiguously to "lost".
    *  - `s3a`: NOT registered by default — plain S3 create is
    *    check-then-PUT and a PUT overwrites. On Hadoop 3.4.1+ against
    *    a store with conditional writes, enable
    *    `fs.s3a.create.conditional.enabled` (close becomes a PUT with
    *    `If-None-Match: *` — again close-decided, never torn) and opt
    *    in at boot:
    *    {{{ CommitGuard.register("s3a", CommitGuard.AtomicCreate) }}}
    *  - `abfs`/`abfss` deliberately do NOT ride this guard: an ADLS
    *    Gen2 blob is VISIBLE from create with appends flushing at
    *    close, so a create-decided publish would expose racing head
    *    readers to truncated manifests (the end-to-end race spec
    *    catches exactly that). ADLS Gen2's hierarchical namespace
    *    makes `rename` atomic and contract-refusing on an existing
    *    destination — the Delta AzureLogStore position — so those
    *    schemes ride [[AtomicRename]] instead.
    *
    * Any non-already-exists failure after the create propagates LOUDLY
    * and deliberately does NOT delete the target: on a close-decided
    * store a visible target can only be a racing WINNER's manifest,
    * and destroying a committed version is the one unrecoverable move.
    * On every failure path the open upload is RELEASED via
    * `abort()` where the stream supports it (round-18 ADVICE: an
    * s3a conditional-create stream left neither closed nor aborted is
    * an orphaned multipart upload that accrues cost). `close()` is
    * deliberately NOT the fallback: on a close-decided store closing
    * after a failed copy would PUBLISH a torn or empty manifest — a
    * non-abortable stream is left unclosed instead (the store expires
    * the upload session; a torn manifest would be forever).
    */
  object AtomicCreate extends CommitGuard {
    private def abortQuietly(
        out: org.apache.hadoop.fs.FSDataOutputStream): Unit =
      try { out.abort(); () }
      catch { case scala.util.control.NonFatal(_) => () }
    def publish(fs: FileSystem, tmp: Path, target: Path): Boolean = {
      val out =
        try fs.create(target, false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            return false
          case _: java.nio.file.FileAlreadyExistsException => return false
        }
      try {
        val in = fs.open(tmp)
        try {
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        out.close()
        true
      } catch {
        // close-decided stores (gs): losing the race surfaces here.
        // abort after a failed close is an idempotent no-op, so the
        // unconditional release is safe on both failure shapes
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          abortQuietly(out); false
        case _: java.nio.file.FileAlreadyExistsException =>
          abortQuietly(out); false
        case t: Throwable =>
          abortQuietly(out); throw t
      }
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitGuard]()
  registry.put("file", PosixLink)
  registry.put("hdfs", AtomicRename)
  registry.put("viewfs", AtomicRename)
  registry.put("webhdfs", AtomicRename)
  // ADLS Gen2: hierarchical-namespace rename is atomic and refuses an
  // existing destination (see the AtomicCreate doc for why a
  // create-decided publish is WRONG there)
  registry.put("abfs", AtomicRename)
  registry.put("abfss", AtomicRename)
  // GCS: close-decided conditional create (if-generation-match=0)
  registry.put("gs", AtomicCreate)

  /** Install (or replace) the guard for a filesystem scheme — call
    * once at boot for object stores (`s3a`, `gs`, `abfs`, …) with a
    * conditional-put implementation backed by the store's SDK.
    */
  def register(scheme: String, guard: CommitGuard): Unit = {
    registry.put(scheme, guard); ()
  }

  /** Remove a registered guard (specs; undoing a boot-time mistake). */
  def deregister(scheme: String): Unit = { registry.remove(scheme); () }

  /** The guard for `scheme`, or a LOUD refusal when none is
    * registered — committing through an unverified scheme with a
    * best-effort fallback would turn every publish race on that
    * store into a silent lost update.
    */
  def forScheme(scheme: String): CommitGuard = {
    val g = registry.get(scheme)
    if (g == null) throw new IllegalStateException(
      s"VectorStore: no CommitGuard registered for filesystem scheme " +
        s"'$scheme' — refusing to commit: a check-then-rename " +
        "fallback silently loses racing commits on stores without " +
        "an atomic no-overwrite publish. Object stores need a " +
        "conditional-put guard: CommitGuard.register(\"" + scheme +
        "\", <guard>) once at boot (the Delta LogStore pattern)")
    g
  }
}
