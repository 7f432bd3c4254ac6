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
  * S3-class object stores have NEITHER (rename is copy+delete, and a
  * plain PUT overwrites): the only correct publish there is a
  * conditional put (`If-None-Match: *`) or an external coordinator
  * (the DynamoDB LogStore pattern) — which cannot be written here
  * without the store's SDK, so there is deliberately NO default for
  * those schemes. An unregistered scheme REFUSES to commit loudly
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

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitGuard]()
  registry.put("file", PosixLink)
  registry.put("hdfs", AtomicRename)
  registry.put("viewfs", AtomicRename)
  registry.put("webhdfs", AtomicRename)

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
