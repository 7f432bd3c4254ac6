package graft.streaming

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import java.net.URI

/** Test-only filesystem modelling an S3-class object store with NO
  * atomic no-overwrite publish: `rename` silently REPLACES an
  * existing destination (copy-then-delete semantics), and there is
  * no link(2). CommitGuardSpec registers it under the `clobber:`
  * scheme (`fs.clobber.impl`) to prove (a) the legacy
  * check-then-rename publish loses a racing commit on such a store,
  * and (b) [[VectorStore]] refuses to commit through it unless a
  * conditional-put-shaped [[CommitGuard]] is registered. Top-level
  * class with a no-arg constructor — Hadoop instantiates it by name.
  */
class ClobberFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "clobber"
  override def getUri: URI = URI.create("clobber:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, false)
    super.rename(src, dst)
  }
}

/** Test-only filesystem modelling the `gs`-class object store
  * [[CommitGuard.AtomicCreate]] targets: `rename` silently REPLACES
  * an existing destination (no rename-based publish is possible), and
  * a no-overwrite create is CLOSE-DECIDED — bytes buffer invisibly
  * and `close()` publishes them iff the target still does not exist,
  * atomically (the local analogue of GCS's if-generation-match-0
  * conditional upload: here a `link(2)` of a finished hidden file,
  * EEXIST-decided). A loser sees
  * [[org.apache.hadoop.fs.FileAlreadyExistsException]] at create (the
  * connector's upfront existence fast path) or at close (the store
  * precondition); a reader NEVER sees a torn object.
  * RawLocalFileSystem's own no-overwrite create is a non-atomic
  * exists-then-open with visible-at-create semantics — under a
  * 16-thread race it admits multiple winners and torn reads, exactly
  * the wrong model. Registered under `atomiccreate:` by
  * CommitGuardSpec. Hadoop's create(Path, boolean) chain lands on the
  * NON-permission 6-arg variant in RawLocalFileSystem, so that is the
  * override point.
  */
/** Test-only filesystem modelling Hadoop 3.4.1+ `s3a` with
  * `fs.s3a.create.conditional.enabled` — the documented AtomicCreate
  * opt-in (CommitGuard.scala): a no-overwrite create SUCCEEDS
  * IMMEDIATELY (S3 does no upfront existence check; the decision is
  * entirely at close), bytes buffer invisibly, and `close()` performs
  * the PUT with `If-None-Match: *` — atomically publishing iff the
  * target still does not exist, else throwing the translated
  * 412-precondition failure as a PLAIN
  * [[org.apache.hadoop.fs.PathIOException]] (deliberately NOT
  * FileAlreadyExistsException: the real connector surfaces a remote
  * precondition failure, and AtomicCreate must propagate it LOUDLY,
  * never map it to a quiet "lost the race"). Streams are Abortable
  * like the real S3ABlockOutputStream; the companion counts
  * opened/committed/failed/aborted uploads so a spec can prove no
  * failure path leaves an orphaned multipart upload (opened =
  * committed + failed + aborted). Registered under `s3acond:` by
  * CommitGuardSpec.
  */
class S3aConditionalFileSystem extends RawLocalFileSystem {
  import S3aConditionalFileSystem._
  override def getScheme: String = "s3acond"
  override def getUri: URI = URI.create("s3acond:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, false) // S3 rename = copy+delete, clobbers
    super.rename(src, dst)
  }
  private def conditionalCreate(f: Path)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    val file = pathToFile(f)
    Option(file.getParentFile).foreach(_.mkdirs())
    opened.incrementAndGet()
    val buf = new java.io.ByteArrayOutputStream()
    // terminal-state latch: 0 = in flight, 1 = committed, 2 = failed
    // (412 — the request completed, nothing orphaned), 3 = aborted
    val state = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = new java.io.OutputStream
        with org.apache.hadoop.fs.Abortable {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        if (!state.compareAndSet(0, 1)) return // idempotent / post-abort
        val tmp = java.nio.file.Files.createTempFile(
          file.getParentFile.toPath, ".inflight_", ".bin")
        java.nio.file.Files.write(tmp, buf.toByteArray)
        try java.nio.file.Files.createLink(file.toPath, tmp)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            state.set(2); failed.incrementAndGet()
            throw new org.apache.hadoop.fs.PathIOException(f.toString,
              "PUT If-None-Match: * rejected: 412 Precondition Failed " +
                "(object already exists)")
        } finally java.nio.file.Files.deleteIfExists(tmp)
        committed.incrementAndGet(); ()
      }
      def abort(): org.apache.hadoop.fs.Abortable.AbortableResult = {
        // the real contract: no-op after close/failed-close, releases
        // the multipart upload when still in flight
        val acted = state.compareAndSet(0, 3)
        if (acted) { aborted.incrementAndGet(); () }
        new org.apache.hadoop.fs.Abortable.AbortableResult {
          def alreadyClosed(): Boolean = !acted
          def anyCleanupException(): java.io.IOException = null
        }
      }
    }
    new org.apache.hadoop.fs.FSDataOutputStream(out, null)
  }
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize,
        progress)
    else conditionalCreate(f)
  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else conditionalCreate(f)
}

object S3aConditionalFileSystem {
  /** Upload accounting: every opened conditional upload must end
    * committed, failed (412 — request complete) or aborted; anything
    * else is the orphaned-multipart leak the guard must not produce.
    */
  val opened = new java.util.concurrent.atomic.AtomicLong(0)
  val committed = new java.util.concurrent.atomic.AtomicLong(0)
  val failed = new java.util.concurrent.atomic.AtomicLong(0)
  val aborted = new java.util.concurrent.atomic.AtomicLong(0)
  def reset(): Unit =
    Seq(opened, committed, failed, aborted).foreach(_.set(0))
}

class AtomicCreateFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "atomiccreate"
  override def getUri: URI = URI.create("atomiccreate:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, false)
    super.rename(src, dst)
  }
  private def conditionalCreate(f: Path)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    val file = pathToFile(f)
    Option(file.getParentFile).foreach(_.mkdirs())
    if (file.exists()) // upfront existence fast path (non-atomic)
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        f.toString)
    val buf = new java.io.ByteArrayOutputStream()
    val out = new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        val tmp = java.nio.file.Files.createTempFile(
          file.getParentFile.toPath, ".inflight_", ".bin")
        java.nio.file.Files.write(tmp, buf.toByteArray)
        try java.nio.file.Files.createLink(file.toPath, tmp)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            java.nio.file.Files.deleteIfExists(tmp)
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              f.toString)
        } finally java.nio.file.Files.deleteIfExists(tmp)
      }
    }
    new org.apache.hadoop.fs.FSDataOutputStream(out, null)
  }
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, overwrite, bufferSize, replication, blockSize,
        progress)
    else conditionalCreate(f)
  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    else conditionalCreate(f)
}
