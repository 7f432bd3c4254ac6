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
