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
