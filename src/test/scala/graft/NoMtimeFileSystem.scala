package graft

import org.apache.hadoop.fs.Path

/** Test-only `nomtime://` scheme: the local filesystem with
  * `setTimes` silently ignored — the S3A metadata contract (object
  * stores accept the call and do nothing). StreamSpec uses it to
  * prove `orderLanding` DETECTS the silent no-op instead of leaving
  * a multi-batch drain unordered, and that `orderLandingStaged`
  * still produces a correctly-ordered landing on such a store. */
class NoMtimeFileSystem extends S3AStubFileSystem {
  override def getScheme: String = "nomtime"
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = ()
}
