package graft

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** Local disk behind a scheme whose `create(overwrite = false)` is
  * DELIBERATELY non-atomic: check-then-create with the TOCTOU window
  * widened to a visible sleep — the model of raw object stores (S3 without
  * conditional writes). Races that are a microsecond window in production
  * become deterministic here, so the spec can demonstrate both the hazard
  * (multiple concurrent "winners" without a [[graft.table.CasProvider]])
  * and the fix (exactly one with). NOTE both `create` overloads are
  * overridden — `FileSystem.create(path, overwrite)` dispatches to the
  * non-permission one on RawLocalFileSystem.
  */
class WeakFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("weakfs:///")
  override def getScheme: String = "weakfs"

  private def weakCheck(f: org.apache.hadoop.fs.Path, overwrite: Boolean): Unit =
    if (!overwrite) {
      if (exists(f))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      Thread.sleep(WeakFs.raceWindowMs) // every racer passes the check first
    }

  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    weakCheck(f, overwrite)
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }

  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    weakCheck(f, overwrite)
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)
  }
}

object WeakFs {
  @volatile var raceWindowMs: Long = 25L
}
