package graft

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** Local disk behind a NON-local Hadoop FileSystem scheme (`mockfs://`):
  * registered via `fs.mockfs.impl`, it forces every Icebox storage
  * operation through the Hadoop FileSystem API — a lingering java.nio call
  * (which cannot resolve a `mockfs:` URI) fails loudly, and the store's
  * non-local branch (create-no-overwrite CAS, rename-based publish) is the
  * one exercised. The overridden scheme also keeps [[graft.table
  * .TableStore]] from detecting it as local and short-circuiting to nio
  * primitives.
  */
class MockFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockfs:///")
  override def getScheme: String = "mockfs"

  /** Create-no-overwrite is the CAS primitive the commit protocol claims
    * snapshot ids and locks with. HDFS makes it NameNode-atomic; raw-local
    * Hadoop is check-then-create (TOCTOU) — restore the contract with an
    * `O_EXCL` claim so this mock models the filesystems the non-local
    * branch is actually specified against. NOTE `FileSystem.create(path,
    * overwrite)` dispatches to the non-permission overload on
    * RawLocalFileSystem, so BOTH create variants are intercepted here.
    */
  private def exclClaim(f: org.apache.hadoop.fs.Path): Unit = {
    val p = java.nio.file.Paths.get(f.toUri.getPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    try java.nio.file.Files
      .newByteChannel(p, java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      .close()
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    }
  }

  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) exclClaim(f) // claim won — the file is ours to fill
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }

  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) exclClaim(f)
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)
  }
}
