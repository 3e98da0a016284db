package graft.table

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

/** Pluggable atomic-claim mechanism fronting [[TableStore.createNew]] (and
  * the claim half of [[TableStore.renameNoReplace]]) on filesystems whose
  * `create(overwrite = false)` is check-then-create — raw-local Hadoop, S3
  * without conditional writes, and most object stores. This is the
  * "catalog CAS" move Iceberg's S3 commit makes (the reference's warehouse
  * is exactly such a store: utils/minio_manager.py:7-44): the claim is won
  * on a mechanism that IS atomic, and only the winner writes the actual
  * file, so the weak filesystem never arbitrates a race.
  *
  * Contract: of N concurrent `claim(path)` calls, at most ONE returns true
  * until `release(path)` — across threads AND processes. `claimAgeMs`
  * supports crash recovery: a claim with no underlying file older than the
  * grace window is abandoned (winner died between claim and write) and may
  * be released by a contender — [[TableStore]] owns that policy so every
  * provider inherits it.
  */
trait CasProvider {

  /** Atomically claim `path` (its rendered URI string). True iff won. */
  def claim(path: String, meta: Array[Byte]): Boolean

  /** Release the claim for `path` (idempotent; absent claims are no-ops). */
  def release(path: String): Unit

  /** Milliseconds since the live claim on `path` was taken; None if none. */
  def claimAgeMs(path: String): Option[Long]
}

object CasProvider {

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, CasProvider]()

  /** Claims with no underlying file older than this are treated as
    * abandoned (crashed winner) and re-claimable — same window as the
    * table-lock break protocol.
    */
  @volatile var abandonedClaimGraceMs: Long = 10000L

  /** Register `provider` as the CAS mechanism for every TableStore whose
    * filesystem resolves to `scheme` (e.g. "s3a"). Takes effect for
    * existing stores immediately (lookup is per-call).
    */
  def register(scheme: String, provider: CasProvider): Unit =
    registry.put(scheme, provider)

  def unregister(scheme: String): Unit = registry.remove(scheme)

  def forScheme(scheme: String): Option[CasProvider] = Option(registry.get(scheme))
}

/** [[CasProvider]] backed by marker files on a filesystem whose
  * `create(overwrite = false)` IS atomic (a shared POSIX mount, HDFS, or
  * S3 with conditional writes enabled) — the file-based analog of
  * fronting commits with a DynamoDB lock table. Claims are
  * `<lockDir>/<sha256(path)>.claim`; the claimed path rides in the marker
  * body for debuggability. Cross-process safe exactly as far as the
  * marker filesystem's create atomicity.
  */
final class FileCasProvider(lockDir: String, conf: Configuration = new Configuration())
    extends CasProvider {

  private val store = new TableStore(new HPath(lockDir), conf)
  store.mkdirs(store.root)

  private def marker(path: String): HPath = {
    val h = MessageDigest.getInstance("SHA-256")
      .digest(path.getBytes(StandardCharsets.UTF_8))
      .take(16).map("%02x".format(_)).mkString
    store.child(s"$h.claim")
  }

  override def claim(path: String, meta: Array[Byte]): Boolean =
    store.createNew(marker(path), path.getBytes(StandardCharsets.UTF_8))

  override def release(path: String): Unit = store.deleteIfExists(marker(path))

  override def claimAgeMs(path: String): Option[Long] = {
    val m = marker(path)
    try {
      if (store.exists(m)) Some(System.currentTimeMillis() - store.mtime(m)) else None
    } catch { case _: java.io.IOException => None } // released mid-look
  }
}
