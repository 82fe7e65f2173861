package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

/** Batched physical-deletion seam for the maintenance sweeps — snapshot
  * expiry's post-commit GC and orphan-file removal ([[LakeTable
  * .expireSnapshots]] / [[LakeTable.removeOrphanFiles]]).
  *
  * The Hadoop FileSystem API only offers per-file `delete()`, so the
  * default implementation is a bounded-parallel per-file loop — already
  * ~10× the serial sweep on a local FS, but on an object store each call
  * is still one HTTP round-trip, and a 10⁶-orphan sweep at ~20 ms each
  * would stall for hours even at 64-way parallelism. Stores with a native
  * batch primitive (S3 `DeleteObjects` takes 1000 keys per request; Azure
  * batch API similar) should [[BulkDelete.register]] an implementation
  * per scheme, exactly like [[CommitCas]] does for the conditional-put
  * commit primitive. Implementations chunk internally to whatever the
  * store caps a batch at.
  *
  * Resolution is per-JVM: the orphan sweep deletes EXECUTOR-side, so a
  * cluster deployment registers its store impl from an executor plugin
  * (driver-only registration still covers expiry, whose GC runs on the
  * driver). An unregistered scheme falls back to [[BulkDelete.Parallel]]
  * — always correct, just round-trip-per-file.
  */
trait BulkDelete {
  /** Physically delete `paths` (files, never recursive). Sweeps race
    * (expiry vs orphan GC vs a re-run): a missing path is NOT an error.
    */
  def deleteAll(fs: FileSystem, paths: Seq[Path]): Unit
}

object BulkDelete {

  /** Default: parallel per-file deletes. The deletes are independent and
    * Hadoop FileSystem instances are thread-safe for deletion; serial
    * per-file round-trips measured ~2 s of the 10⁶-file expiry probe
    * locally and are 10-100× worse per call on an object store.
    */
  object Parallel extends BulkDelete {
    override def deleteAll(fs: FileSystem, paths: Seq[Path]): Unit =
      java.util.Arrays.stream(paths.toArray).parallel()
        .forEach(p => fs.delete(p, false))
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, BulkDelete]()

  /** Install a store-native batch delete for a scheme (overrides the
    * default for that scheme in THIS JVM — see the trait doc for the
    * executor-side caveat).
    */
  def register(scheme: String, impl: BulkDelete): Unit =
    registry.put(scheme, impl)

  /** Remove a registered implementation (test hygiene). */
  def unregister(scheme: String): Unit = registry.remove(scheme)

  /** Resolve for a filesystem: registered impl for its scheme, else the
    * parallel per-file default. Scheme via getUri — FileSystem.getScheme's
    * BASE implementation throws UnsupportedOperationException, so custom
    * connectors that never overrode it would crash the sweeps here.
    */
  def forFs(fs: FileSystem): BulkDelete = {
    // a FileSystem URI may legally carry no scheme (e.g. a raw local
    // path wrapped by an exotic connector) and ConcurrentHashMap.get
    // rejects null keys, so resolve scheme-less filesystems straight
    // to the parallel default
    val scheme = fs.getUri.getScheme
    val registered = if (scheme == null) null else registry.get(scheme)
    if (registered != null) registered else Parallel
  }
}
