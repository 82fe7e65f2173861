package graft.lake

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** Per-request latency injection for the `mocks3:` store — the knob the
  * object-store pricing probes turn (r10 verdict item 3: "local FS
  * undersells per-file latency"). Each primitive that would be one HTTP
  * round-trip on a real flat store sleeps `graft.mocks3.latency.ms`
  * milliseconds (system property, read per call so a bench can flip it
  * around a timed region; default 0 = the historical no-latency mock the
  * correctness specs drive). Composite operations are NOT charged
  * separately: the mock's rename is exists+delete+move, so it naturally
  * costs 2-3 charged primitives — exactly the copy+delete shape that
  * makes object-store "rename" expensive.
  */
object MockStoreLatency {
  val Prop = "graft.mocks3.latency.ms"
  def ms: Long =
    try java.lang.Long.parseLong(System.getProperty(Prop, "0"))
    catch { case _: NumberFormatException => 0L }
  def charge(): Unit = {
    val m = ms
    if (m > 0L) Thread.sleep(m)
  }
}

/** An object-store-shaped FileSystem for the commit-protocol specs and
  * the object-store pricing benches: data lives on the local disk, but
  * `rename` has S3-style semantics — a client-side existence check
  * followed by a move that OVERWRITES, i.e. there is NO atomic
  * create-if-absent primitive anywhere in the API. Two racing committers
  * can both pass the existence check and both "win" the rename; the
  * second silently replaces the first's version file. This is exactly
  * the store shape the [[CommitCas]] conditional-put hook exists for.
  *
  * Every round-trip-shaped primitive charges [[MockStoreLatency]], so a
  * bench can price the SAME protocol at e.g. 15 ms/request — the
  * mid-range of published S3/ADLS first-byte latencies — instead of the
  * local disk's ~0.05 ms, which undersells per-file costs by ~300×.
  *
  * Registered with Hadoop via the ServiceLoader file
  * `src/main/resources/META-INF/services/org.apache.hadoop.fs.FileSystem`
  * under scheme `mocks3` — no Configuration mutation needed. Lives in
  * MAIN sources (not test) so `graft.Bench`'s runtime classpath can
  * drive the probes; it is a measurement fixture, never a production
  * connector, and nothing in the engine references it.
  */
class MockObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")

  override def rename(src: Path, dst: Path): Boolean = {
    // check-then-act, then overwrite: the non-atomic window of an
    // object-store "rename" (copy+delete under the hood). exists() and
    // delete() charge their own round-trips; the move itself is the copy
    // leg — charge it too.
    if (exists(dst)) delete(dst, false)
    MockStoreLatency.charge()
    super.rename(src, dst)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    MockStoreLatency.charge() // the PUT round-trip
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    MockStoreLatency.charge() // the GET round-trip
    super.open(f, bufferSize)
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    MockStoreLatency.charge() // one DELETE request per object
    super.delete(f, recursive)
  }

  // RawLocalFileSystem's statuses load permissions LAZILY via
  // `new java.io.File(uri)` — which rejects the mocks3 scheme, so any
  // recursive listing (FileSystem.listFiles → LocatedFileStatus →
  // getPermission) blows up. Object stores have no POSIX permissions
  // anyway: return plain statuses with defaults pre-loaded.
  private def plainStatus(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDefault,
      "", "", st.getPath)

  // RawLocalFileSystem.listStatus materializes each child via
  // getFileStatus — an IMPLEMENTATION detail of the local backing store,
  // not a round-trip a real flat store pays (LIST returns up to 1000
  // keys' metadata in ONE response). Without this guard the mock charged
  // one latency PER DIRECTORY ENTRY, which made the first mocks3 commit
  // curve read as O(table depth) per commit (229 "round-trips" at depth
  // 300) when the protocol's true request count is flat — a fixture
  // artifact, not an engine finding. The guard scopes to the thread: a
  // listing charges its page requests, its per-child stats charge
  // nothing.
  private val inList = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  override def getFileStatus(f: Path): FileStatus = {
    if (!inList.get()) MockStoreLatency.charge() // HEAD
    plainStatus(super.getFileStatus(f))
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    // one LIST request per 1000 keys (the S3 page size) — charged up
    // front because the child count is only known after the local list
    MockStoreLatency.charge()
    val prev = inList.get() // save/restore: recursive listings must not
    inList.set(java.lang.Boolean.TRUE) // un-guard the outer loop's stats
    try {
      val st = super.listStatus(f)
      var extraPages = (st.length - 1) / 1000
      while (extraPages > 0) { MockStoreLatency.charge(); extraPages -= 1 }
      st.map(plainStatus)
    } finally inList.set(prev)
  }
}
