package graft.lake

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** An object-store-shaped FileSystem for [[CommitCasSpec]]: data lives on
  * the local disk, but `rename` has S3-style semantics — a client-side
  * existence check followed by a move that OVERWRITES, i.e. there is NO
  * atomic create-if-absent primitive anywhere in the API. Two racing
  * committers can both pass the existence check and both "win" the
  * rename; the second silently replaces the first's version file. This
  * is exactly the store shape the [[CommitCas]] conditional-put hook
  * exists for.
  *
  * Registered with Hadoop via the ServiceLoader file
  * `src/test/resources/META-INF/services/org.apache.hadoop.fs.FileSystem`
  * under scheme `mocks3` — no Configuration mutation needed.
  */
class MockObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")

  override def rename(src: Path, dst: Path): Boolean = {
    // check-then-act, then overwrite: the non-atomic window of an
    // object-store "rename" (copy+delete under the hood)
    if (exists(dst)) delete(dst, false)
    super.rename(src, dst)
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

  override def getFileStatus(f: Path): FileStatus =
    plainStatus(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(plainStatus)
}
