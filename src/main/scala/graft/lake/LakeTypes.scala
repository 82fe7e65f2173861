package graft.lake

/** Core metadata types of the LakeTable format — our native re-expression
  * of the reference's Iceberg table semantics (SURVEY §1.1).
  */

/** Per-column long-domain stats harvested from parquet footers
  * (reference readParquetMetrics, StorageQueueBasedBookkeeper.java:63-66);
  * drive stats-based file skipping at scan time (SURVEY §4).
  */
final case class ColStats(min: Long, max: Long)

/** Immutable data-file metadata (reference Iceberg DataFile,
  * Writer.java:84-107): path, size, rows, the file's partition value, and
  * optional column stats.
  */
final case class DataFileMeta(
    path: String,
    sizeBytes: Long,
    rowCount: Long,
    partitionValue: Long,
    format: String = "parquet",
    stats: Map[String, ColStats] = Map.empty)

/** The reference's single partition transform (Constants.java:25,33-35):
  * truncate a long µs column to fixed-width buckets. Floor semantics so
  * negative values bucket monotonically.
  */
final case class TruncateSpec(column: String, widthMicros: Long) {
  require(widthMicros > 0, "truncate width must be positive")
  def apply(v: Long): Long = v - java.lang.Math.floorMod(v, widthMicros)
  def dirName(v: Long): String = s"${column}_trunc=${apply(v)}"
}

/** One committed table version (reference snapshot, Writer.java:146-150).
  * Fast-append semantics: `manifests` = parent's manifests + one new — the
  * commit never rewrites existing manifests (Writer.java:141-146), so commit
  * cost is O(1) in table size.
  */
final case class Snapshot(
    id: Long,
    parentId: Long, // -1 for the first snapshot
    timestampMs: Long,
    operation: String, // create | append | delete | rewrite | expire
    manifests: Seq[String])

/** Full table metadata as persisted in metadata/v<N>.json. */
final case class TableMeta(
    formatVersion: Int,
    location: String,
    schemaDdl: String,
    spec: TruncateSpec,
    properties: Map[String, String],
    snapshots: Seq[Snapshot],
    currentSnapshotId: Long) {
  def current: Option[Snapshot] = snapshots.find(_.id == currentSnapshotId)
  def snapshot(id: Long): Option[Snapshot] = snapshots.find(_.id == id)
}

object LakeFormat {
  val MetadataDir = "metadata"
  val DataDir = "data"
  val PendingCommitsDir = "_commits/pending"
  val TmpCommitsDir = "_commits/tmp"
  val VersionHint = "version-hint.text"

  // Table properties honored from the reference (SURVEY §1.3).
  val PropCommitRetries = "commit.retry.num-retries"
  val PropManifestMinMerge = "commit.manifest.min-count-to-merge"
  val PropMinSnapshotsToKeep = "history.expire.min-snapshots-to-keep"

  val DefaultProperties: Map[String, String] = Map(
    PropCommitRetries -> "20",
    PropManifestMinMerge -> "200",
    PropMinSnapshotsToKeep -> "100",
    "write.metadata.previous-versions-max" -> "200",
    "write.metadata.delete-after-commit.enabled" -> "true")
}
