package graft.lake.dsv2

import java.util

import graft.lake.{Json, LakeTable}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style metadata tables, addressed with a `$`-suffix through the
  * catalog: `SELECT * FROM lake.ns.t$files` / `...t$snapshots`. The files
  * table parses each manifest EXECUTOR-side (one scan task per manifest,
  * same posture as [[graft.lake.LakeTable.filesDF]]), so inspecting a
  * 10⁶-file table never materializes the inventory on the driver; the
  * snapshots table is retention-bounded and ships as one task.
  */
object LakeMetaTables {
  val FilesSchema: StructType = StructType.fromDDL(
    "path STRING, size_bytes BIGINT, row_count BIGINT, " +
      "partition_value BIGINT, format STRING")
  val SnapshotsSchema: StructType = StructType.fromDDL(
    "snapshot_id BIGINT, parent_id BIGINT, committed_at_ms BIGINT, " +
      "operation STRING, manifest_count INT")
}

/** One manifest file to parse on an executor. */
final case class ManifestPartition(path: String) extends InputPartition

final class LakeFilesMetaTable(location: String) extends Table with SupportsRead {
  override def name(): String = s"laketable.`$location`$$files"
  override def schema(): StructType = LakeMetaTables.FilesSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = LakeMetaTables.FilesSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val t = LakeTable.load(location)
        val metaDir = new Path(location, graft.lake.LakeFormat.MetadataDir)
        t.tableMeta.current.map(_.manifests).getOrElse(Nil)
          .map(m => ManifestPartition(new Path(metaDir, m).toString): InputPartition)
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => new PartitionReader[InternalRow] {
          private val it = {
            val p = new Path(partition.asInstanceOf[ManifestPartition].path)
            val in = p.getFileSystem(new Configuration()).open(p)
            val content =
              try new String(in.readAllBytes(), "UTF-8") finally in.close()
            Json.manifestFromJson(content).iterator
          }
          private var cur: InternalRow = _
          override def next(): Boolean = {
            if (!it.hasNext) return false
            val f = it.next()
            cur = InternalRow(UTF8String.fromString(f.path), f.sizeBytes,
              f.rowCount, f.partitionValue, UTF8String.fromString(f.format))
            true
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
    }
}

/** Snapshot log rows (retention-bounded — single task). */
final case class SnapshotRows(rows: Seq[(Long, Long, Long, String, Int)])
  extends InputPartition

final class LakeSnapshotsMetaTable(location: String) extends Table with SupportsRead {
  override def name(): String = s"laketable.`$location`$$snapshots"
  override def schema(): StructType = LakeMetaTables.SnapshotsSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = LakeMetaTables.SnapshotsSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val snaps = LakeTable.load(location).snapshots.map(s =>
          (s.id, s.parentId, s.timestampMs, s.operation, s.manifests.size))
        Array(SnapshotRows(snaps))
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => new PartitionReader[InternalRow] {
          private val it = partition.asInstanceOf[SnapshotRows].rows.iterator
          private var cur: InternalRow = _
          override def next(): Boolean = {
            if (!it.hasNext) return false
            val (id, parent, ts, op, n) = it.next()
            cur = InternalRow(id, parent, ts, UTF8String.fromString(op), n)
            true
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
    }
}
