package graft.lake.dsv2

import java.util

import graft.lake.{ColStats, DataFileMeta, LakeTable}
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 "laketable" source (SURVEY §4, §7.3 — the one declared piece of
  * custom Catalyst work): batch scans with manifest-level partition/stats
  * pruning and filter/column pushdown, plus a MicroBatchStream whose
  * offsets are snapshot ids — the reference's incremental-read contract
  * ("all we are interested in are the added files in a commit",
  * reference Writer.java:141-145) as a first-class streaming source.
  *
  * Usage: spark.read.format("laketable").load(loc)
  *        spark.readStream.format("laketable")
  *          .option("startSnapshotId", "0").load(loc)
  */
class LakeTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "laketable"

  private def location(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("laketable requires a path"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LakeTable.load(location(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LakeDsTable(properties.get("path"))
}

final class LakeDsTable(location: String) extends Table with SupportsRead {
  private lazy val table = LakeTable.load(location)

  override def name(): String = s"laketable.`$location`"
  override def schema(): StructType = table.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(location, table,
      Option(options.get("startSnapshotId")).map(_.toLong))
}

/** Filter pushdown = manifest pruning. Filters over the partition column
  * and any column with footer stats narrow the file list; every filter is
  * also returned to Spark for row-level re-evaluation (pruning is an
  * optimization, never a correctness dependency).
  */
final class LakeScanBuilder(location: String, table: LakeTable,
    startSnapshot: Option[Long])
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = table.schema
  private var aggRows: Option[(StructType, Seq[Seq[Any]])] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all filters still evaluated by Spark post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Manifest-aggregate pushdown (SURVEY §4): COUNT(*)/MIN/MAX over
    * stats-covered long columns are answered from manifest metadata — no
    * data file is ever opened. Partial pushdown: one row per data file,
    * Spark runs the final combine. Declined whenever filters are present
    * (they're evaluated row-level) or any file lacks the needed stat.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = false

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return false
    val files = table.files()
    def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case n: NamedReference if n.fieldNames.length == 1 => Some(n.fieldNames.head)
        case _ => None
      }
    def statOf(f: DataFileMeta, c: String): Option[ColStats] = f.stats.get(c)
    def fieldType(c: String): Option[DataType] =
      table.schema.fields.find(_.name == c).map(_.dataType)
    val plans: Seq[Option[(StructField, DataFileMeta => Any)]] =
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar =>
          Some((StructField("count(*)", LongType, nullable = false),
            (f: DataFileMeta) => f.rowCount))
        case m: Min => colName(m.column).flatMap { c =>
          fieldType(c).collect { case t @ (LongType | TimestampType)
              if files.forall(statOf(_, c).isDefined) =>
            (StructField(s"min($c)", t), (f: DataFileMeta) => statOf(f, c).get.min)
          }
        }
        case m: Max => colName(m.column).flatMap { c =>
          fieldType(c).collect { case t @ (LongType | TimestampType)
              if files.forall(statOf(_, c).isDefined) =>
            (StructField(s"max($c)", t), (f: DataFileMeta) => statOf(f, c).get.max)
          }
        }
        case _ => None
      }
    if (plans.exists(_.isEmpty) || plans.isEmpty) return false
    val fields = plans.map(_.get._1)
    val rows = files.map(f => plans.map(_.get._2(f)))
    aggRows = Some((StructType(fields), rows))
    true
  }

  /** Keep a file iff no pushed filter proves it empty via stats. */
  private def survives(f: DataFileMeta): Boolean = {
    val part = table.spec.column
    def range(col: String): Option[(Long, Long)] =
      if (col == part) Some((f.partitionValue, f.partitionValue + table.spec.widthMicros - 1))
      else f.stats.get(col).map(s => (s.min, s.max))
    def longOf(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    pushed.forall {
      case EqualTo(c, v) => (range(c), longOf(v)) match {
        case (Some((lo, hi)), Some(x)) => x >= lo && x <= hi
        case _ => true
      }
      case GreaterThan(c, v) => (range(c), longOf(v)) match {
        case (Some((_, hi)), Some(x)) => hi > x
        case _ => true
      }
      case GreaterThanOrEqual(c, v) => (range(c), longOf(v)) match {
        case (Some((_, hi)), Some(x)) => hi >= x
        case _ => true
      }
      case LessThan(c, v) => (range(c), longOf(v)) match {
        case (Some((lo, _)), Some(x)) => lo < x
        case _ => true
      }
      case LessThanOrEqual(c, v) => (range(c), longOf(v)) match {
        case (Some((lo, _)), Some(x)) => lo <= x
        case _ => true
      }
      case _ => true
    }
  }

  override def build(): Scan = aggRows match {
    case Some((aggSchema, rows)) => new Scan {
      override def readSchema(): StructType = aggSchema
      override def description(): String =
        s"laketable manifest-aggregate scan: ${aggSchema.fieldNames.mkString(", ")}"
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          Array(LakeAggPartition(rows.map(_.map(_.asInstanceOf[Long]))))
        override def createReaderFactory(): PartitionReaderFactory =
          new LakeAggReaderFactory
      }
    }
    case None => new Scan {
      override def readSchema(): StructType = required

      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          table.files().filter(survives)
            .map(f => LakeInputPartition(f.path, required.toDDL, f.rowCount): InputPartition)
            .toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new LakeReaderFactory
      }

      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new LakeMicroBatchStream(location, required, startSnapshot.getOrElse(0L))
    }
  }
}

/** One row of pre-aggregated manifest values per data file (all long-domain). */
final case class LakeAggPartition(rows: Seq[Seq[Long]]) extends InputPartition

final class LakeAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[LakeAggPartition].rows
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: Seq[Long] = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow =
        InternalRow.fromSeq(cur)
      override def close(): Unit = ()
    }
  }
}

final case class LakeInputPartition(path: String, schemaDdl: String,
    rowCount: Long) extends InputPartition

final class LakeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LakeInputPartition]
    if (p.schemaDdl.isEmpty)
      // empty projection (e.g. COUNT(*)): the manifest already knows the
      // row count — emit that many empty rows, never opening the file
      new PartitionReader[InternalRow] {
        private var remaining = p.rowCount
        private val empty = new GenericInternalRow(0)
        override def next(): Boolean = { remaining -= 1; remaining >= 0 }
        override def get(): InternalRow = empty
        override def close(): Unit = ()
      }
    else new LakeGroupReader(p.path, StructType.fromDDL(p.schemaDdl))
  }
}

/** Row reader over one parquet file via the parquet-hadoop Group API with
  * a projection pushed through PARQUET_READ_SCHEMA. Requires files written
  * with TIMESTAMP_MICROS (LakeWriter enforces this).
  */
final class LakeGroupReader(path: String, schema: StructType)
  extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  // projection must mirror the file's own repetition/annotations exactly:
  // select the requested fields from the footer schema by name
  private val fileSchema: MessageType = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(path), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }
  private val projection = new MessageType("spark_schema",
    schema.fields.map(f => fileSchema.getType(Seq(f.name): _*)): _*)
  conf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(path))
      .withConf(conf).build()
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      if (current.getFieldRepetitionCount(i) == 0) row.setNullAt(i)
      else schema.fields(i).dataType match {
        case LongType => row.setLong(i, current.getLong(i, 0))
        case IntegerType => row.setInt(i, current.getInteger(i, 0))
        case DoubleType => row.setDouble(i, current.getDouble(i, 0))
        case FloatType => row.setFloat(i, current.getFloat(i, 0))
        case BooleanType => row.setBoolean(i, current.getBoolean(i, 0))
        case TimestampType => row.setLong(i, current.getLong(i, 0)) // µs
        case StringType =>
          row.update(i, UTF8String.fromBytes(current.getBinary(i, 0).getBytes))
        case BinaryType => row.update(i, current.getBinary(i, 0).getBytes)
        case other =>
          throw new UnsupportedOperationException(s"laketable read of $other")
      }
      i += 1
    }
    row
  }

  override def close(): Unit = reader.close()
}

/** Snapshot-id offsets: each micro-batch reads exactly the files added in
  * (startId, endId] — one or more snapshot diffs (SURVEY §1.1 "Stream
  * (consume)", A25).
  */
final case class SnapshotOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

final class LakeMicroBatchStream(location: String, schema: StructType,
    startSnapshotId: Long) extends MicroBatchStream {

  private def table: LakeTable = LakeTable.load(location)

  override def initialOffset(): Offset = SnapshotOffset(startSnapshotId)
  override def latestOffset(): Offset = SnapshotOffset(table.currentSnapshotId)
  override def deserializeOffset(json: String): Offset = SnapshotOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val t = table
    // Checkpointed (or configured) offsets can reference snapshots the
    // Reaper has since expired — clamp to the oldest retained snapshot so
    // a restart resumes instead of crash-looping. Commits inside the
    // expired gap are NOT replayed: snapshot expiry bounds replayable
    // history, so operators must keep retainLast above the stream's
    // maximum lag (same contract as Kafka retention vs consumer lag).
    def clamp(id: Long): Long =
      if (t.tableMeta.snapshot(id).isDefined) id
      else t.snapshots.map(_.id).filter(_ >= id).minOption
        .getOrElse(t.currentSnapshotId)
    val s = clamp(start.asInstanceOf[SnapshotOffset].id)
    val e = clamp(end.asInstanceOf[SnapshotOffset].id)
    if (s >= e) Array.empty
    else t.addedFilesBetween(s, e)
      .map(f => LakeInputPartition(f.path, schema.toDDL, f.rowCount): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new LakeReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
