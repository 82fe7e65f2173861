package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The single-committer services (A15/A20–A23) + queue-event parsing (A17).
  */

/** File-discovered commit loop — the heart of the reference
  * (FileBasedBookkeeper.java:152-180). One sweep: list pending monikers →
  * measure arrival latency → read → ONE fast-append commit → delete
  * monikers (strictly after commit — the reference deletes before
  * committing and can lose files across a crash, A14).
  */
final class FileBookkeeper(table: LakeTable) {
  @volatile var totalFiles = 0L
  @volatile var totalMonikers = 0L
  @volatile var cumulativeLatencyMs = 0L

  /** One sweep; returns the new snapshot id or -1 if nothing pending. */
  def sweep(): Long = {
    val monikers = Monikers.listPending(table.location)
    if (monikers.isEmpty) return -1L
    val now = System.currentTimeMillis()
    cumulativeLatencyMs += monikers.map(m => now - m.getModificationTime).sum
    totalMonikers += monikers.size
    val files = Monikers.read(monikers)
    totalFiles += files.size
    val snap = table.append(files) // idempotent: path-deduped
    Monikers.delete(monikers)      // only after the commit landed
    snap
  }

  def avgLatencyMs: Double =
    if (totalMonikers == 0) 0.0 else cumulativeLatencyMs.toDouble / totalMonikers

  /** Retention (A21): metadata-only delete of whole partitions older than
    * `retentionMs`, cutoff aligned down to the bucket width
    * (FileBasedBookkeeper.java:182-192).
    */
  def retentionDelete(retentionMs: Long): Long =
    table.deleteOlderThan((System.currentTimeMillis() - retentionMs) * 1000L)
}

/** Event-discovered variant (A16–A20): instead of an Azure Storage Queue,
  * blob-created events arrive as JSON files in an events directory — the
  * same at-least-once discovery stream, one portable mechanism (SURVEY
  * §1.1 "Stream (ingest)").
  */
final class QueueBookkeeper(table: LakeTable, eventsDir: String,
    maxFilesPerCommit: Int = 500) {

  /** One sweep: parse+filter events with DataFrame ops (A17), resolve
    * footer metrics on executors (A18/A19 — partition value parsed from
    * the path, fixing the reference's never-populated partition), commit
    * once, then ack (delete) consumed event files — after the commit, and
    * duplicates are path-deduped (fixes §3.3.6 at-least-once dupes).
    */
  def sweep(spark: SparkSession): Long = {
    val fs = new org.apache.hadoop.fs.Path(eventsDir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(new org.apache.hadoop.fs.Path(eventsDir))) return -1L
    val eventFiles = fs.listStatus(new org.apache.hadoop.fs.Path(eventsDir))
      .filter(_.getPath.getName.endsWith(".json"))
      .sortBy(_.getPath.getName)
      .take(maxFilesPerCommit)
    if (eventFiles.isEmpty) return -1L
    val parsed = QueueEvents.parse(
      spark.read.text(eventFiles.toIndexedSeq.map(_.getPath.toString): _*))
    val paths = parsed.select("filePath").collect().map(_.getString(0))
    if (paths.isEmpty) {
      eventFiles.foreach(f => fs.delete(f.getPath, false))
      return -1L
    }
    // externally-written files carry no schema or spec id — the ingestion
    // contract is that external writers target the table's CURRENT schema
    // AND current partition spec, so stamp both defs (pre-evolution
    // tables: 0, a no-op). Missing the spec stamp is not cosmetic: after a
    // width evolution, a file left on the creation spec resolves the WRONG
    // bucket width — retention delete then drops rows short of the cutoff
    // and scan pruning skips matching files.
    val sid = table.currentSchemaId
    val pid = table.currentSpecId
    val metas = QueueEvents.resolveMetrics(spark, paths.toSeq, table.spec)
      .map(m => m.copy(
        schemaId = if (sid == 0) m.schemaId else sid,
        specId = if (pid == 0) m.specId else pid))
    val snap = table.append(metas)
    eventFiles.foreach(f => fs.delete(f.getPath, false)) // ack after commit
    snap
  }
}

/** Event Grid BlobCreated parsing (A17, StorageQueueBasedBookkeeper
  * .java:178-212) as pure DataFrame ops: base64 → JSON → predicate chain
  * (BlobCreated ∧ FlushWithClose ∧ '/data/' ∧ .parquet|.avro) → https→abfss
  * URL rewrite. Local file:/ URLs pass through unrewritten so the same
  * pipeline runs on local FS.
  */
object QueueEvents {
  def parse(raw: DataFrame): DataFrame = {
    val schema = "eventType STRING, data STRUCT<api: STRING, blobUrl: STRING, contentLength: BIGINT>"
    raw.select(from_json(
        // queue bodies arrive base64-encoded (StorageQueueBasedBookkeeper.java:181)
        unbase64(col("value")).cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(schema))
        .as("e"))
      .select(col("e.eventType").as("eventType"), col("e.data.api").as("api"),
        col("e.data.blobUrl").as("blobUrl"),
        col("e.data.contentLength").as("contentLength"))
      .filter(col("eventType") === "Microsoft.Storage.BlobCreated"
        && col("api") === "FlushWithClose"
        && col("blobUrl").contains("/data/")
        && (col("blobUrl").endsWith(".parquet") || col("blobUrl").endsWith(".avro")))
      .withColumn("filePath",
        when(col("blobUrl").startsWith("https://"),
          regexp_replace(col("blobUrl"),
            "https://([^/]+)/([^/]+)/(.*)", "abfss://$2@$1/$3"))
          .otherwise(regexp_replace(col("blobUrl"), "^file:", "")))
      .select("filePath", "contentLength")
  }

  /** Footer metrics for externally-written files, resolved on executors
    * (A18/A19). Partition value parsed from the `<col>_trunc=<v>` path
    * segment — the reference never populates it (bug, A19).
    */
  def resolveMetrics(spark: SparkSession, paths: Seq[String],
      spec: TruncateSpec): Seq[DataFileMeta] = {
    val column = spec.column
    spark.sparkContext.parallelize(paths, math.max(1, math.min(paths.size, 32)))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val partRe = (java.util.regex.Pattern.quote(column) + "_trunc=(-?\\d+)").r
        it.map { p =>
          val partVal = partRe.findFirstMatchIn(p).map(_.group(1).toLong).getOrElse(0L)
          LakeWriter.footerMeta(conf, new org.apache.hadoop.fs.Path(p), partVal)
        }
      }.collect().toSeq
  }
}

/** Snapshot expiry service (A22, Reaper.java:17-27). */
final class Reaper(table: LakeTable, maxAgeMs: Long = 600000L, retainLast: Int = 20) {
  def expireOnce(): Long =
    table.expireSnapshots(System.currentTimeMillis() - maxAgeMs, retainLast)
}
