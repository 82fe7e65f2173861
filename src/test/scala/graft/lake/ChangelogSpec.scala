package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Full CDC changelog ([[LakeTable.changelogBetween]]): inserts AND
  * deletes per commit, derived from manifest diffs — append, MoR delete,
  * delta merge (one commit carrying both), CoW delete/update (exceptAll
  * row diff with carryover cancellation), compaction (no logical change).
  */
class ChangelogSpec extends SparkSpec {

  private val Width = 300000000L
  private def bucket(i: Int): Long = (7200000L + i) * Width

  private def changes(t: LakeTable, from: Long, to: Long): Seq[(String, Long, Long)] =
    t.changelogBetween(spark, from, to)
      .select(col("_change_type"), col("_commit_snapshot_id"), col("message_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("appends surface as inserts keyed by their commit") {
    val loc = tmpDir("cdc-append")
    LakeTable.drop(loc)
    val t = LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec)
    val s0 = t.currentSnapshotId
    val s1 = t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 10, bucket(0), seed = 1), t))
    val s2 = t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 5, bucket(1), seed = 2), t))
    val out = changes(t, s0, s2)
    assert(out.count(_._1 == "insert") == 15)
    assert(out.count(_._1 == "delete") == 0)
    assert(out.count(_._2 == s1) == 10)
    assert(out.count(_._2 == s2) == 5)
  }

  test("MoR delete emits exactly the retired rows; re-delete emits nothing") {
    val loc = tmpDir("cdc-mor")
    LakeTable.drop(loc)
    val t = LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec,
      Map(LakeFormat.PropDeleteMode -> LakeFormat.DeleteModeMergeOnRead))
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 100, bucket(0), seed = 3), t))
    val s1 = t.currentSnapshotId
    val s2 = t.deleteWhere(spark, col("message_id") < 30)
    // overlapping second delete: only the 10 NEWLY dead rows may surface
    val s3 = t.deleteWhere(spark, col("message_id") < 40)
    val out = changes(t, s1, s3)
    assert(out.forall(_._1 == "delete"))
    assert(out.count(_._2 == s2) == 30)
    val third = out.filter(_._2 == s3)
    assert(third.size == 10 && third.map(_._3).sorted == (30L until 40L))
  }

  test("delta MERGE: one commit carries its deletes and its inserts") {
    val loc = tmpDir("cdc-delta")
    LakeTable.drop(loc)
    val t = LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec,
      Map(LakeFormat.PropDeleteMode -> LakeFormat.DeleteModeMergeOnRead))
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 50, bucket(0), seed = 4), t))
    val s1 = t.currentSnapshotId
    // hand-built delta commit (the SQL path is covered by DeltaMergeSpec):
    // retire rows 0-9 of the only file, append a 5-row file — like a MERGE
    val target = t.files().head
    val dels = new graft.lake.dsv2.LakeDeletePositionsWriter(loc)
    val tgt = org.apache.spark.unsafe.types.UTF8String.fromString(target.path)
    (0 until 10).foreach(p => dels.write(tgt, p.toLong))
    val newFiles = LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 5, bucket(1), seed = 5), t)
    val s2 = t.commitDelta(newFiles, Seq(dels.finish()))
    assert(s2 > 0)
    val out = changes(t, s1, s2)
    assert(out.count(_._1 == "delete") == 10)
    assert(out.count(_._1 == "insert") == 5)
    assert(out.forall(_._2 == s2))
  }

  test("CoW delete diffs rows; carried-over survivors cancel") {
    val loc = tmpDir("cdc-cow")
    LakeTable.drop(loc)
    val t = LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec)
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 100, bucket(0), seed = 6), t))
    val s1 = t.currentSnapshotId
    // CoW: rewrites the file, re-emitting 80 surviving rows into a new file
    val s2 = t.deleteWhere(spark, col("message_id") < 20)
    val out = changes(t, s1, s2)
    assert(out.count(_._1 == "insert") == 0) // carryovers cancelled
    val dels = out.filter(_._1 == "delete")
    assert(dels.size == 20 && dels.map(_._3).sorted == (0L until 20L))
  }

  test("compaction and no-op ranges emit no changes; masked history respected") {
    val loc = tmpDir("cdc-compact")
    LakeTable.drop(loc)
    val t = LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec,
      Map(LakeFormat.PropDeleteMode -> LakeFormat.DeleteModeMergeOnRead))
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 60, bucket(0), seed = 7), t, 2))
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 40, bucket(0), seed = 8), t, 2))
    t.deleteWhere(spark, col("message_id") < 10) // 20 rows dead (both batches)
    val s3 = t.currentSnapshotId
    val s4 = t.compactFiles(spark, smallFileBytes = 64L << 20, minInputFiles = 2)
    assert(s4 > 0)
    assert(t.changelogBetween(spark, s3, s4).count() == 0)
    assert(t.changelogBetween(spark, s4, s4).count() == 0)
    // full-history replay net effect equals the final table row count
    val all = changes(t, 0L, s4)
    assert(all.count(_._1 == "insert") - all.count(_._1 == "delete") == 80)
  }
}
