package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Position-delete compaction (`rewritePositionDeletes`, the Iceberg
  * `rewrite_position_deletes` maintenance op): a merge-on-read table
  * accretes one pos-delete parquet per DELETE/MERGE commit; the rewrite
  * unions the live marks, drops dangling and duplicate ones, and lands
  * the survivors as range-binned files in one metadata-only commit —
  * data files untouched, read content provably unchanged, equality
  * deletes carried forward verbatim.
  */
class RewriteDeletesSpec extends SparkSpec {

  private val Width = 300000000L
  private def bucket(i: Int): Long = (7600000L + i) * Width

  private def newMoRTable(prefix: String): LakeTable = {
    val loc = tmpDir(prefix)
    LakeTable.drop(loc)
    LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec,
      Map(LakeFormat.PropDeleteMode -> LakeFormat.DeleteModeMergeOnRead))
  }

  private def appendBatch(t: LakeTable, rows: Long, micros: Long, seed: Long,
      filesPer: Int = 1): Long =
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, rows, micros, seed), t, filesPer))

  private def content(t: LakeTable): Set[(Long, Long)] =
    t.toDF(spark).select("message_id", "timeperiod_loadedBy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rewrite collapses fragmented pos-delete files; reads unchanged; " +
      "physical no-op to incremental readers") {
    val t = newMoRTable("rewrite-del-frag")
    appendBatch(t, 100, bucket(0), seed = 1) // ids 0..99
    appendBatch(t, 50, bucket(1), seed = 2)  // ids 0..49
    assert(t.deleteWhere(spark, col("message_id") < 10 &&
      col("timeperiod_loadedBy") === bucket(0)) > 0)
    assert(t.deleteWhere(spark, col("message_id") >= 90) > 0)
    assert(t.deleteWhere(spark, col("message_id") % 13 === 5) > 0)
    val dels = t.deleteFilesMeta().filter(_.kind == DeleteFileMeta.KindPos)
    assert(dels.size >= 3, s"expected fragmentation, got ${dels.size}")
    val markCount = dels.map(_.rowCount).sum
    val dataBefore = t.files().map(_.path).toSet
    val readBefore = content(t)
    val preRewrite = t.currentSnapshotId

    val snap = t.rewritePositionDeletes(spark)
    assert(snap > 0)
    val after = t.deleteFilesMeta()
    assert(after.size == 1 && after.head.kind == DeleteFileMeta.KindPos)
    // no mark was live-referenced twice or dangling here: count preserved
    assert(after.head.rowCount == markCount)
    assert(after.head.dataPaths.nonEmpty) // exact path list re-harvested
    assert(t.files().map(_.path).toSet == dataBefore) // data untouched
    assert(content(t) == readBefore)
    assert(t.snapshots.find(_.id == snap).map(_.operation)
      .contains("rewrite-deletes"))
    // a physical no-op: incremental readers crossing it get nothing
    assert(t.changesBetween(spark, preRewrite, snap).isEmpty)
    // steady state: a second rewrite has nothing to gain
    assert(t.rewritePositionDeletes(spark) == -1L)
    // and the read still applies the compacted mask
    assert(content(t) == readBefore)
  }

  test("rewrite purges marks left dangling by a partial data compaction") {
    val t = newMoRTable("rewrite-del-dangling")
    appendBatch(t, 100, bucket(0), seed = 3) // ids 0..99
    appendBatch(t, 100, bucket(1), seed = 4) // ids 0..99
    // ONE delete commit whose marks span BOTH buckets' files
    assert(t.deleteWhere(spark, col("message_id") < 20) > 0)
    val markBefore = t.deleteFilesMeta()
      .filter(_.kind == DeleteFileMeta.KindPos).map(_.rowCount).sum
    assert(markBefore == 40)
    // compact ONLY bucket 0: its files are rewritten (deletes
    // materialized), so the delete file's bucket-0 marks dangle — but the
    // entry survives because its bucket-1 marks still reference live files
    assert(t.compactFiles(spark, minInputFiles = 1,
      partitionMin = Some(bucket(0)), partitionMax = Some(bucket(0))) > 0)
    val stillThere = t.deleteFilesMeta()
      .filter(_.kind == DeleteFileMeta.KindPos)
    assert(stillThere.nonEmpty && stillThere.map(_.rowCount).sum == 40)
    val readBefore = content(t)
    assert(readBefore.size == 160)

    assert(t.rewritePositionDeletes(spark) > 0)
    val after = t.deleteFilesMeta().filter(_.kind == DeleteFileMeta.KindPos)
    // only the 20 live bucket-1 marks survive; the 20 dangling ones drop
    assert(after.map(_.rowCount).sum == 20)
    assert(content(t) == readBefore)
  }

  test("rewrite dedupes (path, pos) marks from overlapping delete commits") {
    val t = newMoRTable("rewrite-del-dup")
    appendBatch(t, 100, bucket(0), seed = 5)
    // two concurrent DELETE jobs with overlapping predicates: both scans
    // ran before either commit (delete-only commits don't conflict), so
    // the same positions land twice — reads union the masks, but every
    // affected scan pays both files forever until a rewrite dedupes
    val w1 = t.writePositionDeletes(spark, col("message_id") < 30)
    val w2 = t.writePositionDeletes(spark, col("message_id") < 30)
    assert(t.commitPositionDeletes(w1) > 0)
    assert(t.commitPositionDeletes(w2) > 0)
    val before = t.deleteFilesMeta().filter(_.kind == DeleteFileMeta.KindPos)
    assert(before.map(_.rowCount).sum == 60)
    assert(t.toDF(spark).count() == 70)

    assert(t.rewritePositionDeletes(spark) > 0)
    val after = t.deleteFilesMeta().filter(_.kind == DeleteFileMeta.KindPos)
    assert(after.size == 1 && after.map(_.rowCount).sum == 30)
    assert(t.toDF(spark).count() == 70)
  }

  test("delete-mark threshold compaction: a heavily-deleted file rewrites " +
      "regardless of size; lightly-marked and clean files stay") {
    val t = newMoRTable("mark-threshold")
    appendBatch(t, 100, bucket(0), seed = 7) // ids 0..99, bucket 0
    appendBatch(t, 100, bucket(1), seed = 8) // ids 0..99, bucket 1
    // bucket 0: 50 marks (heavy); bucket 1: 5 marks (light)
    assert(t.deleteWhere(spark, col("message_id") < 50 &&
      col("timeperiod_loadedBy") === bucket(0)) > 0)
    assert(t.deleteWhere(spark, col("message_id") < 5 &&
      col("timeperiod_loadedBy") === bucket(1)) > 0)
    val before = t.files().map(f => f.path -> f).toMap
    assert(before.size == 2)
    // size cutoff 0 disqualifies every file by size; only the mark
    // threshold can select — and only bucket 0 crosses it
    val snap = t.compactFiles(spark, smallFileBytes = 0L,
      minInputFiles = 2, deleteMarkThreshold = Some(20L))
    assert(snap > 0)
    val after = t.files()
    val (b0, b1) = after.partition(_.partitionValue == bucket(0))
    assert(b1.map(_.path).toSet == before.keySet.filter(
      p => before(p).partitionValue == bucket(1)),
      "lightly-marked file must not be rewritten")
    assert(b0.size == 1 && !before.contains(b0.head.path),
      "heavily-marked file must be rewritten")
    assert(b0.head.rowCount == 50) // delete debt materialized
    // bucket 1's marks survive; bucket 0's entries were pruned with it
    val marks = t.deleteFilesMeta().filter(_.kind == DeleteFileMeta.KindPos)
      .map(_.rowCount).sum
    assert(marks == 5, s"expected only bucket 1's 5 marks, got $marks")
    assert(t.toDF(spark).count() == 145)
    // threshold off (None): nothing qualifies under the same size cutoff
    assert(t.compactFiles(spark, smallFileBytes = 0L) == -1L)
  }

  test("duplicate marks never fake a whole-file drop: CoW delete after " +
      "overlapping MoR deletes keeps the unmatched rows") {
    // regression: classifyDeleteDecisions called a file WHOLLY dropped
    // when matched == row_count − dels with dels counting duplicate
    // (path, pos) marks — here 30 rows, 10 positions marked TWICE (two
    // overlapping delete commits), and a CoW predicate matching exactly
    // 10 of the 20 live rows made 10 == 30 − 20 hold: rows 10..19 were
    // silently deleted. Distinct-mark counting classifies PARTIAL.
    val t = newMoRTable("dup-mark-cow")
    appendBatch(t, 30, bucket(0), seed = 9) // ids 0..29, ONE file
    val w1 = t.writePositionDeletes(spark, col("message_id") < 10)
    val w2 = t.writePositionDeletes(spark, col("message_id") < 10)
    assert(t.commitPositionDeletes(w1) > 0)
    assert(t.commitPositionDeletes(w2) > 0) // 20 marks, 10 distinct
    assert(t.toDF(spark).count() == 20)
    assert(t.deleteWhereCoW(spark, col("message_id") >= 20) > 0)
    val ids = t.toDF(spark).select("message_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (10L until 20L).toSet,
      s"rows lost/resurrected by the CoW classify: got ${ids.size} rows")
  }

  test("rewrite racing a concurrent MoR delete loses nothing, " +
      "resurrects nothing, whichever order the CAS settles") {
    // a REAL race (two threads through the commit CAS), not a modeled
    // interleaving: the rewrite replaces the scanned pos entries and
    // carries entries appended since its scan; the delete only appends.
    // Whichever commit wins the CAS, the loser retries (or the rewrite
    // aborts) — the one illegal outcome is a mask lost (rows resurrect)
    // or over-kept (rows vanish). 8 rounds to vary the interleaving.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (0 until 8).foreach { round =>
      val t = newMoRTable(s"rewrite-race-$round")
      appendBatch(t, 200, bucket(0), seed = 100 + round) // ids 0..199
      // fragment: three pos-delete commits masking ids 0..29
      (0 until 3).foreach { i =>
        assert(t.deleteWhere(spark,
          col("message_id") >= i * 10 && col("message_id") < (i + 1) * 10) > 0)
      }
      val rewriter = Future {
        val t2 = LakeTable.load(t.location)
        try t2.rewritePositionDeletes(spark)
        catch { case _: java.util.ConcurrentModificationException => -2L }
      }
      val deleter = Future {
        val t3 = LakeTable.load(t.location)
        t3.deleteWhere(spark, col("message_id") >= 150)
      }
      val rw = Await.result(rewriter, 120.seconds)
      val dl = Await.result(deleter, 120.seconds)
      assert(dl > 0, "the delete itself must commit")
      val ids = t.refresh().toDF(spark).select("message_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == (30L until 150L).toSet,
        s"round $round (rewrite=$rw): expected ids 30..149, " +
          s"got ${ids.size} rows")
      // steady state afterwards: one more rewrite still converges
      t.rewritePositionDeletes(spark)
      assert(t.toDF(spark).count() == 120)
      LakeTable.drop(t.location)
    }
  }

  test("equality deletes carry forward verbatim; only pos files compact") {
    val t = newMoRTable("rewrite-del-eq")
    appendBatch(t, 100, bucket(0), seed = 6) // ids 0..99
    // an eq-delete upsert (new versions of 0..9 + key retire), then two
    // fragmenting pos-delete commits
    import spark.implicits._
    val nv = (0L until 10L).toDF("message_id").select(
      col("message_id"), lit("nv").as("data"),
      timestamp_micros(lit(bucket(0)) + col("message_id")).as("timestamp"),
      lit(bucket(0)).as("timeperiod_loadedBy"),
      lit("nv").cast("binary").as("message_body"))
    val files = LakeWriter.writeDataFiles(nv, t)
    val eqw = new graft.lake.dsv2.LakeEqualityDeleteWriter(
      t.location, t.schema, Seq("message_id"))
    val keyRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      t.schema.length)
    (0L until 10L).foreach { id =>
      keyRow.setLong(t.schema.fieldIndex("message_id"), id)
      eqw.write(keyRow)
    }
    assert(t.appendEpoch(files, "uq", 0, Seq(eqw.finish())) > 0)
    assert(t.deleteWhere(spark, col("message_id") >= 95) > 0)
    assert(t.deleteWhere(spark, col("message_id") === 50) > 0)
    val eqBefore = t.deleteFilesMeta().filter(_.kind == DeleteFileMeta.KindEq)
    assert(eqBefore.size == 1)
    val readBefore = content(t)
    assert(readBefore.size == 94) // 100 - 5 - 1 (upserts replace in place)

    assert(t.rewritePositionDeletes(spark) > 0)
    val after = t.deleteFilesMeta()
    val (eqAfter, posAfter) = after.partition(_.kind == DeleteFileMeta.KindEq)
    // the eq entry is the SAME entry — same path, same seq (merging eq
    // files would change their sequence-addressed application window)
    assert(eqAfter.map(e => (e.path, e.seq)) ==
      eqBefore.map(e => (e.path, e.seq)))
    assert(posAfter.size == 1 && posAfter.head.rowCount == 6)
    assert(content(t) == readBefore)
    assert(t.toDF(spark).filter(col("data") === "nv").count() == 10)
  }
}
