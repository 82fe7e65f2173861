package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property fuzz for [[LakeTable.rewritePositionDeletes]] against REAL
  * parquets (the ConcurrencyPropertySpec alphabet runs metadata-only fake
  * files, which the rewrite — a physical read of the delete parquets —
  * cannot join): random schedules of append / MoR delete / compaction /
  * delete-rewrite on a merge-on-read table, with a row-level model
  * checked after every op and exactly at the end. The invariants the
  * rewrite must never break, under any interleaving:
  *  - read content == model (no row resurrects, none is swallowed);
  *  - the live pos-delete mark count never exceeds the marks a fresh
  *    scan would need (rewrite only ever drops dangling/dup marks);
  *  - a rewrite directly after a rewrite is a no-op (-1).
  */
class DeleteRewritePropertySpec extends SparkSpec {

  private val Width = 300000000L
  private def bucket(i: Int): Long = (7900000L + i) * Width

  private def newTable(): LakeTable = {
    val loc = tmpDir("del-rewrite-fuzz")
    LakeTable.drop(loc)
    LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec,
      Map(LakeFormat.PropDeleteMode -> LakeFormat.DeleteModeMergeOnRead))
  }

  private def runSchedule(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val t = newTable()
    import spark.implicits._
    var nextId = 0L
    var totalAppended = 0L
    var epoch = 0L
    // model: live row id -> its bucket
    val live = scala.collection.mutable.Map.empty[Long, Long]
    var lastOpWasRewrite = false

    def append(): Unit = {
      val n = 20 + rnd.nextInt(60)
      val b = bucket(rnd.nextInt(3))
      val ids = (nextId until nextId + n)
      nextId += n
      val df = ids.toDF("message_id").select(
        col("message_id"), lit(s"s$seed").as("data"),
        timestamp_micros(lit(b) + col("message_id")).as("timestamp"),
        lit(b).as("timeperiod_loadedBy"),
        lit("x").cast("binary").as("message_body"))
      t.append(LakeWriter.writeDataFiles(df, t, 1 + rnd.nextInt(2)))
      totalAppended += n
      ids.foreach(i => live(i) = b)
    }
    // streaming-shape CDC upsert: new versions of a random id range land
    // with an equality delete on message_id in ONE epoch-fenced commit —
    // older versions (any bucket) retire, ids absent from the table are
    // plain inserts; the model keeps last-writer-wins per id
    def upsertOp(): Unit = {
      val n = 5 + rnd.nextInt(15)
      // bias toward EXISTING ids so retirement actually happens
      val start = math.max(0L, nextId - n - rnd.nextInt(30))
      val ids = (start until start + n)
      val b = bucket(rnd.nextInt(3))
      val df = ids.toDF("message_id").select(
        col("message_id"), lit(s"u$seed-$epoch").as("data"),
        timestamp_micros(lit(b) + col("message_id")).as("timestamp"),
        lit(b).as("timeperiod_loadedBy"),
        lit("u").cast("binary").as("message_body"))
      val files = LakeWriter.writeDataFiles(df, t)
      val eq = new graft.lake.dsv2.LakeEqualityDeleteWriter(
        t.location, t.schema, Seq("message_id"))
      val keyRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(t.schema.length)
      ids.foreach { id =>
        keyRow.setLong(t.schema.fieldIndex("message_id"), id)
        eq.write(keyRow)
      }
      assert(t.appendEpoch(files, s"fuzz$seed", epoch, Seq(eq.finish())) > 0)
      epoch += 1
      totalAppended += n
      nextId = math.max(nextId, start + n)
      ids.foreach(i => live(i) = b)
    }
    // eq→pos conversion under a random mixed inventory: every eq entry
    // must retire, visible content must not move, and a second call with
    // nothing pending is a no-op
    def convert(): Unit = {
      val hadEq = t.deleteFilesMeta().exists(_.kind == DeleteFileMeta.KindEq)
      val sid = t.convertEqualityDeletes(spark)
      assert((sid > 0) == hadEq,
        s"convert returned $sid with hadEq=$hadEq (seed $seed)")
      assert(!t.deleteFilesMeta().exists(_.kind == DeleteFileMeta.KindEq),
        s"eq entries survive conversion (seed $seed)")
      if (!hadEq) assert(sid == -1L)
    }
    def del(): Unit = {
      val k = 2 + rnd.nextInt(4)
      val r = rnd.nextInt(k)
      val scoped = rnd.nextBoolean()
      val b = bucket(rnd.nextInt(3))
      val pred =
        if (scoped) col("message_id") % k === r &&
          col("timeperiod_loadedBy") === b
        else col("message_id") % k === r
      t.deleteWhere(spark, pred)
      live.filterInPlace((id, bk) =>
        !(id % k == r && (!scoped || bk == b)))
    }
    def compact(): Unit =
      t.compactFiles(spark, minInputFiles = 1 + rnd.nextInt(2))
    // the classifier path the duplicate-mark data-loss bug lived in:
    // CoW delete on a table carrying accumulated (possibly duplicate)
    // MoR marks — whole-vs-partial classification must never drop an
    // unmatched live row whatever the mark state
    def cowDel(): Unit = {
      val k = 2 + rnd.nextInt(4)
      val r = rnd.nextInt(k)
      t.deleteWhereCoW(spark, col("message_id") % k === r)
      live.filterInPlace((id, _) => id % k != r)
    }
    // mark-count-triggered compaction under a random mark state: size
    // cutoff 0 means ONLY the threshold selects; content must not move
    def thresholdCompact(): Unit =
      t.compactFiles(spark, smallFileBytes = 0L,
        deleteMarkThreshold = Some(1L + rnd.nextInt(20)))
    def rewrite(): Unit = {
      val posBefore = t.deleteFilesMeta().count(_.kind == DeleteFileMeta.KindPos)
      val sid = t.rewritePositionDeletes(spark)
      val pos = t.deleteFilesMeta().filter(_.kind == DeleteFileMeta.KindPos)
      if (lastOpWasRewrite)
        assert(sid == -1L, "rewrite directly after rewrite must be a no-op")
      if (sid >= 0) assert(pos.size <= math.max(1, posBefore))
      // after a rewrite every surviving mark references a LIVE file and
      // is unique — the mark count is exactly the masked-row count
      if (sid >= 0) {
        val masked = totalAppended - live.size // rows ever written minus live
        assert(pos.map(_.rowCount).sum <= masked,
          s"rewrite kept more marks than masked rows ($masked)")
      }
    }

    append() // schedules start non-empty
    (0 until 8).foreach { _ =>
      val op = rnd.nextInt(18)
      if (op < 3) { append(); lastOpWasRewrite = false }
      else if (op < 6) { del(); lastOpWasRewrite = false }
      else if (op < 8) { compact(); lastOpWasRewrite = false }
      else if (op < 10) { cowDel(); lastOpWasRewrite = false }
      else if (op < 12) { thresholdCompact(); lastOpWasRewrite = false }
      else if (op < 15) { upsertOp(); lastOpWasRewrite = false }
      else if (op < 16) { convert(); lastOpWasRewrite = false }
      else { rewrite(); lastOpWasRewrite = true }
      assert(t.toDF(spark).count() == live.size.toLong,
        s"count diverged from model (seed $seed)")
    }
    // exact content at schedule end
    val got = t.toDF(spark).select("message_id", "timeperiod_loadedBy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == live.toSet, s"content diverged from model (seed $seed)")
    LakeTable.drop(t.location)
  }

  test("random append/delete/compact/rewrite/upsert/convert schedules " +
      "preserve the model") {
    (1L to 10L).foreach(runSchedule)
  }
}
