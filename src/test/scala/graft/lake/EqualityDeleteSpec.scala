package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Equality deletes (the Iceberg-v2 / Flink CDC-upsert shape): key-column
  * delete files retire every STRICTLY-OLDER row version with a matching
  * key — sequence-addressed via the commit seq stamped on data files, so
  * an upsert's own batch survives its own delete. Readers inject the key
  * columns (even outside the projection) and drop matching rows; the
  * manifest-count shortcuts stand down; compaction materializes the debt.
  */
class EqualityDeleteSpec extends SparkSpec {

  private val Width = 300000000L
  private def bucket(i: Int): Long = (7300000L + i) * Width

  private def newTable(prefix: String): LakeTable = {
    val loc = tmpDir(prefix)
    LakeTable.drop(loc)
    LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec)
  }

  /** One upsert commit through the engine API: new versions of `ids` (data
    * column = `tag`) + an equality delete on message_id, atomically.
    */
  private def upsert(t: LakeTable, ids: Seq[Long], tag: String,
      epoch: Long, query: String = "uq"): Long = {
    import spark.implicits._
    val df = ids.toDF("message_id").select(
      col("message_id"),
      lit(tag).as("data"),
      timestamp_micros(lit(bucket(0)) + col("message_id")).as("timestamp"),
      lit(bucket(0)).as("timeperiod_loadedBy"),
      lit(tag).cast("binary").as("message_body"))
    val files = LakeWriter.writeDataFiles(df, t)
    val eq = new graft.lake.dsv2.LakeEqualityDeleteWriter(
      t.location, t.schema, Seq("message_id"))
    val keyRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      t.schema.length)
    ids.foreach { id =>
      keyRow.setLong(t.schema.fieldIndex("message_id"), id)
      eq.write(keyRow)
    }
    t.appendEpoch(files, query, epoch, Seq(eq.finish()))
  }

  test("upsert retires older versions, not its own batch; stacking works") {
    val t = newTable("eq-upsert")
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 100, bucket(0), seed = 1), t)) // v0: 0..99
    val preUpsert = t.currentSnapshotId
    assert(upsert(t, 50L until 60L, "v1", epoch = 0) > 0)
    val df1 = t.toDF(spark)
    assert(df1.count() == 100)
    assert(df1.filter(col("data") === "v1").count() == 10)
    // second upsert overlapping the first: keys 55..64 → v2
    assert(upsert(t, 55L until 65L, "v2", epoch = 1) > 0)
    val df2 = spark.read.format("laketable").load(t.location)
    assert(df2.count() == 100)
    assert(df2.filter(col("data") === "v1").count() == 5)  // 50..54
    assert(df2.filter(col("data") === "v2").count() == 10) // 55..64
    // reader paths: count-star, key-free projection, filter, _file/_pos
    assert(df2.select("data").count() == 100)
    assert(df2.filter(col("message_id") < 60).count() == 60)
    assert(df2.select("_file", "_pos", "message_id").distinct().count() == 100)
    // time travel: pre-upsert snapshot unaffected
    assert(t.snapshotDF(spark, preUpsert).filter(col("data") === "v1").count() == 0)
    // group-by-partition agg declines manifest pushdown under deletes
    assert(t.toDF(spark).groupBy("timeperiod_loadedBy").count()
      .head.getLong(1) == 100)
  }

  test("compaction materializes equality deletes and retires the entries") {
    val t = newTable("eq-compact")
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 60, bucket(0), seed = 2), t, 2))
    assert(upsert(t, 0L until 20L, "nv", epoch = 0) > 0)
    assert(t.deleteFilesMeta().exists(_.kind == DeleteFileMeta.KindEq))
    assert(t.compactFiles(spark, smallFileBytes = 64L << 20, minInputFiles = 1) > 0)
    assert(t.deleteFilesMeta().isEmpty)
    val df = t.toDF(spark)
    assert(df.count() == 60)
    assert(df.filter(col("data") === "nv").count() == 20)
  }

  test("CoW DELETE classifies files correctly with pending equality deletes") {
    // regression: deleteWhereCoW used to read ALL pending delete parquets
    // as position deletes — an equality-delete file (key-column schema, no
    // file_path/pos) either failed the union read outright or produced
    // null-keyed garbage counts, breaking SQL DELETE in copy-on-write mode
    val t = newTable("eq-cow-delete")
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 100, bucket(0), seed = 9), t)) // 0..99
    assert(upsert(t, 0L until 10L, "nv", epoch = 0) > 0) // eq-retire 0..9
    assert(t.toDF(spark).count() == 100)
    val snap = t.deleteWhereCoW(spark, col("message_id") >= 90)
    assert(snap > 0)
    val df = t.toDF(spark)
    assert(df.count() == 90)
    // the upserted versions survive; the eq-retired originals stay dead
    assert(df.filter(col("data") === "nv").count() == 10)
    assert(df.filter(col("message_id") < 10 && col("data") =!= "nv").count() == 0)
    assert(df.filter(col("message_id") >= 90).count() == 0)
  }

  test("changelog resolves equality retirements to whole deleted rows") {
    val t = newTable("eq-cdc")
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 30, bucket(0), seed = 3), t))
    val s1 = t.currentSnapshotId
    val s2 = upsert(t, 10L until 15L, "u", epoch = 0)
    val out = t.changelogBetween(spark, s1, s2)
      .select("_change_type", "message_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.count(_._1 == "insert") == 5)
    val dels = out.filter(_._1 == "delete").map(_._2).sorted
    assert(dels.toSeq == (10L until 15L)) // the retired old versions
  }

  test("streaming CDC-upsert sink: keep-last per key across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val t = newTable("eq-sink")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val rows = mem.toDF().select(
      col("_1").as("message_id"),
      col("_2").as("data"),
      timestamp_micros(lit(bucket(0)) + col("_1")).as("timestamp"),
      lit(bucket(0)).as("timeperiod_loadedBy"),
      col("_2").cast("binary").as("message_body"))
    val ckpt = tmpDir("eq-sink-ckpt")
    def drain(): Unit = {
      val q = rows.writeStream.format("laketable")
        .option("checkpointLocation", ckpt)
        .option("upsertKeys", "message_id")
        .trigger(Trigger.AvailableNow())
        .start(t.location)
      q.awaitTermination(60000)
    }
    mem.addData((0L until 10L).map(i => (i, "a")): _*)
    drain()
    val filesAfterB1 = t.refresh().files().map(_.path).toSet
    mem.addData((5L until 15L).map(i => (i, "b")): _*)
    drain()
    t.refresh()
    // upsert never rewrites: batch-1 files all still live
    assert(filesAfterB1.subsetOf(t.files().map(_.path).toSet))
    assert(t.deleteFilesMeta().exists(_.kind == DeleteFileMeta.KindEq))
    val out = t.toDF(spark).select("message_id", "data").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == 15)
    out.foreach { case (id, d) =>
      assert(d == (if (id < 5) "a" else "b"), s"key $id")
    }
  }

  test("convertEqualityDeletes: eq debt becomes position marks, rows and " +
      "mixed pos deletes unchanged, key rename unblocks, idempotent") {
    val t = newTable("eq-convert")
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 100, bucket(0), seed = 7), t, 3))
    // stacked upserts with overlap: keys 55..59 carry TWO eq generations —
    // the max-seq aggregation must retire both older versions of 55..64
    // without touching the second upsert's own batch
    assert(upsert(t, 50L until 60L, "v1", epoch = 0) > 0)
    assert(upsert(t, 55L until 65L, "v2", epoch = 1) > 0)
    // a position delete in the same inventory must carry through untouched
    assert(t.deleteWhereMoR(spark, col("message_id") === 99L) > 0)
    assert(t.deleteFilesMeta().exists(_.kind == DeleteFileMeta.KindEq))
    assert(t.deleteFilesMeta().exists(_.kind == DeleteFileMeta.KindPos))
    // rename of the eq key column is blocked while the debt is pending
    intercept[IllegalStateException] { t.renameColumn("message_id", "mid") }
    val before = t.toDF(spark).select("message_id", "data")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(before.size == 99 && !before.exists(_._1 == 99L))
    assert(before.count(_._2 == "v1") == 5)   // 50..54
    assert(before.count(_._2 == "v2") == 10)  // 55..64
    val snap = t.convertEqualityDeletes(spark)
    assert(snap > 0)
    val after = t.refresh().deleteFilesMeta()
    assert(after.nonEmpty && after.forall(_.kind == DeleteFileMeta.KindPos),
      s"eq entries survive conversion: $after")
    val read = t.toDF(spark).select("message_id", "data")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(read == before, "conversion changed visible rows")
    // metadata shortcuts (manifest-count path) now see pos-only deletes
    assert(t.toDF(spark).count() == 99)
    // the retired debt unblocks key-column schema evolution
    assert(t.renameColumn("message_id", "mid") > 0)
    assert(t.toDF(spark).filter(col("mid") === 55L)
      .head().getString(t.schema.fieldIndex("data")) == "v2")
    // nothing left to convert
    assert(t.convertEqualityDeletes(spark) == -1L)
  }

  test("convertEqualityDeletes: min_eq_files threshold gates the run; " +
      "seq-scoped conversion retires only the oldest debt with exact " +
      "visibility throughout") {
    val t = newTable("eq-convert-scoped")
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 100, bucket(0), seed = 8), t, 3))
    assert(upsert(t, 10L until 20L, "g0", epoch = 0) > 0)
    assert(upsert(t, 30L until 40L, "g1", epoch = 1) > 0)
    assert(upsert(t, 15L until 35L, "g2", epoch = 2) > 0)
    val eqs = t.deleteFilesMeta().filter(_.kind == DeleteFileMeta.KindEq)
    assert(eqs.size == 3)
    val before = t.toDF(spark).select("message_id", "data")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // threshold: debt (3) below the bar (4) → no-op, inventory untouched
    assert(t.convertEqualityDeletes(spark, minEqFiles = 4) == -1L)
    assert(t.deleteFilesMeta().count(_.kind == DeleteFileMeta.KindEq) == 3)
    // seq-scope: retire the two oldest entries only; g2's entry stays
    val cut = eqs.map(_.seq).sorted.apply(1)
    assert(t.convertEqualityDeletes(spark, maxSeq = Some(cut),
      minEqFiles = 3) > 0)
    val left = t.refresh().deleteFilesMeta()
      .filter(_.kind == DeleteFileMeta.KindEq)
    assert(left.size == 1 && left.head.seq > cut,
      s"seq-scope retired the wrong entries: $left")
    // visibility exact mid-retirement: pos marks cover what the retired
    // entries did, the surviving newer entry still covers the rest
    val mid = t.toDF(spark).select("message_id", "data")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(mid == before, "scoped conversion changed visible rows")
    // the remainder converts; the table ends eq-free and unchanged
    assert(t.convertEqualityDeletes(spark) > 0)
    assert(!t.refresh().deleteFilesMeta()
      .exists(_.kind == DeleteFileMeta.KindEq))
    val after = t.toDF(spark).select("message_id", "data")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before, "full conversion changed visible rows")
  }

  test("skipDeleteApplication read option exposes masked rows — the " +
      "maintenance-scan contract conversion relies on") {
    val t = newTable("eq-skip")
    t.append(LakeWriter.writeDataFiles(
      LakeWriter.generateBatch(spark, 20, bucket(0), seed = 9), t))
    assert(upsert(t, 0L until 5L, "nv", epoch = 0) > 0)
    assert(t.deleteWhereMoR(spark, col("message_id") === 10L) > 0)
    // default scan: eq masks the 5 older versions, pos mask hides key 10
    assert(spark.read.format("laketable").load(t.location).count() == 19)
    // skip scan: every PHYSICAL row — 20 originals + 5 upsert versions —
    // including the rows both delete kinds would hide
    val rawDf = spark.read.format("laketable")
      .option("skipDeleteApplication", "true").load(t.location)
    assert(rawDf.count() == 25)
    assert(rawDf.filter(col("message_id") === 10L).count() == 1)
    assert(rawDf.filter(col("message_id") < 5L).count() == 10)
    // _file/_pos still served (row path) under skip
    assert(rawDf.select("_file", "_pos").distinct().count() == 25)
  }
}
