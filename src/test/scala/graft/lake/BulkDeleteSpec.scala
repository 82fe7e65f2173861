package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}

/** The batched physical-deletion seam ([[BulkDelete]]) behind the two
  * maintenance sweeps: default = parallel per-file (all the FileSystem
  * API offers), store-native batch impls register per scheme — so a 10⁶-
  * orphan sweep on an object store pays thousands of batch requests, not
  * millions of per-file round-trips. Tests drive the REAL sweeps over
  * [[MockObjectStoreFileSystem]] with a counting impl installed and
  * assert (1) every physical delete routes through the seam, (2) the
  * call count is batch-shaped (one call per category / per task, never
  * per file), and (3) resolution falls back to the parallel default.
  */
class BulkDeleteSpec extends SparkSpec {

  private val Width = 300000000L
  private def bucket(i: Int): Long = (5666666L + i) * Width

  /** Counting pass-through: records (calls, paths) then delegates. */
  private final class Counting extends BulkDelete {
    val calls = new java.util.concurrent.atomic.AtomicLong
    val paths = new java.util.concurrent.atomic.AtomicLong
    override def deleteAll(fs: FileSystem, ps: Seq[Path]): Unit = {
      calls.incrementAndGet()
      paths.addAndGet(ps.size)
      BulkDelete.Parallel.deleteAll(fs, ps)
    }
  }

  test("unregistered schemes resolve to the parallel per-file default") {
    BulkDelete.unregister("mocks3")
    val localFs = new Path(tmpDir("bulk-default"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(BulkDelete.forFs(localFs) eq BulkDelete.Parallel)
  }

  test("snapshot expiry GCs through the seam: batch-shaped calls, files gone") {
    val counting = new Counting
    BulkDelete.register("mocks3", counting)
    try {
      val loc = "mocks3:" + tmpDir("bulk-expire")
      LakeTable.drop(loc)
      val t = LakeTable.create(loc, LakeWriter.EventSchemaDdl,
        LakeWriter.EventSpec)
      // base, then a rolled-past snapshot carrying 8 files only IT
      // references — expiry must GC those 8 data files + their manifest
      val sA = t.append(LakeWriter.writeDataFiles(
        LakeWriter.generateBatch(spark, 50, bucket(1), seed = 2), t))
      val baseFiles = t.files(sA).map(_.path).toSet
      val s1 = t.append(LakeWriter.writeDataFiles(
        LakeWriter.generateBatch(spark, 200, bucket(0), seed = 1), t, 8))
      val s1Files = t.files(s1).map(_.path).filterNot(baseFiles)
      assert(s1Files.size >= 4) // ~8 requested; empty splits are skipped
      t.rollbackTo(sA) // s1's files leave the current lineage
      t.append(LakeWriter.writeDataFiles(
        LakeWriter.generateBatch(spark, 50, bucket(2), seed = 4), t))
      assert(t.expireSnapshots(Long.MaxValue, retainLast = 2) > 0)
      val fs = new Path(loc).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(s1Files.forall(p => !fs.exists(new Path(p))),
        "expired snapshot's files must be physically gone")
      assert(counting.paths.get() >= s1Files.size + 1, // data + >=1 manifest
        s"expected >=${s1Files.size + 1} seam-deleted paths, " +
          s"got ${counting.paths.get()}")
      // batch-shaped: one call per non-empty category (data files,
      // manifests[, delete files, delete manifests]) — never per file
      assert(counting.calls.get() <= 4,
        s"expected <=4 seam calls, got ${counting.calls.get()}")
    } finally BulkDelete.unregister("mocks3")
  }

  test("orphan sweep deletes through the seam: one call per task haul") {
    val counting = new Counting
    BulkDelete.register("mocks3", counting)
    try {
      val loc = "mocks3:" + tmpDir("bulk-orphan")
      LakeTable.drop(loc)
      val t = LakeTable.create(loc, LakeWriter.EventSchemaDdl,
        LakeWriter.EventSpec)
      t.append(LakeWriter.writeDataFiles(
        LakeWriter.generateBatch(spark, 50, bucket(0), seed = 3), t))
      // plant 6 crash-abandoned orphans next to the committed file
      val fs = new Path(loc).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val bucketDir = new Path(t.files().head.path).getParent
      val orphans = (0 until 6).map { i =>
        val p = new Path(bucketDir, s"orphan-$i.parquet")
        val out = fs.create(p, true)
        try out.write(Array[Byte](1, 2, 3)) finally out.close()
        p
      }
      // dry run first: identical count, nothing touched, seam never called
      val audit = t.removeOrphanFiles(spark,
        System.currentTimeMillis() + 60000, dryRun = true)
      assert(audit.deletedCount == 6)
      assert(orphans.forall(fs.exists), "dry run must not delete")
      assert(counting.paths.get() == 0, "dry run must not reach the seam")
      val swept = t.removeOrphanFiles(spark, System.currentTimeMillis() + 60000)
      assert(swept.deletedCount == 6, s"expected 6 orphans, got $swept")
      assert(orphans.forall(p => !fs.exists(p)))
      assert(t.toDF(spark).count() == 50) // committed data untouched
      assert(counting.paths.get() == 6)
      // one seam call per task that actually held orphans (≤6 when the
      // shuffle scatters all six paths to distinct tasks), each carrying
      // its task's whole haul
      assert(counting.calls.get() >= 1 && counting.calls.get() <= 6)
    } finally BulkDelete.unregister("mocks3")
  }
}
