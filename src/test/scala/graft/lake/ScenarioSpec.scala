package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scenario test mirroring the reference's run.sh process matrix (SURVEY
  * §5.5, A24): N concurrent writers publishing monikers, one bookkeeper
  * committing sweeps, retention + reaper maintenance — then assert the
  * final table equals everything published, exactly once, with no orphan
  * files after expiry.
  */
class ScenarioSpec extends SparkSpec {
  private val Width = 300000000L
  private def bucket(i: Int): Long = (5666666L + i) * Width

  test("5 writers || bookkeeper || reaper: exact counts, no orphans") {
    val loc = tmpDir("scenario")
    LakeTable.drop(loc)
    val table = LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec)

    // 5 writer threads × 3 iterations × 200 rows, distinct buckets per writer
    val rowsPerBatch = 200
    val writers = (0 until 5).map { w =>
      new Thread(() => {
        for (iter <- 0 until 3) {
          val files = LakeWriter.writeDataFiles(
            LakeWriter.generateBatch(spark, rowsPerBatch,
              bucket(w * 3 + iter), seed = w * 100 + iter), table)
          Monikers.publish(loc, files)
        }
      })
    }
    // bookkeeper thread sweeping concurrently with the writers
    val bk = new FileBookkeeper(table)
    @volatile var writersDone = false
    val keeper = new Thread(() => {
      while (!writersDone || Monikers.listPending(loc).nonEmpty) {
        bk.sweep()
        Thread.sleep(20)
      }
    })
    keeper.start()
    writers.foreach(_.start())
    writers.foreach(_.join())
    writersDone = true
    keeper.join()

    table.refresh()
    val expected = 5L * 3 * rowsPerBatch
    assert(table.toDF(spark).count() == expected)
    // exactly-once: no duplicate (bucket, message_id) pairs
    assert(table.toDF(spark)
      .select("timeperiod_loadedBy", "message_id").distinct().count() == expected)
    assert(Monikers.listPending(loc).isEmpty)

    // retention: drop the first 5 buckets (metadata-only)
    assert(table.deleteOlderThan(bucket(5)) > 0)
    table.refresh()
    assert(table.toDF(spark).count() == expected - 5 * rowsPerBatch)

    // reaper: expire history, keep only the current snapshot → the dropped
    // buckets' files become orphans and are physically deleted
    val dataDir = new java.io.File(s"$loc/data")
    def liveFiles(): Set[String] =
      table.files().map(f => new java.io.File(f.path).getCanonicalPath).toSet
    table.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    table.refresh()
    val onDisk = {
      def walk(d: java.io.File): Seq[java.io.File] =
        d.listFiles().toSeq.flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
      walk(dataDir).filter(_.getName.endsWith(".parquet"))
        .map(_.getCanonicalPath).toSet
    }
    assert(onDisk == liveFiles(), "orphan files left after expiry")
    assert(table.toDF(spark).count() == expected - 5 * rowsPerBatch)
  }
}
