package graft.queries

/** Round-16 measurement harness (not on the bench path). Unlike Probe15
  * (r15 ADVICE), every machine-specific location is a system property:
  *   -Dgraft.probe.dir=...    data dir      (default /root/testdata/sf0.1)
  *   -Dgraft.probe.plans=...  plan out dir  (default /root/repo/plans/r16)
  *   -Dgraft.probe.cpus=N     local cores + shuffle partitions (default 32)
  * Adds what r15 lacked: a per-stage task-metrics listener (GC time, spill,
  * peak execution memory, shuffle bytes) so a wall that moves splits into
  * bytes-moved vs time-per-byte vs memory-thrash — the d02_phrase_zipf
  * 32-core collapse is exactly the shape only these metrics can adjudicate.
  */
object Probe16 {
  import org.apache.spark.sql._
  import org.apache.spark.sql.functions._
  import org.apache.spark.scheduler._
  import java.util.concurrent.ConcurrentLinkedQueue

  val dir = sys.props.getOrElse("graft.probe.dir", "/root/testdata/sf0.1")
  val plansDir = sys.props.getOrElse("graft.probe.plans", "/root/repo/plans/r16")
  val cpus = sys.props.getOrElse("graft.probe.cpus", "32")

  lazy val spark = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("probe16")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.sources.useV1SourceList", "")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  final case class StageRow(id: Int, name: String, wallMs: Long, tasks: Int,
      gcMs: Long, spillMemMb: Long, spillDiskMb: Long, peakExecMb: Long,
      shufReadMb: Long, shufWriteMb: Long, inputMb: Long)

  object StageProbe extends SparkListener {
    val rows = new ConcurrentLinkedQueue[StageRow]()
    private val gc = new java.util.concurrent.atomic.AtomicLong
    private val spillM = new java.util.concurrent.atomic.AtomicLong
    private val spillD = new java.util.concurrent.atomic.AtomicLong
    private val peak = new java.util.concurrent.atomic.AtomicLong
    private val byStage =
      new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        val a = byStage.computeIfAbsent(e.stageId, _ => new Array[Long](7))
        a.synchronized {
          a(0) += m.jvmGCTime
          a(1) += m.memoryBytesSpilled
          a(2) += m.diskBytesSpilled
          a(3) = math.max(a(3), m.peakExecutionMemory)
          a(4) += m.shuffleReadMetrics.totalBytesRead
          a(5) += m.shuffleWriteMetrics.bytesWritten
          a(6) += m.inputMetrics.bytesRead
        }
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val a = byStage.remove(si.stageId)
      if (a != null) {
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        rows.add(StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(60),
          wall, si.numTasks, a(0), a(1) >> 20, a(2) >> 20, a(3) >> 20,
          a(4) >> 20, a(5) >> 20, a(6) >> 20))
      }
    }
    def reset(): Unit = { rows.clear(); byStage.clear() }
    def report(top: Int = 12): Unit = {
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(-_.wallMs)
      println(f"[stages] n=${all.size} wallSum=${all.map(_.wallMs).sum / 1e3}%.2fs " +
        f"gcSum=${all.map(_.gcMs).sum / 1e3}%.2fs " +
        f"spillDiskSum=${all.map(_.spillDiskMb).sum}MB")
      all.take(top).foreach { r =>
        println(f"[stage ${r.id}%4d] ${r.wallMs / 1e3}%7.2fs tasks=${r.tasks}%3d " +
          f"gc=${r.gcMs / 1e3}%6.2fs spillM=${r.spillMemMb}%5dMB spillD=${r.spillDiskMb}%5dMB " +
          f"peak=${r.peakExecMb}%5dMB sr=${r.shufReadMb}%4dMB sw=${r.shufWriteMb}%4dMB " +
          f"in=${r.inputMb}%4dMB ${r.name}")
      }
    }
  }

  def gcWall(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum / 1e3
  }

  def init(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(StageProbe)
  }

  def time[T](tag: String)(f: => T): T = {
    val g0 = gcWall()
    val t0 = System.nanoTime
    val r = f
    println(f"[t] $tag%-44s ${(System.nanoTime - t0) / 1e9}%8.3f s " +
      f"(jvm gc ${gcWall() - g0}%6.2f s)")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def docs: DataFrame =
    graft.Tables.t(spark, dir, "documents").select(col("doc_id"), col("text"))

  val P = PipelineQueries

  def fullEntry(name: String, stages: Boolean = false): Double = {
    if (stages) StageProbe.reset()
    val t0 = System.nanoTime
    graft.SparkEntry.queries(name)(spark, dir)
      .write.mode("overwrite").format("noop").save()
    val w = (System.nanoTime - t0) / 1e9
    println(f"[t] entry $name $w%8.3f s")
    spark.sqlContext.clearCache()
    if (stages) StageProbe.report()
    w
  }

  def capturePlan(name: String, df: DataFrame, tag: String): Unit = {
    new java.io.File(plansDir).mkdirs()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$plansDir/${name}_$tag.txt"),
      p.getBytes("UTF-8"))
    println(s"[plan] $name -> ${name}_$tag.txt")
  }

  def main(args: Array[String]): Unit = {
    init()
    args.headOption.getOrElse("help") match {
      case "entry" =>
        val n = args.lift(2).flatMap(_.toIntOption).getOrElse(3)
        for (i <- 1 to n) fullEntry(args(1), stages = i == n)
      case "entries" =>
        // run a comma-separated list, 3 reps each, no stage dump
        args(1).split(",").foreach { e =>
          for (_ <- 1 to 3) fullEntry(e)
        }
      case other =>
        println(s"unknown probe command: $other")
    }
    spark.stop()
  }
}
