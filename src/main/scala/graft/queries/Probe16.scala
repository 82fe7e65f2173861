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

  def rdocs: DataFrame = docs
    .crossJoin(broadcast(spark.range(0, P.ZipfPhraseReplicas).toDF("ri")))
    .withColumn("doc_id", col("doc_id") + col("ri") * lit(P.ZipfPhraseShift))
    .select("doc_id", "text")

  /** Window-based positional assembly: ONE sort per partition key group,
    * bounded per-group memory, list pre-sorted by the window order —
    * replaces the double ObjectHashAggregate (partial+final collect_list)
    * whose object buffers churn GC on nearly-unique group keys. */
  def zipfPosWindow(in: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id", "zterm").orderBy("pos")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    P.zipfTokens(in)
      .withColumn("rn", row_number().over(w))
      .withColumn("tf", count(lit(1)).over(wAll))
      .withColumn("positions", collect_list(col("pos").cast("long")).over(wAll))
      .filter(col("rn") === 1)
      .select(col("zterm").as("term"), col("doc_id"), col("tf"),
        col("dl"), col("positions"))
  }

  def phrase16(): Unit = {
    time("V1 zipfTokens only")(noop(P.zipfTokens(rdocs)))
    for (i <- 1 to 2) {
      StageProbe.reset()
      time(s"V0 groupBy collect_list #$i")(noop(P.zipfPositionalPostings(rdocs)))
      if (i == 2) StageProbe.report(6)
    }
    for (i <- 1 to 2) {
      StageProbe.reset()
      time(s"V2 window assembly #$i")(noop(zipfPosWindow(rdocs)))
      if (i == 2) StageProbe.report(6)
    }
    // V3: pure hash object agg (no sort-based fallback) for reference
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "100000000")
    for (i <- 1 to 2)
      time(s"V3 hash-only collect_list #$i")(noop(P.zipfPositionalPostings(rdocs)))
    spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
  }

  def main(args: Array[String]): Unit = {
    init()
    args.headOption.getOrElse("help") match {
      case "phrase16" => phrase16()
      case "aboverlap" =>
        val e = args(1)
        for (_ <- 1 to 3) fullEntry(e)
        sys.props("graft.nooverlap") = "1"
        println(s"[ab] $e -> sequential")
        for (_ <- 1 to 3) fullEntry(e)
        sys.props.remove("graft.nooverlap")
        println(s"[ab] $e -> overlap again")
        for (_ <- 1 to 3) fullEntry(e)
      case "abwrite" =>
        // A/B the no-sort write-clustering policy in ONE JVM (same-epoch
        // rule): pinned 32-way vs AQE-coalescible, 3 reps each, per entry
        val entries = args(1).split(",")
        for (e <- entries) {
          for (_ <- 1 to 3) fullEntry(e) // warm + pinned baseline
          sys.props("graft.write.aqeCluster") = "1"
          println(s"[ab] $e -> aqeCluster")
          for (_ <- 1 to 3) fullEntry(e)
          sys.props.remove("graft.write.aqeCluster")
          println(s"[ab] $e -> pinned again")
          for (_ <- 1 to 2) fullEntry(e)
        }
      case "ccplans" =>
        // one fixpoint round's physical shape: r15 join+agg+left-join form
        // (reconstructed) vs the r16 fused union+aggregate form
        val pairs = P.d03_minhash_lsh(spark, dir).select("a_id", "b_id")
        val edges = pairs.select(explode(array(
            struct(col("a_id").as("src"), col("b_id").as("dst")),
            struct(col("b_id").as("src"), col("a_id").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        val comp = edges.groupBy(col("src").as("id"))
          .agg(least(col("src"), min("dst")).as("comp"))
        val neighborMin = edges
          .join(comp.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
          .groupBy(col("src")).agg(min("ncomp").as("nmin"))
        val before = comp
          .join(neighborMin.select(col("src").as("id"), col("nmin")),
            Seq("id"), "left")
          .select(col("id"), col("comp").as("prev"),
            least(col("comp"), coalesce(col("nmin"), col("comp"))).as("mid"))
        capturePlan("cc_round", before, "before")
        val after = edges
          .join(comp.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
          .select(col("src").as("id"), col("ncomp").as("cand"),
            lit(null).cast("long").as("lbl"))
          .unionByName(comp.select(col("id"), col("comp").as("cand"),
            col("comp").as("lbl")))
          .groupBy("id")
          .agg(min("cand").as("mid"), max("lbl").as("prev"))
          .select(col("id"), col("prev"), col("mid"))
        capturePlan("cc_round", after, "after")
      case "writestats" =>
        // plan-time sizeInBytes estimates for representative write inputs
        def st(tag: String, df: DataFrame): Unit =
          println(f"[est] $tag%-28s ${df.queryExecution.optimizedPlan.stats.sizeInBytes}")
        val e = graft.Tables.t(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        st("emb_filter400", e.filter(col("vec_id") < 400))
        st("emb_full", e)
        st("docs", docs)
        st("bm25Postings(docs)", P.bm25Postings(docs))
        st("zipfPositional(rdocs)", P.zipfPositionalPostings(rdocs)
          .withColumn("thash", xxhash64(col("term")))
          .withColumn("tkey", pmod(col("thash"), lit(16L))))
        st("genBatch25k", graft.lake.LakeWriter.generateBatch(spark, 25000,
          5666666L * 300000000L, seed = 0))
        st("shingle distinct", P.shingleHashes(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0))
          .select("shash").distinct())
        st("minhash bands distinct", P.explodeBands(P.md5MinhashSigs(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0)))
          .select("band", "h0", "h1").distinct())
      case "plans16" =>
        // before = the r15 groupBy collect_list shape (reconstructed);
        // after = the code's current window assembly
        val before = P.zipfTokens(rdocs)
          .groupBy(col("doc_id"), col("zterm"))
          .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"),
            sort_array(collect_list(col("pos").cast("long"))).as("positions"))
          .select(col("zterm").as("term"), col("doc_id"), col("tf"),
            col("dl"), col("positions"))
        capturePlan("zipf_expansion", before, "before")
        capturePlan("zipf_expansion", P.zipfPositionalPostings(rdocs), "after")
        capturePlan("positional_postings", P.positionalPostings(docs), "after")
      case "phraseeq" =>
        // exact-equality gate: V2 must reproduce V0 row-for-row
        def canon(df: DataFrame): Array[String] =
          df.select(col("term"), col("doc_id"), col("tf"), col("dl"),
              concat_ws(",", col("positions").cast("array<string>")).as("p"))
            .collect().map(_.mkString("|")).sorted
        val a = canon(P.zipfPositionalPostings(rdocs))
        val b = canon(zipfPosWindow(rdocs))
        println(s"[eq] rows a=${a.length} b=${b.length} equal=${a.sameElements(b)}")
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
