package graft.queries

object Probe15 {
  import org.apache.spark.sql._
  import org.apache.spark.sql.functions._

  // r15 ADVICE: dirs/core-count were machine-specific literals shipped in
  // src/main — now system properties with the same local defaults
  private val cpus = sys.props.getOrElse("graft.probe.cpus", "32")

  lazy val spark = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("probe15")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.sources.useV1SourceList", "")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def init(): Unit = { spark.sparkContext.setLogLevel("WARN") }

  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime
    val r = f
    println(f"[t] $tag%-40s ${(System.nanoTime - t0) / 1e9}%8.3f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  val dir = sys.props.getOrElse("graft.probe.dir", "/root/testdata/sf0.1")

  def docs: DataFrame =
    graft.Tables.t(spark, dir, "documents").select(col("doc_id"), col("text"))

  val P = PipelineQueries

  // d02_phrase_zipf build decomposition
  def rdocs: DataFrame = docs
    .crossJoin(broadcast(spark.range(0, P.ZipfPhraseReplicas).toDF("ri")))
    .withColumn("doc_id", col("doc_id") + col("ri") * lit(P.ZipfPhraseShift))
    .select("doc_id", "text")

  def phraseZipfParts(): Unit = {
    time("rdocs scan only")(noop(rdocs))
    time("zipfTokens(rdocs)")(noop(P.zipfTokens(rdocs)))
    time("zipfPositionalPostings(rdocs)")(noop(P.zipfPositionalPostings(rdocs)))
    val keyed = P.zipfPositionalPostings(rdocs)
      .withColumn("thash", xxhash64(col("term")))
      .withColumn("tkey", pmod(col("thash"), lit(16L)))
      .select("tkey", "thash", "term", "doc_id", "tf", "dl", "positions")
    time("keyed (thash+tkey)")(noop(keyed))
    val withPart = keyed.withColumn("__part", col("tkey"))
    time("repart+sort (write shape)")(noop(
      withPart.repartition(col("__part"))
        .sortWithinPartitions(col("__part"), col("thash"))))
  }

  def phraseVariants(): Unit = {
    val zt = P.zipfTokens(rdocs)
    println("rows=" + zt.count())
    val base = rdocs.repartition(col("doc_id"))
      .selectExpr("doc_id", "posexplode(split(text, ' ')) AS (pos, term)",
        "CAST(size(split(text, ' ')) AS BIGINT) AS dl")
    time("explode only")(noop(base))
    time("explode+xxhash u")(noop(base.withColumn("u",
      xxhash64(col("doc_id"), col("pos")))))
    time("explode+md5 str")(noop(base.withColumn("m",
      md5(concat(col("doc_id"), lit(":"), col("pos"))))))
    time("explode+md5+conv")(noop(base.withColumn("u", expr(
      "CAST(conv(substring(md5(concat(doc_id, ':', pos)), 1, 15), 16, 10) AS BIGINT)"))))
    time("full zipfTokens")(noop(zt))
    val base64 = rdocs.repartition(64, col("doc_id"))
      .selectExpr("doc_id", "posexplode(split(text, ' ')) AS (pos, term)",
        "CAST(size(split(text, ' ')) AS BIGINT) AS dl")
    time("explode only, repartition(64)")(noop(base64))
    val zt64 = rdocs.repartition(64, col("doc_id"))
      .selectExpr("doc_id", "posexplode(split(text, ' ')) AS (pos, term)",
        "CAST(size(split(text, ' ')) AS BIGINT) AS dl")
      .withColumn("u", expr(
        "CAST(conv(substring(md5(concat(doc_id, ':', pos)), 1, 15), " +
          "16, 10) AS BIGINT)"))
      .withColumn("zterm", expr(
        "concat(term, '~', shiftleft(1L, CAST(u % 10 AS INT)) + " +
          "(u DIV 10) % shiftleft(1L, CAST(u % 10 AS INT)))"))
    time("full zipfTokens, repartition(64)")(noop(zt64))
  }

  def others(): Unit = {
    val d = docs
    time("shingleHashes (as-is)")(noop(P.shingleHashes(d)))
    val dPar = d.repartition(64, col("doc_id"))
    time("shingleHashes (repart 64)")(noop(P.shingleHashes(dPar)))
    time("md5MinhashSigs (as-is)")(noop(P.md5MinhashSigs(d)))
    time("md5MinhashSigs (repart 64)")(noop(P.md5MinhashSigs(dPar)))
    time("bm25Postings (as-is)")(noop(P.bm25Postings(d)))
    time("bm25Postings (repart 64)")(noop(P.bm25Postings(dPar)))
  }

  def cluster(): Unit = {
    val pairs = time("lsh pairs")(
      { val p = P.d03_minhash_lsh(spark, dir).select("a_id", "b_id"); noop(p); p })
    val cc = time("connectedComponents")(P.connectedComponents(pairs))
    println("rounds=" + P.lastCcRounds)
    time("final orderBy+noop")(noop(
      cc.select(col("id").as("doc_id"), col("comp").as("cluster"))
        .withColumn("keeper", col("doc_id") === col("cluster"))
        .orderBy("doc_id")))
    spark.sqlContext.clearCache()
  }

  def ccSteps(): Unit = {
    val pairs = P.d03_minhash_lsh(spark, dir).select("a_id", "b_id")
    val session = spark
    val edges = time("edges cache+count")({
      val e = pairs.select(explode(array(
          struct(col("a_id").as("src"), col("b_id").as("dst")),
          struct(col("b_id").as("src"), col("a_id").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst")).cache()
      e.count(); e
    })
    var comp = edges.groupBy(col("src").as("id"))
      .agg(least(col("src"), min("dst")).as("comp"))
    var rounds = 0
    var changed = 1L
    var pinned: Option[DataFrame] = None
    while (changed > 0 && rounds < 10) {
      val t0 = System.nanoTime
      val neighborMin = edges
        .join(comp.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
        .groupBy(col("src")).agg(min("ncomp").as("nmin"))
      val propagated = comp
        .join(neighborMin.select(col("src").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("mid"))
      val jt = propagated.select(col("id").as("jid"), col("mid").as("jmid"))
      val jumped = propagated.join(jt, propagated("mid") === jt("jid"), "left")
        .select(propagated("id"), col("prev"),
          coalesce(col("jmid"), col("mid")).as("comp"))
        .persist()
      changed = jumped.filter(col("comp") =!= col("prev")).count()
      pinned.foreach(_.unpersist())
      pinned = Some(jumped)
      val labels = jumped.select(col("id"), col("comp"))
      comp = session.createDataFrame(labels.rdd, labels.schema)
      rounds += 1
      println(f"[t] cc round $rounds (changed=$changed) ${(System.nanoTime - t0) / 1e9}%8.3f s")
    }
    val out = time("scratch persist")(Scratch.persist(comp, "cc"))
    pinned.foreach(_.unpersist())
    edges.unpersist()
    time("out noop")(noop(out))
    spark.sqlContext.clearCache()
  }

  def capturePlans(tag: String): Unit = {
    val outDir = sys.props.getOrElse("graft.probe.plans", "/root/repo/plans/r15")
    new java.io.File(outDir).mkdirs()
    def w(name: String, df: DataFrame): Unit = {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        p.getBytes("UTF-8"))
      println(s"[plan] $name -> ${name}_$tag.txt")
    }
    w("zipf_expansion", P.zipfPositionalPostings(rdocs))
    w("shingle_hashes", P.shingleHashes(docs))
    w("minhash_sigs", P.md5MinhashSigs(docs))
    w("bm25_postings", P.bm25Postings(docs))
    w("d02_bm25_topk", graft.SparkEntry.queries("d02_bm25_topk")(spark, dir))
    w("d04_quality_lr", graft.SparkEntry.queries("d04_quality_lr")(spark, dir))
    w("d03_boilerplate", graft.SparkEntry.queries("d03_boilerplate")(spark, dir))
    w("d03_minhash_lsh", graft.SparkEntry.queries("d03_minhash_lsh")(spark, dir))
    // the write-side clustering shape writeDataFiles produces (per-bucket
    // repartition + sortWithinPartitions), as fed to the parquet writer
    val keyed = P.bm25Keyed(P.bm25Postings(docs))
      .withColumn("__part", col("tkey") - pmod(col("tkey"), lit(1L)))
    val repartitioned = keyed.repartition(
      spark.sessionState.conf.numShufflePartitions, col("__part"))
    w("writeDataFiles_cluster",
      repartitioned.sortWithinPartitions(col("__part"), col("thash")))
  }

  def capturePlansBefore(tag: String): Unit = {
    // pre-change shapes, reconstructed: keyless REPARTITION_BY_COL
    val outDir = sys.props.getOrElse("graft.probe.plans", "/root/repo/plans/r15")
    new java.io.File(outDir).mkdirs()
    def w(name: String, df: DataFrame): Unit = {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        p.getBytes("UTF-8"))
      println(s"[plan] $name -> ${name}_$tag.txt")
    }
    w("writeDataFiles_cluster",
      P.bm25Keyed(P.bm25Postings(docs))
        .withColumn("__part", col("tkey") - pmod(col("tkey"), lit(1L)))
        .repartition(col("__part"))
        .sortWithinPartitions(col("__part"), col("thash")))
  }

  def main(args: Array[String]): Unit = {
    init()
    args.headOption.getOrElse("phrase") match {
      case "plans" => capturePlans(args(1))
      case "plansbefore" => capturePlansBefore(args(1))
      case "phrase" =>
        phraseZipfParts()
        phraseZipfParts()  // second pass: warm numbers
      case "variants" =>
        phraseVariants(); phraseVariants()
      case "others" =>
        others(); others()
      case "cluster" =>
        cluster(); cluster()
      case "ccsteps" =>
        ccSteps(); ccSteps()
      case "fanwidth" =>
        for (_ <- 1 to 2) {
          for (n <- Seq(32, 64, 96)) {
            val zt = rdocs.repartition(n, col("doc_id"))
              .selectExpr("doc_id", "posexplode(split(text, ' ')) AS (pos, term)",
                "CAST(size(split(text, ' ')) AS BIGINT) AS dl")
              .withColumn("u", expr(
                "CAST(conv(substring(md5(concat(doc_id, ':', pos)), 1, 15), " +
                  "16, 10) AS BIGINT)"))
              .withColumn("zterm", expr(
                "concat(term, '~', shiftleft(1L, CAST(u % 10 AS INT)) + " +
                  "(u DIV 10) % shiftleft(1L, CAST(u % 10 AS INT)))"))
            time(s"zipfTokens n=$n")(noop(zt))
            val sh = docs.filter(length(col("text")) >= 40)
              .repartition(n, col("doc_id"))
              .select(col("doc_id"),
                explode(sequence(lit(0), length(col("text")) - 40)).as("p"),
                col("text"))
              .select(col("doc_id"), col("p").cast("long").as("p"),
                expr("CAST(conv(substring(md5(substring(text, p + 1, 40)), 1, 15)" +
                  ", 16, 10) AS BIGINT)").as("shash"))
            time(s"shingles n=$n")(noop(sh))
          }
        }
      case "substr" =>
        for (_ <- 1 to 3) {
          fullEntry("d01_substring_index")
          println(f"[t]   build=${LakeQueries.lastSubstrBuildS}%.2f " +
            f"gate=${LakeQueries.lastSubstrGateServeS}%.2f " +
            f"maint=${LakeQueries.lastSubstrMaintS}%.2f")
        }
      case name =>
        fullEntry(name); fullEntry(name); fullEntry(name)
    }
    spark.stop()
  }

  def fullEntry(name: String): Unit = {
    val t0 = System.nanoTime
    graft.SparkEntry.queries(name)(spark, dir)
      .write.mode("overwrite").format("noop").save()
    println(f"[t] entry $name ${(System.nanoTime - t0) / 1e9}%8.3f s")
    spark.sqlContext.clearCache()
  }
}
