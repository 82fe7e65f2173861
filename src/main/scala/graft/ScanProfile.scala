package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic main for the DSv2-scan-vs-raw-parquet gap
  * (VERDICT r5 #6): times planning (df.queryExecution.executedPlan) and
  * execution separately for both sides, prints task counts, and dumps the
  * formatted plans so the physical difference is visible.
  */
object ScanProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-scan-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.lake._
    val loc = s"${System.getProperty("java.io.tmpdir")}/graft-scan-profile-${java.util.UUID.randomUUID()}"
    val table = LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec)
    for (i <- 0 until 4)
      table.append(LakeWriter.writeDataFiles(
        LakeWriter.generateBatch(spark, 100000, (5666666L + i) * 300000000L, seed = 200 + i),
        table, filesPerPartition = 4))
    val paths = table.files().map(_.path)
    println(s"files=${paths.size} bytes=${table.files().map(_.sizeBytes).sum}")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(avg(length(col("data"))).as("avg_len"),
        avg(col("message_id")).as("avg_id"),
        sum(length(col("message_body"))).as("body_bytes"))
    def profile(name: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      // warmup
      agg(mk).write.mode("overwrite").format("noop").save()
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val df = agg(mk)
        val plan = df.queryExecution.executedPlan // force analysis+planning
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6)
      }
      val (plans, execs) = runs.unzip
      println(f"$name%-12s plan_ms=${plans.min}%.1f exec_ms=${execs.min}%.1f " +
        f"(plan runs: ${plans.map(p => f"$p%.0f").mkString(",")} " +
        f"exec runs: ${execs.map(e => f"$e%.0f").mkString(",")})")
    }
    def lakeDf = spark.read.format("laketable").load(loc)
    def rawDf = spark.read.schema(table.schema).parquet(paths: _*)
    profile("lake", lakeDf)
    profile("raw", rawDf)
    profile("lake2", lakeDf)
    profile("raw2", rawDf)
    println("=== lake plan ===")
    println(agg(lakeDf).queryExecution.executedPlan.toString.take(3000))
    println("=== raw plan ===")
    println(agg(rawDf).queryExecution.executedPlan.toString.take(3000))
    LakeTable.drop(loc)
    spark.stop()
  }
}
