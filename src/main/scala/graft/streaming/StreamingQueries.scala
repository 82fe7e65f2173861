package graft.streaming

import java.util.UUID

import graft.Tables.{t, us}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** SURVEY.md §2 Part C (C10–C16) — Structured Streaming surface.
  *
  * Each query replays the driver `events` table through a file-source
  * stream (deterministic: fixed input, AvailableNow trigger, memory sink)
  * and must equal the equivalent batch query — which is exactly what the
  * DuckDB oracle computes. This is the batch-equivalence test strategy of
  * SURVEY §5.4, wired straight into the correctness gate.
  */
object StreamingQueries {

  /** Write the events table as parquet replay input; returns the dir. */
  private def replayDir(s: SparkSession, dir: String, nFiles: Int): String = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-replay-${UUID.randomUUID()}"
    t(s, dir, "events").repartition(nFiles).write.parquet(tmp)
    tmp
  }

  /** Run a streaming transform of the replayed events to completion and
    * return the memory-sink contents.
    */
  private def runStream(s: SparkSession, dir: String, mode: OutputMode,
      nFiles: Int = 4)(transform: DataFrame => DataFrame): DataFrame = {
    val in = replayDir(s, dir, nFiles)
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-ckpt-${UUID.randomUUID()}"
    val name = "m" + UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream
      .schema(t(s, dir, "events").schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(in)
    val q = transform(stream).writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = s.table(name).cache()
    out.count()
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(in))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
    out
  }

  // C10 — tumbling-window aggregate (5-minute windows, epoch-aligned like
  // the reference's truncate transform).
  def c10_stream_tumbling(s: SparkSession, dir: String): DataFrame =
    runStream(s, dir, OutputMode.Complete()) { ev =>
      ev.groupBy(window(col("ts"), "5 minutes")).agg(count(lit(1)).as("n"))
    }.select(us(col("window.start")).as("w_us"), col("n"))
      .orderBy("w_us")

  // C11 — sliding-window aggregate (10-minute window, 5-minute slide).
  def c11_stream_sliding(s: SparkSession, dir: String): DataFrame =
    runStream(s, dir, OutputMode.Complete()) { ev =>
      ev.groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"))
    }.select(us(col("window.start")).as("w_us"), col("n"))
      .orderBy("w_us")

  // C12 — session windows (30-minute gap) per user.
  def c12_stream_session(s: SparkSession, dir: String): DataFrame =
    runStream(s, dir, OutputMode.Complete()) { ev =>
      ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
    }.select(col("user_id"), us(col("session_window.start")).as("session_start_us"),
        col("n"))
      .orderBy("user_id", "session_start_us")

  // C15 — stream-static join: enrich the event stream with the nation dim.
  def c15_stream_static_join(s: SparkSession, dir: String): DataFrame = {
    val nation = t(s, dir, "nation")
    runStream(s, dir, OutputMode.Complete()) { ev =>
      ev.join(nation, pmod(col("user_id"), lit(25)) === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"))
    }.orderBy("n_name")
  }

  // C16 — arbitrary stateful op: running per-user counter via
  // flatMapGroupsWithState; emits final counts (single-pass replay).
  def c16_stream_stateful(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // single input file → one micro-batch → one emission per key
    runStream(s, dir, OutputMode.Append(), nFiles = 1) { ev =>
      ev.selectExpr("user_id").as[Long]
        .groupByKey(identity)
        .flatMapGroupsWithState[Long, (Long, Long)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (uid: Long, rows: Iterator[Long], state: GroupState[Long]) =>
            val total = state.getOption.getOrElse(0L) + rows.size
            state.update(total)
            Iterator.single((uid, total))
        }.toDF("user_id", "n")
    }.orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c10_stream_tumbling" -> c10_stream_tumbling _,
    "c11_stream_sliding" -> c11_stream_sliding _,
    "c12_stream_session" -> c12_stream_session _,
    "c15_stream_static_join" -> c15_stream_static_join _,
    "c16_stream_stateful" -> c16_stream_stateful _,
  )

  val oracle: Map[String, String] = Map(
    "c10_stream_tumbling" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 300000000 AS w_us, COUNT(*) AS n
        |FROM events GROUP BY w_us ORDER BY w_us""".stripMargin,
    "c11_stream_sliding" ->
      """SELECT w_us, COUNT(*) AS n FROM (
        |  SELECT epoch_us(ts) - epoch_us(ts) % 300000000 - i * 300000000 AS w_us
        |  FROM events, generate_series(0, 1) g(i))
        |GROUP BY w_us ORDER BY w_us""".stripMargin,
    "c12_stream_session" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS tu FROM events),
        |b AS (SELECT user_id, tu,
        |        CASE WHEN LAG(tu) OVER w IS NULL
        |               OR tu - LAG(tu) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        |g AS (SELECT user_id, tu, SUM(brk) OVER
        |        (PARTITION BY user_id ORDER BY tu ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM b)
        |SELECT user_id, MIN(tu) AS session_start_us, COUNT(*) AS n
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,
    "c15_stream_static_join" ->
      """SELECT n_name, COUNT(*) AS n FROM events
        |JOIN nation ON user_id % 25 = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "c16_stream_stateful" ->
      "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id ORDER BY user_id",
  )
}
