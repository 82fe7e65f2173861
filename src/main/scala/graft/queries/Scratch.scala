package graft.queries

import org.apache.spark.sql.DataFrame

/** Scratch persistence for iterative/multi-consumer intermediates: write
  * the frame to a parquet under `<warehouse>/_graft_scratch` and return a
  * scan over it. Compared to `persist()` this cuts lineage completely (no
  * Catalyst tree growth across iterations), pins no executor storage
  * blocks past the write, and the result stays a distributed frame — the
  * pattern the label-handoff of connectedComponents and SemDeDup's
  * assignment reuse both need.
  *
  * Lifecycle: a long-lived session must not accumulate one scratch dir
  * per call forever. Every persist sweeps sibling dirs older than
  * `spark.graft.scratch.ttlSeconds` (default 3600) — consumers read their
  * frame promptly in every driver/bench/stream shape, and a slow consumer
  * can raise the TTL. The sweep is OWNERSHIP-AWARE: dir names carry a
  * per-JVM token, and dirs written by OTHER processes (a concurrent app
  * sharing the warehouse, or a crashed session whose deleteOnExit never
  * fired) are only reclaimed at 24× the TTL — this JVM cannot know when
  * a foreign frame was last referenced, so it errs long while still
  * bounding crash debris. `deleteOnExit` remains the JVM-exit backstop
  * (best-effort on object stores, where the TTL sweep is the mechanism
  * that actually runs).
  */
private[graft] object Scratch {
  val TtlKey = "spark.graft.scratch.ttlSeconds"
  private val jvmToken =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  def persist(df: DataFrame, prefix: String): DataFrame = {
    val session = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(
      session.sessionState.conf.warehousePath, "_graft_scratch")
    val fs = root.getFileSystem(session.sparkContext.hadoopConfiguration)
    val ttlMs = 1000L * session.conf.getOption(TtlKey)
      .flatMap(_.toLongOption).getOrElse(3600L)
    val now = System.currentTimeMillis()
    try if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        val mine = st.getPath.getName.contains(s"_${jvmToken}_")
        val ttl = if (mine) ttlMs else ttlMs * 24
        if (st.isDirectory && st.getModificationTime < now - ttl)
          fs.delete(st.getPath, true)
      }
    catch { case _: java.io.IOException => } // sweep is advisory
    val dir = new org.apache.hadoop.fs.Path(root,
      s"${prefix}_${jvmToken}_${java.util.UUID.randomUUID().toString}")
    df.write.mode("overwrite").parquet(dir.toString)
    fs.deleteOnExit(dir)
    // explicit schema: an EMPTY frame (AQE can plan zero partitions)
    // writes no part files, and a bare read would fail schema inference
    session.read.schema(df.schema).parquet(dir.toString)
  }
}
