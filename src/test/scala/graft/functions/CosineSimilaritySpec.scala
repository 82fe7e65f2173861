package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native cosine_sim expression: value parity with the higher-order-
  * function formulation, SQL registration, null handling, codegen path.
  */
class CosineSimilaritySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def pairs = {
    CosineSimilarity.register(spark)
    val e = graft.Tables.t(spark, dir, "embeddings")
    val a = e.filter(col("vec_id") < 30)
      .select(col("vec_id").as("a_id"), col("embedding").as("ae"))
    val b = e.filter(col("vec_id") >= 30 && col("vec_id") < 60)
      .select(col("vec_id").as("b_id"), col("embedding").as("be"))
    a.crossJoin(b)
  }

  test("matches the zip_with/aggregate formulation to 1e-12") {
    val fold = expr(
      """aggregate(zip_with(ae, be, (x, y) -> cast(x as double) * cast(y as double)),
        |          0D, (acc, v) -> acc + v)
        | / (sqrt(aggregate(ae, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))
        |    * sqrt(aggregate(be, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))
        |""".stripMargin)
    val diff = pairs
      .select(abs(expr("cosine_sim(ae, be)") - fold).as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(diff < 1e-12, s"max deviation $diff")
  }

  test("usable from plain SQL after registration") {
    CosineSimilarity.register(spark)
    graft.Tables.t(spark, dir, "embeddings").createOrReplaceTempView("emb")
    val v = spark.sql(
      "SELECT cosine_sim(a.embedding, b.embedding) FROM emb a JOIN emb b " +
        "ON a.vec_id = 0 AND b.vec_id = 0").head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-9) // self-similarity
  }

  test("null inputs yield null (null-intolerant)") {
    CosineSimilarity.register(spark)
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 0.0f)), Option.empty[Seq[Float]]))
      .toDF("x", "y")
    assert(df.select(expr("cosine_sim(x, y)")).head.isNullAt(0))
  }

  test("whole-stage codegen compiles the expression (no fallback)") {
    val df = pairs.select(expr("cosine_sim(ae, be)").as("c"))
    df.collect() // would throw on invalid generated code
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p) // inside a codegen stage
  }

  test("GraftExtensions injects the identical builder without error") {
    // the injection target a conf-driven session would use at build time
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must register cleanly
    // arity guard matches the registry-path builder
    CosineSimilarity.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(cast(1.0 AS FLOAT)))").collect()
    }
    assert(e.getMessage != null)
  }
}
