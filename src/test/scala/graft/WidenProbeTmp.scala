package graft

class WidenProbeTmp extends SparkSpec {
  test("probe: vectorized parquet reads int32 as BIGINT, float as DOUBLE") {
    val df = spark.read.schema("k BIGINT, f DOUBLE")
      .parquet("/tmp/widen_probe.parquet")
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).sum == 45L)
    assert(math.abs(rows.map(_.getDouble(1)).sum - 45.0) < 1e-9)
    info("v1 reader OK")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    val df2 = spark.read.schema("k BIGINT, f DOUBLE")
      .parquet("/tmp/widen_probe.parquet")
    assert(df2.collect().map(_.getLong(0)).sum == 45L)
    info("v2 reader OK")
  }
}
