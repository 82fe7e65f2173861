package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader contract: Tables.t normalizes every testdata timestamp encoding
  * to plain TIMESTAMP without mutating session-global parquet confs — a
  * library loader must not silently change how the shared session reads
  * unrelated parquet (a genuine TIMESTAMP_NTZ table elsewhere would be
  * coerced to instant TIMESTAMP for every later reader).
  */
class TablesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("t() yields plain TIMESTAMP columns without touching session confs") {
    val ntzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val ntzBefore = spark.conf.get(ntzKey)
    val nanosBefore = spark.conf.getOption(nanosKey)

    val orders = Tables.t(spark, dir, "orders")
    val tsFields = orders.schema.fields.filter(f =>
      f.dataType == TimestampType || f.dataType == TimestampNTZType)
    assert(tsFields.nonEmpty, "orders should carry timestamp columns")
    assert(tsFields.forall(_.dataType == TimestampType),
      s"expected plain TIMESTAMP, got ${tsFields.mkString(",")}")

    val events = Tables.t(spark, dir, "events")
    assert(events.schema("ts").dataType == TimestampType,
      s"events ts should normalize to TIMESTAMP, got ${events.schema("ts").dataType}")
    assert(events.schema("ts").dataType != LongType)
    assert(events.limit(1).count() == 1, "events must be readable")

    assert(spark.conf.get(ntzKey) == ntzBefore,
      s"$ntzKey mutated by Tables.t")
    assert(spark.conf.getOption(nanosKey) == nanosBefore,
      s"$nanosKey mutated by Tables.t")
  }
}
