package graft.sources

import java.util.UUID

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro container-file round-trip fidelity for the types the b05 query
  * doesn't touch: µs-precision timestamps, binary, nulls.
  */
class AvroIOSpec extends SparkSpec {

  test("round-trips microsecond timestamps, binary, and nulls exactly") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType),
      StructField("payload", BinaryType),
      StructField("note", StringType)))
    val ts = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T11:22:33.123456Z"))
    val rows = Seq(
      Row(1L, ts, Array[Byte](1, 2, 3, -1), "hello"),
      Row(2L, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = s"${System.getProperty("java.io.tmpdir")}/avroio-${UUID.randomUUID()}"
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir, schema)
      .collect().sortBy(_.getLong(0))
    assert(back.length == 2)
    // sub-millisecond component survives (123456 µs)
    assert(back(0).getTimestamp(1) == ts)
    assert(back(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3, -1))
    assert(back(0).getString(3) == "hello")
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(3))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
  }
}
