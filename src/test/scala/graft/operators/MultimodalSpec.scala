package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D5 plumbing: schema contract, determinism of the stubbed codec, and
  * executor-side batch shape (no driver collection, partitioning kept).
  */
class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def media = Multimodal.asMedia(
    graft.Tables.t(spark, dir, "documents"), "text", "doc_id")

  test("media schema contract: payload binary + typed metadata struct") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    // literal-built struct fields are non-nullable; compare names + types
    val got = sch("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(got.fields.map(f => (f.name, f.dataType)).toSeq
      == Multimodal.mediaMetaType.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("features: chunk arithmetic matches payload sizes") {
    val rows = Multimodal.features(media, chunkBytes = 100)
      .select("size_bytes", "n_chunks").collect()
    rows.foreach { r =>
      val (size, chunks) = (r.getLong(0), r.getLong(1))
      assert(chunks == (size + 99) / 100)
    }
  }

  test("decode stub: deterministic, one vector per row, frame count fixed") {
    val out1 = Multimodal.decode(media, frames = 8)
    val out2 = Multimodal.decode(media, frames = 8)
    assert(out1.count() == media.count())
    assert(out1.filter(size(col("frame_features")) =!= 8).count() == 0)
    val s1 = out1.agg(sum(expr("aggregate(frame_features, 0D, (a, x) -> a + x)")))
      .head.getDouble(0)
    val s2 = out2.agg(sum(expr("aggregate(frame_features, 0D, (a, x) -> a + x)")))
      .head.getDouble(0)
    assert(s1 == s2 && s1 > 0)
  }

  test("decode preserves partitioning (no single-partition collapse)") {
    val repartitioned = media.repartition(7)
    assert(Multimodal.decode(repartitioned, 4).rdd.getNumPartitions == 7)
  }
}
