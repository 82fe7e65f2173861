package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 D5 — multimodal columns: opaque binary payloads with typed
  * metadata, processed without ever collecting to the driver.
  *
  * Media decode libraries are not available in this environment, so the
  * pixel/sample decode itself is a clearly-marked deterministic STUB
  * (`decodeStub`); everything around it — the schema contract, the
  * mapPartitions batch shape, partition preservation, chunking/frame
  * sampling arithmetic — is the real plumbing a production decode would
  * drop into.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("fmt", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a string column as an opaque binary payload + metadata struct —
    * the shape a real ingest (image/audio bytes + probe metadata) produces.
    */
  def asMedia(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("txt").as("fmt"),
        length(col(textCol)).cast("int").as("width"),
        lit(1).as("height")).as("meta"))

  /** Pure-SQL feature extraction over the binary payload: size, content
    * hash, fixed-stride chunk count (the "frame sampling" arithmetic), and
    * a base64 head sample. Fully codegen'd — no UDF.
    */
  def features(media: DataFrame, chunkBytes: Int = 256): DataFrame =
    media.select(
      col("media_id"),
      col("meta.fmt").as("fmt"),
      length(col("payload")).cast("long").as("size_bytes"),
      sha2(col("payload"), 256).as("h256"),
      ceil(length(col("payload")).cast("double") / chunkBytes).cast("long")
        .as("n_chunks"),
      regexp_replace(base64(substring(col("payload"), 1, 32)), "\r\n", "")
        .as("head_b64"))

  /** STUB decode: a real implementation would hand `payload` to an image/
    * audio codec here and return pixel/sample features. This deterministic
    * fake hashes fixed-stride frames so the distributed plumbing (executor-
    * side batch iteration, output schema, partition count) is exercised
    * end-to-end and the swap-in point is a single function.
    */
  def decodeStub(payload: Array[Byte], frames: Int): Array[Float] = {
    val out = new Array[Float](frames)
    if (payload.isEmpty) return out
    val stride = math.max(1, payload.length / frames)
    var f = 0
    while (f < frames) {
      var acc = 0L
      var i = f * stride
      val end = math.min(payload.length, i + stride)
      while (i < end) { acc = acc * 31 + (payload(i) & 0xff); i += 1 }
      out(f) = (java.lang.Long.remainderUnsigned(acc, 1000L)) / 1000.0f
      f += 1
    }
    out
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("fmt", StringType),
    StructField("frame_features", ArrayType(FloatType))))

  /** Distributed decode: mapPartitions over the media rows (batch shape —
    * one iterator per partition, rows streamed, nothing collected),
    * emitting per-frame feature vectors.
    */
  def decode(media: DataFrame, frames: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "meta.fmt", "payload").rdd
      .mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), r.getString(1),
            decodeStub(r.getAs[Array[Byte]](2), frames).toSeq)
        }
      }
    spark.createDataFrame(rows, decodedSchema)
  }
}
