package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.9): image/audio/video travel
  * as opaque `binary` payloads with a typed metadata struct; decode /
  * feature-extraction runs as a batched per-partition transform.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[decodeStub]] derives deterministic fake features from
  * the payload bytes. Everything around it — the schema contract, the
  * `mapPartitions`-style batch shape (one iterator per partition, no
  * per-row JVM↔native churn), partition sizing — is the real, tested
  * scale path; swap `decodeStub` for a JNI/ONNX call in production.
  */
object Multimodal {

  /** Canonical media-table schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
    )), nullable = true),
  ))

  /** Schema of the extracted features appended by [[extractFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false),
  ))

  /** STUB decode: deterministic fake "embedding" from payload bytes.
    * Replace with a real codec (JNI/ONNX) at deployment; signature and
    * batch shape stay identical.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var k = 0
    while (k < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(k) = (h & 0xffff).toFloat / 65535.0f
      k += 1
    }
    out
  }

  /** Batched per-partition feature extraction over a media DataFrame.
    * Uses `mapPartitions` so a real decoder can amortize model/codec init
    * once per partition (the Scala analog of a Pandas-batched UDF).
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      // per-partition init of the (stub) decoder would go here
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        var checksum = 0L
        payload.foreach(b => checksum = (checksum * 131 + (b & 0xff)) & 0x7fffffffffffffL)
        Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
          payload.length.toLong, checksum, decodeStub(payload, dim).toSeq)
      }
    }(enc)
  }

  /** Build a demo media table from any (id, string) pair — payload =
    * UTF-8 bytes, metadata synthesized. Lets the multimodal path run
    * against fixtures that have no real binary column.
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit(640).as("width"), lit(480).as("height"),
        lit(16000).as("sample_rate"),
        (length(col(textCol)) * 10L).cast("long").as("duration_ms")).as("meta"),
    )
}
