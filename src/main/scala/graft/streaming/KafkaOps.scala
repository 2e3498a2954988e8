package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka stream ingest (SURVEY.md §2.1 S5) — the reference's streaming
  * event source mapped to Structured Streaming's Kafka connector.
  *
  * Split into two layers so the parts are independently testable in an
  * environment without the connector jar:
  *
  *  1. [[kafkaSource]]: the reader config (bootstrap servers, subscription,
  *     offsets, rate limit). Requires `spark-sql-kafka-0-10` on the
  *     classpath; absent (as in this build environment — zero-egress, jar
  *     not vendored) it fails fast with an actionable error instead of a
  *     bare ClassNotFoundException.
  *  2. [[parseJsonEvents]]: Kafka wire record → typed rows. Pure column
  *     transforms over the connector's fixed output schema
  *     ([[kafkaWireSchema]]), so it runs identically on any DataFrame of
  *     that shape — spec-tested against a batch frame and a live
  *     rate-source stream dressed in the wire schema.
  *
  * Scale notes: one Spark partition per Kafka partition; `maxOffsetsPerTrigger`
  * bounds micro-batch size (backpressure); `from_json` is codegen'd, so
  * parse cost scales with executors, not the driver.
  */
object KafkaOps {

  /** The fixed schema spark-sql-kafka presents for every topic. */
  val kafkaWireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Streaming Kafka reader. `startingOffsets`: "earliest" | "latest" |
    * per-partition JSON. `maxOffsetsPerTrigger` caps records per
    * micro-batch across all partitions.
    */
  def kafkaSource(
      spark: SparkSession, bootstrapServers: String, subscribe: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", subscribe)
      .option("startingOffsets", startingOffsets)
    val configured = maxOffsetsPerTrigger
      .fold(reader)(n => reader.option("maxOffsetsPerTrigger", n.toString))
    try configured.load()
    catch {
      case e: Exception if Option(e.getMessage).exists(_.toLowerCase.contains("kafka")) =>
        throw new IllegalStateException(
          "Kafka connector not on the classpath — add " +
            "org.apache.spark:spark-sql-kafka-0-10_2.13 (matching the Spark " +
            "version) to use Kafka ingest", e)
    }
  }

  /** Kafka wire records → typed rows: JSON-decode `value` with the given
    * schema, keep (topic, partition, offset) as provenance columns —
    * offset is the exactly-once bookkeeping handle downstream sinks key on.
    * Rows whose value fails to parse surface as all-null event columns
    * (from_json semantics); filter on a required field to drop them.
    */
  def parseJsonEvents(kafka: DataFrame, eventSchema: StructType): DataFrame =
    kafka.select(
      (Seq(col("topic"), col("partition"), col("offset")) :+
        from_json(col("value").cast("string"), eventSchema).as("__e")): _*)
      .select(
        (Seq(col("topic"), col("partition"), col("offset")) ++
          eventSchema.fieldNames.map(n => col(s"__e.$n"))): _*)
}
