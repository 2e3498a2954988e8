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

  /** The exact (format, options) pair [[kafkaSource]] hands to
    * `readStream` — split out so an environment WITHOUT the connector jar
    * can still contract-test the assembled reader config (KafkaSpec pins
    * it against a golden map; the one-line `format("kafka")` swap cannot
    * drift silently).
    */
  def kafkaReaderConfig(
      bootstrapServers: String, subscribe: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): (String, Map[String, String]) =
    ("kafka", Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> subscribe,
      "startingOffsets" -> startingOffsets) ++
      maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString))

  /** Streaming Kafka reader. `startingOffsets`: "earliest" | "latest" |
    * per-partition JSON. `maxOffsetsPerTrigger` caps records per
    * micro-batch across all partitions.
    */
  def kafkaSource(
      spark: SparkSession, bootstrapServers: String, subscribe: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val (fmt, opts) = kafkaReaderConfig(
      bootstrapServers, subscribe, startingOffsets, maxOffsetsPerTrigger)
    val configured = spark.readStream.format(fmt).options(opts)
    try configured.load()
    catch {
      case e: Exception if Option(e.getMessage).exists(_.toLowerCase.contains("kafka")) =>
        throw new IllegalStateException(
          "Kafka connector not on the classpath — add " +
            "org.apache.spark:spark-sql-kafka-0-10_2.13 (matching the Spark " +
            "version) to use Kafka ingest", e)
    }
  }

  /** Conf key gating the live broker path; everything the live reader
    * needs is assembled from session confs so a deployment flips ingest
    * from the file-backed replay to a live topic with `--conf` flags, no
    * code change. Keys:
    *  - `spark.graft.kafka.enabled` — must be `true` for [[liveStream]]
    *  - `spark.graft.kafka.bootstrap.servers` / `.subscribe` — required
    *  - `spark.graft.kafka.startingOffsets` — default `earliest`
    *  - `spark.graft.kafka.maxOffsetsPerTrigger` — optional backpressure cap
    *  - `spark.graft.kafka.option.<name>` — verbatim passthrough to the
    *    connector (TLS/SASL `kafka.*` client configs, `failOnDataLoss`, …)
    */
  val EnabledKey = "spark.graft.kafka.enabled"

  /** The complete (format, options) the live reader would `load()` with,
    * assembled from `spark.graft.kafka.*` confs — split from [[liveStream]]
    * so the assembly is contract-testable in an environment without the
    * connector jar (KafkaSpec pins it against a golden map).
    */
  def liveReaderConfig(spark: SparkSession): (String, Map[String, String]) = {
    def req(k: String): String = spark.conf.getOption(k).getOrElse(
      throw new IllegalArgumentException(
        s"live Kafka ingest needs $k (and $EnabledKey=true)"))
    val (fmt, base) = kafkaReaderConfig(
      req("spark.graft.kafka.bootstrap.servers"),
      req("spark.graft.kafka.subscribe"),
      spark.conf.getOption("spark.graft.kafka.startingOffsets")
        .getOrElse("earliest"),
      spark.conf.getOption("spark.graft.kafka.maxOffsetsPerTrigger")
        .map(_.toLong))
    val passthroughPrefix = "spark.graft.kafka.option."
    val extra = spark.conf.getAll.collect {
      case (k, v) if k.startsWith(passthroughPrefix) =>
        k.stripPrefix(passthroughPrefix) -> v
    }
    (fmt, base ++ extra)
  }

  /** The live S5 pipeline — the exact layers [[wireParseFileBacked]]
    * exercises file-backed, pointed at a broker: conf-assembled connector
    * reader → [[parseJsonEvents]]. Gated on [[EnabledKey]] so the swap is
    * an explicit deployment decision; in this jar-less build environment
    * the `load()` itself fails fast via [[kafkaSource]]'s error translation
    * (the code path compiles and is option-asserted — only execution needs
    * the connector).
    */
  def liveStream(spark: SparkSession, eventSchema: StructType): DataFrame = {
    require(spark.conf.getOption(EnabledKey).contains("true"),
      s"live Kafka ingest is disabled — set $EnabledKey=true " +
        "(file-backed replay via wireParseFileBacked needs no broker)")
    val (fmt, opts) = liveReaderConfig(spark)
    val configured = spark.readStream.format(fmt).options(opts)
    // rewrap ONLY the missing-data-source signature (Spark's "Failed to
    // find data source" analysis error, or a ClassNotFoundException in the
    // cause chain) — when the connector IS present, genuine broker/option
    // failures routinely mention "kafka" in their message and must surface
    // verbatim, not be mislabeled with a classpath remedy
    def isMissingSource(e: Throwable): Boolean = {
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      chain.exists {
        case _: ClassNotFoundException => true
        case t => Option(t.getMessage)
          .exists(_.toLowerCase.contains("failed to find data source"))
      }
    }
    val wire =
      try configured.load()
      catch {
        case e: Exception if isMissingSource(e) =>
          throw new IllegalStateException(
            "Kafka connector not on the classpath — add " +
              "org.apache.spark:spark-sql-kafka-0-10_2.13 (matching the " +
              "Spark version) to use live Kafka ingest", e)
      }
    parseJsonEvents(wire, eventSchema)
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

  /** Typed payload schema of the fixture events on the wire. */
  private val wireEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  /** Dress the events fixture in the exact Kafka wire shape
    * ([[kafkaWireSchema]]): JSON-encoded binary `value`, key = user id
    * bytes, topic/partition/offset/timestamp provenance with offsets
    * monotone per partition — what the connector would present for a
    * 4-partition topic keyed by user. (The offset window is fixture
    * dressing only: real Kafka assigns offsets at the broker, the engine
    * never computes them.)
    */
  def wireFromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("user_id"), lit(4))).orderBy(col("event_id"))
    graft.Tables.events(spark, sfDir).select(
      encode(col("user_id").cast("string"), "UTF-8").as("key"),
      to_json(struct(col("event_id"), col("user_id"), col("event_type"), col("value")))
        .cast("binary").as("value"),
      lit("events").as("topic"),
      pmod(col("user_id"), lit(4)).cast("int").as("partition"),
      (row_number().over(w) - 1).cast("long").as("offset"),
      // fixture ts is already normalized to TIMESTAMP_NTZ by Tables.events;
      // the wire field is instant-typed (UTC session → same wall time)
      col("ts").cast("timestamp").as("timestamp"),
      lit(0).as("timestampType"))
  }

  /** Wire-parquet staging dirs already written this JVM, keyed by sfDir. */
  private val wireStageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Stage [[wireFromEvents]] once per (JVM, sfDir) under a stable
    * tmp path and reuse it across calls. The content is deterministic
    * (fixture rows + deterministic provenance dressing), so reuse is
    * sound; Spark's `_SUCCESS` marker guards against a stale partial dir
    * from an interrupted earlier process. Repeated benchmark runs of
    * [[wireParseFileBacked]] then time only the streaming read + parse —
    * the work a live Kafka consumer would do — not fixture staging I/O.
    */
  private def stagedWireDir(spark: SparkSession, sfDir: String): String = {
    // key on fixture identity (path + size + mtime), not path alone: a
    // regenerated fixture at the same path must get a fresh stage
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val ident = s"$sfDir:${java.nio.file.Files.size(src)}:" +
      java.nio.file.Files.getLastModifiedTime(src).toMillis
    wireStageCache.computeIfAbsent(ident, { _ =>
      val stage = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        "graft_kafka_wire_" + StreamingOps.stageDigest(ident))
      StreamingOps.stagePublish(stage, ident) { tmp =>
        wireFromEvents(spark, sfDir).write.mode("overwrite").parquet(tmp)
      }
    })
  }

  /** S5 end-to-end with a file-backed wire source: stage the wire-shaped
    * records (once per sfDir — see [[stagedWireDir]]), `readStream` them
    * under [[kafkaWireSchema]], run the same [[parseJsonEvents]] layer a
    * live Kafka topic would get, and land the typed rows through the
    * executor-side file sink. Everything except the socket to a broker —
    * the connector swap is one `format("kafka")`.
    */
  def wireParseFileBacked(spark: SparkSession, sfDir: String): DataFrame = {
    val stage = stagedWireDir(spark, sfDir)
    StreamingOps.runToFiles(spark, "kafka_parse", { session =>
      val stream = session.readStream.schema(kafkaWireSchema).parquet(stage)
      (parseJsonEvents(stream, wireEventSchema),
        org.apache.spark.sql.streaming.OutputMode.Append())
    })
  }.orderBy("partition", "offset")

  val queries: Seq[graft.Q] = Seq(
    // ---- S5: the Kafka ingest path minus only the broker socket. The
    // oracle replays the provenance assignment and field extraction
    // relationally; the JSON encode→decode roundtrip is exercised on the
    // Spark side (binary wire value → from_json typed columns) ----
    graft.Q(
      "kafka_wire_parse",
      """SELECT 'events' AS topic,
        |  CAST(user_id % 4 AS INTEGER) AS "partition",
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id % 4 ORDER BY event_id) - 1 AS BIGINT) AS "offset",
        |  event_id, user_id, event_type, value
        |FROM events ORDER BY "partition", "offset"""".stripMargin,
    )(wireParseFileBacked),
  )
}
