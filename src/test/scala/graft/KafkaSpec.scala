package graft

import graft.streaming.KafkaOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Kafka ingest layer (S5). The connector jar is absent in this
  * environment, so the reader config is asserted to fail fast with an
  * actionable error, and the wire-record parse layer is proven on (a) a
  * batch DataFrame and (b) a genuine streaming query (rate source dressed
  * in the Kafka wire schema) — everything but the socket is exercised.
  */
class KafkaSpec extends SparkSpec {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def wireRow(id: Long, json: String): Row =
    Row(null, json.getBytes("UTF-8"), "events", 0, id,
      new java.sql.Timestamp(1700000000000L + id), 0)

  test("parseJsonEvents decodes wire records and keeps provenance columns") {
    val wire = spark.createDataFrame(
      java.util.Arrays.asList(
        wireRow(0, """{"event_id": 7, "event_type": "view", "value": 1.5}"""),
        wireRow(1, """not json""")),
      KafkaOps.kafkaWireSchema)
    val rows = KafkaOps.parseJsonEvents(wire, eventSchema)
      .orderBy("offset").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "events" && rows(0).getLong(2) == 0L)
    assert(rows(0).getLong(3) == 7L && rows(0).getString(4) == "view"
      && rows(0).getDouble(5) == 1.5)
    // malformed value → null event columns, provenance intact
    assert(rows(1).getLong(2) == 1L && rows(1).isNullAt(3))
  }

  test("parse layer composes with a live streaming source end-to-end") {
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "4")
    // rate source dressed in the Kafka wire schema: value = JSON bytes
    val dressed = session.readStream.format("rate")
      .option("rowsPerSecond", "100").load()
      .select(
        lit(null).cast(BinaryType).as("key"),
        encode(to_json(struct(
          col("value").as("event_id"),
          lit("view").as("event_type"),
          (col("value") * 0.5).as("value"))), "UTF-8").as("value"),
        lit("events").as("topic"), lit(0).as("partition"),
        col("value").as("offset"), col("timestamp"),
        lit(0).as("timestampType"))
    val parsed = KafkaOps.parseJsonEvents(dressed, eventSchema)
    val sink = s"kafka_spec_${System.nanoTime()}"
    val q = parsed.writeStream.format("memory").queryName(sink)
      .trigger(Trigger.ProcessingTime(200)).start()
    try {
      var tries = 0
      while (session.table(sink).isEmpty && tries < 100) {
        Thread.sleep(200); tries += 1
      }
      val rows = session.table(sink).orderBy("offset").limit(3).collect()
      assert(rows.nonEmpty, "no rows arrived through the streaming parse")
      rows.foreach { r =>
        assert(r.getString(0) == "events")
        assert(r.getLong(3) == r.getLong(2), "event_id must equal offset")
        assert(r.getString(4) == "view")
        assert(r.getDouble(5) == r.getLong(2) * 0.5)
      }
    } finally {
      q.stop()
      session.catalog.dropTempView(sink)
    }
  }

  test("kafka reader config matches the golden connector contract") {
    // the exact option names spark-sql-kafka-0-10 documents — if any of
    // these drift, a live-broker deployment breaks even though every
    // in-env test stays green, so they are pinned literally
    assert(KafkaOps.kafkaReaderConfig("b1:9092,b2:9092", "events") ==
      ("kafka", Map(
        "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
        "subscribe" -> "events",
        "startingOffsets" -> "earliest")))
    // per-partition offset JSON + backpressure cap pass through verbatim
    val offs = """{"events":{"0":42,"1":-1}}"""
    assert(KafkaOps.kafkaReaderConfig("b:9092", "events",
      startingOffsets = offs, maxOffsetsPerTrigger = Some(10000L)) ==
      ("kafka", Map(
        "kafka.bootstrap.servers" -> "b:9092",
        "subscribe" -> "events",
        "startingOffsets" -> offs,
        "maxOffsetsPerTrigger" -> "10000")))
    // offset bookkeeping: the parse layer must keep the exactly-once
    // handle (topic, partition, offset) ahead of the decoded fields
    val parsed = KafkaOps.parseJsonEvents(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        KafkaOps.kafkaWireSchema),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "event_id", org.apache.spark.sql.types.LongType))))
    assert(parsed.columns.take(3).sameElements(Seq("topic", "partition", "offset")))
  }

  test("liveStream assembles the exact conf-driven reader options and gates on the enable flag") {
    val session = spark.newSession()
    // disabled → refuse before touching the connector at all
    val off = intercept[IllegalArgumentException] {
      KafkaOps.liveStream(session, eventSchema)
    }
    assert(off.getMessage.contains(KafkaOps.EnabledKey))
    session.conf.set(KafkaOps.EnabledKey, "true")
    // enabled but unconfigured → name the missing key
    val missing = intercept[IllegalArgumentException] {
      KafkaOps.liveStream(session, eventSchema)
    }
    assert(missing.getMessage.contains("spark.graft.kafka.bootstrap.servers"))
    // full config incl. passthrough client options → golden option map
    session.conf.set("spark.graft.kafka.bootstrap.servers", "b1:9092,b2:9092")
    session.conf.set("spark.graft.kafka.subscribe", "events")
    session.conf.set("spark.graft.kafka.startingOffsets", "latest")
    session.conf.set("spark.graft.kafka.maxOffsetsPerTrigger", "50000")
    session.conf.set("spark.graft.kafka.option.kafka.security.protocol", "SASL_SSL")
    session.conf.set("spark.graft.kafka.option.failOnDataLoss", "false")
    assert(KafkaOps.liveReaderConfig(session) == ("kafka", Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "events",
      "startingOffsets" -> "latest",
      "maxOffsetsPerTrigger" -> "50000",
      "kafka.security.protocol" -> "SASL_SSL",
      "failOnDataLoss" -> "false")))
    // configured + enabled in THIS env (no connector jar): the load
    // itself must fail fast with the actionable classpath message — the
    // env gap covers execution only; the code path compiles and asserts
    val e = intercept[Exception] { KafkaOps.liveStream(session, eventSchema) }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("spark-sql-kafka")), s"got: ${chain(e)}")
  }

  test("kafkaSource fails fast with an actionable error when connector absent") {
    val e = intercept[Exception] {
      KafkaOps.kafkaSource(spark, "localhost:9092", "events")
        .writeStream.format("noop").start().stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("spark-sql-kafka") || m.toLowerCase.contains("kafka")),
      s"unhelpful error: ${chain(e)}")
  }
}
