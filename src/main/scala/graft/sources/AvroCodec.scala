package graft.sources

import java.io.File
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileWriter, SeekableByteArrayInput, DataFileReader}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File ingest/export against Apache Avro CORE
  * (`org.apache.avro`, shipped with Spark) — the separate `spark-avro`
  * DataSource module is not on this classpath, so the decode is ours:
  * `binaryFile` lists and reads whole files in parallel and a
  * per-partition [[DataFileReader]] walks each container's blocks.
  * Columns map by NAME against the declared table schema (Avro is
  * self-describing, like ORC); nullable unions `[null, T]` resolve to
  * their branch; `timestamp-micros`/`timestamp-millis`/`date` logical
  * types land as native Spark temporals.
  *
  * Scale shape: ingest is BLOCK-SPLITTABLE — the reader plans byte-range
  * splits over every file and each task resynchronizes at the container's
  * 16-byte sync marker ([[DataFileReader.sync]]/`pastSync`, the same
  * contract Hadoop's AvroRecordReader uses), so one multi-GB container
  * reads in parallel with no DataSourceV2 and no 2 GiB whole-file cap.
  * Export writes one container per partition, so file count = partition
  * count and no driver collect.
  */
object AvroCodec {

  /** One byte-range of one container file; a task owns every block whose
    * starting sync lands in [start, end) — the Hadoop split contract, so
    * splits tile a file exactly once no matter where block boundaries fall.
    */
  private case class AvroSplit(path: String, start: Long, end: Long)

  /** Plan byte-range splits over `path` (a file or directory): every
    * regular non-hidden file, `ceil(len / splitBytes)` ranges each. The
    * listing is driver-side metadata work, O(files) — the same cost class
    * as any FileIndex.
    */
  private def planSplits(
      spark: SparkSession, path: String, splitBytes: Long): Seq[AvroSplit] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (st.isFile && !n.startsWith("_") && !n.startsWith("."))
        files += ((st.getPath.toString, st.getLen))
    }
    files.toSeq.sortBy(_._1).flatMap { case (p, len) =>
      (0L until math.max(len, 1L) by splitBytes)
        .map(s => AvroSplit(p, s, math.min(s + splitBytes, len)))
    }
  }

  /** Read Avro container files under `path` (a file or directory) into a
    * DataFrame with exactly the `target` schema, fields matched by name
    * (missing in the file → null). One task per `splitBytes` byte range;
    * records stream through the task (never a whole split in memory).
    */
  def readAvro(spark: SparkSession, path: String, target: StructType,
      splitBytes: Long = 32L << 20): DataFrame = {
    val splits = planSplits(spark, path, splitBytes)
    // Tasks must open the file through the SAME filesystem config the
    // driver listed it with (spark.hadoop.* overrides, fs.defaultFS,
    // object-store credentials) — a bare `new Configuration()` in the
    // task silently drops them all. Hadoop's Configuration is not
    // Serializable, so ship its materialized key/values and overlay them
    // onto task-side defaults (once per partition, not per record).
    val confEntries: Array[(String, String)] = {
      import scala.jdk.CollectionConverters._
      spark.sessionState.newHadoopConf().iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
    }
    val rows = spark.sparkContext
      .parallelize(splits, math.max(splits.size, 1))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        it.flatMap { sp =>
          val in = new org.apache.avro.mapred.FsInput(
            new org.apache.hadoop.fs.Path(sp.path), conf)
          val rdr = new DataFileReader[GenericRecord](
            in, new GenericDatumReader[GenericRecord]())
          rdr.sync(sp.start) // first sync at/after start (header counts: its
          // trailing sync bytes make sync(0) land on the first block)
          org.apache.spark.TaskContext.get() match {
            case null => ()
            case tc => tc.addTaskCompletionListener[Unit](_ => rdr.close())
          }
          new Iterator[Row] {
            def hasNext: Boolean = {
              val h = rdr.hasNext && !rdr.pastSync(sp.end)
              if (!h) rdr.close()
              h
            }
            def next(): Row = toRow(rdr.next(), target)
          }
        }
      }
    spark.createDataFrame(rows, target)
  }

  /** Read Avro files with every target column decoded AS A STRING (null
    * stays null) — the raw face the dead-letter split casts from, exactly
    * like the CSV quarantine path's string-schema read.
    */
  def readAvroAsStrings(
      spark: SparkSession, path: String, target: StructType): DataFrame = {
    val names = target.fieldNames.toSeq
    val strSchema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val bytes = spark.read.format("binaryFile").load(path)
      .select("content").rdd.map(_.getAs[Array[Byte]](0))
    val rows = bytes.mapPartitions { it =>
      it.flatMap { content =>
        val rdr = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(content),
          new GenericDatumReader[GenericRecord]())
        try rdr.iterator().asScala.map { rec =>
          Row.fromSeq(names.map { n =>
            val f = rec.getSchema.getField(n)
            if (f == null) null
            else render(rec.get(f.pos()), f.schema())
          })
        }.toVector
        finally rdr.close()
      }
    }
    spark.createDataFrame(rows, strSchema)
  }

  /** Export `df` as Avro container files under `dir`, one file per
    * partition (`part-NNNNN.avro`), deflate-compressed. The Avro schema
    * derives from the DataFrame schema with nullable-union fields.
    */
  def writeAvro(df: DataFrame, dir: String): Unit = {
    new File(dir).mkdirs()
    // Schema is not serializable — ship its JSON and re-parse per task
    val schemaJson = toAvroSchema(df.schema, "spark_export").toString
    val sparkSchema = df.schema
    df.rdd.foreachPartition { it =>
      val sch = new Schema.Parser().parse(schemaJson)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(sch, new File(dir, f"part-$pid%05d.avro"))
      try it.foreach(r => w.append(toAvro(r, sparkSchema, sch)))
      finally w.close()
    }
  }

  /** The Avro writer schema (JSON) this codec derives for a DataFrame —
    * the artifact a wire producer/consumer pair shares out of band.
    */
  def writerSchemaJson(st: StructType, name: String = "wire"): String =
    toAvroSchema(st, name).toString

  /** Encode each row as a bare Avro BINARY DATUM (no container framing —
    * the shape of a Kafka message value or any schema-registry payload):
    * one `value BINARY` column out, schema shared via
    * [[writerSchemaJson]]. Per-partition writer reuse; no driver hop.
    */
  def encodeDatum(df: DataFrame): DataFrame = {
    val schemaJson = writerSchemaJson(df.schema)
    val sparkSchema = df.schema
    val rows = df.rdd.mapPartitions { it =>
      val sch = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](sch)
      val out = new java.io.ByteArrayOutputStream()
      var enc: org.apache.avro.io.BinaryEncoder = null
      it.map { r =>
        out.reset()
        enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, enc)
        writer.write(toAvro(r, sparkSchema, sch), enc)
        enc.flush()
        Row(out.toByteArray)
      }
    }
    df.sparkSession.createDataFrame(rows,
      StructType(Seq(StructField("value", BinaryType, nullable = false))))
  }

  /** Decode a `value BINARY` column of bare Avro datums written under
    * `writerSchemaJson` into rows of exactly `target` (fields matched by
    * name, like the container path) — the consumer half of the wire
    * shape. Per-partition reader + decoder reuse.
    */
  def decodeDatum(df: DataFrame, writerSchemaJson: String,
      target: StructType): DataFrame = {
    val rows = df.select("value").rdd.mapPartitions { it =>
      val sch = new Schema.Parser().parse(writerSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](sch)
      var dec: org.apache.avro.io.BinaryDecoder = null
      var rec: GenericRecord = null
      it.map { r =>
        dec = org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(r.getAs[Array[Byte]](0), dec)
        rec = reader.read(rec, dec)
        toRow(rec, target)
      }
    }
    df.sparkSession.createDataFrame(rows, target)
  }

  // ---- Spark StructType → Avro schema ----

  private[sources] def toAvroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = typeToAvro(f.dataType, s"${name}_${f.name}")
      val sch =
        if (f.nullable)
          Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def typeToAvro(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType => // wall-clock stamp, no zone: local-timestamp-micros
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(et, containsNull) =>
      val e = typeToAvro(et, s"${name}_item")
      Schema.createArray(
        if (containsNull)
          Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), e))
        else e)
    case st: StructType => toAvroSchema(st, name)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = typeToAvro(vt, s"${name}_value")
      Schema.createMap(
        if (valueContainsNull)
          Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), v))
        else v)
    case other => throw new IllegalArgumentException(
      s"avro export: unsupported Spark type $other (decimal/interval not mapped)")
  }

  // ---- Row → GenericRecord ----

  private def toAvro(row: Row, st: StructType, sch: Schema): GenericRecord = {
    val rec = new GenericData.Record(sch)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, valueToAvro(if (row.isNullAt(i)) null else row.get(i), f.dataType,
        nonNull(sch.getField(f.name).schema())))
    }
    rec
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def valueToAvro(v: Any, dt: DataType, sch: Schema): AnyRef = v match {
    case null => null
    case ts: java.sql.Timestamp => Long.box(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
    case ts: java.time.Instant =>
      Long.box(ts.getEpochSecond * 1000000L + ts.getNano / 1000)
    case ldt: java.time.LocalDateTime => // TimestampNTZ: micros from the local epoch
      Long.box(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000)
    case d: java.sql.Date => Int.box(d.toLocalDate.toEpochDay.toInt)
    case d: java.time.LocalDate => Int.box(d.toEpochDay.toInt)
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case r: Row => toAvro(r, dt.asInstanceOf[StructType], sch)
    case seq: scala.collection.Seq[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      val es = nonNull(sch.getElementType)
      seq.map(e => valueToAvro(e, et, es)).asJava
    case m: scala.collection.Map[_, _] =>
      val vt = dt.asInstanceOf[MapType].valueType
      val vs = nonNull(sch.getValueType)
      m.map { case (k, mv) => k.toString -> valueToAvro(mv, vt, vs) }.asJava
    case s: String => s
    case other => other.asInstanceOf[AnyRef] // numeric/boolean primitives box as-is
  }

  // ---- GenericRecord → Row (by NAME against the target schema) ----

  private def toRow(rec: GenericRecord, target: StructType): Row =
    Row.fromSeq(target.fields.toSeq.map { f =>
      val af = rec.getSchema.getField(f.name)
      if (af == null) null
      else fromAvro(rec.get(af.pos()), nonNull(af.schema()), f.dataType)
    })

  private def fromAvro(v: Any, sch: Schema, dt: DataType): Any = v match {
    case null => null
    case _ => dt match {
      case LongType => v.asInstanceOf[Number].longValue()
      case IntegerType => v.asInstanceOf[Number].intValue()
      case ShortType => v.asInstanceOf[Number].shortValue()
      case ByteType => v.asInstanceOf[Number].byteValue()
      case DoubleType => v.asInstanceOf[Number].doubleValue()
      case FloatType => v.asInstanceOf[Number].floatValue()
      case BooleanType => v.asInstanceOf[Boolean]
      case StringType => v.toString // Utf8 / enum symbol / any scalar
      case BinaryType =>
        val bb = v.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case TimestampType =>
        val micros = sch.getLogicalType match {
          case _: LogicalTypes.TimestampMillis => v.asInstanceOf[Number].longValue() * 1000L
          case _ => v.asInstanceOf[Number].longValue() // micros (the default stamp)
        }
        java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(
          micros, java.time.temporal.ChronoUnit.MICROS))
      case TimestampNTZType =>
        val micros = sch.getLogicalType match {
          case _: LogicalTypes.LocalTimestampMillis =>
            v.asInstanceOf[Number].longValue() * 1000L
          case _: LogicalTypes.TimestampMillis =>
            v.asInstanceOf[Number].longValue() * 1000L
          case _ => v.asInstanceOf[Number].longValue() // local/instant micros
        }
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Number].longValue()))
      case ArrayType(et, _) =>
        val es = nonNull(sch.getElementType)
        v.asInstanceOf[java.util.Collection[_]].asScala.toSeq
          .map(e => fromAvro(e, es, et))
      case st: StructType => toRow(v.asInstanceOf[GenericRecord], st)
      case MapType(StringType, vt, _) =>
        val vs = nonNull(sch.getValueType)
        v.asInstanceOf[java.util.Map[_, _]].asScala.map {
          case (k, mv) => k.toString -> fromAvro(mv, vs, vt)
        }.toMap
      case other => throw new IllegalArgumentException(
        s"avro ingest: unsupported target type $other for ${sch.getType}")
    }
  }

  /** Render an Avro value as its string form for the quarantine raw read:
    * scalars via toString, temporal logical types as their ISO forms so a
    * later `try_cast` to TIMESTAMP/DATE succeeds, bytes as hex.
    */
  private def render(v: Any, sch0: Schema): String = v match {
    case null => null
    case _ =>
      val sch = nonNull(sch0)
      sch.getLogicalType match {
        case _: LogicalTypes.TimestampMicros =>
          java.time.Instant.EPOCH.plus(v.asInstanceOf[Number].longValue(),
            java.time.temporal.ChronoUnit.MICROS).toString
        case _: LogicalTypes.TimestampMillis =>
          java.time.Instant.ofEpochMilli(v.asInstanceOf[Number].longValue()).toString
        case _: LogicalTypes.LocalTimestampMicros => // ISO local form, no zone suffix
          val micros = v.asInstanceOf[Number].longValue()
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC).toString
        case _: LogicalTypes.LocalTimestampMillis =>
          val millis = v.asInstanceOf[Number].longValue()
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(millis, 1000L),
            (Math.floorMod(millis, 1000L) * 1000000L).toInt,
            java.time.ZoneOffset.UTC).toString
        case _: LogicalTypes.Date =>
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()).toString
        case _ => v match {
          case bb: ByteBuffer =>
            val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out)
            out.map("%02x".format(_)).mkString
          case other => other.toString
        }
      }
  }
}
