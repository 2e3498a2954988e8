package graft.streaming

import graft.{Det, Q}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Structured Streaming tier (SURVEY.md §2.7): the reference's append-only
  * event ingest generalized to real stream processing — file source,
  * tumbling event-time windows with watermarks, AvailableNow triggers for
  * batch-equivalent replay.
  *
  * The driver-checkable queries run genuine streaming jobs (file source →
  * transform → FILE sink via foreachBatch, `Trigger.AvailableNow`) whose
  * results are batch-equivalent, so the DuckDB oracle can still check
  * them — streaming correctness verified against relational semantics.
  * Every result path is executor→disk; nothing is collected through the
  * driver.
  *
  * Resource discipline: each invocation runs in a `newSession()` (own
  * SQLConf/catalog sharing the SparkContext — no thread-unsafe set/restore
  * of session-global `spark.sql.shuffle.partitions`; note newSession
  * inherits only builder-level confs, not runtime `spark.conf.set` values,
  * which is fine here because every conf we rely on is builder-level),
  * materializes the sink, then drops sink/checkpoint state before
  * returning. The normalized-events staging dir is the one deliberate
  * residue: stable-pathed and memoized per (JVM, fixture identity), so
  * repeated bench runs re-use it instead of re-writing it, and driver
  * memory/tmp usage stays bounded.
  */
/** Per-user running totals as a `transformWithState` StatefulProcessor —
  * the Spark 4 arbitrary-state API (state store v2): explicit named state
  * variables with per-variable encoders and TTL, instead of
  * mapGroupsWithState's single implicit state slot. Same integer-micros
  * state contract as [[StreamingOps.statefulUserTotals]], so the two APIs
  * are output-identical and share one oracle. Top-level class: no
  * enclosing-instance capture to serialize to executors.
  */
private[streaming] class UserTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Double)] {
  import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)](
      "totals",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      user: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    val (n0, s0) = if (totals.exists()) totals.get() else (0L, 0L)
    var n = n0
    var s = s0
    rows.foreach { case (_, vmic) => n += 1; s += vmic }
    totals.update((n, s))
    Iterator.single((user, n, s.toDouble / 1000000.0))
  }
}

/** Gap-sessionization driven by EVENT-TIME TIMERS — the transformWithState
  * feature surface [[UserTotalsProcessor]] doesn't touch (TimeMode
  * EventTime, `registerTimer`/`handleExpiredTimer`): per-user open-session
  * state, re-armed on every batch at `last_ts + gap`; when the watermark
  * passes the timer the session is emitted CLOSED and its state cleared.
  * Sessions still open when the bounded replay ends never fire a timer —
  * they are read DIRECTLY from the state store afterward (the state-store
  * reader), and closed ∪ open must equal batch gap-sessionization exactly
  * (shared oracle with `stream_session_agg`/`session_window`).
  *
  * In-batch ordering: rows within a micro-batch arrive unordered, so the
  * processor sorts the group's batch slice by ts before walking gaps —
  * memory is bounded by one USER's rows per BATCH (not per stream), the
  * same envelope any per-key stateful operator already holds.
  *
  * State contract: `(start_us, last_us, n_events, sum_micros)` — integer
  * micros only (the Det discipline), so the fold is independent of batch
  * boundaries and replayable bit-exactly.
  */
private[streaming] class TimerSessionProcessor(gapUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long), (Long, Long, Long, Double)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

  @transient private var sess: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long, Long)](
      "sess",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      user: Long, rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Double)] = {
    val batch = rows.toArray.sortBy(_._2) // (user, ts_us, value_micros) by ts
    var closed = List.empty[(Long, Long, Long, Double)]
    var st = if (sess.exists()) Option(sess.get()) else None
    // single live timer per key: drop the previous arm before re-arming
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    batch.foreach { case (_, ts, vmic) =>
      st match {
        case Some((s0, last, n, sum)) if ts - last < gapUs =>
          st = Some((s0, ts, n + 1, sum + vmic))
        case Some((s0, _, n, sum)) => // gap exceeded inside the batch
          closed ::= ((user, s0, n, sum.toDouble / 1000000.0))
          st = Some((ts, ts, 1L, vmic))
        case None =>
          st = Some((ts, ts, 1L, vmic))
      }
    }
    st.foreach { cur =>
      sess.update(cur)
      getHandle.registerTimer(cur._2 / 1000L + gapUs / 1000L) // timers are ms
    }
    closed.reverse.iterator
  }

  override def handleExpiredTimer(
      user: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Double)] =
    if (sess.exists()) {
      val (s0, _, n, sum) = sess.get()
      sess.clear()
      Iterator.single((user, s0, n, sum.toDouble / 1000000.0))
    } else Iterator.empty
}

object StreamingOps {

  /** Schema of the NORMALIZED staged events (what [[withStagedEvents]]
    * writes): the canonical shape produced by [[graft.Tables.events]] —
    * `ts` as TIMESTAMP_NTZ plus the exact integer `ts_ns`. The stream tier
    * carries NO copy of the fixture's physical-unit decode logic; all time
    * arithmetic below derives from `ts_ns`.
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType),
    StructField("ts_ns", LongType)))

  /** Staged normalized-events dirs already written this JVM, keyed by the
    * fixture identity (path + size + mtime — a regenerated fixture at the
    * same path gets a fresh stage, never a stale one).
    */
  private val eventsStageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Stage the events fixture as a normalized parquet directory for the
    * file stream source (the source requires a directory; in production
    * it is a landing directory already). Staging writes
    * [[graft.Tables.events]] output — the ONE shared decode of the
    * fixture's physical ts encoding — so a fixture re-encode (INT64 nanos
    * ↔ TIMESTAMP_NTZ micros) cannot drift streaming results away from
    * batch. Staged once per (JVM, fixture identity) under a stable tmp
    * path (same discipline as KafkaOps.stagedWireDir): `_SUCCESS` guards
    * a stale partial dir from an interrupted earlier process, and
    * `computeIfAbsent` records the memo only when the write succeeds, so
    * repeated bench runs time the streaming read, not staging I/O.
    */
  private def withStagedEvents[T](spark: SparkSession, sfDir: String)(f: String => T): T = {
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val ident = s"$sfDir:${java.nio.file.Files.size(src)}:" +
      java.nio.file.Files.getLastModifiedTime(src).toMillis
    f(eventsStageCache.computeIfAbsent(ident, { _ =>
      val stage = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_stream_events_" + stageDigest(ident))
      stagePublish(stage, ident) { tmp =>
        graft.Tables.events(spark, sfDir).write.mode("overwrite").parquet(tmp)
      }
    }))
  }

  /** Collision-proof stage-dir key: a truncated SHA-256 of the full
    * fixture identity (96 bits — two distinct fixtures can never share a
    * stage dir, unlike the 32-bit `String.hashCode` this replaces, where
    * a collision would silently serve another fixture's staged data).
    */
  private[graft] def stageDigest(ident: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(ident.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(12).map(b => f"$b%02x").mkString

  /** Multi-process-safe publish of a staged directory: write into a
    * process-private tmp dir, then atomically rename into the stable
    * path — two JVMs staging the same fixture concurrently (e.g. a
    * driver's Verify and Bench) each build privately and exactly one
    * wins. Publication is serialized on an exclusive cross-process file
    * lock (`<stage>.lock`), and the published check re-runs UNDER the
    * lock before any delete, so a just-completed publish by another
    * process can never be swept as a "stale partial" (the TOCTOU the
    * unlocked check had). A published stage is valid only when BOTH the
    * `_SUCCESS` marker and an `_graft_ident` file carrying the full
    * identity string are present and the identity matches — content is
    * verified, never assumed from the dir name.
    */
  /** Per-stage-path monitors: OS file locks are held per PROCESS, so a
    * second `FileChannel.lock` on the same file from another thread of
    * this JVM would throw `OverlappingFileLockException` instead of
    * blocking — intra-JVM callers serialize on this monitor first.
    */
  private val publishMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def stagePublish(stage: java.nio.file.Path, ident: String)(
      write: String => Unit): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
    def published: Boolean =
      Files.exists(stage.resolve("_SUCCESS")) && {
        val idf = stage.resolve("_graft_ident")
        Files.exists(idf) && Files.readString(idf) == ident
      }
    if (!published) {
      val mon = publishMonitors.computeIfAbsent(stage.toString, _ => new Object)
      mon.synchronized {
        val lockPath = Paths.get(stage.toString + ".lock")
        val ch = java.nio.channels.FileChannel.open(lockPath,
          StandardOpenOption.CREATE, StandardOpenOption.WRITE)
        try {
          val lock = ch.lock() // blocks until exclusive across processes
          try {
            if (!published) { // re-check under the lock — no delete races a publish
              if (Files.exists(stage)) deleteRecursively(stage)
              val tmp = Paths.get(
                stage.toString + ".tmp." + java.lang.ProcessHandle.current().pid())
              deleteRecursively(tmp)
              write(tmp.toString)
              Files.writeString(tmp.resolve("_graft_ident"), ident)
              Files.move(tmp, stage, StandardCopyOption.ATOMIC_MOVE)
            }
          } finally lock.release()
        } finally ch.close()
      }
    }
    stage.toString
  }

  /** [[runToFiles]] for UPDATE-mode stateful streams: an Update stream
    * emits the CURRENT value of every key touched in a micro-batch, so
    * persisting batches to an append-only file sink is an upsert problem.
    * Without a mutable sink we append each batch tagged with its batch id
    * and resolve last-writer-wins per key at read time — the standard
    * `foreachBatch` pattern for idempotent Update-mode file output. In
    * production the sink would be a key-value store or a MERGE-capable
    * table format; here the tag-and-resolve keeps the entire result path
    * executor-side (no driver collect), which is what matters at corpus-
    * sized state (per-user running totals at 100 TB are data-sized, not
    * model-sized).
    */
  private def runToFilesUpsert(
      spark: SparkSession, prefix: String, keys: Seq[String],
      build: SparkSession => DataFrame): DataFrame = {
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "4")
    val work = java.nio.file.Files.createTempDirectory(s"graft_${prefix}_")
    val outDir = work.resolve("out").toString
    try {
      val stream = build(session)
      val query = stream.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          // per-batch overwrite (writeBatch): a retried micro-batch rewrites
          // its own `batch=<id>` dir — no duplicate tags under retry
          writeBatch(df, outDir, complete = false, batchId)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      // last-writer-wins: a (map|flatMap)GroupsWithState group emits at most
      // once per batch, so (keys, batch) is unique and rn=1 is total; the
      // batch id is the partition-dir column writeBatch lays down
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*).orderBy(col("batch").desc)
      spark.read.parquet(outDir)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .drop("_rn", "batch")
        .transform(graft.Tables.pin)
    } finally deleteRecursively(work)
  }

  /** Run a streaming query to completion writing a FILE sink — the scale
    * path: results go executor→disk, never through the driver (a memory
    * sink would collect results driver-side, capping at driver memory).
    * Complete-mode windowed aggs can't use the native file
    * sink (append-only, and its watermark-gated emission would hold back
    * the final windows of a bounded replay), so this uses `foreachBatch` +
    * overwrite — the standard pattern: each micro-batch atomically rewrites
    * the output with the full current aggregate; the last rewrite IS the
    * final answer. Checkpoint + output live in a temp dir deleted after the
    * result is re-read and localCheckpoint'ed to executor blocks (fixture
    * hygiene — in production the output directory is the product and
    * stays).
    */
  private[streaming] def runToFiles(
      spark: SparkSession, prefix: String,
      build: SparkSession => (DataFrame, org.apache.spark.sql.streaming.OutputMode))
      : DataFrame = {
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "4")
    val work = java.nio.file.Files.createTempDirectory(s"graft_${prefix}_")
    val outDir = work.resolve("out").toString
    try {
      val (stream, mode) = build(session)
      val complete = mode == org.apache.spark.sql.streaming.OutputMode.Complete()
      val query = stream.writeStream
        .outputMode(mode)
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          writeBatch(df, outDir, complete, batchId)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      // drop("batch") strips Append mode's per-batch partition dir column;
      // no-op for Complete output (no such column)
      spark.read.parquet(outDir).drop("batch").transform(graft.Tables.pin)
    } finally deleteRecursively(work)
  }

  /** Per-batch sink write, IDEMPOTENT under micro-batch retry. Complete
    * mode re-emits the full result, so each batch atomically rewrites the
    * whole output dir and the last rewrite is the final answer. Append
    * mode emits only new rows per batch — but `mode("append")` into one
    * shared dir would double-write a retried batch, so each batch
    * overwrites its OWN deterministic subdir (`batch=<id>`): a retry
    * rewrites exactly its previous output, exactly-once semantics
    * end-to-end (the same tag-and-resolve discipline runToFilesUpsert
    * uses for Update mode). Asserted by StreamingSpec's retry spec.
    */
  private[graft] def writeBatch(
      df: org.apache.spark.sql.Dataset[Row], outDir: String,
      complete: Boolean, batchId: Long): Unit = {
    val target = if (complete) outDir else s"$outDir/batch=$batchId"
    df.write.mode("overwrite").parquet(target)
  }

  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      finally s.close()
    }

  /** Streaming tumbling-window aggregation over the events fixture,
    * executed to completion with AvailableNow and materialized through the
    * file sink (no driver-side result collection). Returns the final
    * result as a batch DataFrame backed by executor blocks.
    */
  def hourlyCountsStreaming(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      runToFiles(spark, "stream_hourly", { session =>
        val stream = session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          // watermarks require an instant TimestampType; emit NTZ only at the
          // output edge so written results are naive like the batch tier's
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
          .withWatermark("ts", "1 hour")
          .groupBy(col("event_type"), window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
          .select(col("event_type"),
            col("window.start").cast(TimestampNTZType).as("hour_start"),
            col("n"), col("sum_value"))
        (stream, org.apache.spark.sql.streaming.OutputMode.Complete())
      })
    }.orderBy("event_type", "hour_start")

  /** Streaming drift monitor: per event-time hour, the Population
    * Stability Index of that hour's value-bucket distribution against a
    * STATIC baseline distribution (here the whole table's, computed
    * batch-side — in deployment an offline snapshot) — the serving-side
    * companion of [[graft.operators.DataQuality.psiDrift]]: an alert
    * fires when an hour's psi_micros crosses the 0.25 gate.
    *
    * Event-time windows make the report micro-batch-boundary-independent
    * (the reconciliation contract every stream row here obeys): the
    * stream only maintains per-(hour, bucket) counts — bounded state, 10
    * buckets × open hours — and the PSI arithmetic runs batch-side on the
    * materialized counts against the broadcast 10-row baseline. Bucket
    * contributions are micros-quantized BEFORE the per-hour integer sum,
    * so the report is order-independent and engine-portable.
    */
  def streamPsiDrift(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      def bucketOf(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        least(greatest(floor(v / 20).cast("long"), lit(0L)), lit(9L))
      val perWin = runToFiles(spark, "stream_psi", { session =>
        val stream = session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), bucketOf(col("value")).as("bucket"))
          .agg(count(lit(1)).as("c"))
          .select(col("window.start").cast(TimestampNTZType).as("hour_start"),
            col("bucket"), col("c"))
        (stream, org.apache.spark.sql.streaming.OutputMode.Complete())
      })
      val base = spark.read.schema(eventsSchema).parquet(stageDir)
        .select(bucketOf(col("value")).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("cb"))
      val dom = spark.range(10).select(col("id").as("bucket"))
      val basef = dom.join(base, Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("cb"), lit(0L)).as("cb"))
      val tot = basef.agg(sum("cb").as("nt"))
      val full = perWin.select("hour_start").distinct()
        .crossJoin(broadcast(dom))
        .join(perWin, Seq("hour_start", "bucket"), "left")
        .select(col("hour_start"), col("bucket"),
          coalesce(col("c"), lit(0L)).as("c"))
      val hn = full.groupBy("hour_start").agg(sum("c").as("n_events"))
      val psi = full.join(hn, "hour_start")
        .join(broadcast(basef), "bucket")
        .crossJoin(broadcast(tot))
        .withColumn("__p", (col("c") + 1).cast("double") / (col("n_events") + 10))
        .withColumn("__q", (col("cb") + 1).cast("double") / (col("nt") + 10))
        .withColumn("__pm",
          floor((col("__p") - col("__q")) * log(col("__p") / col("__q"))
            * lit(1000000.0) + lit(0.5)).cast("long"))
        .groupBy("hour_start").agg(sum("__pm").as("psi_micros"))
      psi.join(hn, "hour_start")
        .select(col("hour_start"), col("n_events"), col("psi_micros"))
        .orderBy("hour_start")
    }

  /** Streaming CUSUM mean-shift monitor: daily per-type counts stream
    * through a watermarked tumbling window (event-volume work); the
    * changepoint scan (division-cleared S_k = Σ(c·n − T), earliest peak
    * wins) runs over the resulting day×type-bounded series in batch —
    * streaming where volume lives, relational where it doesn't. In a
    * continuous deployment the same day-count stream feeds an
    * incremental CUSUM against a frozen baseline mean; the replay here
    * uses the full-series mean so it stays batch-equivalent for the
    * oracle (same contract as the batch `events_cusum_changepoint`).
    */
  def streamCusumAlert(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      val dc = runToFiles(spark, "stream_cusum", { session =>
        val stream = session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
          .withWatermark("ts", "1 day")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("c"))
          .select(col("window.start").cast(TimestampNTZType).as("day"),
            col("event_type"), col("c"))
        (stream, org.apache.spark.sql.streaming.OutputMode.Complete())
      })
      val w = org.apache.spark.sql.expressions.Window
      val tot = dc.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("t"))
      val cum = dc.join(tot, "event_type")
        .select(col("event_type"), col("day"), col("n"),
          sum(col("c") * col("n") - col("t"))
            .over(w.partitionBy("event_type").orderBy("day")).as("s_k"))
      cum
        .withColumn("rk", row_number().over(
          w.partitionBy("event_type").orderBy(abs(col("s_k")).desc, col("day"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n").as("n_days"),
          col("day").as("cp_day"), abs(col("s_k")).as("cusum_peak"))
        .orderBy("event_type")
    }

  /** Streaming SLIDING-window aggregation (2 h windows every 30 min):
    * each event lands in size/slide = 4 overlapping windows — the window
    * type [[hourlyCountsStreaming]]'s tumbling case can't express
    * (trend-over-trailing-window metrics). Same watermark/AvailableNow/
    * file-sink discipline. NOTE on state: this replay runs in Complete
    * output mode (simplest batch-equivalent materialization for a
    * bounded AvailableNow input), and Complete mode retains every
    * (key, window) group for re-emission — the watermark does NOT evict.
    * A continuously-running deployment of the same aggregation should
    * use Update/Append mode, where the 1 h watermark closes each 2 h
    * window and its state IS dropped.
    */
  def slidingCountsStreaming(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      runToFiles(spark, "stream_sliding", { session =>
        val stream = session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
          .withWatermark("ts", "1 hour")
          .groupBy(col("event_type"), window(col("ts"), "2 hours", "30 minutes"))
          .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
          .select(col("event_type"),
            col("window.start").cast(TimestampNTZType).as("win_start"),
            col("n"), col("sum_value"))
        (stream, org.apache.spark.sql.streaming.OutputMode.Complete())
      })
    }.orderBy("event_type", "win_start")

  /** Stateful streaming (the §2.8/§2.7 extension surface): per-user
    * running aggregates via `mapGroupsWithState` — arbitrary state the
    * built-in windowed aggregates can't express. Executed with
    * AvailableNow so the final state equals the batch per-user totals
    * (asserted by StreamingSpec).
    */
  def statefulUserTotals(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      runToFilesUpsert(spark, "stream_state", Seq("user_id"), { session =>
        import session.implicits._
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
        val updated = session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          // micros in the STATE (the Det contract applied to streaming):
          // integer accumulation makes the final state independent of
          // micro-batch boundaries and arrival order — replayable and
          // oracle-comparable, where a double fold would drift in ulps
          .selectExpr("user_id", "CAST(ROUND(value * 1000000.0, 0) AS LONG) AS vmic")
          .as[(Long, Long)]
          .groupByKey(_._1)
          .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
            (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
              val (n0, s0) = state.getOption.getOrElse((0L, 0L))
              var n = n0; var s = s0
              rows.foreach { case (_, v) => n += 1; s += v }
              state.update((n, s))
              (user, n, s.toDouble / 1000000.0)
          }
          .toDF("user_id", "n_events", "sum_value")
        updated
      })
    }.orderBy("user_id")

  /** Streaming rolling-DAU: per-day HLL sketch STATE maintained
    * incrementally (DataSketches union in `mapGroupsWithState` — the
    * sketch, not raw ids, is the retained state, so a day's memory is
    * fixed at ~2^lgK bytes no matter how many events arrive), then the
    * same 7-day window union + estimate as the batch
    * `rolling_active_users_check` over the final day-level sketch table.
    * This is the continuous form of the DAU/WAU curve: ids are never
    * retained beyond the micro-batch, state is mergeable and bounded,
    * and the result is micro-batch-boundary-independent because HLL
    * register state is a function of the per-day id SET, not arrival
    * order or batching. Contract: every day's estimate within tolerance
    * of the exact rolling distinct count.
    */
  def streamRollingDau(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      val perDay = runToFilesUpsert(spark, "stream_dau", Seq("day"), { session =>
        import session.implicits._
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
        session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          .selectExpr("ts_ns div 86400000000000 AS day", "user_id")
          .as[(Long, Long)]
          .groupByKey(_._1)
          .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
            (day: Long, rows: Iterator[(Long, Long)],
             state: GroupState[Array[Byte]]) =>
              import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
              val u = new Union(12)
              state.getOption.foreach(b => u.update(HllSketch.heapify(b)))
              val batch = new HllSketch(12)
              rows.foreach { case (_, uid) => batch.update(uid) }
              u.update(batch)
              val bytes = u.getResult(TgtHllType.HLL_4).toCompactByteArray
              state.update(bytes)
              (day, bytes)
          }
          .toDF("day", "sk")
      })
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("day").rangeBetween(-6, 0)
      val est = perDay.select(col("day"),
        hll_sketch_estimate(
          hll_union_agg(col("sk"), allowDifferentLgConfigK = false).over(w))
          .as("est"))
      val du = spark.read.schema(eventsSchema).parquet(stageDir)
        .selectExpr("ts_ns div 86400000000000 AS day", "user_id").distinct()
      val days = du.select("day").distinct()
      val exact = du
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("user_id"))
        .join(days, "day")
        .groupBy("day").agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(est, "day")
        .select(col("day").cast("long").as("day"), col("n_exact"),
          (abs(col("est") - col("n_exact")).cast("double")
            / col("n_exact") <= 0.15).as("within_tol"))
        .orderBy("day")
    }

  /** flatMapGroupsWithState (the 1-to-N stateful surface): per-event
    * running sequence numbers per user — emits one enriched record PER
    * INPUT row (mapGroups can only emit one per group per batch). The
    * iterator must be forced before `state.update` (rows is lazy; updating
    * state first would number every event with the final count).
    */
  def runningUserSeq(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      // Append-mode 1-to-N stateful output: every event is emitted exactly
      // once, so the plain append file path is already upsert-free
      runToFiles(spark, "stream_seq", { session =>
        import session.implicits._
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        val out = session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          .selectExpr("user_id", "event_id")
          .as[(Long, Long)]
          .groupByKey(_._1)
          .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
            (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
              var n = state.getOption.getOrElse(0L)
              val emitted = rows.map { case (_, ev) => n += 1; (user, ev, n) }.toList
              state.update(n)
              emitted.iterator
          }
          .toDF("user_id", "event_id", "seq")
        (out, OutputMode.Append())
      })
    }.orderBy("user_id", "seq")

  /** Same per-user totals through the Spark 4 `transformWithState` API
    * (see [[UserTotalsProcessor]]). Requires the RocksDB state store
    * provider — the scale-grade store (off-heap, changelog-checkpointed,
    * TB-sized state per executor), set per-session here.
    */
  def statefulUserTotalsTws(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      runToFilesUpsert(spark, "stream_tws", Seq("user_id"), { session =>
        import session.implicits._
        session.conf.set(
          "spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          .selectExpr("user_id", "CAST(ROUND(value * 1000000.0, 0) AS LONG) AS vmic")
          .as[(Long, Long)]
          .groupByKey(_._1)
          .transformWithState(
            new UserTotalsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF("user_id", "n_events", "sum_value")
      })
    }.orderBy("user_id")

  /** Timer-closed gap sessionization (see [[TimerSessionProcessor]]):
    * event-time timers close sessions as the watermark passes
    * `last_ts + gap`; sessions still OPEN at end-of-replay are recovered
    * from the checkpoint via the STATE-STORE READER (`format
    * ("statestore")`, `stateVarName = sess`) — streaming state as a
    * queryable table, the introspection surface a production engine needs
    * for state debugging and exactly this kind of drain-free readout.
    * closed ∪ open = batch gap-sessionization (same oracle as
    * `stream_session_agg`). Requires RocksDB (the transformWithState
    * store); watermark delay 0 s — the bounded-replay setting that
    * advances the final watermark to the stream's max event time, firing
    * every timer at least `gap` behind it.
    */
  def sessionWindowTimers(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      val session = spark.newSession()
      session.conf.set("spark.sql.shuffle.partitions", "4")
      session.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val work = java.nio.file.Files.createTempDirectory("graft_stream_timer_")
      val ckpt = work.resolve("ckpt").toString
      val outDir = work.resolve("out").toString
      try {
        import session.implicits._
        val gapUs = 30L * 60 * 1000000
        val stream = session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          .withColumn("tts", timestamp_micros(expr("ts_ns div 1000")))
          .withWatermark("tts", "0 seconds")
          .selectExpr("user_id", "ts_ns div 1000 AS ts_us",
            "CAST(ROUND(value * 1000000.0, 0) AS LONG) AS vmic")
          .as[(Long, Long, Long)]
          .groupByKey(_._1)
          .transformWithState(
            new TimerSessionProcessor(gapUs),
            org.apache.spark.sql.streaming.TimeMode.EventTime(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .toDF("user_id", "start_us", "n_events", "sum_value")
        val query = stream.writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
            writeBatch(df, outDir, complete = false, batchId)
          }
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        val closed = spark.read.parquet(outDir).drop("batch")
          .select(col("user_id"), col("start_us"), col("n_events"), col("sum_value"))
        // drain-free readout of the open tail: state as a table
        val open = spark.read.format("statestore")
          .option("stateVarName", "sess")
          .load(ckpt)
          .select(
            col("key.value").as("user_id"),
            col("value._1").as("start_us"),
            col("value._3").as("n_events"),
            (col("value._4").cast("double") / lit(1000000.0)).as("sum_value"))
        closed.unionByName(open)
          .select(col("user_id"),
            timestamp_micros(col("start_us")).cast(TimestampNTZType).as("session_start"),
            col("n_events"), col("sum_value"))
          .orderBy("user_id", "session_start")
          .transform(graft.Tables.pin)
      } finally deleteRecursively(work)
    }

  /** Stream-stream interval join: views joined to same-user clicks within
    * the [view_ts, view_ts + 2 h] window. Both sides carry watermarks and
    * the join condition bounds event time in both directions, so Spark
    * can evict join state older than watermark + interval — the shape
    * that runs forever at scale (an unbounded-time stream-stream join
    * would accumulate state indefinitely). The 31-day delay covers the
    * fixture's whole span, so nothing evicts before the replay finishes
    * and the result provably equals the batch join.
    */
  def viewClickJoin(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      runToFiles(spark, "stream_join", { session =>
        def side(tpe: String, idAs: String, tsAs: String, userAs: String) =
          session.readStream
            .schema(eventsSchema)
            .parquet(stageDir)
            .withColumn("tts", timestamp_micros(expr("ts_ns div 1000")))
            .filter(col("event_type") === tpe)
            .select(col("user_id").as(userAs), col("event_id").as(idAs),
              col("tts").as(tsAs))
            .withWatermark(tsAs, "31 days")
        val views = side("view", "view_id", "view_ts", "user_id")
        val clicks = side("click", "click_id", "click_ts", "c_user_id")
        val joined = views.join(
          clicks,
          col("user_id") === col("c_user_id") &&
            col("click_ts") >= col("view_ts") &&
            col("click_ts") <= col("view_ts") + expr("INTERVAL 2 HOURS"))
          .select(col("user_id"), col("view_id"), col("click_id"))
        (joined, org.apache.spark.sql.streaming.OutputMode.Append())
      })
    }.orderBy("view_id", "click_id")

  /** Stream-stream LEFT OUTER interval join: views that saw NO click
    * within 2 hours emit once with a null click_id — but only after the
    * watermark passes the view's join window, because until then a match
    * could still arrive. That makes the adjudicable subset the CLOSED
    * windows (view_ts + 2h strictly before the final watermark): an open
    * window's no-match verdict doesn't exist yet, in streaming or in
    * truth — so the result (and the oracle) restricts to it explicitly
    * rather than pretending the tail is decided. Watermark delay is 0
    * seconds: the bounded replay arrives in order, so the watermark
    * advances as far as it can. What "the final watermark" IS here is
    * subtle: Catalyst pushes the per-type filter BELOW the
    * EventTimeWatermark node, so each side's watermark tracks the max ts
    * of ITS OWN event type, and the query's global watermark is the MIN
    * of the two (multipleWatermarkPolicy = min) — i.e.
    * least(max view ts, max click ts), NOT the global max event time.
    * The closed-window cutoff must use exactly that value or the last
    * few unmatched views are wrongly expected (measured: one view inside
    * the gap at sf0.001).
    *
    * State/scale: both sides keyed by user in the state store; the time
    * constraint bounds each view row's state TTL to 2 hours of event
    * time, so state is (arrival rate × window), not history.
    */
  def viewClickLeftOuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val out = viewClickLeftOuterJoinRaw(spark, sfDir)
    val wmMicros = graft.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click"))
      .groupBy("event_type").agg(max(expr("ts_ns div 1000")).as("m"))
      .agg(min(col("m")).as("wm")).head().getLong(0)
    out
      .filter(col("view_ts") + expr("INTERVAL 2 HOURS")
        < timestamp_micros(lit(wmMicros)))
      .select("user_id", "view_id", "click_id")
      .orderBy("view_id", "click_id")
  }

  /** The unfiltered stream result (incl. open-window views), exposed for
    * the spec tier.
    */
  private[graft] def viewClickLeftOuterJoinRaw(
      spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      runToFiles(spark, "stream_ljoin", { session =>
        def side(tpe: String, idAs: String, tsAs: String, userAs: String) =
          session.readStream
            .schema(eventsSchema)
            .parquet(stageDir)
            .withColumn("tts", timestamp_micros(expr("ts_ns div 1000")))
            .withWatermark("tts", "0 seconds")
            .filter(col("event_type") === tpe)
            .select(col("user_id").as(userAs), col("event_id").as(idAs),
              col("tts").as(tsAs))
        val views = side("view", "view_id", "view_ts", "user_id")
        val clicks = side("click", "click_id", "click_ts", "c_user_id")
        val joined = views.join(
          clicks,
          col("user_id") === col("c_user_id") &&
            col("click_ts") >= col("view_ts") &&
            col("click_ts") <= col("view_ts") + expr("INTERVAL 2 HOURS"),
          "leftOuter")
          .select(col("user_id"), col("view_id"), col("view_ts"), col("click_id"))
        (joined, org.apache.spark.sql.streaming.OutputMode.Append())
      })
    }

  /** Streaming SESSION windows: the merging-window aggregation (gap-based
    * sessions grow/merge as events arrive — state the tumbling-window path
    * can't express). Same 30-minute gap as the batch `q_session_window`,
    * so the two tiers share one oracle: streaming session semantics
    * verified against relational semantics over the same data. Complete
    * mode (session_window doesn't support Update; under AvailableNow the
    * final emission is the fully-merged session set).
    */
  def sessionWindowStreaming(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      runToFiles(spark, "stream_session", { session =>
        val stream = session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
          .withWatermark("ts", "31 days")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
          .select(col("user_id"),
            col("session_window.start").cast(TimestampNTZType).as("session_start"),
            col("n_events"), col("sum_value"))
        (stream, org.apache.spark.sql.streaming.OutputMode.Complete())
      })
    }.orderBy("user_id", "session_start")

  /** Stream-static join: enrich a live event stream with a batch dimension
    * table (customer). The static side is planned per micro-batch as an
    * ordinary batch relation — Catalyst broadcasts it when small, exactly
    * like the batch tier — and needs no watermark or join state: this is
    * the stateless enrichment shape (events × dims) that runs forever at
    * scale, complementing the stateful stream-stream interval join.
    */
  def enrichWithStatic(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      runToFiles(spark, "stream_enrich", { session =>
        val dim = graft.Tables.customer(session, sfDir)
          .select(col("c_custkey"), col("c_mktsegment"))
        val stream = session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          .filter(col("event_type") === "purchase")
          .join(dim, col("user_id") === col("c_custkey"))
          .select(col("event_id"), col("user_id"),
            col("c_mktsegment").as("segment"), col("value"))
        (stream, org.apache.spark.sql.streaming.OutputMode.Append())
      })
    }.orderBy("event_id")

  /** Streaming POINT-IN-TIME (SCD2) enrichment: each purchase event joins
    * the dimension version VALID AT ITS EVENT TIME — stream-static join
    * on key + validity interval (`ts ∈ [valid_from, valid_to)`), the
    * as-of discipline that prevents enriching yesterday's fact with
    * today's dimension row. The SCD2 dim here is derived deterministically
    * from `customer` (v1 before the mid-span cutoff, '#2'-suffixed v2
    * after), so the DuckDB oracle replays the interval join exactly.
    * Static side is dim-sized → Spark broadcasts it per micro-batch; the
    * stream never shuffles on the dim key.
    */
  def enrichScd2Static(spark: SparkSession, sfDir: String): DataFrame =
    withStagedEvents(spark, sfDir) { stageDir =>
      runToFiles(spark, "stream_scd2", { session =>
        val base = graft.Tables.customer(session, sfDir)
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
        val cut = to_timestamp(lit("2024-01-15 00:00:00"))
        val lo = to_timestamp(lit("1970-01-01 00:00:00"))
        val hi = to_timestamp(lit("2100-01-01 00:00:00"))
        val dim = base.select(col("k"), col("seg"),
            lo.as("valid_from"), cut.as("valid_to"))
          .unionByName(base.select(col("k"),
            concat(col("seg"), lit("#2")).as("seg"),
            cut.as("valid_from"), hi.as("valid_to")))
        val stream = session.readStream
          .schema(eventsSchema)
          .parquet(stageDir)
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
          .filter(col("event_type") === "purchase")
          .join(dim, col("user_id") === col("k") &&
            col("ts") >= col("valid_from") && col("ts") < col("valid_to"))
          .select(col("event_id"), col("user_id"),
            col("seg").as("segment_pit"), col("value"))
        (stream, org.apache.spark.sql.streaming.OutputMode.Append())
      })
    }.orderBy("event_id")

  val queries: Seq[Q] = Seq(
    // identical semantics to the batch events_sessionize_agg — that's the
    // point: stream results must reconcile with batch over the same data
    Q(
      "stream_hourly_agg",
      """SELECT event_type, DATE_TRUNC('hour', ts) AS hour_start,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND((value)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, hour_start""".stripMargin,
    )(hourlyCountsStreaming),

    // ---- streaming rolling-DAU: per-day HLL state (sketch bytes, never
    // raw ids) + the 7-day window union; exact-contract per day ----
    Q(
      "stream_rolling_dau",
      """WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |cover AS (SELECT unnest(range(day, day + 7)) AS day, user_id FROM du),
        |days AS (SELECT DISTINCT day FROM du),
        |ex AS (SELECT c.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS n_exact
        |  FROM cover c JOIN days d ON d.day = c.day GROUP BY 1)
        |SELECT CAST(day AS BIGINT) AS day, n_exact, TRUE AS within_tol
        |FROM ex ORDER BY day""".stripMargin,
    )(streamRollingDau),

    // ---- streaming drift monitor: per-hour PSI of the value-bucket
    // distribution vs the static whole-table baseline; per-bucket
    // contributions micros-quantized before the integer per-hour sum ----
    Q(
      "stream_psi_drift",
      """WITH e AS (SELECT DATE_TRUNC('hour', ts) AS hour_start,
        |    CAST(LEAST(GREATEST(FLOOR(value / 20), 0), 9) AS BIGINT) AS bucket
        |  FROM events),
        |hb AS (SELECT hour_start, bucket, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2),
        |dom AS (SELECT CAST(unnest(range(10)) AS BIGINT) AS bucket),
        |hrs AS (SELECT DISTINCT hour_start FROM e),
        |f AS (SELECT h.hour_start, d.bucket, COALESCE(hb.c, 0) AS c
        |  FROM hrs h CROSS JOIN dom d
        |  LEFT JOIN hb ON hb.hour_start = h.hour_start AND hb.bucket = d.bucket),
        |hn AS (SELECT hour_start, CAST(SUM(c) AS BIGINT) AS n_events
        |  FROM f GROUP BY 1),
        |bs AS (SELECT d.bucket, COALESCE(b.cb, 0) AS cb FROM dom d
        |  LEFT JOIN (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cb
        |             FROM e GROUP BY 1) b USING (bucket)),
        |tot AS (SELECT CAST(SUM(cb) AS BIGINT) AS nt FROM bs),
        |pm AS (SELECT f.hour_start,
        |    CAST(FLOOR(((f.c + 1.0) / (hn.n_events + 10) - (bs.cb + 1.0) / (tot.nt + 10))
        |      * ln(((f.c + 1.0) / (hn.n_events + 10)) / ((bs.cb + 1.0) / (tot.nt + 10)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS v
        |  FROM f JOIN hn USING (hour_start) JOIN bs USING (bucket) CROSS JOIN tot)
        |SELECT p.hour_start, hn.n_events, CAST(SUM(p.v) AS BIGINT) AS psi_micros
        |FROM pm p JOIN hn USING (hour_start)
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    )(streamPsiDrift),

    // ---- streaming CUSUM changepoint monitor: the daily per-type counts
    // stream through a watermarked 1-day tumbling window (the only part
    // that touches event volume); the mean-shift scan then runs over the
    // bounded day×type series — same division-cleared BIGINT lattice and
    // earliest-peak tie-break as the batch events_cusum_changepoint row,
    // and the SAME oracle shape, so stream and batch detectors must agree
    // on one relational answer ----
    Q(
      "stream_cusum_alert",
      """WITH dc AS (
        |  SELECT event_type, DATE_TRUNC('day', ts) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS t FROM dc GROUP BY 1),
        |cum AS (
        |  SELECT dc.event_type, dc.day,
        |    CAST(SUM(dc.c * tot.n - tot.t) OVER (PARTITION BY dc.event_type
        |      ORDER BY dc.day) AS BIGINT) AS s_k,
        |    tot.n
        |  FROM dc JOIN tot ON tot.event_type = dc.event_type),
        |pk AS (
        |  SELECT event_type, day, s_k, n,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY ABS(s_k) DESC, day) AS rk
        |  FROM cum)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days, day AS cp_day,
        |  CAST(ABS(s_k) AS BIGINT) AS cusum_peak
        |FROM pk WHERE rk = 1 ORDER BY event_type""".stripMargin,
    )(streamCusumAlert),

    // ---- sliding windows (every event in 4 overlapping 2h/30m windows):
    // the oracle enumerates each event's window starts explicitly —
    // epoch-aligned floor minus k slides, exactly Spark's window()
    // alignment — and replays the micros-exact sum per window ----
    Q(
      "stream_sliding_agg",
      """WITH e AS (SELECT event_type, value,
        |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS t30
        |  FROM events),
        |w AS (SELECT event_type, value,
        |    t30 - k.k * INTERVAL 30 MINUTE AS win_start
        |  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k)
        |SELECT event_type, win_start,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND((value)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY event_type, win_start""".stripMargin,
    )(slidingCountsStreaming),

    // ---- stateful mapGroupsWithState per-user totals, oracle-checked:
    // integer-micros state makes the streaming fold bit-equal to the
    // batch aggregate regardless of micro-batch boundaries. Update-mode
    // output lands in files via the tag-and-resolve upsert — corpus-sized
    // per-user state never transits the driver ----
    Q(
      "stream_user_totals",
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(ROUND((value)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    )(statefulUserTotals),

    // ---- the SAME totals through transformWithState (state store v2 /
    // RocksDB): named ValueState + explicit encoders + TTL surface. One
    // oracle for both stateful APIs — they must agree with batch and
    // with each other ----
    Q(
      "stream_user_totals_tws",
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(ROUND((value)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    )(statefulUserTotalsTws),

    // ---- streaming session windows (merging-window state), oracle =
    // the batch gap-sessionization SQL (same as q_session_window) ----
    Q(
      "stream_session_agg",
      """WITH marked AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN epoch_us(ts) -
        |        LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
        |      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(ROUND((value)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    )(sessionWindowStreaming),

    // ---- timer-closed sessionization (event-time timers + state-store
    // reader for the open tail); same oracle as stream_session_agg — the
    // three sessionization tiers (batch window, merging session_window,
    // timer-driven stateful) must agree on one relational answer ----
    Q(
      "stream_session_timers",
      """WITH marked AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN epoch_us(ts) -
        |        LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
        |      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(ROUND((value)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    )(sessionWindowTimers),

    // ---- stream-static enrichment join (stateless; dim side planned per
    // micro-batch), oracle = the plain batch join ----
    Q(
      "stream_enrich_static",
      """SELECT e.event_id, e.user_id, c.c_mktsegment AS segment, e.value
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |WHERE e.event_type = 'purchase' ORDER BY e.event_id""".stripMargin,
    )(enrichWithStatic),

    // ---- stream-static SCD2 point-in-time enrichment (see
    // [[enrichScd2Static]]): events before the cutoff carry the v1
    // segment, after it the '#2' version — the oracle replays the
    // interval join over the same derived dim ----
    Q(
      "stream_scd2_enrich",
      """WITH dim AS (
        |  SELECT c_custkey AS k, c_mktsegment AS seg,
        |    TIMESTAMP '1970-01-01' AS f, TIMESTAMP '2024-01-15' AS t
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment || '#2',
        |    TIMESTAMP '2024-01-15', TIMESTAMP '2100-01-01'
        |  FROM customer)
        |SELECT e.event_id, e.user_id, d.seg AS segment_pit, e.value
        |FROM events e JOIN dim d ON d.k = e.user_id
        |  AND e.ts >= d.f AND e.ts < d.t
        |WHERE e.event_type = 'purchase' ORDER BY e.event_id""".stripMargin,
    )(enrichScd2Static),

    // ---- stream-stream interval join, oracle = the batch join ----
    Q(
      "stream_view_click_join",
      """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
        |FROM events v JOIN events c ON c.user_id = v.user_id
        | AND v.event_type = 'view' AND c.event_type = 'click'
        | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
        |ORDER BY view_id, click_id""".stripMargin,
    )(viewClickJoin),

    // ---- stream-stream LEFT OUTER interval join: unmatched views emit a
    // null click_id once the watermark closes their window; result and
    // oracle restrict to the closed-window subset (see
    // [[viewClickLeftOuterJoin]]) ----
    Q(
      "stream_view_click_left_join",
      """WITH mx AS (SELECT LEAST(
        |    (SELECT max(ts) FROM events WHERE event_type = 'view'),
        |    (SELECT max(ts) FROM events WHERE event_type = 'click')) AS m),
        |v AS (SELECT user_id, event_id AS view_id, ts FROM events
        |      WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id AS click_id, ts FROM events
        |      WHERE event_type = 'click')
        |SELECT v.user_id, v.view_id, c.click_id
        |FROM v CROSS JOIN mx
        |LEFT JOIN c ON c.user_id = v.user_id
        |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
        |WHERE v.ts + INTERVAL 2 HOUR < mx.m
        |ORDER BY view_id, click_id""".stripMargin,
    )(viewClickLeftOuterJoin),

    // ---- streaming exact dedup: dropDuplicates state over the stream —
    // the streaming face of §2.9 exact dedup (state = one key per distinct
    // user; at scale bound it with dropDuplicatesWithinWatermark) ----
    Q(
      "stream_distinct_users",
      "SELECT DISTINCT user_id FROM events ORDER BY user_id",
    ) { (spark, sfDir) =>
      withStagedEvents(spark, sfDir) { stageDir =>
        runToFiles(spark, "stream_distinct", { session =>
          val stream = session.readStream
            .schema(eventsSchema)
            .parquet(stageDir)
            .select("user_id")
            .dropDuplicates("user_id")
          (stream, org.apache.spark.sql.streaming.OutputMode.Append())
        })
      }.orderBy("user_id")
    },

    // ---- the BOUNDED-state form: dropDuplicatesWithinWatermark evicts
    // dedup state older than the watermark, which is what makes streaming
    // dedup run forever at 100 TB/day (plain dropDuplicates state grows
    // without bound). With a delay covering the fixture's whole time span
    // nothing evicts, so the bounded operator provably equals exact
    // DISTINCT here — the eviction bound is a retention policy, not an
    // accuracy loss, for any key re-seen within the delay ----
    Q(
      "stream_distinct_users_wm",
      "SELECT DISTINCT user_id FROM events ORDER BY user_id",
    ) { (spark, sfDir) =>
      withStagedEvents(spark, sfDir) { stageDir =>
        runToFiles(spark, "stream_distinct_wm", { session =>
          val stream = session.readStream
            .schema(eventsSchema)
            .parquet(stageDir)
            .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
            .withWatermark("ts", "365 days")
            .dropDuplicatesWithinWatermark("user_id")
            .select("user_id")
          (stream, org.apache.spark.sql.streaming.OutputMode.Append())
        })
      }.orderBy("user_id")
    },

    // ---- streaming CDC upsert: a file-source CDC feed replayed one file
    // per micro-batch (maxFilesPerTrigger=1, mtime-ordered) through
    // foreachBatch → Catalog.merge — Structured Streaming driving the
    // warehouse's row-level COW DML. The update batches OVERLAP on
    // doc_id ∈ [200, 300), so the result is only correct if the stream
    // applies them as three ordered merges (a single collapsed batch
    // would fail merge's key-uniqueness check; a reordered replay would
    // leave those keys labeled b0). The oracle replays the same three
    // merges as chained anti-join CTEs. The table is inserted
    // range-clustered on the merge key and the CDC batches are id-RANGE
    // slices (ids 0..499 exist at every fixture scale), so each merge's
    // COW rewrite really is file-granular — at sf0.1 the updates touch
    // 10% of the key space and the other ~90% of files pass through
    // untouched; sink cost tracks update volume, not table size ----
    Q.weekly(
      "stream_upsert_merge",
      """WITH b0 AS (
        |  SELECT doc_id, text, lang, 'b0' AS source,
        |         CAST(n_chars + 1 AS BIGINT) AS n_chars
        |  FROM documents WHERE doc_id < 300),
        |b1 AS (
        |  SELECT doc_id, text, lang, 'b1' AS source,
        |         CAST(n_chars + 2 AS BIGINT) AS n_chars
        |  FROM documents WHERE doc_id >= 200 AND doc_id < 400),
        |b2 AS (
        |  SELECT doc_id, text, lang, 'b2' AS source,
        |         CAST(n_chars + 3 AS BIGINT) AS n_chars
        |  FROM documents WHERE doc_id >= 400 AND doc_id < 500
        |  UNION ALL
        |  SELECT CAST(doc_id + 10000000 AS BIGINT), text, lang, 'b2' AS source,
        |         CAST(n_chars + 3 AS BIGINT)
        |  FROM documents WHERE doc_id < 50),
        |a0 AS (SELECT * FROM b0 UNION ALL
        |       SELECT d.* FROM documents d
        |       WHERE NOT EXISTS (SELECT 1 FROM b0 u WHERE u.doc_id = d.doc_id)),
        |a1 AS (SELECT * FROM b1 UNION ALL
        |       SELECT a.* FROM a0 a
        |       WHERE NOT EXISTS (SELECT 1 FROM b1 u WHERE u.doc_id = a.doc_id)),
        |a2 AS (SELECT * FROM b2 UNION ALL
        |       SELECT a.* FROM a1 a
        |       WHERE NOT EXISTS (SELECT 1 FROM b2 u WHERE u.doc_id = a.doc_id))
        |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_id
        |FROM a2 GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    ) { (s, d) =>
      val docs = graft.Tables.documents(s, d)
      val wh = graft.operators.CatalogOps.tempWarehouse()
      val cat = new graft.sources.Catalog(s, wh)
      cat.create("docs_cdc", docs.schema)
      // range-clustered on the merge key: each file holds a contiguous
      // id slice, so range-keyed merges can skip the unmatched files
      cat.insert("docs_cdc", docs.repartitionByRange(8, col("doc_id")))
      val b0 = docs.filter(col("doc_id") < 300)
        .withColumn("source", lit("b0"))
        .withColumn("n_chars", col("n_chars") + 1L)
      val b1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
        .withColumn("source", lit("b1"))
        .withColumn("n_chars", col("n_chars") + 2L)
      val b2 = docs.filter(col("doc_id") >= 400 && col("doc_id") < 500)
        .unionByName(docs.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 10000000L))
        .withColumn("source", lit("b2"))
        .withColumn("n_chars", col("n_chars") + 3L)
      val work = java.nio.file.Files.createTempDirectory("graft_cdc_")
      try {
        val feed = java.nio.file.Files.createDirectory(work.resolve("feed"))
        // one parquet FILE per CDC batch; strictly increasing mtimes pin
        // the file source's replay order to commit order
        Seq(b0, b1, b2).zipWithIndex.foreach { case (b, k) =>
          val tmp = work.resolve(s"w$k")
          b.select(docs.columns.map(col).toSeq: _*)
            .coalesce(1).write.parquet(tmp.toString)
          val part = java.nio.file.Files.list(tmp).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).next()
          val dst = feed.resolve(s"b$k.parquet")
          java.nio.file.Files.move(part, dst)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + k * 60000L))
          deleteRecursively(tmp)
        }
        val session = s.newSession()
        session.conf.set("spark.sql.shuffle.partitions", "4")
        val query = session.readStream
          .schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(feed.toString)
          .writeStream
          .option("checkpointLocation", work.resolve("ckpt").toString)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
            cat.merge("docs_cdc", df, "doc_id"); ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
      } finally deleteRecursively(work)
      cat.table("docs_cdc")
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("lang", "source")
    },

    // ---- streaming heavy hitters: the count-min sketch built AS A
    // STREAMING AGGREGATE — the sketch Aggregator's merge is associative
    // and commutative, so micro-batch partials combine exactly like
    // map-side partials in batch and the final sketch is bit-identical
    // to the batch build regardless of batch boundaries. This is the
    // 100 TB streaming-frequency path: state is the depth×width cell
    // array (32 KiB), NOT per-key counters — unbounded key cardinality,
    // bounded state, no watermark needed (Complete mode over a global
    // 1-row aggregate). The md5-derived hashes make it engine-portable:
    // the oracle REBUILDS the identical sketch in SQL, estimates
    // included. Probe side = exact top-10 user ids (batch), joined to
    // the 1-row streamed sketch by broadcast (PlanSpec-allowlisted) ----
    Q(
      "stream_heavy_hitters",
      """WITH toks AS (SELECT CAST(user_id AS VARCHAR) AS token FROM events),
        |cells AS (
        |  SELECT r, ('0x' || substr(md5('cm' || CAST(r AS VARCHAR) || ':' || token), 1, 15))::BIGINT % 1024 AS b,
        |    COUNT(*) AS c
        |  FROM toks CROSS JOIN (SELECT unnest([0,1,2,3]) AS r) GROUP BY 1, 2),
        |exact AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS n_exact FROM toks GROUP BY token
        |  ORDER BY n_exact DESC, token LIMIT 10)
        |SELECT e.token, e.n_exact, CAST(MIN(c.c) AS BIGINT) AS cms_est,
        |  CAST(MIN(c.c) AS BIGINT) >= e.n_exact AS never_under
        |FROM exact e JOIN cells c
        |  ON c.b = ('0x' || substr(md5('cm' || CAST(c.r AS VARCHAR) || ':' || e.token), 1, 15))::BIGINT % 1024
        |GROUP BY e.token, e.n_exact
        |ORDER BY n_exact DESC, token""".stripMargin,
    ) { (s, d) =>
      import graft.functions.CountMinSketch
      val sketch = withStagedEvents(s, d) { stageDir =>
        runToFiles(s, "stream_hh", { session =>
          val stream = session.readStream
            .schema(eventsSchema)
            .parquet(stageDir)
            .select(col("user_id").cast("string").as("token"))
            .agg(CountMinSketch.sketchAgg(
              CountMinSketch.buckets(col("token"))).as("cms"))
          (stream, org.apache.spark.sql.streaming.OutputMode.Complete())
        })
      }
      val toks = graft.Tables.events(s, d)
        .select(col("user_id").cast("string").as("token"))
      toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token")).limit(10)
        .crossJoin(broadcast(sketch))
        .select(col("token"), col("n_exact"),
          CountMinSketch.estimate(col("cms"), col("token")).as("cms_est"))
        .withColumn("never_under", col("cms_est") >= col("n_exact"))
        .orderBy(col("n_exact").desc, col("token"))
    },

    // ---- streaming embedding near-dup: vectors arrive in four
    // micro-batches; each batch finds its within-batch SRP pairs AND
    // probes the PERSISTED block index of everything already arrived
    // (exact-cosine verified), then appends its own block rows and the
    // found pairs to catalog tables. State is a versioned parquet index
    // on disk — NOT in-memory stream state — so per-batch probe cost is
    // batch-linear and total state is corpus-sized storage, the same
    // discipline as the persisted MinHash index. A pair is found exactly
    // once (when its LATER vector arrives), so the union over batches
    // equals the batch self-join EXACTLY — same oracle as
    // dedup_embedding_srp ----
    Q.weekly("stream_dedup_embedding",
      graft.operators.Similarity.srpOracleSql(0.4, 64, 32)) { (s, d) =>
      streamSrpDedup(s, graft.Tables.embeddings(s, d),
        threshold = 0.4, dim = 64)
        .select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim_r"))
        .orderBy("vec_a", "vec_b")
    },
  )

  /** Streaming SRP near-dup core (see the `stream_dedup_embedding`
    * registration comment): feed `emb` in four mod-4 micro-batches; each
    * batch finds within-batch pairs and probes the persisted block index
    * of everything already arrived. Returns the full (vec_a, vec_b, sim)
    * pair table — equal to the batch self-join by construction.
    */
  private[graft] def streamSrpDedup(s: SparkSession, emb: DataFrame,
      threshold: Double, dim: Int): DataFrame = {
    import graft.operators.Similarity
    val cat = new graft.sources.Catalog(
      s, graft.operators.CatalogOps.tempWarehouse())
    // normalize to nullable element types: the stream source reads parquet
    // arrays as containsNull=true, and a cast to a non-null-element array
    // is not allowed — the declared schema must be the permissive form
    def asNullable(dt: DataType): DataType = dt match {
      case ArrayType(e, _) => ArrayType(asNullable(e), containsNull = true)
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = asNullable(f.dataType), nullable = true)))
      case other => other
    }
    // Both sink tables are PARTITIONED by the writing batch id: foreachBatch
    // is at-least-once, and the two inserts below are not atomic — a retry
    // after the pairs insert but before the index insert would otherwise
    // commit duplicate pair rows. Each attempt first drops its own batch's
    // partition (metadata-only O(1); a no-op on the first attempt,
    // self-healing on a retry), then inserts — so stream == batch equality
    // holds under replays.
    cat.create("emb_idx", StructType(asNullable(
      Similarity.srpBlockRows(emb.limit(1), "vec_id", "embedding", dim, 32).schema)
      .asInstanceOf[StructType].fields :+ StructField("batch_id", LongType)),
      partitionBy = Some("batch_id"))
    cat.create("emb_pairs", StructType(Seq(
      StructField("vec_a", LongType), StructField("vec_b", LongType),
      StructField("sim", DoubleType), StructField("batch_id", LongType))),
      partitionBy = Some("batch_id"))
    val work = java.nio.file.Files.createTempDirectory("graft_semb_")
    try {
      val feed = java.nio.file.Files.createDirectory(work.resolve("feed"))
      (0 until 4).foreach { k =>
        val tmp = work.resolve(s"w$k")
        emb.filter(col("vec_id") % 4 === k)
          .coalesce(1).write.parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).next()
        val dst = feed.resolve(s"b$k.parquet")
        java.nio.file.Files.move(part, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + k * 60000L))
        deleteRecursively(tmp)
      }
      val session = s.newSession()
      session.conf.set("spark.sql.shuffle.partitions", "4")
      val query = session.readStream
        .schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed.toString)
        .writeStream
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          // idempotent replay: drop any partial rows a failed earlier
          // attempt of THIS batch left behind before re-inserting
          cat.deletePartition("emb_pairs", String.valueOf(batchId))
          cat.deletePartition("emb_idx", String.valueOf(batchId))
          val blocks = Similarity
            .srpBlockRows(df, "vec_id", "embedding", dim, 32)
            .transform(graft.Tables.pin) // consumed by probe AND index insert
          val probe = blocks.select(col("vec_id").as("__b_id"),
            col("embedding").as("__b_vec"), col("blk"), col("key"))
          val cross = cat.table("emb_idx")
            .join(broadcast(probe), Seq("blk", "key"))
            .select(col("vec_id").as("__i_id"), col("embedding").as("__i_vec"),
              col("__b_id"), col("__b_vec"))
            .distinct()
            .withColumn("sim",
              graft.functions.VectorFunctions.cosine(col("__i_vec"), col("__b_vec")))
            .filter(col("sim") >= threshold)
            .select(least(col("__i_id"), col("__b_id")).as("vec_a"),
              greatest(col("__i_id"), col("__b_id")).as("vec_b"), col("sim"))
          val within = Similarity
            .srpNearDupPairs(df, "vec_id", "embedding", threshold, dim = dim)
          cat.insert("emb_pairs",
            cross.unionByName(within).withColumn("batch_id", lit(batchId)))
          cat.insert("emb_idx", blocks.withColumn("batch_id", lit(batchId)))
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    } finally deleteRecursively(work)
    cat.table("emb_pairs").drop("batch_id")
  }
}
