package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints one JSON line.
  *
  * Measurement protocol (the round-13 verdict's ask — the recorded value
  * must be a MEDIAN, not whatever one contended run happened to read):
  *  - every query gets 1 untimed warm-up + `max(SPARK_GRAFT_BENCH_RUNS, 3)`
  *    timed runs and reports the median — the same statistic BASELINE.md
  *    used, robust to the transient machine-contention spikes that made
  *    three rounds of one-shot records unrepresentative (19.2 s vs a
  *    2.9 s same-day median for the same query, byte-identical code);
  *  - BETWEEN queries: blocking unpersist of everything the query
  *    pinned, `clearCache()`, and an untimed GC — later queries are not
  *    timed under earlier queries' block-manager debt;
  *  - every `restartEvery` queries the whole SparkSession is torn down
  *    and rebuilt (untimed, ~1 s in local mode): codegen-cache, broadcast
  *    and shuffle-tracking state cannot accumulate across a 249-query
  *    suite the way a single long-lived JVM session lets them. Each query
  *    still warms up once after a restart, so JIT state is the only
  *    cross-boundary carryover.
  *
  * Output contract (three records, one source of truth):
  *  - the COMPLETE full-precision per-query record, rewritten on every
  *    run, in the repo working dir — tier-named so records stay
  *    comparable round over round: `BENCH_local.json` (full tier ONLY),
  *    `BENCH_local_default.json` (default tier, weekly rows skipped),
  *    `BENCH_local_filtered.json` (name-filtered runs). The harness that
  *    invokes this main captures only the tail of sbt's stdout (~2000
  *    chars); the full per-query map plus names alone exceeds that
  *    window, so the durable complete record lives on disk.
  *  - `BENCH_metric.json`: byte-identical copy of the compact stdout
  *    line — the machine-readable metric for harnesses whose tail
  *    capture interleaves sbt/log4j chatter into stdout.
  *  - stdout, last line before sbt's epilogue: ONE compact JSON line with
  *    the suite total and the headline/perf-watch query subset, sized to
  *    always fit the tail window so it parses every round. It carries a
  *    `"local_json"` pointer to the complete record.
  */
object Bench {
  /** Queries surfaced in the printed tail-window JSON: the six BASELINE.md
    * headline queries plus the dedup/ANN/streaming perf-watch set the
    * judge tracks round over round. Everything else is in BENCH_local.json.
    */
  private val headline: Set[String] = Set(
    "q1_scan_agg", "q3_join_agg_topk", "distinct_exact", "distinct_approx",
    "window_rank", "events_sessionize_agg",
    "dedup_exact", "dedup_minhash", "dedup_ngram_jaccard",
    "dedup_jaccard_capped", "dedup_simhash", "dedup_components",
    "dedup_embedding_srp", "kafka_wire_parse", "tfidf_top_terms",
    "training_corpus_v2", "ann_topk_ivf", "ann_topk_int8", "kmeans_assign",
    "stream_hourly_agg", "stream_user_totals",
    "seq_pack", "corpus_mixture", "pii_redact", "decontaminate_fuzzy",
    "lm_unigram_score",
    "q_heavy_hitters_cms", "dedup_bloom_shingles", "stream_session_agg",
    "stream_enrich_static", "dedup_substring", "dedup_semantic",
    "quality_buckets", "lm_bigram_score", "catalog_compact",
    "dedup_semantic_scaled",
    "decontaminate_semantic", "lm_trigram_backoff", "catalog_merge",
    // r19 verdict item 1b: the text-family rows the r19 optimizations
    // landed on must be visible in the printed subset (additions-only)
    "bpe_train", "bpe_encode", "bpe_corpus_tokens", "bpe_corpus_tokens_served",
    "wordpiece_train", "wordpiece_encode", "wordpiece_encode_served",
    "unigram_train", "unigram_encode", "unigram_encode_served")

  private def buildSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Let AQE size post-shuffle partitions by bytes (advisory 64MB)
      // instead of defending the session's parallelism: at fixture scale
      // this collapses 32 near-empty reducers into a few right-sized ones
      // (fixed task overhead dominates small shuffles); at 100 TB the same
      // rule yields full parallelism because partitions are byte-bound.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the invoking harness records only the tail of the
    // combined output, and per-query WARN chatter (streaming's
    // ResolveWriteToStream most of all) can push the final JSON line out
    // of that window — which is exactly what blanked BENCH_r13's
    // per-query map
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // median-of-3 MINIMUM: a one-shot record is not a statistic; the env
    // var can raise the run count, never lower it below 3
    val runs = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt, 3)
    val restartEvery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RESTART", "60").toInt
    var spark = buildSession(cpus)

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    // GC attribution: total collector time is split into (a) GC that ran
    // while a query was being TIMED (inflates the recorded medians) and
    // (b) GC during the untimed between-query hygiene (System.gc() full
    // collections — wall-clock cost to the suite run, but invisible in
    // per-query numbers). The env block reports both so a "gc_sec" number
    // can be read for what it is instead of blamed on the queries.
    def gcNow(): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum / 1000.0
    }
    var gcTimed = 0.0
    var gcHygiene = 0.0

    // Full materialization via the noop sink: every projected column is
    // computed and every sort retained (a bare .count() lets Catalyst prune
    // projections/sorts, under-measuring real query cost).
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Optional comma-separated name filter for targeted timing.
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).toSet)
    // Default tier skips weekly lifecycle rows (their serving-path twins
    // are the per-round perf signal; Verify still oracle-checks them
    // every round). SPARK_GRAFT_BENCH_TIER=full times everything.
    val fullTier = sys.env.get("SPARK_GRAFT_BENCH_TIER").contains("full")
    // Global JVM warm pass: C2-compile the scan/codegen/shuffle machinery
    // before ANY query is timed — otherwise the first measured query pays
    // suite-wide JIT warm-up that later ones amortize for free.
    SparkEntry.allQ.headOption.foreach { q0 =>
      (1 to 2).foreach(_ => try materialize(q0.run(spark, sfDir))
      catch { case _: Throwable => () })
    }
    // drop blocks a query left behind (localCheckpoints of iterative /
    // cached pipelines) so later queries aren't timed under the
    // accumulated memory pressure of earlier ones. blocking = true: the
    // removal completes before the next query's timer starts, so slow
    // ContextCleaner churn can't leak block-manager pressure forward.
    def cleanBetween(): Unit = {
      val g0 = gcNow()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      // untimed GC between queries: without it, allocation-heavy queries
      // (the PPJoin pair join most of all) get timed under whatever heap
      // debt the previous ~100 queries accumulated — observed as 2.6 s
      // isolated vs 7.7 s in-suite for the same query. Standard
      // between-iteration hygiene; costs untimed milliseconds.
      System.gc()
      gcHygiene += gcNow() - g0
    }
    // Stable ordering so per-round bench JSON diffs cleanly.
    val toRun = SparkEntry.allQ
      .filter(q => filter.forall(_.contains(q.name)))
      .filter(q => fullTier || filter.isDefined || !q.weekly)
    val weeklySkipped =
      if (fullTier || filter.isDefined) Seq.empty
      else SparkEntry.allQ.filter(_.weekly).map(_.name)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // per-QUERY load average (r16 verdict item: the per-run load number
    // can't attribute which rows a host-contention burst landed on)
    val loadByQuery = scala.collection.mutable.LinkedHashMap[String, Double]()
    // per-QUERY sample count (r17 advisor: rows adaptively re-measured to
    // 5 samples reported "runs":3, so round-over-round comparisons could
    // not tell which medians were defended) — lives in the on-disk record
    val runsByQuery = scala.collection.mutable.LinkedHashMap[String, Int]()
    // per-QUERY max EXTERNAL load (loadavg minus own CPU share): the
    // value the re-run trigger fires on; the compact attribution lists
    // rows by THIS, while loadByQuery keeps raw loadavg for comparability
    val extByQuery = scala.collection.mutable.LinkedHashMap[String, Double]()
    // load-triggered re-measure (r17 verdict item 1): the >20% spread
    // trigger misses rows whose THREE samples are all uniformly slowed by
    // a contention burst — if the EXTERNAL load during the row exceeds
    // this, take two more samples even when the spread was tight.
    // "External" = 1-min loadavg minus this JVM's own instantaneous CPU
    // share in cores (r19 fix, designed in NOTES_r19 §7): the bench's own
    // 32-thread stages hold raw loadavg above 4 for the whole suite, so
    // the raw-loadavg trigger self-fired on 252/258 rows of the sf1 full
    // run (+50% wall for zero signal — the load it re-measured under was
    // the row's own). Subtracting the process's CPU share cancels
    // self-load to ~0 while a contending neighbor still shows through.
    // The attribution map keeps recording RAW loadavg for
    // round-over-round comparability.
    val loadRerunAt =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_RERUN", "4.0").toDouble
    def externalLoad(raw: Double): Double = {
      val selfCores = osBean match {
        case x: com.sun.management.OperatingSystemMXBean =>
          math.max(x.getProcessCpuLoad, 0.0) * osBean.getAvailableProcessors
        case _ => 0.0
      }
      math.max(raw - selfCores, 0.0)
    }
    // One row's full measurement protocol; `key` names the entry in the
    // load/runs attribution maps (suite-end re-measures record under
    // "<name>#end" so the start-position attribution is never clobbered).
    def measureRow(q: Q, key: String): Double = {
      val t =
        try {
          time(materialize(q.run(spark, sfDir))) // warm-up (JIT + parquet footer cache)
          val g0 = gcNow()
          // load is sampled BEFORE the first timed run and after every
          // run; the row triggers and records on the MAX observed
          // (r18 advisor: a single post-row sample misses a burst that
          // subsides before the check, and a load-triggered re-measure
          // could be recorded next to a low load value). rowLoad keeps
          // the RAW loadavg (recorded); rowExt the external estimate
          // (triggers).
          var rowLoad = osBean.getSystemLoadAverage
          var rowExt = externalLoad(rowLoad)
          // r19 advisor: right after a heavy row the JVM's own prior load
          // is still in the decayed 1-min loadavg but no longer in the
          // instantaneous getProcessCpuLoad, so a single inflated sample
          // is expected self-load tail, not a neighbor — the re-measure
          // trigger requires the threshold on MORE THAN ONE of the row's
          // samples (a genuine contender shows through on every sample it
          // overlaps). rowExt still RECORDS the max for attribution.
          var extHits = if (rowExt > loadRerunAt) 1 else 0
          def timedRun(): Double = {
            val v = time(materialize(q.run(spark, sfDir)))
            val raw = osBean.getSystemLoadAverage
            rowLoad = math.max(rowLoad, raw)
            val e = externalLoad(raw)
            if (e > loadRerunAt) extHits += 1
            rowExt = math.max(rowExt, e)
            v
          }
          var ts = (1 to runs).map(_ => timedRun())
          // adaptive re-measure: when the 3 timed runs disagree by >20%
          // of their median, the row is being bounced by host contention
          // — two more runs make the median a 5-sample statistic, which
          // is what shrinks the documented same-code band. ALSO triggered
          // by the load average alone (r17 verdict): a burst that slows
          // all three samples uniformly leaves the spread tight and the
          // median inflated — the load reading is the only tell. Gated on
          // runs == 3 exactly (r18 advisor): the adaptive path defends
          // the default median-of-3; an env-raised run count is already
          // a deliberately bigger sample.
          if (runs == 3 &&
              ((ts.max - ts.min) > 0.2 * math.max(median(ts), 1e-9) ||
                extHits >= 2))
            ts = ts ++ (1 to 2).map(_ => timedRun())
          gcTimed += gcNow() - g0
          runsByQuery(key) = ts.size
          loadByQuery(key) = rowLoad
          extByQuery(key) = rowExt
          median(ts)
        } catch { case _: Throwable =>
          runsByQuery(key) = 0
          loadByQuery(key) = osBean.getSystemLoadAverage
          extByQuery(key) = externalLoad(loadByQuery(key))
          -1.0
        }
      cleanBetween()
      t
    }
    val startResults = toRun.zipWithIndex.map { case (q, idx) =>
      if (idx > 0 && restartEvery > 0 && idx % restartEvery == 0) {
        // session rotation (untimed): bounded-state execution windows
        spark.stop()
        spark = buildSession(cpus)
      }
      q.name -> measureRow(q, q.name)
    }
    // The six BASELINE.md rows are the stock-Spark ratio anchors; the r18
    // driver record showed q1/q3 regressing ~60% under a run-START
    // contention burst while the rest of the suite got FASTER. Re-measure
    // the anchors at suite END (same full protocol, fresh session) as
    // ATTRIBUTION ONLY: the reported `queries` value is ALWAYS the
    // start-position reading (the r19 verdict: min(start, end) is a
    // one-sided estimator that biases the anchors downward and broke
    // round-over-round comparison). Both positions stay in the on-disk
    // record ("<name>#end" entries + headline_end_by_query), so a slow
    // start reading remains attributable as positional rather than code.
    val baselineAnchors = Seq("q1_scan_agg", "q3_join_agg_topk",
      "distinct_exact", "distinct_approx", "window_rank",
      "events_sessionize_agg")
    val startByName = startResults.toMap
    val endByQuery = scala.collection.mutable.LinkedHashMap[String, Double]()
    if (filter.isEmpty) {
      spark.stop()
      spark = buildSession(cpus)
      toRun.filter(q => baselineAnchors.contains(q.name) &&
          startByName.get(q.name).exists(_ >= 0))
        .foreach(q => endByQuery(q.name) = measureRow(q, q.name + "#end"))
    }
    val results = startResults
    // `value` is ALWAYS the total over every query run this invocation,
    // even when `queries` shows only the headline subset — the printed
    // tail-window line must report the same suite total as the full
    // on-disk record.
    val suiteTotal = results.map(_._2).filter(_ >= 0).sum
    // Round-over-round comparable total (r16 verdict item 3): the suite
    // total silently absorbs tier demotions/additions, so also report the
    // sum over the INTERSECTION of query names with the previous committed
    // same-tier record (read BEFORE this run overwrites it;
    // SPARK_GRAFT_BENCH_PREV points it elsewhere, e.g. a driver record).
    // Three fields: this run over the intersection, the previous record
    // over the same intersection, and the intersection size — the judge
    // reads code-level delta directly from the first two.
    def prevQueries(path: java.nio.file.Path): Map[String, Double] = {
      if (!java.nio.file.Files.exists(path)) return Map.empty
      val body = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      // a prev record at a DIFFERENT scale factor (e.g. an sf0.001 smoke
      // run's leftover) would make the delta meaningless — skip it
      val prevSf = """"sf"\s*:\s*"([^"]*)"""".r
        .findFirstMatchIn(body).map(_.group(1))
      if (!prevSf.contains(sfDir)) return Map.empty
      val qBlock = """"queries"\s*:\s*\{([^}]*)\}""".r
        .findFirstMatchIn(body).map(_.group(1)).getOrElse(return Map.empty)
      """"([^"]+)"\s*:\s*(-?[0-9][0-9.eE+-]*)""".r.findAllMatchIn(qBlock)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    // Complete full-precision record — durable, can't be tail-truncated.
    // A filtered run writes a separate file so it can't masquerade as (or
    // clobber) the full-suite record, and (r15 advisor) the default tier
    // writes a tier-suffixed file too: `BENCH_local.json` is FULL-suite
    // only, so its `total` stays comparable across rounds.
    val recordName =
      if (filter.isDefined) "BENCH_local_filtered.json"
      else if (fullTier) "BENCH_local.json"
      else "BENCH_local_default.json"
    val prev = prevQueries(java.nio.file.Paths.get(sys.props("user.dir"),
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", recordName)))
    val shared = results.collect {
      case (n, t) if t >= 0 && prev.get(n).exists(_ >= 0) => (n, t, prev(n))
    }
    val comparableJson =
      f""""comparable_total":${shared.map(_._2).sum}%.1f,""" +
        f""""comparable_prev_total":${shared.map(_._3).sum}%.1f,""" +
        s""""comparable_n":${shared.size},"""
    // Environment evidence (the round-14 finding: identical code measures
    // 2.5× apart under different machine states; medians bound but don't
    // eliminate it). Recording load/memory/GC alongside the numbers makes
    // any future builder/driver divergence attributable from artifacts.
    def envJson(): String = {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      val load = os.getSystemLoadAverage
      val freeGb = os match {
        case x: com.sun.management.OperatingSystemMXBean =>
          f"${x.getFreeMemorySize / 1e9}%.1f"
        case _ => "null"
      }
      val heapGb = f"${Runtime.getRuntime.maxMemory / 1e9}%.1f"
      val (gcN, gcSec) = {
        import scala.jdk.CollectionConverters._
        val gs = java.lang.management.ManagementFactory
          .getGarbageCollectorMXBeans.asScala
        (gs.map(_.getCollectionCount).sum,
          gs.map(_.getCollectionTime).sum / 1000.0)
      }
      s"""{"load_avg":$load,"free_mem_gb":$freeGb,"heap_gb":$heapGb,""" +
        s""""gc_count":$gcN,"gc_sec":$gcSec,""" +
        f""""gc_timed_sec":$gcTimed%.1f,"gc_hygiene_sec":$gcHygiene%.1f,""" +
        s""""cpus":$cpus}"""
    }
    val env = envJson()
    val tier =
      if (filter.isDefined) "filtered" else if (fullTier) "full" else "default"
    val weeklyJson = weeklySkipped.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The reported value is the start-position reading, so the compact
    // line only needs the END map for positional attribution; the start
    // map is recoverable from `queries` itself.
    val headlineEndJson = if (endByQuery.isEmpty) "" else
      endByQuery.map { case (k, v) => f""""$k":$v%.3f""" }
        .mkString(""""headline_end_by_query":{""", ",", "},")
    // Compact self-attribution for the tail-window line (r18 verdict
    // item 5: the driver-parsed record must let a judge attribute
    // per-row deltas without the local file). Full maps live on disk;
    // here only the rows that NEED attribution — suspect-load rows (max
    // observed > loadRerunAt, highest first) and adaptively extended or
    // errored rows — emitted under a character budget so the line keeps
    // fitting the harness's ~2000-char tail capture ("_omitted" counts
    // any truncation; "load_med" attributes every absent row).
    def compactAttribution(budget: Int): String = {
      val sb = new StringBuilder
      if (loadByQuery.nonEmpty)
        sb.append(f""""load_med":${median(loadByQuery.values.toSeq)}%.2f,""")
      // anchors first (fixed size, always wanted); the capped maps below
      // then budget against what's already emitted
      sb.append(headlineEndJson)
      def emitMap(field: String, xs: Seq[(String, String)]): Unit = {
        val kept = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < xs.size &&
            sb.length + kept.map(_.length + 1).sum +
              xs(i)._1.length + xs(i)._2.length + field.length + 40 < budget) {
          kept += "\"" + xs(i)._1 + "\":" + xs(i)._2; i += 1
        }
        sb.append("\"" + field + "\":" + kept.mkString("{", ",", "}") + ",")
        if (xs.size > kept.size)
          sb.append("\"" + field + "_omitted\":" + (xs.size - kept.size) + ",")
      }
      // listed by EXTERNAL load (the trigger's own criterion: a row here
      // was contended by a neighbor, not by its own work); the emitted
      // value stays the raw loadavg the full map records
      emitMap("load_avg_by_query", extByQuery.toSeq
        .filter(_._2 > loadRerunAt).sortBy(-_._2)
        .map { case (k, _) => k -> f"${loadByQuery(k)}%.1f" })
      emitMap("runs_by_query", runsByQuery.toSeq
        .filter(_._2 != runs).map { case (k, n) => k -> n.toString })
      sb.toString
    }
    def json(rs: Seq[(String, Double)], round: Boolean,
        withLoad: Boolean = false): String = {
      val qs = rs.map { case (k, v) =>
        val vs = if (round) f"$v%.3f" else v.toString
        "\"" + k + "\":" + vs
      }.mkString("{", ",", "}")
      // the on-disk full record carries the COMPLETE per-row load map and
      // sample counts ("<name>#end" rows are the suite-end anchor
      // re-measures). runs_by_query lists ONLY rows whose count differs
      // from the base (the adaptively re-measured ones) — an absent row
      // means exactly `runs` samples.
      val fullLoadJson = if (!withLoad) "" else
        loadByQuery.map { case (k, l) => f""""$k":$l%.2f""" }
          .mkString(""""load_avg_by_query":{""", ",", "},") +
          extByQuery.map { case (k, l) => f""""$k":$l%.2f""" }
            .mkString(""""ext_load_by_query":{""", ",", "},") +
          runsByQuery.collect { case (k, n) if n != runs => s""""$k":$n""" }
            .mkString(""""runs_by_query":{""", ",", "},") +
          headlineEndJson
      val head = s"""{"metric":"total","value":$suiteTotal,"unit":"sec",""" +
        comparableJson + s""""queries":$qs,"""
      val tail = s""""local_json":"$recordName","tier":"$tier","runs":$runs,""" +
        s""""sf":"$sfDir","env":$env,"weekly_skipped":$weeklyJson}"""
      // 1750, not ~2000: sbt's epilogue ("[success] Total time ...")
      // prints AFTER this line and shares the same tail window — the
      // measured smoke line at budget 1950 came to 1993 chars, which an
      // epilogue would push out of a 2000-char capture
      val attrib = if (withLoad) fullLoadJson
        else compactAttribution(1750 - head.length - tail.length)
      head + attrib + tail
    }
    def writeRecord(name: String, body: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sys.props("user.dir"), name),
        (body + "\n").getBytes("UTF-8"))
    writeRecord(recordName, json(results, round = false, withLoad = true))
    // The compact headline line ALSO lands in a dedicated file: the
    // invoking harness's tail window mixes sbt/log4j chatter into stdout
    // (BENCH_r15.json recorded "parsed": null because of it), so the
    // machine-readable copy of exactly what stdout prints lives on disk.
    // Filtered runs SKIP it (r16 advisor): a partial total must never
    // clobber the durable suite metric.
    if (filter.isEmpty)
      writeRecord("BENCH_metric.json",
        json(results.filter(r => headline.contains(r._1)), round = true))
    // stop FIRST, print LAST: shutdown-time log lines must not land after
    // the compact headline line and push it out of the harness's
    // ~2000-char tail window.
    spark.stop()
    println(json(results.filter(r => headline.contains(r._1)), round = true))
  }
}
