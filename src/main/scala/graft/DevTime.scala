package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the expensive queries' building
  * blocks (`runMain graft.DevTime <sfDir>`) — where does the wall-clock
  * actually go. Sibling of [[ExplainProbe]]; not part of the driver
  * contract.
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(fn: => Unit): Unit = {
      val t0 = System.nanoTime(); fn
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (args.contains("wp")) {
      import graft.operators.{Similarity, TextOps}
      val docs = Tables.documents(spark, sfDir)
      val dir = Similarity.withStagedIndex(spark, sfDir, "wordpiece:150:6",
        fixture = "documents.parquet") { tmp =>
        graft.sources.ModelStore.saveMerges(spark, tmp,
          TextOps.wordpieceTrain(docs, 150, 6)._1.map(m => (m._1, m._2, m._3, m._4)))
      }
      val merges = graft.sources.ModelStore.loadMerges(spark, dir).map(m => (m._2, m._3))
      mat(docs.limit(1).toDF()) // warm
      // mirrors wordpieceApplyCorpus as of the r20 literal-vocab rewrite:
      // stages are (alphabet collect) → (join-free greedy fold) → full row
      (1 to 2).foreach { i =>
        val words = docs.select(col("doc_id"), explode(filter(
            split(lower(col("text")), "[^a-z]+"),
            w => length(w) > 0)).as("word"))
        val dw = words.select("word").distinct()
          .repartition(spark.sessionState.conf.numShufflePartitions, col("word"))
        var vocab: Array[String] = Array()
        t(s"[$i] alphabet collect") {
          val alphabet = dw
            .select(explode(sequence(lit(1), length(col("word")))).as("p"), col("word"))
            .select(expr("substring(word, p, 1)").as("piece")).distinct()
            .collect().map(_.getString(0))
          vocab = (alphabet ++ merges.map { case (a, b) => a + b }).distinct
        }
        val maxL = vocab.map(_.length).max
        val vmapLit = vocab.sorted.map(p => s"'$p', 1").mkString("map(", ", ", ")")
        val enc = dw
          .withColumn("seg", expr(TextOps.greedyMatchExpr(maxL, vmapLit)))
          .select(col("word"), split(col("seg.t"), "[|]").as("toks"))
        t(s"[$i] enc fold")(mat(enc))
        t(s"[$i] full registered row")(mat(
          SparkEntry.queries("wordpiece_encode_served")(spark, sfDir)))
      }
      spark.stop(); return
    }
    if (args.contains("bpe")) {
      import graft.operators.{Similarity, TextOps}
      val docs = Tables.documents(spark, sfDir)
      val dir = Similarity.withStagedIndex(spark, sfDir, "bpe:150:6",
        fixture = "documents.parquet") { tmp =>
        graft.sources.ModelStore.saveMerges(spark, tmp,
          TextOps.bpeTrain(docs, topN = 150, rounds = 6)._1)
      }
      val merges = graft.sources.ModelStore.loadMerges(spark, dir)
      mat(docs.limit(1).toDF()) // warm
      (1 to 2).foreach { i =>
        t(s"[$i] words explode+pin+count") {
          val words = docs.select(col("doc_id"), explode(filter(
              split(lower(col("text")), "[^a-z]+"),
              w => length(w) > 0)).as("word"))
          mat(words)
        }
        val words = docs.select(col("doc_id"), explode(filter(
            split(lower(col("text")), "[^a-z]+"),
            w => length(w) > 0)).as("word"))
          .transform(graft.Tables.pin)
        val table = merges
          .map { case (_, a, b, _) => s"named_struct('a', '$a', 'b', '$b')" }
          .mkString("array(", ", ", ")")
        val fold =
          s"""aggregate(
             |  $table,
             |  filter(split(word, ''), s -> s <> ''),
             |  (ts, m) -> aggregate(
             |    sequence(1, size(ts)),
             |    named_struct('o', cast(array() as array<string>), 'skip', false),
             |    (st, i) -> CASE
             |      WHEN st.skip THEN named_struct('o', st.o, 'skip', false)
             |      WHEN i < size(ts) AND element_at(ts, i) = m.a
             |           AND element_at(ts, i + 1) = m.b
             |        THEN named_struct('o', array_append(st.o, concat(m.a, m.b)),
             |             'skip', true)
             |      ELSE named_struct('o', array_append(st.o, element_at(ts, i)),
             |           'skip', false) END,
             |    st -> st.o))""".stripMargin
        val dw = words.select("word").distinct()
          .repartition(spark.sessionState.conf.numShufflePartitions, col("word"))
          .withColumn("toks", expr(fold))
        t(s"[$i] distinct words only")(mat(words.select("word").distinct()))
        t(s"[$i] dw fold")(mat(dw))
        val wordToks = dw.select(col("word"),
          size(col("toks")).cast("long").as("n_toks"), col("toks"))
        val perDoc = words.join(wordToks, Seq("word"))
        t(s"[$i] nTok agg")(mat(
          perDoc.groupBy("doc_id").agg(sum("n_toks").as("n_tokens"))))
        t(s"[$i] types agg")(mat(
          perDoc.select(col("doc_id"), explode(col("toks")).as("sym"))
            .groupBy("doc_id")
            .agg(countDistinct(col("sym")).cast("long").as("n_token_types"))))
        t(s"[$i] full bpeApplyCorpus")(mat(
          TextOps.bpeApplyCorpus(docs, merges)))
        t(s"[$i] full registered row")(mat(
          SparkEntry.queries("bpe_corpus_tokens_served")(spark, sfDir)))
      }
      spark.stop(); return
    }
    if (args.contains("cta")) {
      // corpusTokenAggs shape decomposition (r20): where does the
      // dedup-first form spend its time vs the r19 two-consumer form
      import graft.operators.{Similarity, TextOps}
      val docs = Tables.documents(spark, sfDir)
      val dir = Similarity.withStagedIndex(spark, sfDir, "bpe:150:6",
        fixture = "documents.parquet") { tmp =>
        graft.sources.ModelStore.saveMerges(spark, tmp,
          TextOps.bpeTrain(docs, topN = 150, rounds = 6)._1)
      }
      val merges = graft.sources.ModelStore.loadMerges(spark, dir)
      mat(docs.limit(1).toDF()) // warm
      (1 to 2).foreach { i =>
        val words = docs.select(col("doc_id"), explode(filter(
            split(lower(col("text")), "[^a-z]+"),
            w => length(w) > 0)).as("word"))
        t(s"[$i] words explode only")(mat(words))
        val dwc = words.groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        t(s"[$i] dwc groupBy")(mat(dwc))
        val table = merges
          .map { case (_, a, b, _) => s"named_struct('a', '$a', 'b', '$b')" }
          .mkString("array(", ", ", ")")
        val fold =
          s"""aggregate(
             |  $table,
             |  filter(split(word, ''), s -> s <> ''),
             |  (ts, m) -> aggregate(
             |    sequence(1, size(ts)),
             |    named_struct('o', cast(array() as array<string>), 'skip', false),
             |    (st, i) -> CASE
             |      WHEN st.skip THEN named_struct('o', st.o, 'skip', false)
             |      WHEN i < size(ts) AND element_at(ts, i) = m.a
             |           AND element_at(ts, i + 1) = m.b
             |        THEN named_struct('o', array_append(st.o, concat(m.a, m.b)),
             |             'skip', true)
             |      ELSE named_struct('o', array_append(st.o, element_at(ts, i)),
             |           'skip', false) END,
             |    st -> st.o))""".stripMargin
        val dwCheap = dwc.select("word").distinct()
          .repartition(spark.sessionState.conf.numShufflePartitions, col("word"))
          .withColumn("toks", expr("array(word)")) // stand-in cheap fold
        val dw = dwc.select("word").distinct()
          .repartition(spark.sessionState.conf.numShufflePartitions, col("word"))
          .withColumn("toks", expr(fold))
        t(s"[$i] dw real fold solo")(mat(dw))
        val joinedCheap = dwc.join(broadcast(dwCheap.select(col("word"),
          size(col("toks")).cast("long").as("n_toks"),
          array_distinct(col("toks")).as("syms"))), Seq("word"))
        t(s"[$i] dwc+bjoin cheapfold")(mat(joinedCheap))
        val joined = dwc.join(broadcast(dw.select(col("word"),
          size(col("toks")).cast("long").as("n_toks"),
          array_distinct(col("toks")).as("syms"))), Seq("word"))
        t(s"[$i] dwc+bjoin")(mat(joined))
        val agg = joined.groupBy("doc_id")
          .agg(sum(col("c") * col("n_toks")).as("n_tokens"),
            size(array_distinct(flatten(collect_set(col("syms")))))
              .cast("long").as("n_token_types"))
          .orderBy("doc_id")
        t(s"[$i] +agg(doc)+sort")(mat(agg))
        t(s"[$i] full registered row")(mat(
          SparkEntry.queries("bpe_corpus_tokens_served")(spark, sfDir)))
      }
      spark.stop(); return
    }
    if (args.contains("bask")) {
      // basket_association_rules reuse check (r20 verdict item 8): if the
      // three consumers of the deduped basket table really share one
      // exchange, the full row should cost ~ one b-subtree + the pair
      // fan-out, not 3× b
      mat(Tables.lineitem(spark, sfDir).limit(1).toDF()) // warm
      (1 to 2).foreach { i =>
        val b = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        t(s"[$i] b distinct solo")(mat(b))
        val pairsOnly = b.groupBy("ok")
          .agg(array_sort(collect_list(col("pk"))).as("ps"))
          .repartition(spark.sparkContext.defaultParallelism)
          .select(explode(expr(
            "flatten(transform(ps, (x, i) -> " +
              "transform(slice(ps, i + 2, size(ps) - i - 1), " +
              "y -> shiftleft(x, 32) + y)))")).as("pr"))
          .groupBy("pr").agg(count(lit(1)).as("supp_ab"))
          .filter(col("supp_ab") >= 2)
        t(s"[$i] pairs subtree")(mat(pairsOnly))
        t(s"[$i] full registered row")(mat(
          SparkEntry.queries("basket_association_rules")(spark, sfDir)))
      }
      spark.stop(); return
    }
    if (args.contains("pr")) {
      // graph_pagerank A/B at final HEAD (r20 verdict item 7): the code
      // relies on AQE stage reuse across the 3 iteration subtrees instead
      // of pinning (r18 A/B said pin is slower) — re-verify both arms
      import org.apache.spark.sql.DataFrame
      mat(Tables.orders(spark, sfDir).limit(1).toDF()) // warm
      def build(pin: Boolean): DataFrame = {
        val pairs = Tables.orders(spark, sfDir)
          .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
          .distinct()
        val edges0 = pairs
          .select(explode(array(
            struct(col("c").as("src"), (col("s") + 1000000L).as("dst")),
            struct((col("s") + 1000000L).as("src"), col("c").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        val edges = if (pin) graft.Tables.pin(edges0) else edges0
        val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
        val nodes = edges.select(col("src").as("id")).distinct()
        val nTot = nodes.agg(count(lit(1)).as("n"))
        val edgesDeg0 = edges.join(deg, "src")
        val edgesDeg = if (pin) graft.Tables.pin(edgesDeg0) else edgesDeg0
        var r = nodes.crossJoin(broadcast(nTot))
          .select(col("id"), expr("1000000000 DIV n").as("r"))
        for (_ <- 1 to 3) {
          val contrib = edgesDeg
            .join(r.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id"))
            .agg(sum(expr("r DIV outdeg")).as("s"))
          r = nodes.crossJoin(broadcast(nTot))
            .join(contrib, Seq("id"), "left")
            .select(col("id"), (expr("150000000 DIV n")
              + expr("(85 * COALESCE(s, 0)) DIV 100")).as("r"))
        }
        r.select(col("id"), col("r").as("rank_nanos"))
          .orderBy(col("rank_nanos").desc, col("id")).limit(50)
      }
      (1 to 2).foreach { i =>
        t(s"[$i] pagerank reuse (as shipped)")(mat(build(pin = false)))
        t(s"[$i] pagerank pinned edgesDeg")(mat(build(pin = true)))
        t(s"[$i] registered row")(mat(
          SparkEntry.queries("graph_pagerank")(spark, sfDir)))
      }
      spark.stop(); return
    }
    if (args.contains("svc")) {
      // stream_view_click_left_join floor decomposition (r20 verdict
      // item 6): watermark head job vs streaming machinery vs final sort
      import graft.streaming.StreamingOps
      mat(Tables.events(spark, sfDir).limit(1).toDF()) // warm
      (1 to 3).foreach { i =>
        t(s"[$i] wm head job") {
          Tables.events(spark, sfDir)
            .filter(col("event_type").isin("view", "click"))
            .groupBy("event_type").agg(max(expr("ts_ns div 1000")).as("m"))
            .agg(min(col("m")).as("wm")).head().getLong(0)
        }
        t(s"[$i] raw stream (stage+run)")(mat(
          StreamingOps.viewClickLeftOuterJoinRaw(spark, sfDir).toDF()))
        t(s"[$i] full registered row")(mat(
          SparkEntry.queries("stream_view_click_left_join")(spark, sfDir)))
        t(s"[$i] inner-join row (ref)")(mat(
          SparkEntry.queries("stream_view_click_join")(spark, sfDir)))
      }
      spark.stop(); return
    }
    if (args.contains("cat")) {
      // catalog_sql_dml lifecycle decomposition (r20 verdict item 4):
      // which statement owns the wall-clock, and how much is write jobs
      import graft.sources.{Catalog, CatalogSql, GraftSql}
      mat(Tables.documents(spark, sfDir).limit(1).toDF()) // warm
      (1 to 2).foreach { i =>
        GraftSql.registerFixtures(spark, sfDir)
        val wh = java.nio.file.Files.createTempDirectory("graft_wh_").toString
        val cat = new Catalog(spark, wh)
        def x(label: String, q: String) =
          t(s"[$i] $label")(CatalogSql.exec(spark, cat, q))
        x("ctas", """CREATE TABLE docs_sql AS
          |SELECT doc_id, text, lang, CAST(n_chars AS BIGINT) AS n_chars
          |FROM documents""".stripMargin)
        x("alter", "ALTER TABLE docs_sql ADD COLUMN tag STRING DEFAULT 'base'")
        x("merge", """MERGE INTO docs_sql USING (
          |  SELECT doc_id, text, lang, CAST(n_chars + 1000 AS BIGINT) AS n_chars,
          |         'merged' AS tag
          |  FROM documents WHERE doc_id % 7 = 3) src
          |ON docs_sql.doc_id = src.doc_id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        x("delete", "DELETE FROM docs_sql WHERE doc_id % 5 = 0")
        x("insert", """INSERT INTO docs_sql
          |SELECT CAST(doc_id + 10000000 AS BIGINT) AS doc_id, text, lang,
          |       CAST(n_chars AS BIGINT) AS n_chars, 'fresh' AS tag
          |FROM documents WHERE doc_id % 11 = 5""".stripMargin)
        t(s"[$i] select+mat")(mat(CatalogSql.exec(spark, cat,
          """SELECT lang, tag, CAST(COUNT(*) AS BIGINT) AS n_docs,
            |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
            |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
            |  CAST(MAX(doc_id) AS BIGINT) AS max_id
            |FROM docs_sql GROUP BY lang, tag ORDER BY lang, tag""".stripMargin)))
        t(s"[$i] full registered row")(mat(
          SparkEntry.queries("catalog_sql_dml")(spark, sfDir)))
        val nf = java.nio.file.Files.walk(java.nio.file.Paths.get(wh))
          .filter(p => p.toString.endsWith(".parquet")).count()
        println(s"[$i] parquet files in warehouse: $nf")
      }
      spark.stop(); return
    }
    if (args.contains("cap")) {
      // stage decomposition of exactJaccardPairs / dedup_jaccard_capped
      // (r20: 2× slower at 32 cores than 8 on this host — which stage)
      import graft.operators.Dedup
      val docs = Tables.documents(spark, sfDir)
      mat(docs.limit(1).toDF()) // warm
      (1 to 2).foreach { i =>
        val sh0raw = Dedup.explodedShingles(Tables.fanOut(docs), "doc_id",
          Dedup.shingles3(col("text")))
          .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
        t(s"[$i] explode+hash (no pin)")(mat(sh0raw))
        var sh0: org.apache.spark.sql.DataFrame = null
        t(s"[$i] pin explode") { sh0 = graft.Tables.pin(sh0raw) }
        val hot = sh0.groupBy("sh").count().filter(col("count") > 5).select("sh")
        t(s"[$i] hot df agg")(mat(hot))
        val sh = sh0.join(broadcast(hot), Seq("sh"), "left_anti")
        t(s"[$i] anti join")(mat(sh))
        val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        val a = sh.select(col("doc_id").as("doc_a"), col("sh"))
        val b = sh.select(col("doc_id").as("doc_b"), col("sh"))
        val inter = a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
        t(s"[$i] self join+agg")(mat(inter))
        t(s"[$i] full registered row")(mat(
          SparkEntry.queries("dedup_jaccard_capped")(spark, sfDir)))
        t(s"[$i] minhash row")(mat(
          SparkEntry.queries("dedup_minhash")(spark, sfDir)))
      }
      spark.stop(); return
    }
    if (args.contains("jacc")) {
      // stage decomposition of prefixFilteredJaccardPairs (r16 verdict's
      // dedup_ngram_jaccard watch item): which stage owns the ~2.9 s
      import graft.operators.Dedup
      val docs = Tables.documents(spark, sfDir)
      val sh = Dedup.explodedShingles(Tables.fanOut(docs), "doc_id",
        Dedup.shingles3(col("text")))
        .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
      mat(sh.limit(1).toDF()) // warm
      (1 to 2).foreach { i =>
        t(s"[$i] explode+hash")(mat(sh))
        val docFreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        t(s"[$i] docFreq")(mat(docFreq))
        val arr = sh.join(docFreq, "sh")
          .groupBy(col("doc_id"))
          .agg(transform(
            sort_array(collect_list(struct(col("df"), col("sh")))),
            s => s.getField("sh")).as("arr"))
        t(s"[$i] arr (join+collect+sort)")(mat(arr))
        val eps = 1e-9
        val threshold = 0.8
        val pref = arr
          .select(col("doc_id"), size(col("arr")).as("sz"), col("arr"))
          .select(col("doc_id"), col("sz"), posexplode(
            slice(col("arr"), lit(1),
              (col("sz") - ceil(lit(threshold) * col("sz") - lit(eps)) + 1).cast("int")))
            .as(Seq("pos0", "sh")))
        val a = pref.select(
          col("doc_id").as("doc_a"), col("sh"), (col("pos0") + 1).as("pa"), col("sz").as("na"))
        val b = pref.select(
          col("doc_id").as("doc_b"), col("sh"), (col("pos0") + 1).as("pb"), col("sz").as("nb"))
        val cand = a.join(b, Seq("sh"))
          .filter(col("doc_a") < col("doc_b"))
          .filter(least(col("na"), col("nb")).cast("double")
            >= lit(threshold) * greatest(col("na"), col("nb")) - lit(eps))
          .groupBy("doc_a", "doc_b", "na", "nb")
          .agg(min(least(col("pa"), col("pb"))
            + least(col("na") - col("pa"), col("nb") - col("pb"))).as("ub"))
          .filter(col("ub").cast("double")
            >= lit(threshold / (1 + threshold)) * (col("na") + col("nb")) - lit(eps))
          .select("doc_a", "doc_b")
        t(s"[$i] cand (prefix join)")(mat(cand))
        t(s"[$i] full query")(mat(
          SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir)))
        t(s"[$i] merge full")(mat(
          SparkEntry.queries("catalog_merge")(spark, sfDir)))
      }
      spark.stop(); return
    }

    val cp = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    // warm
    mat(cp.limit(1).toDF())
    t("cp distinct")(mat(cp))
    val cpP = cp.localCheckpoint(true)
    val deg = cpP.groupBy("p").agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2 && col("d") <= 64)
    t("deg from pinned cp")(mat(deg))
    val grouped = cpP.join(deg, "p")
      .select(col("p"), col("c"), expr("1000000L DIV d").as("w_mic"))
      .groupBy("p")
      .agg(array_sort(collect_list(col("c"))).as("cs"),
        first(col("w_mic")).as("w_mic"))
    t("grouped arrays")(mat(grouped))
    val gP = grouped.localCheckpoint(true)
    val pairs = gP.select(col("w_mic"), explode(expr(
      "flatten(transform(cs, (x, i) -> " +
        "transform(slice(cs, i + 2, size(cs) - i - 1), " +
        "y -> shiftleft(x, 32) + y)))")).as("pk"))
    t("pairs explode only")(mat(pairs))
    t("pairs count")(println("n_pairs=" + pairs.count()))
    val agg = pairs.groupBy("pk")
      .agg(count(lit(1)).as("n_common"), sum(col("w_mic")).as("ra_mic"))
    t("pair agg")(mat(agg))
    t("full query repeat")(mat(
      SparkEntry.queries("graph_link_predict_ra")(spark, sfDir)))
    t("full query repeat2")(mat(
      SparkEntry.queries("graph_link_predict_ra")(spark, sfDir)))
    spark.stop()
  }
}
