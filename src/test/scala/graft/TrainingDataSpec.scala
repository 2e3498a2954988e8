package graft

import graft.operators.TrainingData
import org.apache.spark.sql.functions._

/** Training-set assembly: connected components, dup-cluster resolution,
  * hash split, stratified sampling.
  */
class TrainingDataSpec extends SparkSpec {

  import spark.implicits._

  test("connectedComponents resolves chains, cliques and isolated pairs") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
    ).toDF("a", "b")
    val comp = TrainingData.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("star CC ≡ min-label CC on chain / clique / random graphs") {
    // deterministic xorshift edge generator (no runtime randomness)
    def rng(seed: Long): Iterator[Long] = Iterator.iterate(seed) { s =>
      var z = s; z ^= z << 13; z ^= z >>> 7; z ^= z << 17; z
    }.drop(1)
    val chain = (1L to 64L).sliding(2).map(p => (p(0), p(1))).toSeq
    val clique = for (i <- 1L to 12L; j <- (i + 1) to 12L) yield (i, j)
    val random = rng(42L).take(200).grouped(2).collect {
      case Seq(x, y) => (math.floorMod(x, 80).toLong, math.floorMod(y, 80).toLong)
    }.filter(p => p._1 != p._2).toSeq
    for ((name, es) <- Seq("chain" -> chain, "clique" -> clique, "random" -> random)) {
      val edges = es.toDF("a", "b")
      def key(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = key(TrainingData.connectedComponentsStar(edges, "a", "b"))
      val label = key(TrainingData.connectedComponentsMinLabel(edges, "a", "b", 80))
      assert(star == label, s"graph $name")
    }
    // a 64-chain converges in far fewer star rounds than its diameter
    // (the require(converged) inside would throw at maxIter otherwise)
    val comp = TrainingData.connectedComponentsStar(chain.toDF("a", "b"), "a", "b", 8)
      .collect().map(r => r.getLong(1)).distinct
    assert(comp sameElements Array(1L))
  }

  test("adaptive CC escalates to star contraction on a planted length-1000 chain") {
    // diameter 999: min-label alone would need ~999 rounds (and throws at
    // its bound), so the adaptive path MUST hand over to the O(log n)
    // star contraction after its few probe rounds — and still finish
    // within the default maxIter=20 budget
    val chain = (1L to 1000L).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    intercept[IllegalArgumentException] {
      TrainingData.connectedComponentsMinLabel(chain, "a", "b", 8)
    }
    val comp = TrainingData.connectedComponents(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comp.length == 1000)
    assert(comp.forall(_._2 == 1L), "every chain node must resolve to component 1")
  }

  test("CC convergence probes piggyback on the round jobs — no driver collect/count") {
    // both CC variants observe their convergence metrics inside each
    // round's own checkpoint job; a separate probe would surface here as a
    // collect/count action on the query-execution listener
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        actions.add(funcName)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
      // constructing the result runs all iterative work (eager checkpoints)
      val label = TrainingData.connectedComponentsMinLabel(edges, "a", "b")
      val star = TrainingData.connectedComponentsStar(edges, "a", "b")
      // listener events post asynchronously; drain until the event count
      // is STABLE for a full second (a fixed sleep after the first event
      // could miss a late-posted probe action and false-pass)
      var last = -1
      var stableFor = 0
      var waited = 0
      while (waited < 15000 && stableFor < 1000) {
        Thread.sleep(200); waited += 200
        if (actions.size == last && last >= 0) stableFor += 200 else stableFor = 0
        last = actions.size
      }
      import scala.jdk.CollectionConverters._
      val probes = actions.asScala.filter(f =>
        f.startsWith("collect") || f == "count" || f == "head" || f == "first")
      assert(probes.isEmpty, s"separate driver probe actions ran: $probes")
      val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)
      assert(label.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
      assert(star.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    } finally spark.listenerManager.unregister(l)
  }

  test("dupClusters marks exactly one keeper per component with its size") {
    val pairs = Seq((5L, 9L), (9L, 7L), (30L, 31L)).toDF("doc_a", "doc_b")
    val rows = TrainingData.dupClusters(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.toSet == Set(
      (5L, 5L, 3L, true), (7L, 5L, 3L, false), (9L, 5L, 3L, false),
      (30L, 30L, 2L, true), (31L, 30L, 2L, false)))
  }

  test("hashSplit is deterministic and roughly respects the split fraction") {
    val docs = Tables.documents(spark, sf0001)
    val split1 = docs.select(col("doc_id"),
      TrainingData.hashSplit(col("doc_id"), 90).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val split2 = docs.select(col("doc_id"),
      TrainingData.hashSplit(col("doc_id"), 90).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split1 == split2)
    val trainFrac = split1.values.count(_ == "train").toDouble / split1.size
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
  }

  test("packSequences fills every non-final sequence to >= budget tokens") {
    val docs = Tables.documents(spark, sf0001)
    val packed = TrainingData.packSequences(
      docs, "doc_id", graft.functions.TextFunctions.tokens(col("text")),
      budget = 256, shards = 8)
    assert(packed.count() == docs.count()) // every doc lands in a sequence
    // start-offset rule: a single long doc may straddle past a boundary
    // and leave the NEXT sequence short, but coverage is contiguous —
    // through any non-final sequence k the shard has packed at least
    // (k+1)*budget tokens
    val perSeq = packed.groupBy("shard", "seq_id").agg(sum("n_tok").as("toks"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("seq_id")
    val cum = perSeq.withColumn("cum", sum("toks").over(w))
    val lastPerShard = packed.groupBy("shard").agg(max("seq_id").as("last"))
    val short = cum.join(lastPerShard, "shard")
      .filter(col("seq_id") < col("last") && col("cum") < (col("seq_id") + 1) * 256)
    assert(short.count() == 0)
    // determinism: same input → identical assignment
    val again = TrainingData.packSequences(
      docs, "doc_id", graft.functions.TextFunctions.tokens(col("text")),
      budget = 256, shards = 8)
    assert(packed.exceptAll(again).count() == 0)
  }

  test("batchByLength: full coverage, bounded waste, only tail batches short") {
    val docs = Tables.documents(spark, sf0001)
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val batches = TrainingData.batchByLength(
      docs, "doc_id", toks, batchSize = 16, shards = 4)
    // every non-empty doc is in exactly one batch
    val nDocs = docs.filter(size(toks) > 0).count()
    assert(batches.agg(sum("n_docs")).head.getLong(0) === nDocs)
    // no batch exceeds the batch size; at most ONE short batch per
    // (bucket, shard) — the tail
    assert(batches.filter(col("n_docs") > 16).count() === 0)
    val shorts = batches.filter(col("n_docs") < 16)
      .groupBy("bucket", "shard").count().filter(col("count") > 1)
    assert(shorts.count() === 0)
    // power-of-two buckets bound the intra-batch spread structurally:
    // max_tok < 2^(bucket+1) and every member >= 2^bucket, so padding
    // waste is < 50% for every batch
    assert(batches.filter(
      col("pad_waste_micros") >= 500000L).count() === 0)
    // determinism
    val again = TrainingData.batchByLength(
      docs, "doc_id", toks, batchSize = 16, shards = 4)
    assert(batches.exceptAll(again).count() === 0)
  }

  test("mixtureSample respects per-source token quotas within one document") {
    val docs = Tables.documents(spark, sf0001)
    val weights = (0 until 20).map(i => s"src$i" -> (i % 4 + 1) / 50.0).toMap
    val kept = TrainingData.mixtureSample(
      docs, "source", "doc_id", graft.functions.TextFunctions.tokens(col("text")),
      weights, totalTokenBudget = 3000)
    val perSource = kept.groupBy("source")
      .agg(sum("n_tok").as("toks"), max("n_tok").as("maxDoc"))
      .collect()
    assert(perSource.nonEmpty)
    perSource.foreach { r =>
      val quota = weights(r.getString(0)) * 3000
      // admitted-by-start-offset ⇒ overshoot is bounded by the last doc
      assert(r.getLong(1) < quota + r.getLong(2),
        s"${r.getString(0)}: ${r.getLong(1)} tokens vs quota $quota")
    }
  }

  test("redactPii removes every match and is idempotent") {
    val df = Seq(
      "mail a.b+c@sub.example.org here",
      "host 192.168.0.1 and tel 555-0147",
      "already <EMAIL> clean",
      "no pii at all").toDF("t")
      .select(col("t"),
        graft.functions.TextFunctions.redactPii(col("t")).as("red"),
        graft.functions.TextFunctions.piiCount(col("t")).as("n"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows(0)._2 == "mail <EMAIL> here" && rows(0)._3 == 1)
    assert(rows(1)._2 == "host <IP> and tel <PHONE>" && rows(1)._3 == 2)
    assert(rows(2)._2 == "already <EMAIL> clean" && rows(2)._3 == 0)
    assert(rows(3)._2 == "no pii at all" && rows(3)._3 == 0)
    // idempotence: redacting redacted text changes nothing
    val twice = df.select(
      graft.functions.TextFunctions.redactPii(col("red")).as("r2"), col("red"))
      .filter(col("r2") =!= col("red"))
    assert(twice.count() == 0)
  }

  test("minHashCrossPairs ≡ one-corpus near-dup pairs restricted to cross pairs") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf0001)
    val sh = graft.functions.TextFunctions.wordShingles(col("text"), 3)
    val left = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val right = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val cross = Dedup
      .minHashCrossPairs(left, "doc_id", sh, right, "doc_id", sh, 0.8)
      .select(col("doc_a"), col("doc_b"))
    // the union-corpus pairs (doc_a < doc_b), kept only when the two ids
    // fall on opposite sides, reoriented to (left, right)
    val expected = Dedup.minHashNearDupPairs(docs, "doc_id", sh, 0.8)
      .filter(pmod(col("doc_a"), lit(2)) =!= pmod(col("doc_b"), lit(2)))
      .select(
        when(pmod(col("doc_a"), lit(2)) === 0, col("doc_a")).otherwise(col("doc_b")).as("doc_a"),
        when(pmod(col("doc_a"), lit(2)) === 0, col("doc_b")).otherwise(col("doc_a")).as("doc_b"))
    assert(cross.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(cross).count() == 0)
    assert(cross.count() > 0) // the fixture has cross-parity dup pairs
  }

  test("chunkDocuments covers every token; overlap and tails behave") {
    val docs = Tables.documents(spark, sf0001)
    val chunks = TrainingData.chunkDocuments(docs, "doc_id", col("text"), 64, 48)
    val docLens = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("len"))
    // per doc: chunk count == ceil(max(len,1) / 48) over starts 1, 49, ...,
    // total chunked tokens == len + 16 per non-final chunk (the overlap)
    val agg = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"), sum("n_tokens").as("tok_sum"),
      max("n_tokens").as("max_ct"), min("n_tokens").as("min_ct"))
    val joined = agg.join(docLens, "doc_id")
      .withColumn("expect_chunks",
        ceil(greatest(col("len"), lit(1)).cast("double") / 48).cast("long"))
      // chunk sizes min(64, len−start+1) are non-increasing in start, so
      // the smallest chunk is the last one: len − 48·(n_chunks−1)
      .withColumn("expect_last", col("len") - (col("expect_chunks") - 1) * 48)
    assert(joined.filter(col("n_chunks") =!= col("expect_chunks")).isEmpty)
    assert(joined.filter(col("min_ct") =!= col("expect_last")).isEmpty)
    assert(joined.filter(col("max_ct") > 64).isEmpty)
    // coverage: chunked tokens ≥ len (every token appears), ≤ len + 16 per
    // overlap (each non-final chunk re-reads at most 16 tokens)
    assert(joined.filter(col("tok_sum") < col("len")).isEmpty)
    assert(joined.filter(
      col("tok_sum") > col("len") + (col("expect_chunks") - 1) * 16).isEmpty)
    // every doc appears; chunk_idx is dense from 0
    assert(agg.count() == docs.count())
    assert(chunks.groupBy("doc_id").agg(min("chunk_idx").as("mn")).filter(col("mn") =!= 0).isEmpty)
    intercept[IllegalArgumentException](
      TrainingData.chunkDocuments(docs, "doc_id", col("text"), 32, 48)) // stride > chunk
  }

  test("stupidBackoffScore: self-scoring never backs off; short docs drop out") {
    import graft.operators.TextOps
    val docs = Tables.documents(spark, sf0001)
    // scoring the LM corpus against itself: every trigram is in the count
    // tables, so the score is the pure trigram MLE — c3 ≤ c2 per position
    // forces every term (and the average) ≤ 0
    val self = TextOps.stupidBackoffScore(docs, docs, "doc_id", col("text"))
    assert(self.filter(col("avg_logp3") > 0).isEmpty)
    val eligible = docs
      .filter(size(graft.functions.TextFunctions.tokens(col("text"))) >= 3).count()
    assert(self.count() == eligible)
    // held-out scoring is deterministic and bounded above by 0 too (every
    // branch is the ln of a value in (0, 1]: MLE ratios ≤ 1, and the
    // backoff factors only shrink them)
    val lm = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
    val ev = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val a = TextOps.stupidBackoffScore(ev, lm, "doc_id", col("text")).collect()
    val b = TextOps.stupidBackoffScore(ev, lm, "doc_id", col("text")).collect()
    assert(a.forall(_.getDouble(1) <= 0))
    assert(a.map(r => (r.getLong(0), r.getDouble(1))).toSet
      == b.map(r => (r.getLong(0), r.getDouble(1))).toSet)
  }

  test("decontaminateSemantic always flags exact embedding copies, and only real hits") {
    val emb = Tables.embeddings(spark, sf0001)
    // plant benchmark rows that are EXACT copies of train vectors 1 and 2:
    // identical vectors produce identical SRP signatures, so every block
    // collides and the cosine-1.0 verify passes at any threshold — the
    // structural recall floor of the SRP candidate generator
    val bench = emb.filter(col("vec_id").isin(1L, 2L))
      .withColumn("vec_id", col("vec_id") + 9000L)
    val out = TrainingData.decontaminateSemantic(
      emb, bench, "vec_id", "embedding", 0.99, dim = 64)
    val flagged = out.filter(col("contaminated"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // at 0.99 nothing else in the fixture comes close (max pairwise ~0.6)
    assert(flagged == Set(1L, 2L))
    assert(out.count() == emb.count())
    assert(out.filter(col("contaminated") && col("n_matches") === 0).isEmpty)
    assert(out.filter(!col("contaminated") && col("n_matches") > 0).isEmpty)
  }

  test("stratifiedSample returns k deterministic rows per stratum") {
    val docs = Tables.documents(spark, sf0001)
    val s1 = TrainingData.stratifiedSample(docs, "lang", "doc_id", 5)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s2 = TrainingData.stratifiedSample(docs, "lang", "doc_id", 5)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s1 == s2)
    val perLang = s1.groupBy(_._1).view.mapValues(_.size).toMap
    val langCounts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    langCounts.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(5L, n).toInt,
        s"stratum $lang: got ${perLang.getOrElse(lang, 0)} of $n")
    }
  }

  test("weightedSample's bounded windows reproduce the naive single-window sample") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf0001)
    val got = TrainingData.weightedSample(docs, "source", "doc_id", col("n_chars"), 5)
      .select("source", "doc_id", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // naive formulation: ONE window over each whole group
    val u = (graft.functions.TextFunctions
      .tokenHash60(concat(lit("ws:"), col("doc_id").cast("string")))
      % 1000003L + 1L).cast("double") / 1000004.0
    val w = Window.partitionBy("source").orderBy((log(u) / col("n_chars")).desc, col("doc_id"))
    val naive = docs
      .withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= 5)
      .select("source", "doc_id", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("weightedSample is biased toward heavy rows (weight = n_chars)") {
    val docs = Tables.documents(spark, sf0001)
    val sampled = TrainingData.weightedSample(docs, "source", "doc_id", col("n_chars"), 5)
      .agg(avg("n_chars")).collect().head.getDouble(0)
    val corpus = docs.agg(avg("n_chars")).collect().head.getDouble(0)
    assert(sampled > corpus,
      f"weighted sample mean $sampled%.1f not above corpus mean $corpus%.1f")
  }

  test("weightedSample fails loudly on non-positive weights") {
    import spark.implicits._
    // zero would silently drop the row; negative would INVERT the bias —
    // both must error instead (Efraimidis–Spirakis requires w > 0)
    for (bad <- Seq(0L, -3L)) {
      val df = Seq(("g", 1L, 10L), ("g", 2L, bad)).toDF("src", "doc_id", "w")
      val e = intercept[Exception](
        TrainingData.weightedSample(df, "src", "doc_id", col("w"), 1).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("weight must be > 0")), s"weight=$bad: $e")
    }
  }

  test("corpus_lang_balance: smallest language keeps all, rates decrease with size") {
    val rows = SparkEntry.queries("corpus_lang_balance")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val minDocs = rows.map(_._2).min
    rows.foreach { case (lang, nDocs, nKept, rate) =>
      assert(nKept <= nDocs)
      if (nDocs == minDocs)
        assert(rate === 1000000L && nKept === nDocs,
          s"$lang is a smallest language and must keep everything")
      // r = √(n_min/n_l) quantized down, always in (0, 1e6]
      assert(rate > 0L && rate <= 1000000L)
    }
    // monotone: more docs → no higher rate
    val sorted = rows.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((_, _, _, r1), (_, _, _, r2)) => assert(r2 <= r1)
      case _ => ()
    }
    // kept share tracks the rate to within binomial noise (±15 pp)
    rows.foreach { case (lang, nDocs, nKept, rate) =>
      val share = nKept.toDouble / nDocs
      assert(math.abs(share - rate / 1e6) < 0.15, s"$lang share $share vs rate $rate")
    }
  }

  test("keepBestPerCluster keeps the best-quality member; singletons pass through") {
    // docs 1..6; cluster {1,2,3} (chain), cluster {5,6}, singleton 4
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L), (4L, 5L), (5L, 7L), (6L, 7L),
    ).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = TrainingData.keepBestPerCluster(docs, "doc_id", col("q"), pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out == Map(
      1L -> ((1L, 3L, false)), 2L -> ((1L, 3L, true)), 3L -> ((1L, 3L, false)),
      4L -> ((4L, 1L, true)), // singleton: own component, kept
      5L -> ((5L, 2L, true)), 6L -> ((5L, 2L, false)), // quality tie → smaller id
    ))
  }

  test("mixtureWithEpochs: full epochs replicate, fractional epoch is a hash prefix") {
    // 4 docs of 10 tokens per source; a: 1.25 epochs, b: 0.5, c: 2.0
    val docs = (for {
      s <- Seq("a", "b", "c"); i <- 0 until 4
    } yield (s + i, s, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "source", "text")
    val out = TrainingData.mixtureWithEpochs(
      docs, "source", "doc_id", graft.functions.TextFunctions.tokens(col("text")),
      Map("a" -> 1.25, "b" -> 0.5, "c" -> 2.0))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val bySource = out.groupBy(_._2)
    // a: one full epoch (4 rows, epoch 0) + rem = 0.25*40 = 10 tokens → exactly
    // the first hash-ordered doc at epoch 1
    assert(bySource("a").count(_._3 == 0L) == 4)
    assert(bySource("a").count(_._3 == 1L) == 1)
    // b: no full epoch; rem = 20 tokens → exactly 2 docs, all at epoch 0
    assert(bySource("b").map(_._3).toSet == Set(0L) && bySource("b").length == 2)
    // c: exactly two full epochs, no partial
    assert(bySource("c").length == 8 &&
      bySource("c").groupBy(_._1).forall(_._2.map(_._3).sorted.sameElements(Seq(0L, 1L))))
  }

  test("keepBestPerCluster with constant quality ≡ dupClusters (min-id keeper)") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("doc_a", "doc_b")
    val docs = (1L to 25L).toDF("doc_id")
    val best = TrainingData.keepBestPerCluster(
      docs, "doc_id", lit(1L), edges, "doc_a", "doc_b")
      .filter(col("n_members") > 1) // restrict to clustered docs
      .select("doc_id", "component", "n_members", "is_kept")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val minId = TrainingData.dupClusters(edges, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(best == minId)
  }

  test("mixtureWithEpochs rejects negative / non-finite repetition factors") {
    val docs = Seq(("a0", "a", "t t t")).toDF("doc_id", "source", "text")
    for (bad <- Seq(-0.5, Double.NaN, Double.PositiveInfinity)) {
      intercept[IllegalArgumentException] {
        TrainingData.mixtureWithEpochs(
          docs, "source", "doc_id", graft.functions.TextFunctions.tokens(col("text")),
          Map("a" -> bad))
      }
    }
  }

  test("packConcatCut: spans partition each doc; every non-final sequence is exactly full") {
    val docs = Seq(
      ("d1", "t t t t t t t t t t t t t"), // 13 tokens — crosses boundaries
      ("d2", "t t t"), ("d3", "t"), ("d4", ""), // empty: must drop out
      ("d5", "t t t t t t t")).toDF("doc_id", "text")
    val out = TrainingData.packConcatCut(
      docs, "doc_id", graft.functions.TextFunctions.tokens(col("text")),
      seqLen = 5, shards = 1)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nTok = Map("d1" -> 13L, "d2" -> 3L, "d3" -> 1L, "d5" -> 7L)
    // note: split("", " ") yields [""] (1 token) — d4 carries one empty
    // token under the tokens() contract, so "empty" here means d4 still
    // appears; assert instead that every present doc partitions exactly
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (id, spans) =>
      val sorted = spans.sortBy(_._2)
      // contiguous seq ids, slices chain [0, n_tok) without gap/overlap
      assert(sorted.head._3 == 0L, s"$id first slice must start at 0")
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._2 == a._2 + 1 && b._3 == a._4,
            s"$id spans must chain: $a -> $b")
        case _ =>
      }
      nTok.get(id).foreach(n => assert(sorted.last._4 == n, s"$id must end at n_tok"))
    }
    // every sequence except the shard's last is exactly full (5 tokens)
    val bySeq = out.groupBy(_._2).map { case (s, xs) => s -> xs.map(x => x._4 - x._3).sum }
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, tot) =>
      if (s != lastSeq) assert(tot == 5L, s"seq $s holds $tot tokens, want 5")
      else assert(tot >= 1L && tot <= 5L)
    }
    intercept[IllegalArgumentException] {
      TrainingData.packConcatCut(docs, "doc_id",
        graft.functions.TextFunctions.tokens(col("text")), 0, 1)
    }
  }

  test("mixtureWithEpochs fails loudly on a source missing from the map; factor 0 excludes") {
    val docs = Seq(("a0", "a", "t t t"), ("b0", "b", "t t"))
      .toDF("doc_id", "source", "text")
    // source 'b' present in the data but absent from the map: must NOT be
    // silently dropped from the governance artifact — the job fails
    // naming the source
    val ex = intercept[Exception] {
      TrainingData.mixtureWithEpochs(
        docs, "source", "doc_id", graft.functions.TextFunctions.tokens(col("text")),
        Map("a" -> 1.0)).collect()
    }
    assert(ex.getMessage.contains("'b'") ||
      Option(ex.getCause).exists(_.getMessage.contains("'b'")))
    // explicit factor 0.0 is the sanctioned way to exclude a source
    val out = TrainingData.mixtureWithEpochs(
      docs, "source", "doc_id", graft.functions.TextFunctions.tokens(col("text")),
      Map("a" -> 1.0, "b" -> 0.0))
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(out.toSet == Set(("a0", 0L)))
  }

  test("dsirImportance ranks target-vocabulary docs above off-target docs") {
    // target docs speak "alpha beta", off-target docs "gamma delta";
    // mixed doc sits in between — scores must order tgt > mixed > off
    val docs = Seq(
      (1L, true, "alpha beta alpha beta alpha beta"),
      (2L, true, "beta alpha beta alpha beta alpha"),
      (3L, false, "gamma delta gamma delta gamma delta"),
      (4L, false, "delta gamma delta gamma delta gamma"),
      (5L, false, "alpha beta gamma delta alpha beta"),
    ).toDF("doc_id", "tgt", "text")
    val out = TrainingData.dsirImportance(docs, col("tgt"), "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(3)))).toMap
    assert(out(1L)._1 > out(5L)._1 && out(5L)._1 > out(3L)._1)
    // pure-target docs are selected, pure-off-target docs are not
    assert(out(1L)._2 && out(2L)._2 && !out(3L)._2 && !out(4L)._2)
    // identical texts (up to token order) score identically: bag-of-buckets
    assert(out(1L)._1 == out(2L)._1 && out(3L)._1 == out(4L)._1)
  }

  test("contaminationOverlap reports gram counts and quantized overlap fraction") {
    // doc 1: 6 tokens → 2 distinct 5-grams, one shared with the benchmark;
    // doc 2: 4 tokens → no 5-grams; doc 3: exact copy of the benchmark doc
    val train = Seq(
      (1L, "a b c d e f"), (2L, "x y z w"), (3L, "a b c d e"),
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val out = TrainingData.contaminationOverlap(train, bench, "doc_id", col("text"), 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      1L -> ((2L, 1L, 500000L)), // 1 of 2 grams hit → 0.5 → 500000 micros
      2L -> ((0L, 0L, 0L)), // too short: no grams, fraction defined as 0
      3L -> ((1L, 1L, 1000000L)), // full overlap
    ))
  }

  test("kfold_group_assign: zero leakage — every source lives in exactly one fold") {
    import graft.operators.TrainingData
    val assigned = Tables.documents(spark, sf0001)
      .select(col("source"), TrainingData.kFold(col("source"), 5).as("fold"))
    // per source, exactly one distinct fold
    val leaky = assigned.groupBy("source")
      .agg(countDistinct("fold").as("nf")).filter(col("nf") > 1).count()
    assert(leaky === 0L)
    // folds cover all docs and all sources are assigned
    val rows = SparkEntry.queries("kfold_group_assign")(spark, sf0001).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf0001).count())
    val nSources = Tables.documents(spark, sf0001)
      .select("source").distinct().count()
    assert(rows.map(_.getLong(2)).sum === nSources)
  }

  test("corpus_budget_select: budget respected tightly, greedy-by-quality, boundary fill deterministic") {
    val sel = SparkEntry.queries("corpus_budget_select")(spark, sf0001).cache()
    try {
      val m = Tables.documents(spark, sf0001)
        .select(split(col("text"), " ").as("ws"))
        .select(size(col("ws")).cast("long").as("n_tok"))
      val total = m.agg(sum("n_tok")).first().getLong(0)
      val budget = total / 5
      val picked = sel.agg(sum("tok_selected")).first().getLong(0)
      // never exceeds the budget, and fills it to within one boundary doc
      assert(picked <= budget)
      val maxDoc = m.agg(max("n_tok")).first().getLong(0)
      assert(budget - picked <= maxDoc,
        s"budget $budget, picked $picked — fill must stop only when the next doc overflows")
      // greedy by quality: selected buckets form a top-down prefix
      // (every bucket above the lowest selected one is selected)
      val buckets = sel.select("bucket").collect().map(_.getLong(0)).sorted
      val allBuckets = Tables.documents(spark, sf0001)
        .select(split(col("text"), " ").as("ws")).filter(size(col("ws")) >= 1)
        .select((floor(size(array_distinct(col("ws"))) * 1000000.0
          / size(col("ws")) + 0.5).cast("long") / 10000).cast("long").as("b"))
        .distinct().collect().map(_.getLong(0))
      val lowestSel = buckets.min
      assert(allBuckets.filter(_ > lowestSel).toSet.subsetOf(buckets.toSet))
      // deterministic: a second run selects the identical per-bucket counts
      val a = sel.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val b2 = SparkEntry.queries("corpus_budget_select")(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(a === b2)
    } finally sel.unpersist()
  }

  test("temperature mixture: quota share ∝ 1/√n — tail sources upsampled") {
    val sel = SparkEntry.queries("corpus_mixture_temperature")(spark, sf0001)
    val rows = sel.collect()
    assert(rows.nonEmpty)
    // every admitted doc starts inside its source quota by construction;
    // check the published quota table is consistent: one quota per source
    val quotas = rows.map(r => r.getString(1) -> r.getLong(3)).toMap
    // raw source sizes
    val sizes = Tables.documents(spark, sf0001)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " "))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // α = 0.5 property: RELATIVE share (quota/n) strictly decreases with
    // size — the smallest source is upsampled vs the largest
    val present = quotas.keys.toSeq
    val small = present.minBy(sizes)
    val big = present.maxBy(sizes)
    assert(sizes(big) > sizes(small))
    assert(quotas(small).toDouble / sizes(small) >
      quotas(big).toDouble / sizes(big),
      "temperature sampling must over-represent the tail source")
    // quotas sum to ≤ the declared 3000-token budget (integer division
    // truncates per source)
    assert(quotas.values.sum <= 3000L)
  }

  test("hard negatives: every neighbor is similar-but-WRONG-label, k per query") {
    val got = SparkEntry.queries("ann_hard_negatives")(spark, sf0001)
    val rows = got.collect()
    val labels = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // exactly 5 per query, ranks contiguous, sims non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length == 5)
      assert(rs.map(_.getLong(3)).sorted.sameElements(1L to 5L))
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(4))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      // the defining property: neighbor label ≠ query label, always
      rs.foreach { r =>
        assert(labels(r.getLong(1)).toLong == r.getLong(2))
        assert(r.getLong(2) != labels(q).toLong,
          s"hard negative must carry a different label: $r")
      }
    }
  }
}
