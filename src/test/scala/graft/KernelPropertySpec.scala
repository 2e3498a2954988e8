package graft

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tier: every fused text kernel must equal its functional-form
  * witness on GENERATED adversarial strings, not just handpicked edges —
  * empty tokens, runs of spaces, multi-byte UTF-8, single chars, long
  * repeats. Deterministic: scalacheck generators are driven by fixed
  * seeds, so the corpus (and thus the assertion) is identical every run.
  */
class KernelPropertySpec extends SparkSpec {

  import spark.implicits._

  private val token: Gen[String] = Gen.frequency(
    5 -> Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)),
    2 -> Gen.const(""), // split(, -1) keeps empty tokens
    1 -> Gen.oneOf("日本語", "héllo", "🎉", "ß", "ẞ", "İ"),
    1 -> Gen.stringOfN(40, Gen.oneOf('x', 'y')), // long repetitive token
  )
  private val text: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))

  // 300 deterministic samples (fixed seeds) — includes "" via n=0
  private lazy val corpus: Seq[String] =
    (0 until 300).flatMap(i => text(Gen.Parameters.default, Seed(i.toLong)))

  test("count-min + bloom aggregators honor their sketch contracts on generated corpus") {
    import graft.functions.{BloomMembership, CountMinSketch}
    val items = corpus.filter(_.nonEmpty)
    val df = items.toDF("v")
    // CMS: est(v) ≥ true_count(v) for EVERY distinct item, and total mass
    // is preserved (Depth increments per occurrence)
    val sketch = df.agg(CountMinSketch.sketchAgg(CountMinSketch.buckets(col("v"))).as("cms"))
    val probed = df.groupBy("v").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sketch))
      .select(col("n"), CountMinSketch.estimate(col("cms"), col("v")).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(probed.nonEmpty)
    probed.foreach { case (n, est) => assert(est >= n, s"CMS under-count: $est < $n") }
    val cells = sketch.collect().head.getSeq[Long](0)
    assert(cells.sum == CountMinSketch.Depth.toLong * items.size)
    // Bloom: no false negatives on every inserted generated item
    val bloom = df.agg(BloomMembership.bloomAgg(BloomMembership.bitIndexes(col("v"))).as("bf"))
    val misses = df.crossJoin(broadcast(bloom))
      .select(BloomMembership.mightContain(col("bf"), col("v")).as("m"))
      .collect().count(!_.getBoolean(0))
    assert(misses == 0, s"bloom false negatives: $misses")
  }

  test("hash + shingle + winnow kernels ≡ witnesses on generated strings") {
    assert(corpus.size > 250, s"generator drought: ${corpus.size}")
    val df = corpus.toDF("text")
    val rows = df.select(
      TextFunctions.tokenHash60(col("text")) === TextFunctions.tokenHash60Portable(col("text")),
      TextFunctions.rollingTokenHash(col("text")) === TextFunctions.rollingTokenHashPortable(col("text")),
      TextFunctions.wordShingles(col("text"), 2) === TextFunctions.wordShinglesPortable(col("text"), 2),
      TextFunctions.wordShingles(col("text"), 4) === TextFunctions.wordShinglesPortable(col("text"), 4),
      TextFunctions.wordShinglesAll(col("text"), 3) === TextFunctions.wordShinglesAllPortable(col("text"), 3),
      TextFunctions.winnowFingerprints(col("text"), 3, 4) === TextFunctions.winnowFingerprintsPortable(col("text"), 3, 4),
      TextFunctions.winnowFingerprints(col("text"), 2, 7) === TextFunctions.winnowFingerprintsPortable(col("text"), 2, 7),
      col("text"))
      .collect()
    rows.foreach { r =>
      (0 until 7).foreach(i =>
        assert(r.getBoolean(i), s"kernel $i diverged on: '${r.getString(7)}'"))
    }
  }

  test("canonicalizeUrl is idempotent on generated messy URLs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val host: Gen[String] = for {
      h <- Gen.oneOf("ex.com", "EX.com", "A.B.ORG", "h")
      p <- Gen.oneOf("", ":80", ":443", ":8080")
    } yield h + p
    val param: Gen[String] = Gen.oneOf(
      "id=1", "b=2", "a=3", "utm_source=x", "utm_campaign=y", "fbclid=z", "gclid=q")
    val url: Gen[String] = for {
      h <- host
      path <- Gen.oneOf("", "/p", "/p/5", "/p/5/")
      ps <- Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, param))
      frag <- Gen.oneOf("", "#f", "#a/b?c")
    } yield s"https://$h$path" +
      (if (ps.isEmpty) "" else ps.mkString("?", "&", "")) + frag
    val urls = (0 until 300).flatMap(i => url(Gen.Parameters.default, Seed(i.toLong)))
    val df = urls.toDF("u")
    val rows = df.select(
      graft.operators.TextOps.canonicalizeUrl(col("u")).as("c1"))
      .select(col("c1"),
        graft.operators.TextOps.canonicalizeUrl(col("c1")).as("c2"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}"))
    assert(rows.nonEmpty)
  }

  test("HilbertIndex2D codegen path ≡ static kernel; clamps and null-propagates") {
    import graft.plans.HilbertIndex2D
    // deterministic coordinate pairs spanning in-range, boundary,
    // negative, and far-out-of-range values (kernel clamps to the grid)
    def mix(i: Long): Long = { // splitmix64 — deterministic spread
      var z = i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      math.abs(z ^ (z >>> 31))
    }
    val pts = (0 until 400).map { i =>
      val h = mix(i.toLong)
      (h % 70000L, (h / 70000L) % 70000L)
    } ++ Seq((0L, 0L), (65535L, 65535L), (-1L, 5L), (1L << 40, 3L))
    val df = pts.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        HilbertIndex2D.hilbertIndex2d(col("x"), col("y")).as("d"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == HilbertIndex2D.xy2d(r.getLong(0), r.getLong(1)),
        s"codegen diverged at (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // null inputs propagate (BinaryExpression null contract)
    val n = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(HilbertIndex2D.hilbertIndex2d(col("x"), col("y"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("SimHash60 + MinHashSig kernels ≡ aggregate forms on generated corpus") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val toks = TextFunctions.distinctTokens(col("text"))
    def sigs(f: (org.apache.spark.sql.DataFrame, String, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.DataFrame) =
      f(docs, "doc_id", toks).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(Dedup.simHash) == sigs(Dedup.simHashAgg))

    val arr = docs.select(col("doc_id"),
      array_distinct(transform(TextFunctions.wordShingles(col("text"), 2),
        s => xxhash64(s))).as("arr"))
      .filter(size(col("arr")) > 0)
    val kernel = arr.select(col("doc_id"),
      graft.plans.MinHashSig.minHashSig(col("arr"), Dedup.permConstants(8)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = Dedup.minHashSigAgg(arr, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    assert(kernel == agg)
    assert(kernel.nonEmpty)
  }

  test("dedup_minhash_calibration: bucket bounds hold by construction, estimate tracks exact within sketch error") {
    val cal = SparkEntry.queries("dedup_minhash_calibration")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cal.nonEmpty)
    cal.foreach { case (bucket, nPairs, meanEst, meanExact) =>
      assert(bucket >= 0L && bucket <= 9L)
      assert(nPairs >= 1L)
      // mean estimate lies inside its own bucket's range by construction
      val hi = if (bucket == 9L) 1000000L else (bucket + 1) * 100000L
      assert(meanEst >= bucket * 100000L && meanEst <= hi,
        s"bucket $bucket meanEst $meanEst")
      // 32-hash MinHash std error ~ sqrt(J(1-J)/32) <= 0.09; bucket means
      // of est vs exact should agree well inside 0.25
      assert(math.abs(meanEst - meanExact) <= 250000L,
        s"bucket $bucket: est $meanEst vs exact $meanExact")
    }
  }

  test("ann_topk_filtered: pre-filter semantics — k matches from the allowed subset only") {
    val got = SparkEntry.queries("ann_topk_filtered")(spark, sf0001).cache()
    try {
      // every neighbor passes the predicate
      val labels = Tables.embeddings(spark, sf0001)
        .select(col("vec_id").as("neighbor_id"), col("label"))
      assert(got.join(labels, "neighbor_id")
        .filter(col("label") % 2 =!= 0).count() === 0L)
      // exactly k=5 per query (pre-filter, so the rank is over the subset)
      val per = got.groupBy("query_id").count().select("count")
        .collect().map(_.getLong(0)).toSet
      assert(per === Set(5L))
      // pre-filter != post-filter: at least one query's filtered top-5
      // contains a neighbor NOT in its unfiltered top-5
      val unf = SparkEntry.queries("ann_topk_bruteforce")(spark, sf0001)
        .select(col("query_id"), col("neighbor_id")).withColumn("inUnf", lit(1))
      val extra = got.join(unf, Seq("query_id", "neighbor_id"), "left_anti").count()
      assert(extra > 0L, "filtered top-5 must differ from post-filtering the global top-5")
    } finally got.unpersist()
  }

  test("lm_generate_greedy: deterministic walk, each step follows the argmax successor") {
    val gen = SparkEntry.queries("lm_generate_greedy")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(gen.head._1 === 0L)
    assert(gen.map(_._1) === (0L until gen.length).toSeq, "steps must be contiguous")
    assert(gen.length >= 2 && gen.length <= 13)
    // replay determinism: a second run is identical
    val again = SparkEntry.queries("lm_generate_greedy")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(gen === again)
    // each transition is a bigram actually present in the corpus
    import spark.implicits._
    val pairs = gen.sliding(2).collect { case Seq((_, a), (_, b)) => (a, b) }.toSeq
    val bi = Tables.documents(spark, sf0001)
      .select(split(col("text"), " ").as("ws")).filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws)-1), i -> struct(element_at(ws,i) AS w1, element_at(ws,i+1) AS w2))")).as("b"))
      .select("b.w1", "b.w2").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.forall(bi.contains), "every generated transition must be a corpus bigram")
  }

  test("unigram tokenizer: segmentations re-join to their words, model prunes") {
    val vocab = SparkEntry.queries("unigram_train")(spark, sf0001).collect()
    // every single char of the word table survives pruning; multi-char ≤ 24
    assert(vocab.count(_.getLong(1) > 1) <= 24)
    assert(vocab.forall(_.getLong(3) < 0L), "logprobs are negative micros")
    val enc = SparkEntry.queries("unigram_encode")(spark, sf0001).collect()
    // the tokenization is a true segmentation: pieces concatenate back
    enc.foreach { r =>
      assert(r.getString(2).replace("|", "") == r.getString(0),
        s"pieces must re-join to the word: $r")
      assert(r.getString(2).split("[|]").length == r.getLong(1))
    }
    // every emitted piece is in the trained vocabulary
    val pieces = vocab.map(_.getString(0)).toSet
    assert(enc.flatMap(_.getString(2).split("[|]")).forall(pieces.contains))
    // served path is byte-identical to the trained path
    val served = SparkEntry.queries("unigram_encode_served")(spark, sf0001).collect()
    assert(enc.map(_.toSeq).toSeq == served.map(_.toSeq).toSeq)
  }

  test("langid_confusion: cells partition the corpus, row rates sum to ~1e6 per true lang") {
    val cells = SparkEntry.queries("langid_confusion")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(cells.map(_._3).sum === Tables.documents(spark, sf0001).count())
    cells.groupBy(_._1).foreach { case (lang, rows) =>
      val nTrue = rows.head._4
      assert(rows.map(_._3).sum === nTrue, s"$lang cells must sum to its row total")
      // integer-floor rates: within one ulp-per-cell of 1e6
      val rateSum = rows.map(_._5).sum
      assert(rateSum <= 1000000L && rateSum >= 1000000L - rows.length,
        s"$lang rates sum $rateSum")
    }
    // agreement with the per-doc prediction row
    val fromDocs = SparkEntry.queries("langid_heuristic")(spark, sf0001)
      .groupBy("lang", "lang_pred").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    cells.foreach { case (l, p, n, _, _) => assert(fromDocs((l, p)) === n) }
  }
}
