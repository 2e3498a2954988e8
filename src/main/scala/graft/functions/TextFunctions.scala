package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline tier
  * (SURVEY.md §2.9): tokenization, shingling, quality scoring,
  * fingerprinting, language-ID heuristics.
  *
  * Everything is built from `org.apache.spark.sql.functions._` higher-order
  * array functions, so the whole pipeline stays inside whole-stage codegen —
  * no Scala UDFs in the hot path. All of it is embarrassingly parallel
  * (per-row), so it scales linearly with partitions.
  */
object TextFunctions {

  /** Whitespace tokens, in document order (duplicates kept). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct whitespace tokens. */
  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Bind `arr` to a lambda variable so `f` can reference it many times at
    * the cost of ONE evaluation per row. Higher-order-function lambdas are
    * interpreted (no whole-stage codegen) and get no common-subexpression
    * elimination, so an expression referenced k times inside a lambda body
    * is re-computed k times PER ELEMENT — [[wordShingles]] re-running
    * `split(text)` 3× per window was ~10× the cost of the dedup pipelines'
    * joins at sf0.1 before this bind.
    */
  private def bindOnce(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), ws => f(ws)), 1)

  /** Word n-shingles (distinct), e.g. n=3 → "a b c" for each window.
    * Empty array when the document has fewer than n tokens (guarded — an
    * unguarded `sequence(1, size-n+1)` would go descending for short docs).
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.plans.WordShingles.wordShingles(text, n)

  /** The pre-Catalyst functional form of [[wordShingles]]; kept as the
    * equivalence witness (FunctionsSpec asserts ≡).
    */
  private[graft] def wordShinglesPortable(text: Column, n: Int): Column =
    bindOnce(tokens(text)) { ws =>
      when(
        size(ws) >= n,
        array_distinct(
          transform(
            sequence(lit(1), size(ws) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*))))
        .otherwise(array().cast("array<string>"))
    }

  /** Word n-shingles with duplicates KEPT, in document order — the input
    * for repetition statistics, where multiplicity is the signal that
    * [[wordShingles]]' distinct form deliberately erases.
    */
  def wordShinglesAll(text: Column, n: Int): Column =
    graft.plans.WordShingles.wordShinglesAll(text, n)

  /** Functional-form witness for [[wordShinglesAll]] (FunctionsSpec ≡). */
  private[graft] def wordShinglesAllPortable(text: Column, n: Int): Column =
    bindOnce(tokens(text)) { ws =>
      when(
        size(ws) >= n,
        transform(
          sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*)))
        .otherwise(array().cast("array<string>"))
    }

  /** Winnowing fingerprints (Schleimer et al., "Winnowing: Local
    * Algorithms for Document Fingerprinting", SIGMOD'03): hash every
    * word k-gram, slide a window of `w` consecutive gram hashes, keep the
    * minimum of each window, dedupe. Guarantees every shared substring of
    * ≥ w+k−1 tokens contributes at least one shared fingerprint, while
    * storing ~2/(w+1) of the grams — the sublinear sketch that lets
    * substring-level near-dup detection run on a 100 TB corpus without
    * carrying every shingle. Fewer grams than `w` → a single whole-doc
    * minimum (standard short-input convention).
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    graft.plans.WinnowedFingerprints.winnowFingerprints(text, k, w)

  /** Functional-form witness for [[winnowFingerprints]] (FunctionsSpec ≡). */
  private[graft] def winnowFingerprintsPortable(text: Column, k: Int, w: Int): Column =
    bindOnce(tokens(text)) { ws =>
      val grams = when(
        size(ws) >= k,
        transform(
          sequence(lit(1), size(ws) - (k - 1)),
          i => tokenHash60(
            concat_ws(" ", (0 until k).map(off => element_at(ws, i + lit(off))): _*))))
        .otherwise(array().cast("array<bigint>"))
      bindOnce(grams) { hs =>
        when(
          size(hs) >= w,
          array_distinct(transform(
            sequence(lit(1), size(hs) - (w - 1)),
            j => array_min(slice(hs, j, lit(w))))))
          .otherwise(
            when(size(hs) >= 1, array(array_min(hs)))
              .otherwise(array().cast("array<bigint>")))
      }
    }

  /** Distinct character n-grams of the raw text. */
  def charNgrams(text: Column, n: Int): Column =
    when(
      length(text) >= n,
      array_distinct(
        transform(
          sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Token count via a BPE-ish regex (runs of lowercase alphanumerics). */
  def regexTokenCount(text: Column): Column =
    size(filter(split(text, "[^a-z0-9]+"), t => length(t) > 0)).cast("long")

  /** Count of stopword tokens in an already-bound token ARRAY — shared by
    * [[stopwordCount]], [[qualityScore]] and [[langIdHeuristic]] so the
    * expression exists once.
    */
  private def stopCountOn(ws: Column, stopwords: Seq[String]): Column =
    size(filter(ws, t => t.isin(stopwords.map(lit): _*))).cast("long")

  /** Occurrence count of tokens from a fixed stopword list. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    stopCountOn(tokens(text), stopwords)

  /** Heuristic quality score in [0,1]: length saturation, lexical
    * diversity, and stopword balance — the standard cheap pre-filters a
    * training-data pipeline applies before expensive model scoring.
    * Pure integer-ratio double arithmetic → bit-deterministic.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = bindOnce(tokens(text)) { ws =>
    // tokens bound once: the unbound form re-ran split() 3× per row
    val nTok = size(ws).cast("double")
    val nUniq = size(array_distinct(ws)).cast("double")
    val lengthScore = least(nTok / lit(100.0), lit(1.0))
    val diversity = nUniq / greatest(nTok, lit(1.0))
    val stopRatio = stopCountOn(ws, stopwords).cast("double") /
      greatest(nTok, lit(1.0))
    lit(0.4) * lengthScore + lit(0.4) * diversity + lit(0.2) * (lit(1.0) - stopRatio)
  }

  /** PII patterns shared by [[redactPii]] and [[piiCount]] — restricted
    * to the regex subset with identical semantics in Java regex and RE2
    * (no lookaround, no backreferences), so a SQL oracle can replay the
    * redaction byte-for-byte. Order matters only for overlapping hits;
    * these three are disjoint by construction (@ / dotted quad / dash).
    */
  private[graft] val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>",
    "\\b[0-9]{3}-[0-9]{4}\\b" -> "<PHONE>")

  /** Redact emails, IPv4 addresses and phone-shaped numbers to typed
    * placeholders — the per-row scrub a training pipeline runs before
    * anything else sees the text. Pure codegen'd `regexp_replace` chain:
    * linear scan, no shuffle.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (re, tag)) => regexp_replace(c, re, tag) }

  /** Number of PII hits [[redactPii]] would replace. */
  def piiCount(text: Column): Column =
    PiiPatterns.map { case (re, _) => regexp_count(text, lit(re)) }
      .reduce(_ + _).cast("long")

  /** Exact content fingerprint: MD5 of the UTF-8 bytes (hex). */
  def fingerprintMd5(text: Column): Column = md5(encode(text, "UTF-8"))

  /** Canonical "bag of distinct tokens" form: sorted distinct tokens
    * re-joined — equal for any token-order permutation of the same set.
    */
  def canonicalTokenForm(text: Column): Column =
    array_join(array_sort(distinctTokens(text)), " ")

  /** Per-token 60-bit hash: the first 15 hex chars of md5, as a long.
    * md5 is engine-portable (identical hex in Spark and DuckDB/Postgres),
    * unlike xxhash64 whose seed/variant is Spark-internal — which is what
    * makes [[rollingTokenHash]] oracle-checkable cross-engine.
    */
  def tokenHash60(t: Column): Column =
    graft.plans.TokenHash60.tokenHash60(t)

  /** The pre-Catalyst functions-API form of [[tokenHash60]]; kept as the
    * cross-engine equivalence witness (FunctionsSpec asserts ≡).
    */
  private[graft] def tokenHash60Portable(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Polynomial rolling-hash fingerprint over tokens (base/mod fixed):
    * order-sensitive content hash, computed distributively with
    * `aggregate` — the cheap alternative to md5-of-document when only
    * equality matters but token ORDER must still distinguish documents.
    */
  def rollingTokenHash(text: Column): Column =
    graft.plans.TokenHash60.rollingTokenHash(text)

  /** The pre-Catalyst higher-order-function form of [[rollingTokenHash]];
    * kept as the cross-engine equivalence witness (FunctionsSpec asserts ≡).
    */
  private[graft] def rollingTokenHashPortable(text: Column): Column =
    // modulus < 2^30 so acc * base never overflows Long (ANSI mode);
    // acc*1e6 + tokenHash60 < 1e15 + 2^60 < Long.Max before the mod.
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + tokenHash60Portable(t), lit(1000000007L)))

  /** Tiny n-gram language-ID heuristic: scores each candidate language by
    * occurrences of its marker tokens and returns the argmax (or "und").
    * Real pipelines plug in trained profiles; the mechanism — a per-row
    * codegen'd scoring expression, no shuffle — is the point here.
    */
  def langIdHeuristic(text: Column, profiles: Map[String, Seq[String]]): Column =
    bindOnce(tokens(text)) { ws =>
      // tokens bound once: the unbound form re-ran split() once per profile
      val scored = profiles.toSeq.sortBy(_._1).map { case (lang, markers) =>
        struct(stopCountOn(ws, markers).as("score"), lit(lang).as("lang"))
      }
      val best = greatest(scored: _*)
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
    }
}
