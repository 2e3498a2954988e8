package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.TextFunctions

/** Entity resolution (record linkage): match dirty records against a
  * canonical table via SEGMENT-BLOCKED candidate generation + exact
  * edit-distance verify + deterministic best-match resolution.
  *
  * The blocking trick is the edit-distance analog of the SimHash
  * combination keys in [[Dedup.simHashNearDupPairs]]: split a fixed
  * character window of the record key into `numSegs` equal segments and
  * emit one blocking key per `numSegs − maxSub`-subset of segments. At
  * most `maxSub` substitutions can touch at most `maxSub` segments, so a
  * true pair always shares one full combination key (pigeonhole) —
  * candidate recall is guaranteed, not probabilistic.
  *
  * For EQUAL-LENGTH records the guarantee is complete in both
  * directions: levenshtein ≤ 1 on same-length strings ⟺ hamming ≤ 1
  * (a cost-1 edit script that preserves length can only be a single
  * substitution), so the blocked match set EQUALS the naive all-pairs
  * match set — which is exactly what the oracle states, with no
  * blocking replay needed.
  *
  * Scale shape: combination keys are `C(numSegs, numSegs−maxSub)` rows
  * per record (a small constant — 3 here), the candidate join is a plain
  * key-partitioned equi-join whose block sizes are bounded by the
  * segment-value distribution (discriminative key windows keep E[block]
  * constant as n grows; a skewed segment value gets the same df-cap /
  * salting guards as the LSH tiers), and the verify is O(len²) per
  * candidate on bounded-length keys. No all-pairs product anywhere; the
  * resolution step is one groupBy(min) on the dirty-record key.
  */
object EntityResolution {

  /** Blocking keys for one side: one row per combination of
    * `numSegs - maxSub` segments drawn from the char window starting at
    * `segStart` (1-based), each segment `segLen` chars. */
  private def withComboKeys(
      df: DataFrame, name: String,
      segStart: Int, segLen: Int, numSegs: Int, maxSub: Int): DataFrame = {
    require(maxSub >= 0 && maxSub < numSegs, "need 0 <= maxSub < numSegs")
    val segs = (0 until numSegs).map(i =>
      substring(col(name), segStart + i * segLen, segLen))
    val combos = (0 until numSegs).combinations(numSegs - maxSub).toSeq
    val keys = combos.zipWithIndex.map { case (combo, ci) =>
      struct(lit(ci).as("blk"),
        concat_ws("", combo.map(segs): _*).as("key"))
    }
    df.select(col("*"), explode(array(keys: _*)).as("bk"))
      .select(col("*"), col("bk.blk"), col("bk.key")).drop("bk")
  }

  /** Resolve each record of `b` (columns `idB`, `nameB`) against the
    * canonical `a` (columns `idA`, `nameA`): returns one row per dirty
    * record that matched — its best canonical id by (lev, idA), the
    * match distance, and how many canonicals were within `maxSub`.
    *
    * Both name columns must be drawn from the same fixed-length format
    * for the completeness guarantee above; variable-length corpora keep
    * pigeonhole RECALL but may emit extra candidates the verify drops.
    */
  def linkBySegments(
      a: DataFrame, idA: String, nameA: String,
      b: DataFrame, idB: String, nameB: String,
      segStart: Int, segLen: Int, numSegs: Int, maxSub: Int): DataFrame = {
    val ab = withComboKeys(a.select(col(idA), col(nameA)), nameA,
      segStart, segLen, numSegs, maxSub)
    val bb = withComboKeys(b.select(col(idB), col(nameB)), nameB,
      segStart, segLen, numSegs, maxSub)
    val verified = ab.join(bb, Seq("blk", "key"))
      .filter(levenshtein(col(nameA), col(nameB)) <= maxSub)
      .select(col(idB), col(nameB), col(idA),
        levenshtein(col(nameA), col(nameB)).cast("long").as("lev"))
      .distinct() // a pair can collide on several combination keys
    // deterministic argmin via an encoded (lev, idA) integer — the same
    // total order the oracle's MIN replays; ids stay < 1e10 by contract
    verified
      .groupBy(col(idB), col(nameB))
      .agg(
        min(col("lev") * lit(10000000000L) + col(idA)).as("enc"),
        count(lit(1)).as("n_matches"))
      .select(col(idB), col(nameB),
        pmod(col("enc"), lit(10000000000L)).as("best_match"),
        (col("enc") / lit(10000000000L)).cast("long").as("best_lev"),
        col("n_matches"))
  }

  /** Deterministic dirty copy of every 10th customer: ONE md5-derived
    * substitution at an md5-derived position of `c_name` — the typo
    * corpus the registered query resolves back against the clean table.
    * Everything is engine-portable integer/string arithmetic, so the
    * oracle regenerates the identical corpus. */
  private[graft] def dirtyCustomers(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(pmod(col("c_custkey"), lit(10)) === 3)
    val pos0 = pmod(TextFunctions.tokenHash60(
      concat(lit("pos:"), col("c_custkey").cast("string"))), lit(18))
    val sub = expr("char(97 + pmod(" +
      "conv(substring(md5(concat('chr:', cast(c_custkey as string))), 1, 15), 16, 10)" +
      ", 26))")
    c.select(
      col("c_custkey").as("id_b"),
      concat(
        col("c_name").substr(lit(1), pos0),
        sub,
        col("c_name").substr(pos0 + lit(2), lit(18))).as("dirty_name"))
  }

  def queries: Seq[Q] = Seq(
    // ---- fuzzy record linkage: every dirty record resolved to its best
    // canonical customer. Because names are fixed-length, lev<=1 <=>
    // hamming<=1 and the 3-segment/2-of-3 combination blocking has
    // COMPLETE recall — so the oracle can state the naive all-pairs
    // semantics (restricted to the 1-in-10 dirty sample to stay cheap)
    // while the Spark plan never forms a cross product (PlanSpec-swept).
    // n_matches > 1 happens when the typo lands in the digit region and
    // another customer one digit away ties — resolution picks the
    // (lev, id) minimum, same total order both engines ----
    Q(
      "er_link_typos",
      """WITH b0 AS (
        |  SELECT c_custkey AS id_b, c_name,
        |    ('0x' || substr(md5('pos:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 18 AS pos0,
        |    chr(97 + CAST(('0x' || substr(md5('chr:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 26 AS INT)) AS sub
        |  FROM customer WHERE c_custkey % 10 = 3),
        |bd AS (
        |  SELECT id_b,
        |    substr(c_name, 1, CAST(pos0 AS INT)) || sub ||
        |      substr(c_name, CAST(pos0 + 2 AS INT)) AS dirty_name
        |  FROM b0),
        |m AS (
        |  SELECT bd.id_b, bd.dirty_name, a.c_custkey AS id_a,
        |    CAST(levenshtein(a.c_name, bd.dirty_name) AS BIGINT) AS lev
        |  FROM bd, customer a
        |  WHERE levenshtein(a.c_name, bd.dirty_name) <= 1)
        |SELECT id_b, dirty_name,
        |  CAST(MIN(lev * 10000000000 + id_a) % 10000000000 AS BIGINT) AS best_match,
        |  CAST(MIN(lev * 10000000000 + id_a) // 10000000000 AS BIGINT) AS best_lev,
        |  CAST(COUNT(*) AS BIGINT) AS n_matches
        |FROM m GROUP BY id_b, dirty_name
        |ORDER BY id_b""".stripMargin,
    ) { (s, d) =>
      val clean = Tables.customer(s, d).select("c_custkey", "c_name")
      linkBySegments(
        clean, "c_custkey", "c_name",
        dirtyCustomers(s, d), "id_b", "dirty_name",
        segStart = 13, segLen = 2, numSegs = 3, maxSub = 1)
        .orderBy("id_b")
    },
  )
}
