package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join (SURVEY.md §2.4 J2 extension): match points to
  * intervals (`start ≤ p < end`) WITHOUT an equi key.
  *
  * The naive plan for a pure range predicate is a broadcast nested loop —
  * O(|points|·|intervals|) comparisons, the classic 100 TB cliff. The
  * bucketed form discretizes both sides at a chosen granularity: each
  * point lands in one bucket, each interval explodes into the buckets it
  * covers, and the join becomes an EQUI join on bucket id followed by the
  * exact range filter. Cost O(|points| + |intervals|·span/width + matches)
  * — linear when the bucket width is chosen near the typical interval
  * span (each interval explodes into O(1) buckets). This is the same
  * binning strategy Databricks' range-join optimization and KDB's window
  * joins use under the hood.
  *
  * Every (point, interval) match is produced exactly once: a matching
  * point's bucket is always inside the interval's covered bucket list, and
  * the pair only joins on THAT bucket — no post-dedup needed.
  */
object RangeJoin {

  /** Join `points` (long column `pCol`) to `intervals` (long columns
    * `startCol` inclusive, `endCol` exclusive) on containment, equi-joined
    * through buckets of `bucketWidth`. Returns the matched rows with all
    * columns from both sides.
    *
    * Both sides are aliased internally, so the join and containment
    * predicates resolve unambiguously even when `points` and `intervals`
    * share column names (r18 advisor: bare-name resolution threw an
    * ambiguous-reference AnalysisException for the natural
    * same-key-name-on-both-sides caller). A shared name then appears
    * twice in the OUTPUT — standard Spark join behavior; disambiguate
    * downstream or rename before joining.
    */
  def rangeJoin(
      points: DataFrame, pCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floor(col(pCol) / bucketWidth))
      .as("__rj_p")
    val iv = intervals
      // empty/inverted intervals can match nothing — and must be dropped
      // BEFORE the explode: sequence(a, b) steps DOWNWARD when a > b, so
      // one corrupt interval row would otherwise fan out into a huge
      // descending bucket list instead of zero buckets
      .filter(col(endCol) > col(startCol))
      .withColumn("__ibucket", explode(sequence(
        floor(col(startCol) / bucketWidth),
        // end is exclusive: the last covered bucket holds end-1
        floor((col(endCol) - 1) / bucketWidth))))
      .as("__rj_iv")
    p.join(iv, col("__rj_p.__bucket") === col("__rj_iv.__ibucket"))
      .filter(col(s"__rj_p.$pCol") >= col(s"__rj_iv.$startCol") &&
        col(s"__rj_p.$pCol") < col(s"__rj_iv.$endCol"))
      .drop("__bucket", "__ibucket")
  }

  /** KEYED range join — the bounded-output shape [[rangeJoin]] should be
    * traded up to whenever the semantics carry an entity key: points join
    * intervals on `pKey == ivKey` AND containment, equi-joined through
    * (key, bucket). The pure-range form's candidate set is all co-temporal
    * pairs (grows ~quadratically when both sides grow together — the
    * measured 28–36× at 10× data on `q_range_join`); the keyed form's is
    * bounded by per-key × per-bucket cardinality, so 10× entities with
    * the same per-entity activity is 10× work — the 100 TB-safe contract,
    * the way `dedup_semantic_scaled` twins `dedup_semantic`. Shuffle is
    * one hash exchange on (key, bucket) per side; exactly-once output per
    * match holds for the same reason as [[rangeJoin]].
    */
  def rangeJoinKeyed(
      points: DataFrame, pCol: String, pKey: String,
      intervals: DataFrame, startCol: String, endCol: String, ivKey: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // both sides aliased internally (same contract as [[rangeJoin]]): the
    // natural caller keys both sides by the SAME name (user_id == user_id),
    // which bare-name resolution rejected as ambiguous (r18 advisor).
    // A shared name appears twice in the output, as in any Spark join.
    val p = points.withColumn("__bucket", floor(col(pCol) / bucketWidth))
      .as("__rj_p")
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__ibucket", explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor((col(endCol) - 1) / bucketWidth))))
      .as("__rj_iv")
    p.join(iv,
        col(s"__rj_p.$pKey") === col(s"__rj_iv.$ivKey") &&
          col("__rj_p.__bucket") === col("__rj_iv.__ibucket"))
      .filter(col(s"__rj_p.$pCol") >= col(s"__rj_iv.$startCol") &&
        col(s"__rj_p.$pCol") < col(s"__rj_iv.$endCol"))
      .drop("__bucket", "__ibucket")
  }

  val queries: Seq[Q] = Seq(
    // ---- pure range join, no equi key: count ALL users' events landing
    // in each user's first-2-hours window. Epoch-second integers on both
    // sides (exact arithmetic, no float/precision edges); oracle is the
    // naive theta join ----
    Q(
      "q_range_join",
      """WITH ev AS (SELECT user_id,
        |              date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec
        |            FROM events),
        |iv AS (SELECT user_id AS iv_user, MIN(sec) AS start, MIN(sec) + 7200 AS fin
        |       FROM ev GROUP BY 1)
        |SELECT iv.iv_user, CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM iv JOIN ev e ON e.sec >= iv.start AND e.sec < iv.fin
        |GROUP BY 1 ORDER BY iv_user""".stripMargin,
    ) { (s, d) =>
      val ev = Tables.events(s, d)
        // NTZ → instant (UTC session: same wall time) → floor epoch seconds
        .select(col("user_id"), col("ts").cast("timestamp").cast("long").as("sec"))
      val iv = ev.groupBy(col("user_id").as("iv_user"))
        .agg(min("sec").as("start"))
        .withColumn("fin", col("start") + lit(7200L))
      rangeJoin(ev, "sec", iv, "start", "fin", bucketWidth = 3600L)
        .groupBy("iv_user").agg(count(lit(1)).as("n_events"))
        .orderBy("iv_user")
    },
    // ---- BOUNDED range join (scale twin of q_range_join): same window
    // semantics but keyed — each user's window counts only that user's
    // own events. The pure-range row above is the suite's documented
    // worst grower (~28–36× at 10× data: co-temporal pair count is
    // semantically quadratic); this row is the shape a 100 TB pipeline
    // should ship (per-key bounded candidates → linear growth), kept
    // side by side the way dedup_semantic_scaled twins dedup_semantic ----
    Q(
      "q_range_join_bounded",
      """WITH ev AS (SELECT user_id,
        |              date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec
        |            FROM events),
        |iv AS (SELECT user_id AS iv_user, MIN(sec) AS start, MIN(sec) + 7200 AS fin
        |       FROM ev GROUP BY 1)
        |SELECT iv.iv_user, CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM iv JOIN ev e
        |  ON e.user_id = iv.iv_user AND e.sec >= iv.start AND e.sec < iv.fin
        |GROUP BY 1 ORDER BY iv_user""".stripMargin,
    ) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("timestamp").cast("long").as("sec"))
      val iv = ev.groupBy(col("user_id").as("iv_user"))
        .agg(min("sec").as("start"))
        .withColumn("fin", col("start") + lit(7200L))
      rangeJoinKeyed(ev, "sec", "user_id", iv, "start", "fin", "iv_user",
          bucketWidth = 3600L)
        .groupBy("iv_user").agg(count(lit(1)).as("n_events"))
        .orderBy("iv_user")
    },
  )
}
