package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for each left row, attach the payload of the
  * LATEST right row with the same key and right.ts <= left.ts. The staple
  * of feature back-filling ("most recent profile/price/session as of this
  * event") that plain equi-joins can't express. `direction` extends this
  * to forward (earliest upcoming right) and nearest (closer of the two,
  * ties backward), and `tolerance` bounds the allowed time gap — the full
  * pandas merge_asof surface.
  *
  * Spark-first implementation — the union trick, not a join:
  * tag both inputs, union them, and run ONE window pass per key ordered by
  * (ts, tag): `last(payload, ignoreNulls)` carries the most recent right
  * payload forward onto every left row. Cost: a single hash shuffle on the
  * key + an in-partition sort — no join fan-out, no range-explosion, and
  * key-partitioned so it scales exactly like a groupBy at 100 TB (salt the
  * key upstream if one entity dominates). A broadcast range join would
  * need the whole right side per executor; this needs only the per-key
  * slice.
  *
  * Tie semantics: right rows sort BEFORE left rows at equal ts (tag 0 < 1),
  * so "as of" is inclusive (right.ts == left.ts matches). Multiple right
  * rows at the same (key, ts) resolve to the greatest payload struct
  * (deterministic; pre-aggregate the right side if you need a different
  * rule).
  *
  * NULL semantics (matches DuckDB/pandas ASOF): right rows with a NULL key
  * or NULL ts can never match and are dropped before the union; left rows
  * with a NULL key or NULL ts are preserved with a NULL `outCol` (a NULL
  * ts sorts before every right row in its partition, and a NULL key lands
  * in a partition that contains no right rows — both fall out of the
  * window pass with nothing to carry forward).
  */
object AsOfJoin {

  // Internal work columns get an unlikely fixed prefix (kept deterministic —
  // a per-call UUID would make plans uncacheable); collisions with user
  // columns are rejected loudly below rather than silently shadowed.
  private val K = "__graft_asof_k"
  private val TS = "__graft_asof_ts"
  private val TAG = "__graft_asof_tag"
  private val LROW = "__graft_asof_lrow"
  private val P = "__graft_asof_p"
  private val FILLED = "__graft_asof_filled"
  private val internals = Seq(K, TS, TAG, LROW, P, FILLED)

  /** @param left      driving rows (all columns preserved)
    * @param right     payload rows
    * @param key       equality key column (same name both sides)
    * @param leftTs    left ordering column (numeric or timestamp)
    * @param rightTs   right ordering column
    * @param payloads  right columns to carry (exposed as fields of `outCol`)
    * @param outCol    name of the output struct column: fields `ts` (the
    *                  matched right ts) + each payload column; NULL when no
    *                  right row matches
    * @param direction `backward` (default): latest right.ts <= left.ts;
    *                  `forward`: earliest right.ts >= left.ts; `nearest`:
    *                  whichever of the two is closer in time, ties to
    *                  backward (pandas merge_asof semantics). Forward /
    *                  nearest reuse the same union + window machinery —
    *                  forward is the backward scan under the reversed
    *                  ordering; nearest runs both scans over ONE exchange
    *                  (same partitioning, two in-partition sorts) and
    *                  picks per row
    * @param tolerance max allowed |left ts − matched right ts|, as an
    *                  expression comparable with the ts difference (a
    *                  numeric literal for numeric ts, an INTERVAL for
    *                  timestamps); a match beyond it becomes NULL. For
    *                  `nearest` it gates each direction before the pick
    */
  def asOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payloads: Seq[String], outCol: String = "asof",
      direction: String = "backward",
      tolerance: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asOf: direction must be backward | forward | nearest, got $direction")
    val clash = (left.columns ++ right.columns).toSet.intersect(internals.toSet)
    require(clash.isEmpty, s"asOf: column names ${clash.mkString(", ")} are reserved")
    // the window pass orders by the payload struct to break same-(key, ts)
    // ties deterministically — every payload column must be orderable
    val pType = StructType(
      right.schema(rightTs).copy(name = "ts") +: payloads.map(right.schema(_)))
    require(
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(pType),
      s"asOf: payload struct $pType contains an unorderable type (e.g. map);" +
        " pre-aggregate the right side to one row per (key, ts) instead")

    val lStruct = StructType(left.schema.fields)
    val pStruct = struct(
      (col(rightTs).as("ts") +: payloads.map(col)): _*)

    val l = left.select(
      col(key).as(K), col(leftTs).as(TS), lit(1).as(TAG),
      struct(left.columns.map(col): _*).as(LROW),
      lit(null).cast(pType).as(P))
    val r = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull) // can never match
      .select(
        col(key).as(K), col(rightTs).as(TS), lit(0).as(TAG),
        lit(null).cast(lStruct).as(LROW),
        pStruct.as(P))

    // backward: ascending scan, most recent right ≤ left carried forward.
    // forward: the SAME scan under (ts desc) — rights still sort before
    // lefts at equal ts (TAG asc) and in P asc order so the carried row
    // at a tie is the greatest payload struct, identical tie rule in both
    // directions.
    def fill(forward: Boolean) = {
      // desc_nulls_FIRST on the reversed scan: a NULL-ts left row must
      // sort before every right row in scan order (as it does under the
      // ascending scan, where nulls-first is the default) so it can never
      // inherit a payload — the NULL contract holds in both directions
      val ord =
        if (forward) Seq(col(TS).desc_nulls_first, col(TAG).asc, col(P).asc)
        else Seq(col(TS).asc, col(TAG).asc, col(P).asc)
      last(col(P), ignoreNulls = true).over(
        Window.partitionBy(K).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }
    // a match beyond the tolerance becomes NULL; delta is oriented so it
    // is non-negative in each direction (numeric or interval, per ts type)
    def gate(p: org.apache.spark.sql.Column, forward: Boolean) =
      tolerance match {
        case None => p
        case Some(tol) =>
          val delta =
            if (forward) p.getField("ts") - col(TS) else col(TS) - p.getField("ts")
          when(p.isNotNull && delta <= tol, p).otherwise(lit(null).cast(pType))
      }
    val u = l.unionByName(r)
    val filled = direction match {
      case "backward" => u.withColumn(FILLED, gate(fill(forward = false), forward = false))
      case "forward" => u.withColumn(FILLED, gate(fill(forward = true), forward = true))
      case "nearest" =>
        // both scans share one hash exchange on the key (same partitioning;
        // two in-partition sorts); ties between equidistant matches go
        // backward — merge_asof's rule
        val bk = gate(fill(forward = false), forward = false)
        val fw = gate(fill(forward = true), forward = true)
        u.withColumn(FILLED,
          when(bk.isNull, fw)
            .when(fw.isNull, bk)
            .when(col(TS) - bk.getField("ts") <= fw.getField("ts") - col(TS), bk)
            .otherwise(fw))
    }
    filled
      .filter(col(TAG) === 1)
      .select((left.columns.map(c => col(s"$LROW.$c").as(c)) :+
        col(FILLED).as(outCol)): _*)
  }
}
