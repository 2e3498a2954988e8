package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for each left row, attach the payload of the
  * LATEST right row with the same key and right.ts <= left.ts. The staple
  * of feature back-filling ("most recent profile/price/session as of this
  * event") that plain equi-joins can't express.
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
    *                  right row precedes the left row
    */
  def asOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payloads: Seq[String], outCol: String = "asof"): DataFrame = {
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

    val w = Window.partitionBy(K).orderBy(col(TS), col(TAG), col(P))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(FILLED, last(col(P), ignoreNulls = true).over(w))
      .filter(col(TAG) === 1)
      .select((left.columns.map(c => col(s"$LROW.$c").as(c)) :+
        col(FILLED).as(outCol)): _*)
  }
}
