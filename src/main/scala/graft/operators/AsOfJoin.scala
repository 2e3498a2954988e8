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
  */
object AsOfJoin {

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
    val lStruct = StructType(left.schema.fields)
    val pStruct = struct(
      (col(rightTs).as("ts") +: payloads.map(col)): _*)
    val pType = StructType(
      right.schema(rightTs).copy(name = "ts") +: payloads.map(right.schema(_)))

    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__tag"),
      struct(left.columns.map(col): _*).as("__lrow"),
      lit(null).cast(pType).as("__p"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__tag"),
      lit(null).cast(lStruct).as("__lrow"),
      pStruct.as("__p"))

    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__tag"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__filled", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((left.columns.map(c => col(s"__lrow.$c").as(c)) :+
        col("__filled").as(outCol)): _*)
  }
}
