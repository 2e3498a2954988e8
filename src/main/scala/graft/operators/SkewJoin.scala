package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting (the manual fallback for the
  * cases AQE's skew-join splitting can't reach, e.g. when the skewed side
  * feeds from an upstream cached stage).
  *
  * Mechanism: the skewed (large) side gets a uniform random-ish salt in
  * [0, n) derived deterministically from its row content; the small side
  * is replicated n times with every salt value. The join key becomes
  * (key, salt), splitting each hot key's rows across n reducers. Result
  * rows are identical to the unsalted join (asserted by spec).
  *
  * At 100 TB: pick `salts` ≈ (largest key's row count) / (target rows per
  * task). The replicated side's size multiplies by `salts` — use only
  * when that side is broadcast-scale or the skew is pathological.
  */
object SkewJoin {

  /** Join types whose semantics survive replicating the small side: every
    * emitted row is driven by a (unique-salted) large-side row. Right/full
    * outer would emit each unmatched small-side row once per salt —
    * duplicated — so they are rejected rather than silently wrong.
    */
  private val supportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  def saltedJoin(
      large: DataFrame, small: DataFrame, largeKey: String, smallKey: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(supportedJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin: joinType '$joinType' not supported — replicating the " +
        "small side duplicates its unmatched rows under right/full outer; " +
        s"use one of ${supportedJoinTypes.toSeq.sorted.mkString(", ")}")
    // deterministic salt from the whole row of the large side: uniform
    // enough to split hot keys, reproducible across retries (no rand()).
    val salted = large.withColumn(
      "__salt", pmod(hash(large.columns.map(col).toSeq: _*), lit(salts)))
    val saltVals = explode(sequence(lit(0), lit(salts - 1)))
    val replicated = small.withColumn("__salt", saltVals)
    salted.join(replicated,
        salted(largeKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }

  // ---------------------------------------------------------------- queries

  val queries: Seq[Q] = Seq(
    // ---- salted lineitem ⋈ supplier, aggregated by nation: the oracle is
    // the PLAIN join SQL — green means salted ≡ unsalted row-for-row, the
    // skew-join correctness contract checked by the driver, not just spec ----
    Q(
      "q_skew_join",
      """SELECT CAST(s.s_nationkey AS BIGINT) AS nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(ROUND((l.l_quantity)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_qty
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1 ORDER BY nationkey""".stripMargin,
    ) { (s, d) =>
      saltedJoin(Tables.lineitem(s, d), Tables.supplier(s, d),
        "l_suppkey", "s_suppkey", salts = 8)
        .groupBy(col("s_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_items"), Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("nationkey")
    },
  )
}
