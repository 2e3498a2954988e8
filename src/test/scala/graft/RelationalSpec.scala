package graft

import org.apache.spark.sql.functions._

/** Semantics of relational-tier queries not already pinned by DslSpec. */
class RelationalSpec extends SparkSpec {

  test("q_rfm_segments: segments partition the customer base, quartiles balanced") {
    val df = SparkEntry.queries("q_rfm_segments")(spark, sf0001).cache()
    try {
      // Segments partition customers-with-orders exactly once, and carry
      // the full monetary mass.
      val base = Tables.orders(spark, sf0001)
        .agg(countDistinct("o_custkey"),
          sum(floor(col("o_totalprice") * 1000000.0 + 0.5).cast("long")))
        .first()
      assert(df.agg(sum("n_customers")).first().getLong(0) === base.getLong(0))
      assert(df.agg(sum("m_mic_total")).first().getLong(0) === base.getLong(1))

      // NTILE(4) over a total order deals bucket sizes within 1 of each
      // other — check it per dimension by folding segments back down.
      for (dim <- 0 to 2) {
        val sizes = df
          .groupBy(substring(col("segment"), dim + 1, 1).as("q"))
          .agg(sum("n_customers").as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(sizes.keySet === Set("1", "2", "3", "4"), s"dim $dim: $sizes")
        assert(sizes.values.max - sizes.values.min <= 1, s"dim $dim: $sizes")
      }
    } finally df.unpersist()
  }

  test("q_window_range_frame: RANGE frame includes same-day ties together and honors the 7-day cutoff") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Same window spec as the registered query, on a hand-computable
    // series: days 0,3,6 then TWO orders on day 10. The value-based frame
    // means both day-10 rows see the identical {day>=4} frame -- the
    // rows-based formulation would give them different sums on the tie.
    val o = Seq((1L, 10L, 0L, 100L), (2L, 10L, 3L, 200L), (3L, 10L, 6L, 400L),
      (4L, 10L, 10L, 800L), (5L, 10L, 10L, 1600L))
      .toDF("o_orderkey", "o_custkey", "day", "p_mic")
    val w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-6, 0)
    val got = o.select(col("o_orderkey"),
        sum(col("p_mic")).over(w).as("s"), count(lit(1)).over(w).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((100L, 1L)))
    assert(got(2L) === ((300L, 2L)))        // days 0 and 3
    assert(got(3L) === ((700L, 3L)))        // days 0,3,6 all within 6
    assert(got(4L) === ((2800L, 3L)))       // days 6,10,10 -- tie included
    assert(got(5L) === ((2800L, 3L)))       // identical frame on the tie
    // registered query: one output row per order, frames never empty
    val df = SparkEntry.queries("q_window_range_frame")(spark, sf0001)
    assert(df.count() === 1500L)
    assert(df.filter(col("trail7d_n") < 1L || col("trail7d_mic") <= 0L).count() === 0L)
  }

  test("basket_association_rules: bounded ratios, canonical pair order, min support") {
    val df = SparkEntry.queries("basket_association_rules")(spark, sf0001).cache()
    try {
      assert(df.count() === 50L)
      // support floor honored; pairs canonical (a < b)
      assert(df.filter(col("supp_ab") < 2L || col("part_a") >= col("part_b")).count() === 0L)
      // confidence = supp_ab/supp(x) is a probability; lift positive.
      // supp(a) >= supp_ab always, so conf <= 1e6 exactly.
      assert(df.filter(col("conf_ab_mic") <= 0L || col("conf_ab_mic") > 1000000L ||
        col("conf_ba_mic") <= 0L || col("conf_ba_mic") > 1000000L ||
        col("lift_mic") <= 0L).count() === 0L)
      // ranked by lift: top row carries the max
      val lifts = df.select("lift_mic").collect().map(_.getLong(0))
      assert(lifts.toSeq === lifts.sortBy(-_).toSeq)
    } finally df.unpersist()
  }

  test("q_except_all / q_intersect_all: bag algebra identities hold") {
    import spark.implicits._
    // counts: a = {1,1,2,3}, b = {1,2,2} -> except_all = {1,3}, intersect_all = {1,2}
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L).toDF("k")
    assert(a.exceptAll(b).collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    assert(a.intersectAll(b).collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // |A except all B| + |A intersect all B| = |A| on the fixture
    val ex = SparkEntry.queries("q_except_all")(spark, sf0001).count()
    val in = SparkEntry.queries("q_intersect_all")(spark, sf0001).count()
    val aCnt = Tables.lineitem(spark, sf0001)
      .filter(expr("l_shipdate >= DATE'1996-01-01' AND l_shipdate < DATE'1997-01-01'"))
      .count()
    assert(ex + in === aCnt)
  }
}
