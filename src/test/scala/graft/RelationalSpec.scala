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
}
