package graft

import org.apache.spark.sql.functions._

/** Invariants of the integer-lattice PageRank (operators.GraphOps). */
class GraphSpec extends SparkSpec {

  test("graph_pagerank: positive ranks, bounded mass loss, deterministic replay") {
    val top = SparkEntry.queries("graph_pagerank")(spark, sf0001).cache()
    try {
      // Every rank is strictly positive (base term is always present).
      assert(top.filter(col("rank_nanos") <= 0).count() === 0L)

      // Integer floors only LOSE mass: the top-50 mass must stay under the
      // total budget of 1e9 nanos, and the heaviest nodes must carry more
      // than the uniform share (otherwise the iteration did nothing).
      val mass = top.agg(sum("rank_nanos")).first().getLong(0)
      assert(mass > 0L && mass <= 1000000000L)
      val maxRank = top.agg(max("rank_nanos")).first().getLong(0)
      val n = top.count()
      assert(n === 50L)
      assert(maxRank > 1000000000L / 2000L,
        s"top rank $maxRank should exceed a uniform share on a <2000-node graph")

      // Bit-exact replay: the lattice arithmetic has no engine or ordering
      // sensitivity, so a second run must produce identical rows.
      val again = SparkEntry.queries("graph_pagerank")(spark, sf0001)
      assert(top.except(again).count() === 0L)
      assert(again.except(top).count() === 0L)
    } finally top.unpersist()
  }
}
