package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

/** Semi-join-reduction invariants: the bloom pre-filter loses NO true
  * match (structural no-false-negative guarantee) and actually shrinks
  * the probe side on a key-sparse build side.
  */
class BloomJoinSpec extends SparkSpec {

  test("bloomReduce keeps every true match and drops most non-matches") {
    val li = Tables.lineitem(spark, sf0001)
    val dim = Tables.part(spark, sf0001).filter(col("p_size") === 7)
    val reduced = BloomJoin.bloomReduce(li, col("l_partkey"), dim, col("p_partkey"))

    val trueMatches = li.join(dim, col("p_partkey") === col("l_partkey")).count()
    val total = li.count()
    val kept = reduced.count()

    // no false negatives: every true match survives the pre-filter
    val lostMatches = reduced.join(dim, col("p_partkey") === col("l_partkey")).count()
    assert(lostMatches === trueMatches, "bloom dropped a true match")
    // real reduction: the pre-filter must remove the bulk of the fact side
    // (p_size=7 selects ~2% of parts; bloom FP rate at these sizes ≪ 1%)
    assert(kept < total / 4, s"expected strong reduction, kept $kept of $total")
    assert(kept >= trueMatches)
  }

  test("q_bloom_semi_reduction equals the plain join it accelerates") {
    val withBloom = SparkEntry.queries("q_bloom_semi_reduction")(spark, sf0001)
    val dim = Tables.part(spark, sf0001).filter(col("p_size") === 7)
    val plain = Tables.lineitem(spark, sf0001)
      .join(dim, col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("p_brand")
    assert(withBloom.collect().toSeq === plain.collect().toSeq)
  }
}
