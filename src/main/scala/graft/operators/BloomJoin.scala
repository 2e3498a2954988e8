package graft.operators

import graft.{Det, Q, Tables}
import graft.functions.BloomMembership
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: build a fixed-size bloom over the
  * build side's join keys, broadcast the SKETCH (not the rows), and
  * pre-filter the probe side BEFORE its shuffle. The exact join still
  * runs afterwards, so false positives cost only wasted shuffle bytes —
  * never wrong rows — and the result is bit-identical to the plain join
  * (which is exactly what the oracle states: no sketch replay needed).
  *
  * This is the pattern for the regime where the build side is too big to
  * broadcast as ROWS but its key set fits a sketch: a 10⁸-key build side
  * is a ~125 MB bloom at 10 bits/key vs many GB of broadcast rows, and a
  * 99%-selective filter drops the probe shuffle by the same factor.
  * (Spark's own runtime bloom-join rule injects this shape when stats
  * justify it; here it is explicit, deterministic, and usable on
  * checkpointed/cached inputs the runtime rule cannot see. At dim scale
  * AQE simply broadcasts the build side and the bloom is a no-op tax —
  * the spec measures the reduction, the scaladoc owns the trade-off.)
  */
object BloomJoin {

  /** Probe-side rows that might join `buildKeys` (no false negatives):
    * `probe` filtered by a broadcast bloom of the build side's key set.
    */
  def bloomReduce(probe: DataFrame, probeKey: Column,
                  build: DataFrame, buildKey: Column,
                  bits: Int = BloomMembership.Bits): DataFrame = {
    val sketch = build.agg(
      BloomMembership.bloomAgg(
        BloomMembership.bitIndexes(buildKey.cast("string"), bits), bits)
        .as("__bloom"))
    probe.crossJoin(broadcast(sketch))
      .filter(BloomMembership.mightContain(col("__bloom"), probeKey.cast("string"), bits))
      .drop("__bloom")
  }

  val queries: Seq[Q] = Seq(
    // ---- revenue by brand over a key-sparse dim subset (p_size = 7,
    // ~2% of parts): lineitem is bloom-reduced on l_partkey before the
    // join shuffle. Oracle is the PLAIN join — semi-join reduction must
    // be invisible in the result. ----
    Q(
      "q_bloom_semi_reduction",
      s"""SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  ${Det.dsumSql("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE p_size = 7
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    ) { (s, d) =>
      val dim = Tables.part(s, d).filter(col("p_size") === 7)
      val fact = bloomReduce(
        Tables.lineitem(s, d), col("l_partkey"), dim, col("p_partkey"))
      fact.join(dim, col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy("p_brand")
    },
  )
}
