package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** Streaming tier: batch-equivalence of the windowed agg and the stateful
  * mapGroupsWithState path.
  */
class StreamingSpec extends SparkSpec {

  test("streaming hourly agg equals batch aggregation over the same data") {
    val streamed = StreamingOps.hourlyCountsStreaming(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).sorted
    val batch = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).sorted
    assert(streamed.sameElements(batch))
    assert(batch.nonEmpty)
  }

  test("stateful mapGroupsWithState totals equal batch per-user totals") {
    val stateful = StreamingOps.statefulUserTotals(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(stateful.keySet == batch.keySet)
    batch.foreach { case (u, (n, s)) =>
      assert(stateful(u)._1 == n)
      assert(math.abs(stateful(u)._2 - s) < 1e-9 * math.max(1.0, math.abs(s)))
    }
  }
}
