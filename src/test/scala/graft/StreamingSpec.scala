package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** Streaming tier: batch-equivalence of the windowed agg and the stateful
  * mapGroupsWithState path.
  */
class StreamingSpec extends SparkSpec {

  test("streaming hourly agg equals batch aggregation over the same data") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), col("hour_start").cast("string"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    val streamed = rows(StreamingOps.hourlyCountsStreaming(spark, sf0001))
    val batch = rows(Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n")))
    assert(streamed.sameElements(batch))
    assert(batch.nonEmpty)
  }

  test("stateful mapGroupsWithState totals are BIT-equal to the batch Det sums") {
    val stateful = StreamingOps.statefulUserTotals(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(stateful == batch) // integer-micros state ⇒ exact equality
    assert(batch.nonEmpty)
  }
}
