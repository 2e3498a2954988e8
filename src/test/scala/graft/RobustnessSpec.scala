package graft

import org.apache.spark.sql.functions._

/** Failure-isolation contracts from the round-9 postmortem: a throwing
  * loader must not poison the SQL session memo, and a retried streaming
  * micro-batch must not double its sink output.
  */
class RobustnessSpec extends SparkSpec {

  test("a throwing loader does not poison the SQL-surface registration memo") {
    val dir = java.nio.file.Files.createTempDirectory("graft_poison_")
    // stage a dir that registers TPC-H + events fine but fails on documents
    (Tables.tpch :+ "events").foreach { n =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/$n.parquet"),
        dir.resolve(s"$n.parquet"))
    }
    intercept[Exception] {
      sources.GraftSql.sql(spark, dir.toString, "SELECT COUNT(*) FROM lineitem")
    }
    // repair the fixture; the next call must retry registration from
    // scratch (a memo recorded before success would leave the session
    // half-registered and this query would fail on a missing view)
    Seq("documents", "embeddings").foreach { n =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/$n.parquet"),
        dir.resolve(s"$n.parquet"))
    }
    val n = sources.GraftSql
      .sql(spark, dir.toString, "SELECT COUNT(*) AS n FROM documents")
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  test("writeBatch: a retried Append-mode micro-batch does not double-write") {
    val out = java.nio.file.Files.createTempDirectory("graft_retry_").resolve("out").toString
    val b0 = spark.range(0, 100).toDF("id")
    val b1 = spark.range(100, 150).toDF("id")
    streaming.StreamingOps.writeBatch(b0.toDF(), out, complete = false, 0L)
    // simulate a sink retry of batch 0 (foreachBatch redelivers the same
    // batch id after a failure) — the rewrite must replace, not append
    streaming.StreamingOps.writeBatch(b0.toDF(), out, complete = false, 0L)
    streaming.StreamingOps.writeBatch(b1.toDF(), out, complete = false, 1L)
    val got = spark.read.parquet(out).drop("batch")
    assert(got.count() == 150)
    assert(got.select(countDistinct(col("id"))).collect()(0).getLong(0) == 150)
  }
}
