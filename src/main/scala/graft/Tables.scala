package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture table loaders.
  *
  * All driver fixtures are single parquet files `<dir>/<name>.parquet`
  * (see TESTDATA.md / FIXTURES.md). Loading goes through `spark.read.parquet`
  * so Catalyst column pruning + filter pushdown apply automatically.
  *
  * `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark 4.x rejects
  * unless `spark.sql.legacy.parquet.nanosAsLong=true` is set (FIXTURES.md
  * caveat 1, verified). With that flag the column reads as LongType
  * nanoseconds; [[events]] reconstructs a microsecond timestamp with
  * integer arithmetic (`ts div 1000`) — double division would lose
  * precision above 2^53 ns and must not be used.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Events with `ts` normalized from INT64-nanos to a microsecond
    * TIMESTAMP_NTZ; raw nanos kept as `ts_ns`. Requires the session to
    * have `spark.sql.legacy.parquet.nanosAsLong=true`.
    *
    * NTZ, not TimestampType: the other fixture timestamps (orders,
    * lineitem) read as NTZ, DuckDB's TIMESTAMP is naive, and parquet
    * written from NTZ carries isAdjustedToUTC=false — so every timestamp
    * the engine emits compares as a naive wall-clock value, with no
    * tz-awareness mismatch in the driver's hash compare. Time arithmetic
    * (gaps, sessions) uses the exact integer `ts_ns` column instead of
    * instant-only functions like unix_micros.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
          .withColumn("ts", col("ts").cast(TimestampNTZType))
    }
  }
}

/** Aggregate helpers that make double-valued aggregates deterministic and
  * hence hash-comparable against a DuckDB oracle.
  *
  * A plain `sum(double)` depends on accumulation order (Spark partial/final
  * aggregation vs DuckDB's scan order), so the last few ulps differ run to
  * run. Casting each value to `DECIMAL(18,6)` first makes the sum exact and
  * associative; the final cast back to double is a single deterministic
  * rounding. Averages divide the exact decimal sum (as double) by the count
  * in IEEE double — identical in both engines.
  *
  * At 100 TB the decimal cast costs ~nothing (stays inside whole-stage
  * codegen) and buys bit-exact reproducibility across partitionings — the
  * sum no longer depends on how many partitions/executors contributed.
  */
object Det {
  private val dec = DecimalType(18, 6)

  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(dec)).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count in IEEE double. */
  def davg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(dec)).cast(DoubleType) / count(lit(1))

  /** Oracle-side SQL for [[dsum]]. */
  def dsumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"

  /** Oracle-side SQL for [[davg]]. */
  def davgSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*)"
}
