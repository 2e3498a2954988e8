package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same fixture tables. `oracle == None` downgrades the driver's
  * check to rows-only (used for approx/LSH operators whose exact output
  * depends on engine-internal hash functions).
  *
  * Determinism contract (so the driver's value-hash compare passes):
  *  - every query ends in a total-order `ORDER BY` with a unique tie-break;
  *  - double aggregates go through [[Det.dsum]]/[[Det.davg]];
  *  - integer-valued derived columns are cast to BIGINT on both sides
  *    (DuckDB's SUM(BIGINT) is HUGEINT, Spark's is LongType);
  *  - column names are aliased identically on both sides;
  *  - values feeding a COMPARE (bucket cuts, thresholds on derived
  *    doubles) are quantized to integer micros via FLOOR(x*1e6 + 0.5)
  *    first — ROUND(x, d) ties are engine-specific (Spark rounds the
  *    shortest-decimal rendering, DuckDB the binary value) — and
  *    quantile cut points are DISCRETE order statistics with integer
  *    index arithmetic, never interpolated (p·(n−1) can land an ulp
  *    apart across engines at exact-integer indices).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    weekly: Boolean = false,
)

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** Rows-only checked query (no SQL-expressible oracle). */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)

  /** Weekly-tier query: a full LIFECYCLE replay (multi-batch streaming
    * runs, train-then-serve loops, incremental-maintenance epochs) or an
    * ALGORITHM-VARIANT twin sharing another row's oracle, whose cheaper
    * per-round twin is the row a per-round bench should time. Still a
    * first-class oracle row — Verify runs it every round and the DuckDB
    * gate checks it, and `WeeklyTierSpec` executes it per test run — but
    * [[Bench]] skips it by default (`SPARK_GRAFT_BENCH_TIER=full`
    * restores it), the way a production perf suite times the serving
    * path per-commit and the end-to-end rebuild on a slower cadence.
    */
  def weekly(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle), weekly = true)
}
