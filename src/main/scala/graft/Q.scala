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
  *  - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** Rows-only checked query (no SQL-expressible oracle). */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
