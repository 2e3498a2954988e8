package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): a
  * fixed-memory frequency sketch — `Depth` hash rows × `Width` counters;
  * each occurrence increments one counter per row, the point estimate is
  * the MIN across rows. Estimates never under-count, and over-count by
  * ≤ εN (ε = e/Width) with probability 1 − (1/e)^Depth.
  *
  * This is the heavy-hitters path that replaces an exact
  * `groupBy(token).count()` at 100 TB: the sketch is Depth·Width longs
  * (32 KiB here) REGARDLESS of corpus size, built in one pass as a typed
  * [[Aggregator]] (map-side partial sketches, elementwise-sum merge — the
  * only shuffled bytes are the 4096-cell partials, one per partition).
  *
  * The row hashes are md5-derived ([[TextFunctions.tokenHash60]] of a
  * row-tagged token), so the sketch is ENGINE-PORTABLE: the DuckDB oracle
  * rebuilds the identical sketch in SQL and the driver compare is
  * hash-exact on the estimates themselves — no accuracy-slack contract
  * needed (cf. the HLL/approx-percentile sketches, whose internals are
  * engine-specific).
  */
object CountMinSketch {

  /** 4 rows × 1024 counters → ε = e/1024 ≈ 0.27% of total mass, failure
    * probability (1/e)^4 ≈ 1.8% per probe (and deterministic given the
    * data: the same corpus always yields the same sketch).
    */
  val Depth = 4
  val Width = 1024

  /** Per-row bucket indices for one token: `array<int>` of length Depth.
    * Row r's hash is tokenHash60("cm<r>:" || token) mod Width — computed
    * by the codegen'd kernel in the scan, so the aggregator below only
    * ever sees small int arrays.
    */
  def buckets(token: Column): Column =
    array((0 until Depth).map { r =>
      (TextFunctions.tokenHash60(concat(lit(s"cm$r:"), token)) % Width).cast("int")
    }: _*)

  /** Point estimate for `token` against a sketch column (the flat
    * Depth·Width array produced by [[sketchAgg]]): min over rows of the
    * token's counter in that row.
    */
  def estimate(sketch: Column, token: Column): Column =
    least((0 until Depth).map { r =>
      element_at(
        sketch,
        lit(r * Width + 1) +
          (TextFunctions.tokenHash60(concat(lit(s"cm$r:"), token)) % Width).cast("int"))
    }: _*)

  /** The sketch as a typed Aggregator: buffer = one flat long array of
    * Depth·Width cells (row-major), reduce = increment Depth cells, merge
    * = elementwise sum. Associative + commutative, so partial sketches
    * combine map-side exactly like any built-in partial aggregate.
    */
  private final class CmsAggregator
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](Depth * Width)

    override def reduce(buf: Array[Long], idx: Seq[Int]): Array[Long] = {
      var r = 0
      while (r < Depth) { buf(r * Width + idx(r)) += 1L; r += 1 }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Aggregate a [[buckets]] column into the sketch (`array<bigint>` of
    * Depth·Width cells).
    */
  def sketchAgg(bucketsCol: Column): Column =
    udaf(new CmsAggregator, ExpressionEncoder[Seq[Int]]())(bucketsCol)
}
