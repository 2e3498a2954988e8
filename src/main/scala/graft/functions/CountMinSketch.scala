package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): a
  * fixed-memory frequency sketch — `depth` hash rows × `width` counters;
  * each occurrence increments one counter per row, the point estimate is
  * the MIN across rows. Estimates never under-count, and over-count by
  * ≤ εN (ε = e/width) with probability 1 − (1/e)^depth.
  *
  * This is the heavy-hitters path that replaces an exact
  * `groupBy(token).count()` at 100 TB: the sketch is depth·width longs
  * REGARDLESS of corpus size, built in one pass as a typed
  * [[Aggregator]] (map-side partial sketches, elementwise-sum merge — the
  * only shuffled bytes are the depth·width-cell partials, one per
  * partition).
  *
  * Sizing is a CALLER parameter (every method takes `depth`/`width`,
  * defaulted to the fixture-scale [[Depth]]/[[Width]]): ε = e/width is a
  * fraction of TOTAL corpus mass, so a 100 TB vocabulary needs width
  * sized to the heavy-hitter threshold it must resolve (e.g. width 2²⁰ →
  * ε ≈ 2.6e-6 at 32 MiB per sketch) — a compile-time constant cannot
  * serve both the correctness fixture and a real corpus.
  *
  * The row hashes are md5-derived ([[TextFunctions.tokenHash60]] of a
  * row-tagged token), so the sketch is ENGINE-PORTABLE: the DuckDB oracle
  * rebuilds the identical sketch in SQL and the driver compare is
  * hash-exact on the estimates themselves — no accuracy-slack contract
  * needed (cf. the HLL/approx-percentile sketches, whose internals are
  * engine-specific).
  */
object CountMinSketch {

  /** Default sizing: 4 rows × 1024 counters → ε = e/1024 ≈ 0.27% of total
    * mass, failure probability (1/e)^4 ≈ 1.8% per probe (and
    * deterministic given the data: the same corpus always yields the same
    * sketch). The registered `q_heavy_hitters_cms` query pins these
    * values (its oracle SQL replays them); real corpora pass their own.
    */
  val Depth = 4
  val Width = 1024

  private def check(depth: Int, width: Int): Unit =
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth×$width")

  /** Per-row bucket indices for one token: `array<int>` of length depth.
    * Row r's hash is tokenHash60("cm<r>:" || token) mod width — computed
    * by the codegen'd kernel in the scan, so the aggregator below only
    * ever sees small int arrays.
    */
  def buckets(token: Column, depth: Int = Depth, width: Int = Width): Column = {
    check(depth, width)
    array((0 until depth).map { r =>
      (TextFunctions.tokenHash60(concat(lit(s"cm$r:"), token)) % width).cast("int")
    }: _*)
  }

  /** Point estimate for `token` against a sketch column (the flat
    * depth·width array produced by [[sketchAgg]] with the SAME sizing):
    * min over rows of the token's counter in that row.
    */
  def estimate(sketch: Column, token: Column,
      depth: Int = Depth, width: Int = Width): Column = {
    check(depth, width)
    least((0 until depth).map { r =>
      element_at(
        sketch,
        lit(r * width + 1) +
          (TextFunctions.tokenHash60(concat(lit(s"cm$r:"), token)) % width).cast("int"))
    }: _*)
  }

  /** The sketch as a typed Aggregator: buffer = one flat long array of
    * depth·width cells (row-major), reduce = increment depth cells, merge
    * = elementwise sum. Associative + commutative, so partial sketches
    * combine map-side exactly like any built-in partial aggregate.
    */
  private final class CmsAggregator(depth: Int, width: Int)
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], idx: Seq[Int]): Array[Long] = {
      var r = 0
      while (r < depth) { buf(r * width + idx(r)) += 1L; r += 1 }
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
    * depth·width cells; pass the same sizing used for the buckets).
    */
  def sketchAgg(bucketsCol: Column, depth: Int = Depth, width: Int = Width): Column = {
    check(depth, width)
    udaf(new CmsAggregator(depth, width), ExpressionEncoder[Seq[Int]]())(bucketsCol)
  }
}
