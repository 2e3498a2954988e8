package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a PARTIAL aggregate (SURVEY.md §2.8 custom aggregate
  * surface + the O2 top-k operator generalized to per-group).
  *
  * The naive per-group top-k — `ROW_NUMBER() OVER (PARTITION BY g ORDER BY
  * v DESC) <= k` — shuffles EVERY row to its group's reducer and sorts the
  * whole partition before discarding all but k rows. This aggregator keeps
  * a size-k buffer per group per map task instead, so the shuffle carries
  * at most k rows per group per input partition and no sort ever sees the
  * full data: at 100 TB the window plan moves the whole table across the
  * wire, this plan moves ≤ k·groups·partitions tuples. Spark plans it as
  * ObjectHashAggregate with a partial_topk → merge_topk split (map-side
  * combine), the same shape the built-in partial aggregates get.
  *
  * Ordering is (value, id) lexicographic descending — the unique id
  * tie-break makes the result total-ordered and engine-portable. Values
  * pass through untouched (no double arithmetic), so the oracle compare is
  * hash-exact.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(
      buf: Array[(Double, Long)],
      x: (Double, Long)): Array[(Double, Long)] =
    if (buf.length < k) buf :+ x
    else {
      var mi = 0
      var i = 1
      while (i < buf.length) { if (lt(buf(i), buf(mi))) mi = i; i += 1 }
      if (lt(buf(mi), x)) buf(mi) = x
      buf
    }

  override def merge(
      x: Array[(Double, Long)],
      y: Array[(Double, Long)]): Array[(Double, Long)] =
    y.foldLeft(x)(reduce)

  /** Descending (value, id) so position in the array IS the rank. */
  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] =
    buf.sortWith((a, b) => lt(b, a))

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()

  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}
