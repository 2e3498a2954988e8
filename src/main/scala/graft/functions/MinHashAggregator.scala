package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY.md §2.8): the reference's user-definable
  * `Aggregation` objects — (init, accumulate, combine, result) — map onto
  * Spark's `Aggregator[IN, BUF, OUT]`. This one folds base shingle hashes
  * into a full MinHash signature in a single buffer per group: the
  * one-pass alternative to planning N separate `min()` aggregates.
  *
  * The permutation family (a_i·h + b_i mod P) must match
  * operators.Dedup.permConstants so both signature paths agree — asserted
  * by spec.
  */
final class MinHashAggregator(numHashes: Int, perms: Seq[(Long, Long)])
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val P: Long = 4294967291L
  private val as: Array[Long] = perms.map(_._1).toArray
  private val bs: Array[Long] = perms.map(_._2).toArray
  require(as.length == numHashes, "need one (a,b) pair per hash")

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val v = (as(i) * h + bs(i)) % P // h < P < 2^32, a < 2^31: no overflow
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
