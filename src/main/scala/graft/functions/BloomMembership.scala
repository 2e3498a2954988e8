package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter set membership (Bloom, CACM 1970) as a typed Aggregator:
  * `Bits` bit positions packed into `Bits/64` longs, `K` md5-derived
  * hashes per item, OR-merge. The sketch answers "was this item in the
  * corpus?" with NO false negatives and a false-positive rate of
  * ~(1 − e^(−K·n/Bits))^K — the incremental-ingest dedup primitive: a new
  * batch is checked against a fixed 128 KiB summary of an arbitrarily
  * large existing corpus, instead of a corpus-sized anti-join (the BFF
  * shape used by Dolma's paragraph dedup).
  *
  * Like [[CountMinSketch]], the hashes are [[TextFunctions.tokenHash60]]
  * (md5-derived, engine-portable), so a SQL oracle can rebuild the exact
  * set of set-bits and replay membership answers bit-for-bit — false
  * positives included.
  */
object BloomMembership {

  /** 2^20 bits (128 KiB) / K=3: ~0.2% false positives at n = 45k items,
    * sized for the sf0.01 correctness gate with headroom. At a real 100 TB
    * corpus you size Bits ≈ 10·n (still MBs for billions of items) —
    * the constant here is a fixture-scale choice, not a design limit.
    */
  val Bits = 1 << 20
  val Words: Int = Bits / 64
  val K = 3

  private def hash(j: Int, item: Column): Column =
    (TextFunctions.tokenHash60(concat(lit(s"bf$j:"), item)) % Bits).cast("int")

  /** The K bit positions for one item: `array<int>` of length K. */
  def bitIndexes(item: Column): Column =
    array((0 until K).map(hash(_, item)): _*)

  /** Membership probe against a bloom column (the packed long array from
    * [[bloomAgg]]): true iff all K bits are set. No false negatives.
    */
  def mightContain(bloom: Column, item: Column): Column =
    (0 until K).map { j =>
      val idx = hash(j, item)
      getbit(element_at(bloom, shiftright(idx, 6) + 1), idx.bitwiseAND(63)) === 1
    }.reduce(_ && _)

  private final class BloomAggregator
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](Words)

    override def reduce(buf: Array[Long], idx: Seq[Int]): Array[Long] = {
      idx.foreach(i => buf(i >>> 6) |= (1L << (i & 63)))
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Aggregate a [[bitIndexes]] column into the packed bloom filter. */
  def bloomAgg(bitsCol: Column): Column =
    udaf(new BloomAggregator, ExpressionEncoder[Seq[Int]]())(bitsCol)
}
