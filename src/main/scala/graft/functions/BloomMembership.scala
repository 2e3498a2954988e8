package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter set membership (Bloom, CACM 1970) as a typed Aggregator:
  * `bits` bit positions packed into `bits/64` longs, `k` md5-derived
  * hashes per item, OR-merge. The sketch answers "was this item in the
  * corpus?" with NO false negatives and a false-positive rate of
  * ~(1 − e^(−k·n/bits))^k — the incremental-ingest dedup primitive: a new
  * batch is checked against a fixed-size summary of an arbitrarily
  * large existing corpus, instead of a corpus-sized anti-join (the BFF
  * shape used by Dolma's paragraph dedup).
  *
  * Sizing is a CALLER parameter (every method takes `bits`, defaulted to
  * the fixture-scale [[Bits]]): a 100 TB corpus sizes bits ≈ 10·n for
  * ~1% false positives (still only ~1.2 GiB per 10⁹ items) — a
  * compile-time constant cannot serve both the correctness fixture and a
  * real corpus. `StressScale sketch` measures the FP-rate cliff of the
  * fixture default vs the 10·n sizing on the 10× stress corpus.
  *
  * Like [[CountMinSketch]], the hashes are [[TextFunctions.tokenHash60]]
  * (md5-derived, engine-portable), so a SQL oracle can rebuild the exact
  * set of set-bits and replay membership answers bit-for-bit — false
  * positives included.
  */
object BloomMembership {

  /** Default sizing: 2^20 bits (128 KiB) / K=3 ~0.2% false positives at
    * n = 45k items — the sf0.01 correctness-gate scale with headroom.
    * The registered `dedup_bloom_shingles` query pins these values (its
    * oracle SQL replays them); real corpora pass their own `bits`.
    */
  val Bits = 1 << 20
  val Words: Int = Bits / 64
  val K = 3

  private def hash(j: Int, item: Column, bits: Int): Column =
    (TextFunctions.tokenHash60(concat(lit(s"bf$j:"), item)) % bits).cast("int")

  private def checkBits(bits: Int): Unit =
    require(bits > 0 && bits % 64 == 0, s"bits must be a positive multiple of 64, got $bits")

  /** The k bit positions for one item: `array<int>` of length k. */
  def bitIndexes(item: Column, bits: Int = Bits, k: Int = K): Column = {
    checkBits(bits)
    require(k > 0, s"k must be positive, got $k")
    array((0 until k).map(hash(_, item, bits)): _*)
  }

  /** Membership probe against a bloom column (the packed long array from
    * [[bloomAgg]], built with the SAME `bits`/`k`): true iff all k bits
    * are set. No false negatives.
    */
  def mightContain(bloom: Column, item: Column, bits: Int = Bits, k: Int = K): Column = {
    checkBits(bits)
    (0 until k).map { j =>
      val idx = hash(j, item, bits)
      getbit(element_at(bloom, shiftright(idx, 6) + 1), idx.bitwiseAND(63)) === 1
    }.reduce(_ && _)
  }

  private final class BloomAggregator(words: Int)
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](words)

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

  /** Aggregate a [[bitIndexes]] column into the packed bloom filter
    * (`bits/64` longs; pass the same `bits` used for the indexes).
    */
  def bloomAgg(bitsCol: Column, bits: Int = Bits): Column = {
    checkBits(bits)
    udaf(new BloomAggregator(bits / 64), ExpressionEncoder[Seq[Int]]())(bitsCol)
  }
}
