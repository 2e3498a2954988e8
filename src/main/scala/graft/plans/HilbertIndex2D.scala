package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Per-row 2-D Hilbert-curve index over two pre-normalized 16-bit bucket
  * coordinates (the d = s(x,y) step of Hilbert clustering).
  *
  * Why Hilbert and not only Z-order: both map a 2-D box to a small set of
  * contiguous curve ranges, but the Z-curve takes long diagonal jumps at
  * every power-of-two boundary, so a range-partitioned file can span two
  * far-apart spatial blocks and its min/max box widens; the Hilbert curve
  * is fully edge-connected (consecutive indices are always grid
  * neighbors — asserted by spec), so range partitions stay spatially
  * tight and stats-based pruning skips more files for the same box. This
  * is why table formats cluster on Hilbert when they can (e.g. Delta's
  * liquid clustering); the classic reference is Hilbert's 1891 curve via
  * the bit-twiddling xy→d walk popularized by "Programming the Hilbert
  * curve" (Skilling, 2004).
  *
  * Why an Expression: the walk is a 16-iteration loop with rotation
  * state — inexpressible as a reasonable built-in-function tree, and a
  * Scala UDF would break whole-stage codegen in the middle of the layout
  * job's projection. This kernel stays codegen'd (defineCodeGen calls the
  * shared static walk), so the OPTIMIZE pass remains one narrow
  * shuffle + sort.
  *
  * Inputs must already be bucket longs in [0, 2^16) — normalization
  * (min/max to bucket space) is the caller's affair and is shared with
  * Z-order so the two layouts differ ONLY in the curve.
  */
case class HilbertIndex2D(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index_2d expects (bigint, bigint), got " +
          s"(${a.catalogString}, ${b.catalogString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex2D.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.plans.HilbertIndex2D.xy2d($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2D =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2D {

  /** Bits per dimension; 16 matches [[graft.sources.ZOrder]]'s 2-D
    * resolution so the two curves bucket identically.
    */
  val Order = 16

  /** Static kernel shared by interpreted eval and generated code: the
    * standard xy→d walk (quadrant digit + rotation per level, high bit
    * first). Inputs are clamped to the grid so out-of-contract callers
    * degrade to the curve's border instead of corrupting the index.
    */
  def xy2d(x0: Long, y0: Long): Long = {
    val mask = (1L << Order) - 1
    var x = if (x0 < 0) 0L else if (x0 > mask) mask else x0
    var y = if (y0 < 0) 0L else if (y0 > mask) mask else y0
    var d = 0L
    var s = 1L << (Order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the lower quadrant so the walk stays edge-connected
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertIndex2d(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(HilbertIndex2D(Bridge.expression(x), Bridge.expression(y)))
  }
}
