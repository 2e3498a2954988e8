package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst kernel for the k-means assignment step: argmin over k
  * centroids of the squared-L2 distance, rounded to 6dp, ties to the
  * smallest cluster id.
  *
  * Why an Expression and not `least(round(aggregate(zip_with(...))))` per
  * centroid: the functional form walks k interpreted lambda chains per row
  * (higher-order functions never enter whole-stage codegen) and allocates
  * k intermediate arrays; this kernel reads the vector's primitive storage
  * once and folds all k distances in one fused JVM loop via `doGenCode`.
  * At n rows × k centroids × d dims, the assignment pass is exactly this
  * kernel — it is the entire per-round scan cost of Lloyd iteration.
  *
  * Determinism contract preserved bit-for-bit (oracle replay unchanged):
  * per-centroid sum in index order 0..d−1, [[VectorKernels.round6]] uses
  * the same shortest-decimal HALF_UP rounding as Spark's `round(x, 6)`,
  * and the argmin keeps the first (= smallest, ids are sorted) cluster on
  * rounded ties.
  */
case class L2ArgMin(child: Expression, clusterIds: Seq[Long], centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  require(clusterIds.nonEmpty && clusterIds.length == centroids.length,
    "l2_argmin: one id per centroid required")
  require(clusterIds == clusterIds.sorted,
    "l2_argmin: cluster ids must be ascending (tie-break contract)")
  require(centroids.forall(_.length == centroids.head.length),
    "l2_argmin: ragged centroid matrix")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"l2_argmin expects array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def mayHaveNullElems: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean = super.nullable || mayHaveNullElems

  // flattened row-major copies for the hot loop (and for addReferenceObj)
  @transient private lazy val flatCents: Array[Double] = centroids.flatten.toArray
  @transient private lazy val ids: Array[Long] = clusterIds.toArray
  private def dim: Int = centroids.head.length

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = dim
    require(x.numElements() == d,
      s"l2_argmin: expected dim $d, got ${x.numElements()}")
    val checkNulls = mayHaveNullElems
    var best = 0L
    var bestDist = Double.PositiveInfinity
    var j = 0
    while (j < ids.length) {
      var s = 0.0
      var i = 0
      while (i < d) {
        if (checkNulls && x.isNullAt(i)) return null
        val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val diff = xi - flatCents(j * d + i)
        s += diff * diff
        i += 1
      }
      val r = VectorKernels.round6(s)
      if (r < bestDist) { bestDist = r; best = ids(j) }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cents = ctx.addReferenceObj("flatCents", flatCents, "double[]")
      val cids = ctx.addReferenceObj("clusterIds", ids, "long[]")
      val d = dim
      val (i, j, s, r, xi, best, bestDist) = (
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("s"),
        ctx.freshName("r"), ctx.freshName("xi"), ctx.freshName("best"),
        ctx.freshName("bestDist"))
      val getX = if (isFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($x.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "l2_argmin: expected dim $d, got " + $x.numElements());
         |}
         |long $best = 0L;
         |double $bestDist = Double.POSITIVE_INFINITY;
         |for (int $j = 0; $j < ${ids.length} && !${ev.isNull}; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $nullCheck
         |    final double $xi = $getX;
         |    final double diff$s = $xi - $cents[$j * $d + $i];
         |    $s += diff$s * diff$s;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $r = graft.plans.VectorKernels.round6($s);
         |    if ($r < $bestDist) { $bestDist = $r; $best = $cids[$j]; }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2ArgMin =
    copy(child = newChild)
}

/** Native Catalyst kernel for SRP-LSH signatures: bit j = sign(v · r_j)
  * over `planes.length` fixed ±1 hyperplanes, packed into a long.
  *
  * Why an Expression and not `aggregate(zip_with(...))` per plane: the
  * functional form walks `bits` interpreted lambda chains per row
  * (higher-order functions never enter whole-stage codegen) and allocates
  * `bits` intermediate arrays — measured as the dominant cost of the SRP
  * near-dup pipeline at sf0.1. This kernel reads the vector's primitive
  * storage once and folds all planes in one fused JVM loop.
  *
  * Bit-for-bit equal to the functional witness
  * ([[graft.operators.Similarity.srpSignaturePortable]], spec-asserted):
  * per-plane dot product accumulates in index order 0..d−1 from 0.0 —
  * the same operation sequence as `aggregate(zip_with(...))` — so the
  * sign, hence every signature and the oracle replay, is unchanged.
  */
case class SrpSig(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 60, "srp_sig packs bits into a long")
  require(planes.forall(_.length == planes.head.length), "srp_sig: ragged planes")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_sig expects array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def mayHaveNullElems: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean = super.nullable || mayHaveNullElems

  @transient private lazy val flatPlanes: Array[Double] = planes.flatten.toArray
  private def dim: Int = planes.head.length

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = dim
    require(x.numElements() == d,
      s"srp_sig: expected dim $d, got ${x.numElements()}")
    val checkNulls = mayHaveNullElems
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      var s = 0.0
      var i = 0
      while (i < d) {
        if (checkNulls && x.isNullAt(i)) return null
        val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        s += xi * flatPlanes(j * d + i)
        i += 1
      }
      if (s >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val pl = ctx.addReferenceObj("flatPlanes", flatPlanes, "double[]")
      val d = dim
      val (i, j, s, xi, sig) = (
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("s"),
        ctx.freshName("xi"), ctx.freshName("sig"))
      val getX = if (isFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($x.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "srp_sig: expected dim $d, got " + $x.numElements());
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < ${planes.length} && !${ev.isNull}; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $nullCheck
         |    final double $xi = $getX;
         |    $s += $xi * $pl[$j * $d + $i];
         |  }
         |  if (!${ev.isNull} && $s >= 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSig =
    copy(child = newChild)
}

object VectorKernels {
  import org.apache.spark.sql.graft.Bridge

  /** Exactly Spark's `round(x, 6)` on doubles: shortest-decimal
    * representation, scale 6, HALF_UP.
    */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Argmin cluster id by round6(squared-L2), ties to smallest id. */
  def l2ArgMin(vec: Column, cents: Seq[(Long, Seq[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    Bridge.column(
      L2ArgMin(Bridge.expression(vec), sorted.map(_._1), sorted.map(_._2)))
  }

  /** Packed SRP-LSH signature over fixed ±1 planes. */
  def srpSig(vec: Column, planes: Seq[Seq[Double]]): Column =
    Bridge.column(SrpSig(Bridge.expression(vec), planes))
}
