package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-row MinHash signature over a doc's HASHED shingle array
  * (`array<long>`, the 8-byte xxhash64 identities the dedup pipelines
  * shuffle): base hash = `pmod(xxhash64(elem), P)` — bit-identical to the
  * SQL-function chain of the aggregate formulation (same xxhash64 seed
  * 42, same pmod) — then the (a·h + b) mod P permutation family,
  * tracking each minimum.
  *
  * Why an Expression: a signature is a pure per-document function, but
  * the aggregate form explodes the shingle table and runs numHashes
  * `min()` aggregates through a groupBy — one row per (doc, shingle)
  * plus aggregation machinery. This kernel folds all permutations in one
  * pass over the array inside the scan, so the near-dup pipeline never
  * explodes shingles at all: signatures here, verification over the same
  * per-doc arrays. Returns null when no non-null element exists (callers
  * filter empty arrays, reproducing explode's row-dropping).
  */
case class MinHashSig(child: Expression, perms: Seq[(Long, Long)])
    extends UnaryExpression {

  require(perms.nonEmpty, "need at least one permutation")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint> (hashed shingles), got ${t.catalogString}")
  }

  @transient private lazy val as: Array[Long] = perms.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = perms.map(_._2).toArray

  override def nullSafeEval(a: Any): Any =
    MinHashSig.sig(a.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", as, "long[]")
    val bRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.MinHashSig.sig($c, $aRef, $bRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.graft.Bridge

  private val P = 4294967291L // matches operators.Dedup.P

  /** Static kernel shared by interpreted eval and generated code. Returns
    * null when the array holds no non-null element.
    */
  def sig(arr: ArrayData, as: Array[Long], bs: Array[Long]): GenericArrayData = {
    val n = arr.numElements()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val x = XxHash64Function.hash(arr.getLong(i), LongType, 42L) // xxhash64 default seed
        var h = x % P
        if (h < 0) h += P // pmod
        var j = 0
        while (j < k) {
          // no overflow: a ≤ 2^31, h ≤ P−1 < 2^32, b ≤ 2^31 ⇒
          // a·h + b ≤ 2^31·(2^32−6) + 2^31 < 2^63−1 (≈1.3e10 headroom only —
          // widening a/b or P requires re-deriving this bound)
          val v = (as(j) * h + bs(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins.map(Long.box(_): Any))
  }

  def minHashSig(hashedShingles: Column, perms: Seq[(Long, Long)]): Column =
    Bridge.column(MinHashSig(Bridge.expression(hashedShingles), perms))
}
