package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-row 60-bit SimHash over a token ARRAY: hash each token
  * (md5-top-60, the [[TextHash]] portability contract), vote ±1 per bit,
  * emit the packed majority signature.
  *
  * Why an Expression: the aggregate formulation explodes the token table
  * and shuffles it through a 60-sum `groupBy(id)` — at corpus scale
  * that shuffle carries one row per (doc, token). A signature is a pure
  * per-document function, so this kernel computes it in the scan and THE
  * SHUFFLE CEASES TO EXIST; downstream LSH bucketing shuffles only
  * (id, signature). Semantics match the aggregate form exactly: null
  * tokens contribute nothing; a document whose tokens are all null gets
  * signature 0 (the aggregate's null-sum → otherwise-0 path); ties
  * (vote sum 0) set the bit, like `when(sum >= 0, ...)`. Callers filter
  * empty/null arrays to reproduce explode's row-dropping.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    SimHash60.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash60.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  import org.apache.spark.sql.graft.Bridge

  /** Static kernel shared by interpreted eval and generated code. */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = TextHash.hash60(arr.getUTF8String(i))
        var k = 0
        while (k < 60) {
          votes(k) += (((h >>> k) & 1L).toInt << 1) - 1
          k += 1
        }
      }
      i += 1
    }
    if (!any) return 0L
    var sig = 0L
    var k = 0
    while (k < 60) {
      if (votes(k) >= 0) sig |= 1L << k
      k += 1
    }
    sig
  }

  def simHash60(tokens: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(tokens)))
}
