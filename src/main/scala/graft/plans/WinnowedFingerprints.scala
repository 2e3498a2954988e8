package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fully-fused winnowing kernel: tokenize → k-gram hash → w-window min →
  * first-occurrence dedupe, one pass over the raw UTF-8 bytes.
  *
  * Equals `TextFunctions.winnowFingerprintsPortable` (the functional
  * pipeline it replaces) value-for-value: gram (j..j+k−1) is a byte RANGE
  * of the source string (its tokens are already space-joined there), so
  * `TextHash.md5Top60` over that range is exactly `tokenHash60` of the
  * materialized gram string — zero gram strings are ever allocated. The
  * sliding window minimum runs on a monotonic deque (O(grams) total, not
  * O(grams·w)), and dedupe keeps first-occurrence order like
  * `array_distinct`. Fewer grams than `w` → one whole-document minimum;
  * fewer tokens than `k` → empty.
  */
case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "winnow: k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    WinnowedFingerprints.winnow(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WinnowedFingerprints.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowedFingerprints =
    copy(child = newChild)
}

object WinnowedFingerprints {
  import org.apache.spark.sql.graft.Bridge

  /** Static kernel shared by interpreted eval and generated code. */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var nTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1
    val m = nTokens - k + 1 // gram count
    val hs = new Array[Long](m)
    var j = 0
    while (j < m) {
      hs(j) = TextHash.md5Top60(bytes, starts(j), starts(j + k) - 1)
      j += 1
    }
    val out = new java.util.ArrayList[Any]()
    val seen = new java.util.HashSet[java.lang.Long]()
    if (m < w) {
      var min = hs(0)
      j = 1
      while (j < m) { if (hs(j) < min) min = hs(j); j += 1 }
      out.add(min)
    } else {
      // monotonic deque of gram indices: head = min of current window
      val dq = new Array[Int](m)
      var head = 0
      var tail = 0 // exclusive
      j = 0
      while (j < m) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (dq(head) <= j - w) head += 1
        if (j >= w - 1) {
          val min = hs(dq(head))
          if (seen.add(min)) out.add(min)
        }
        j += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowedFingerprints(Bridge.expression(text), k, w))
}
