package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-shingling: `WordShingles(text, n, distinct)` equals the
  * functional form
  * `transform(sequence(...), i => concat_ws(" ", element_at(ws, i+k)...))`
  * (optionally wrapped in `array_distinct`) over `split(text, " ")`.
  *
  * Why an Expression: the functional chain runs 3+ interpreted lambda
  * layers per row (higher-order functions never enter whole-stage
  * codegen), re-materializes token strings per window, and allocates a
  * hash set per array_distinct. This kernel walks the raw UTF-8 bytes
  * once — splitting on 0x20 (which never occurs inside a multi-byte
  * sequence, so byte-level splitting is UTF-8-safe), slicing each
  * shingle as ONE byte range of the original string (tokens in a shingle
  * are already space-joined in the source bytes — zero concatenation) —
  * and dedupes in first-occurrence order, matching `array_distinct`.
  * Shingling is the per-row scan cost of every text-dedup pipeline
  * (MinHash, SimHash, PPJoin, winnowing), which is what makes this the
  * suite's widest-reach kernel.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    WordShingles.shingle(s.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WordShingles.shingle($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.graft.Bridge

  /** Static kernel shared by interpreted eval and generated code. Token
    * boundaries are 0x20 bytes (split keeps empty tokens, like
    * `split(text, " ")` with limit −1); shingle (i..i+n−1) is the byte
    * range from token i's start to token i+n−1's end — identical bytes to
    * `concat_ws(" ", tokens...)` because the separators are the original
    * single spaces.
    */
  def shingle(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token start offsets (a token starts at 0 and after every space)
    var nTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTokens + 1) // sentinel: starts(nTokens) = len+1
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1
    val out = new java.util.ArrayList[Any](nTokens - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var j = 0
    while (j <= nTokens - n) {
      val from = starts(j)
      val until = starts(j + n) - 1 // end of token j+n-1 (strip next space)
      val sh = UTF8String.fromBytes(bytes, from, until - from)
      if (!distinct || seen.add(sh)) out.add(sh)
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n, distinct = true))

  def wordShinglesAll(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n, distinct = false))
}
