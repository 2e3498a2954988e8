package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The library's `SparkSessionExtensions` entry point — the idiomatic
  * deployment path for custom Catalyst expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects every graft SQL function into each new session's registry at
  * construction time (works with spark-submit, the thrift server, and
  * Connect servers alike — anywhere the session is built from conf rather
  * than code). The per-session `register(spark)` helpers on the companion
  * objects remain for programmatic use; this class is the zero-code-change
  * route.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // arity-checked at resolution so a wrong-arity call surfaces as an
    // analysis error, not an IndexOutOfBoundsException from the builder
    def fn(name: String, arity: Int, usage: String)
        (builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        exprs => {
          if (exprs.length != arity)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> name, "expectedNum" -> arity.toString,
                "actualNum" -> exprs.length.toString, "docroot" -> ""))
          builder(exprs)
        }))

    fn("cosine_similarity", 2,
      "cosine_similarity(a, b) - cosine of two array<float|double> vectors") {
      exprs => plans.CosineSimilarity(exprs(0), exprs(1))
    }
    fn("token_hash60", 1,
      "token_hash60(s) - first 60 bits of md5(s) as a bigint (engine-portable)") {
      exprs => plans.TokenHash60(exprs.head)
    }
    fn("rolling_token_hash", 1,
      "rolling_token_hash(s) - polynomial rolling hash over space-split tokens") {
      exprs => plans.RollingTokenHash(exprs.head)
    }
    fn("redact_pii", 1,
      "redact_pii(s) - emails/IPv4s/phone-shaped numbers replaced by typed placeholders") {
      exprs =>
        import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
        functions.TextFunctions.PiiPatterns.foldLeft(exprs.head) {
          case (e, (re, tag)) => RegExpReplace(e, Literal(re), Literal(tag))
        }
    }
  }
}
