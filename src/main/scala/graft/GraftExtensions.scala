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
    def fn(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))

    fn("cosine_similarity",
      "cosine_similarity(a, b) - cosine of two array<float|double> vectors") {
      exprs => plans.CosineSimilarity(exprs(0), exprs(1))
    }
    fn("token_hash60",
      "token_hash60(s) - first 60 bits of md5(s) as a bigint (engine-portable)") {
      exprs => plans.TokenHash60(exprs.head)
    }
    fn("rolling_token_hash",
      "rolling_token_hash(s) - polynomial rolling hash over space-split tokens") {
      exprs => plans.RollingTokenHash(exprs.head)
    }
  }
}
