package graft.dsl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Result dump / CLI (SURVEY.md §2.1 S7): the reference's pretty-printed
  * result table and one-shot SQL runner.
  *
  * `dump` renders a bounded prefix via `take(n)` — dump is inherently a
  * driver-side operation on a bounded prefix (the only sanctioned
  * `collect`-shaped call in the library); unbounded results go through
  * sinks, not dump.
  */
object Dump {

  /** First `n` rows as an aligned text table (header, rule, rows). */
  def dump(df: DataFrame, n: Int = 20): String = {
    val header = df.columns.toSeq
    val rows = df.take(n).toSeq
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString))
    val widths = header.indices
      .map(i => (header(i).length +: rows.map(_(i).length)).max)
    def line(vals: Seq[String]) = vals.zip(widths)
      .map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val rule = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(rule, line(header), rule) ++ rows.map(line) :+ rule).mkString("\n")
  }

  /** One-shot CLI: `runMain graft.dsl.Dump "<sql>" [sfDir] [n]` — registers
    * the fixture tables and dumps the query result.
    */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Dump <sql> [sfDir] [limit]")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val n = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try println(dump(graft.sources.GraftSql.sql(spark, sfDir, args(0)), n))
    finally spark.stop()
  }
}
