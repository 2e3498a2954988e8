package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2): each entry is a
  * Spark implementation; `oracleSql` carries the ANSI-SQL equivalent the
  * driver runs in DuckDB over the same parquet tables. Entries without an
  * oracle (engine-specific sketches/LSH) get a rows-only check.
  */
object SparkEntry {

  /** All registered queries, grouped by area. */
  def allQ: Seq[Q] =
    operators.Relational.queries ++
      operators.EventsOps.queries ++
      operators.TextOps.queries ++
      operators.Dedup.queries ++
      operators.TrainingData.queries ++
      operators.Similarity.queries ++
      operators.SkewJoin.queries ++
      operators.DataQuality.queries ++
      operators.BloomJoin.queries ++
      operators.GraphOps.queries ++
      operators.RangeJoin.queries ++
      operators.CatalogOps.queries ++
      operators.Scd2.queries ++
      operators.EntityResolution.queries ++
      streaming.StreamingOps.queries ++
      streaming.KafkaOps.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_scan_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
