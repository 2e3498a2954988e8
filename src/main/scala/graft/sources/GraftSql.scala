package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: registers every fixture table as a temp view (events
  * with the normalized timestamp) and runs Spark SQL — the engine's
  * second query surface next to the DSL. Any query expressible in the
  * DSL is expressible here; the physical plans are identical because both
  * compile to the same Catalyst logical plans.
  */
object GraftSql {

  // registration is idempotent per (session, dir): each re-registration
  // re-reads 10 parquet footers, so repeated SQL-surface calls memoize it
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()

  /** Register all fixture tables under their canonical names (once per
    * session + fixture dir).
    */
  def registerFixtures(spark: SparkSession, sfDir: String): Unit =
    if (registered.add((System.identityHashCode(spark), sfDir))) {
      graft.plans.TokenHash60.register(spark)
      Tables.tpch.foreach(n => Tables.load(spark, sfDir, n).createOrReplaceTempView(n))
      Tables.events(spark, sfDir).createOrReplaceTempView("events")
      Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
      Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
    }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerFixtures(spark, sfDir)
    spark.sql(query)
  }
}
