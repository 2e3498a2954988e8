package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Hash-bucketed external tables: the storage-side half of a co-located
  * join (SURVEY.md §6 partitioning strategy).
  *
  * Writing both sides of a recurring fact-fact join bucketed BY THE JOIN
  * KEY into the same bucket count makes each scan report a compatible
  * `HashPartitioning`, so the join plans with ZERO shuffle exchanges —
  * the price of the shuffle is paid once at write time instead of on
  * every query. At 100 TB this is the difference between re-shuffling
  * two fact tables per join and a pure map-side merge; `sortBy` on the
  * same key additionally lets a sort-merge join skip its per-partition
  * sorts when each bucket holds one file. PlanSpec asserts the
  * no-Exchange plan; `catalog_bucketed_join` oracle-checks the results.
  *
  * Spark keeps bucketing metadata in the session catalog (`saveAsTable`),
  * so this path addresses tables by NAME — it is deliberately separate
  * from [[Catalog]]'s manifest-log tables, the same split Spark itself
  * has between catalog tables and path-based reads. `path` keeps the
  * bytes external (nothing hides inside a warehouse dir).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted external parquet table. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }
}
