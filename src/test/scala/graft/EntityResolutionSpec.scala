package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

/** Semantics of segment-blocked record linkage. */
class EntityResolutionSpec extends SparkSpec {

  test("er_link_typos: complete recall, origin always a candidate, best is (lev,id)-min") {
    val df = SparkEntry.queries("er_link_typos")(spark, sf0001).cache()
    try {
      // Pigeonhole completeness: every dirty record's origin is within
      // lev<=1, so every dirty record resolves — no row is dropped.
      val dirty = Tables.customer(spark, sf0001)
        .filter(pmod(col("c_custkey"), lit(10)) === 3).count()
      assert(df.count() === dirty)
      assert(df.filter(col("n_matches") < 1).count() === 0L)
      assert(df.filter(col("best_lev") > 1).count() === 0L)
      // The origin id_b participates with lev <= 1, so the encoded
      // (lev, id) minimum can never exceed the origin's encoding.
      assert(df.filter(
        col("best_lev") * lit(10000000000L) + col("best_match") >
          lit(10000000000L) + col("id_b")).count() === 0L)
    } finally df.unpersist()
  }

  test("blocked linkage equals the naive all-pairs resolution (equal-length completeness)") {
    val clean = Tables.customer(spark, sf0001).select("c_custkey", "c_name")
    val blocked = SparkEntry.queries("er_link_typos")(spark, sf0001)
    // naive: cross join + lev filter + the same encoded-min resolution
    val naivePairs = clean.as("a")
      .crossJoin(EntityResolution.dirtyCustomers(spark, sf0001).as("b"))
      .filter(levenshtein(col("a.c_name"), col("b.dirty_name")) <= 1)
      .select(col("b.id_b"), col("b.dirty_name"), col("a.c_custkey").as("id_a"),
        levenshtein(col("a.c_name"), col("b.dirty_name")).cast("long").as("lev"))
    val naive = naivePairs.groupBy("id_b", "dirty_name")
      .agg(min(col("lev") * lit(10000000000L) + col("id_a")).as("enc"),
        count(lit(1)).as("n_matches"))
      .select(col("id_b"), col("dirty_name"),
        pmod(col("enc"), lit(10000000000L)).as("best_match"),
        (col("enc") / lit(10000000000L)).cast("long").as("best_lev"),
        col("n_matches"))
    assert(blocked.count() === naive.count())
    assert(blocked.join(naive,
      Seq("id_b", "dirty_name", "best_match", "best_lev", "n_matches"))
      .count() === blocked.count())
  }
}
