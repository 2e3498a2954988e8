package graft

import graft.operators.{CatalogOps, Scd2}
import graft.sources.Catalog
import org.apache.spark.sql.functions._

/** SCD Type-2 version algebra on a synthetic dimension with every case:
  * changed, unchanged (no-op), new entity, and a null-valued attribute.
  */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  test("scd2Updates emits close-out + new version ONLY for real changes") {
    val dim = Seq(
      (10L, 1L, Option("a"), 0, Scd2.OpenBatch, true),
      (20L, 2L, Option("b"), 0, Scd2.OpenBatch, true),
      (30L, 3L, Option.empty[String], 0, Scd2.OpenBatch, true),
    ).toDF("sk", "k", "attr", "from_batch", "to_batch", "is_current")
    val batch = Seq(
      (1L, Option("a")),  // unchanged → no-op
      (2L, Option("B")),  // changed → close + reopen
      (3L, Option("c")),  // null → value IS a change (null-safe compare)
      (4L, Option("d")),  // new entity → insert only
    ).toDF("k", "attr")
    val delta = Scd2.scd2Updates(dim, batch, "k", Seq("attr"), batchNo = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3), r.getInt(4), r.getBoolean(5)))
      .toSet
    assert(delta === Set(
      (20L, 2L, "b", 0, 1, false),               // close-out keeps OLD attrs
      (21L, 2L, "B", 1, Scd2.OpenBatch, true),
      (30L, 3L, null, 0, 1, false),
      (31L, 3L, "c", 1, Scd2.OpenBatch, true),
      (41L, 4L, "d", 1, Scd2.OpenBatch, true),   // no close-out for new keys
    ))
  }

  test("applied through Catalog.merge, history accumulates and no-ops don't churn") {
    val cat = new Catalog(spark, CatalogOps.tempWarehouse())
    val dim0 = Seq(
      (10L, 1L, "a", 0, Scd2.OpenBatch, true),
      (20L, 2L, "b", 0, Scd2.OpenBatch, true),
    ).toDF("sk", "k", "attr", "from_batch", "to_batch", "is_current")
    cat.create("scd2_t", dim0.schema)
    cat.insert("scd2_t", dim0)
    val batch = Seq((1L, "a"), (2L, "b2"), (5L, "e")).toDF("k", "attr")
    val delta = Scd2.scd2Updates(cat.table("scd2_t"), batch, "k", Seq("attr"), 1)
    val (matched, inserted) = cat.merge("scd2_t", delta, "sk")
    assert(matched === 1L)   // only k=2's current version was closed
    assert(inserted === 2L)  // k=2 new version + k=5 new entity
    val after = cat.table("scd2_t").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getInt(4), r.getBoolean(5))).toSet
    assert(after === Set(
      (10L, "a", Scd2.OpenBatch, true),  // untouched no-op row
      (20L, "b", 1, false),              // closed old version
      (21L, "b2", Scd2.OpenBatch, true),
      (51L, "e", Scd2.OpenBatch, true),
    ))
    // exactly one current version per key, always
    val dupCurrent = cat.table("scd2_t").filter(col("is_current"))
      .groupBy("k").count().filter(col("count") > 1).count()
    assert(dupCurrent === 0L)
  }

  test("point-in-time join resolves each fact to exactly one version") {
    // For every (fact batch, key) there must be EXACTLY one valid
    // version — the PIT window is a partition of batch time per key.
    val rows = SparkEntry.queries("catalog_scd2_asof")(spark, sf0001).collect()
    val byKey = rows.map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    // batch 0 predates every move: no fact may see a moved segment
    assert(!byKey.contains((0, "moved")))
    assert(byKey((0, "orig")) > 0L)
    assert(byKey.getOrElse((1, "moved"), 0L) > 0L)
    // total fact rows joined == total orders (no loss, no duplication)
    assert(rows.map(_.getLong(2)).sum ===
      Tables.orders(spark, sf0001).count())
  }
}
