package graft

import graft.operators.CatalogOps
import graft.sources.{Catalog, CatalogSql}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The SQL-text command surface over the warehouse catalog. The happy-path
  * lifecycle (CTAS → ALTER ADD → MERGE → DELETE → INSERT → SELECT) is
  * oracle-checked by the registered `catalog_sql_dml` query; these specs
  * pin the remaining statements and the loud-failure contracts.
  */
class CatalogSqlSpec extends SparkSpec {

  private def freshCat() = new Catalog(spark, CatalogOps.tempWarehouse())

  test("CREATE TABLE (cols) PARTITIONED BY + INSERT VALUES + SELECT round-trip") {
    val cat = freshCat()
    CatalogSql.exec(spark, cat,
      "CREATE TABLE t (id BIGINT, name STRING, region STRING) PARTITIONED BY (region)")
    assert(cat.schema("t") == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("region", StringType))))
    assert(cat.partitionColumn("t").contains("region"))
    CatalogSql.exec(spark, cat,
      """INSERT INTO t VALUES (1, 'a', 'eu'), (2, 'b', 'us'), (3, 'c', 'eu')""")
    val got = CatalogSql.exec(spark, cat,
      "SELECT region, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY region ORDER BY region")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("eu", 2L), ("us", 1L)))
  }

  test("ALTER RENAME / ALTER TYPE (widen) / DROP TABLE route to catalog ops") {
    val cat = freshCat()
    CatalogSql.exec(spark, cat, "CREATE TABLE t (id INT, v INT)")
    CatalogSql.exec(spark, cat, "INSERT INTO t VALUES (1, 10)")
    CatalogSql.exec(spark, cat, "ALTER TABLE t RENAME COLUMN v TO val")
    CatalogSql.exec(spark, cat, "ALTER TABLE t ALTER COLUMN val TYPE BIGINT")
    assert(cat.schema("t")("val").dataType == LongType)
    val v = CatalogSql.exec(spark, cat, "SELECT val FROM t").collect()(0).getLong(0)
    assert(v == 10L)
    CatalogSql.exec(spark, cat, "DROP TABLE t")
    assert(!cat.exists("t"))
  }

  test("command statements return a one-row (op, table, rows) status") {
    val cat = freshCat()
    val st = CatalogSql.exec(spark, cat, "CREATE TABLE t (id INT);").collect()(0)
    assert(st.getString(0) == "create" && st.getString(1) == "t")
    val ins = CatalogSql.exec(spark, cat, "INSERT INTO t VALUES (1), (2)").collect()(0)
    assert(ins.getString(0) == "insert" && ins.getLong(2) == 2L)
    val del = CatalogSql.exec(spark, cat, "DELETE FROM t WHERE id = 1").collect()(0)
    assert(del.getString(0) == "delete" && del.getLong(2) == 1L)
  }

  test("MERGE requires the single-key upsert-all form; bad shapes fail loud") {
    val cat = freshCat()
    CatalogSql.exec(spark, cat, "CREATE TABLE t (id BIGINT, v BIGINT)")
    CatalogSql.exec(spark, cat, "INSERT INTO t VALUES (1, 1), (2, 2)")
    // aliased form resolves sides in either order
    CatalogSql.exec(spark, cat,
      """MERGE INTO t USING (SELECT CAST(2 AS BIGINT) AS id, CAST(20 AS BIGINT) AS v) s
        |ON s.id = t.id
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = CatalogSql.exec(spark, cat, "SELECT id, v FROM t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 1L), (2L, 20L)))
    // ON clause naming neither side's alias is rejected
    val e = intercept[IllegalArgumentException] {
      CatalogSql.exec(spark, cat,
        """MERGE INTO t USING (SELECT CAST(3 AS BIGINT) AS id, CAST(3 AS BIGINT) AS v) s
          |ON x.id = y.id
          |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("MERGE"))
  }

  test("repl with a bound warehouse drives DDL/DML as text") {
    val wh = CatalogOps.tempWarehouse()
    val out = scala.collection.mutable.ArrayBuffer[String]()
    graft.dsl.Dump.repl(
      spark, sf0001,
      Iterator(
        "CREATE TABLE kv (k BIGINT, v STRING);",
        "INSERT INTO kv VALUES (1, 'a'), (2, 'b');",
        "SELECT k, v FROM kv ORDER BY k;",
        "DELETE FROM kv WHERE k = 1;",
        "SELECT COUNT(*) AS n FROM kv;",
        "DROP TABLE kv;",
        "\\q"),
      out += _, warehouse = Some(wh))
    assert(out(1).contains("create") && out(1).contains("kv"))
    assert(out(2).contains("insert"))
    assert(out(3).contains("a") && out(3).contains("b"))
    assert(out(4).contains("delete"))
    assert(out(5).contains("1"))
    assert(out(6).contains("drop"))
    assert(!new Catalog(spark, wh).exists("kv"))
  }

  test("unsupported statements are rejected with the supported-statement list") {
    val cat = freshCat()
    val e = intercept[IllegalArgumentException] {
      CatalogSql.exec(spark, cat, "TRUNCATE TABLE t")
    }
    assert(e.getMessage.contains("unsupported statement"))
  }
}
