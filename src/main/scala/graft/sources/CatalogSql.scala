package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SQL text surface for the warehouse [[Catalog]]: CREATE / CTAS / INSERT /
  * DELETE / MERGE / ALTER / DROP / SELECT routed to the catalog's
  * versioned-COW table operations. The reference exposed its catalog
  * through a programmatic DSL only; this closes the "DDL as text" gap so
  * a SQL-speaking client can drive the warehouse end-to-end.
  *
  * Division of labor, deliberately: the OUTER statement shape (which
  * command, which table, which key) is recognized here, while everything
  * relational inside — the CTAS/INSERT/MERGE source query, the DELETE
  * predicate, column types (`StructType.fromDDL`), literal defaults — is
  * handed to Spark's own SQL parser/analyzer with every catalog table
  * registered as a temp view. So the query dialect, optimization, and
  * type checking are Catalyst's, identical to the DataFrame surface, and
  * this layer stays a thin command router (no second expression parser to
  * drift out of sync).
  *
  * MERGE accepts the ANSI upsert-all form (`WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *`) with an equi-key ON clause — exactly
  * the semantics [[Catalog.merge]] implements file-granularly.
  */
object CatalogSql {

  private val CreateAs =
    """(?is)^CREATE\s+TABLE\s+(\w+)\s+AS\s+(SELECT\b.*)$""".r
  private val Create =
    """(?is)^CREATE\s+TABLE\s+(\w+)\s*\((.*?)\)(?:\s+PARTITIONED\s+BY\s*\(\s*(\w+)\s*\))?\s*$""".r
  private val Insert =
    """(?is)^INSERT\s+INTO\s+(\w+)\s+((?:SELECT|VALUES|WITH|TABLE)\b.*)$""".r
  private val Delete =
    """(?is)^DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.*)$""".r
  private val Merge =
    ("""(?is)^MERGE\s+INTO\s+(\w+)(?:\s+AS)?(?:\s+(\w+))?\s+USING\s+\((.*)\)(?:\s+AS)?\s+(\w+)""" +
      """\s+ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)""" +
      """\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
      """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$""").r
  private val AddCol =
    """(?is)^ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)(?:\s+DEFAULT\s+(.+?))?\s*$""".r
  private val RenameCol =
    """(?is)^ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*$""".r
  private val AlterType =
    """(?is)^ALTER\s+TABLE\s+(\w+)\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(.+?)\s*$""".r
  private val Drop =
    """(?is)^DROP\s+TABLE\s+(\w+)\s*$""".r
  private val Query =
    """(?is)^(?:SELECT|WITH|TABLE|VALUES)\b.*$""".r

  /** True when the statement is one of the catalog COMMANDS this router
    * owns (CREATE/INSERT/DELETE/MERGE/ALTER/DROP) — callers with their own
    * SQL path (e.g. the REPL) route commands here and leave everything
    * else to plain Spark SQL.
    */
  def isCommand(statement: String): Boolean = {
    val stmt = statement.trim.stripSuffix(";").trim
    stmt match {
      case CreateAs(_, _) | Create(_, _, _) | Insert(_, _) | Delete(_, _) |
          Merge(_, _, _, _, _, _, _, _) | AddCol(_, _, _, _) |
          RenameCol(_, _, _) | AlterType(_, _, _) | Drop(_) => true
      case _ => false
    }
  }

  /** Run the relational part of a statement through Spark SQL with every
    * catalog table visible as a temp view (reads go through
    * [[Catalog.table]], so time-travel/COW resolution applies as usual).
    */
  private def subQuery(spark: SparkSession, cat: Catalog, sql: String): DataFrame = {
    cat.tables().foreach(n => cat.table(n).createOrReplaceTempView(n))
    spark.sql(sql)
  }

  private def status(spark: SparkSession, op: String, tbl: String, n: Long): DataFrame = {
    import spark.implicits._
    Seq((op, tbl, n)).toDF("op", "table", "rows")
  }

  /** Execute one statement; returns the result rows for a query, or a
    * one-row `(op, table, rows)` status for a command.
    */
  def exec(spark: SparkSession, cat: Catalog, statement: String): DataFrame = {
    val stmt = statement.trim.stripSuffix(";").trim
    stmt match {
      case CreateAs(t, sel) =>
        val df = subQuery(spark, cat, sel)
        cat.create(t, df.schema)
        cat.insert(t, df)
        status(spark, "create_as", t, cat.table(t).count())
      case Create(t, cols, part) =>
        cat.create(t, StructType.fromDDL(cols), Option(part))
        status(spark, "create", t, 0L)
      case Insert(t, src) =>
        val df = subQuery(spark, cat, src)
        // ANSI INSERT binds columns POSITIONALLY (a bare VALUES row has no
        // names); rename to the schema when arities match. A narrower
        // select keeps its names so Catalog.insert can fill declared
        // defaults for the omitted columns.
        val sch = cat.schema(t)
        val aligned =
          if (df.columns.length == sch.fields.length) df.toDF(sch.fieldNames.toSeq: _*)
          else df
        cat.insert(t, aligned)
        status(spark, "insert", t, aligned.count())
      case Delete(t, cond) =>
        status(spark, "delete", t, cat.deleteRows(t, expr(cond)))
      case Merge(t, tAlias, sel, sAlias, lq, lk, rq, rk) =>
        val (tk, sk) = (Option(tAlias).getOrElse(t), sAlias) match {
          case (ta, sa) if lq.equalsIgnoreCase(ta) && rq.equalsIgnoreCase(sa) => (lk, rk)
          case (ta, sa) if lq.equalsIgnoreCase(sa) && rq.equalsIgnoreCase(ta) => (rk, lk)
          case _ => throw new IllegalArgumentException(
            s"MERGE ON must equate the target and source keys, got $lq.$lk = $rq.$rk")
        }
        require(tk == sk,
          s"MERGE routes to a single-key upsert; key must share a name on both sides ($tk vs $sk)")
        val (matched, appended) = cat.merge(t, subQuery(spark, cat, sel), tk)
        status(spark, "merge", t, matched + appended)
      case AddCol(t, c, tpe, dflt) =>
        val dt = StructType.fromDDL(s"x $tpe").head.dataType
        cat.addColumn(t, c, dt, Option(dflt).getOrElse("NULL"))
        status(spark, "add_column", t, 0L)
      case RenameCol(t, from, to) =>
        cat.renameColumn(t, from, to)
        status(spark, "rename_column", t, 0L)
      case AlterType(t, c, tpe) =>
        cat.widenColumn(t, c, StructType.fromDDL(s"x $tpe").head.dataType)
        status(spark, "alter_column", t, 0L)
      case Drop(t) =>
        cat.drop(t)
        status(spark, "drop", t, 0L)
      case Query() =>
        subQuery(spark, cat, stmt)
      case other =>
        throw new IllegalArgumentException(
          "unsupported statement (expected CREATE TABLE [AS] / INSERT INTO / DELETE FROM " +
            s"/ MERGE INTO / ALTER TABLE / DROP TABLE / SELECT): ${other.take(80)}")
    }
  }
}
