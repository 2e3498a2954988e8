package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SQL text surface for the warehouse [[Catalog]]: CREATE / CTAS / CREATE
  * VIEW / INSERT / UPDATE / DELETE / MERGE / ALTER / TRUNCATE / DROP /
  * VACUUM / OPTIMIZE / DESCRIBE [HISTORY] / SHOW TABLES / SHOW CREATE
  * TABLE / ANALYZE / SHOW STATS / EXPLAIN / SELECT routed to the
  * catalog's versioned-COW table operations. The reference exposed its catalog through a programmatic
  * DSL only; this closes the "DDL as text" gap so a SQL-speaking client
  * can drive the warehouse end-to-end.
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
  * MERGE takes an equi-key ON clause with either the ANSI upsert-all form
  * (`WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` →
  * [[Catalog.merge]]) or the general conditional multi-action form —
  * `WHEN MATCHED [AND <cond>] THEN UPDATE SET * | DELETE` (repeatable) plus
  * `WHEN NOT MATCHED [AND <cond>] THEN INSERT *` →
  * [[Catalog.mergeConditional]], both file-granular copy-on-write.
  */
object CatalogSql {

  private val CreateAs =
    """(?is)^CREATE\s+TABLE\s+(\w+)\s+AS\s+(SELECT\b.*)$""".r
  private val Create =
    """(?is)^CREATE\s+TABLE\s+(\w+)\s*\((.*?)\)(?:\s+PARTITIONED\s+BY\s*\(\s*(\w+)\s*\))?\s*$""".r
  private val Insert =
    """(?is)^INSERT\s+INTO\s+(\w+)\s+((?:SELECT|VALUES|WITH|TABLE)\b.*)$""".r
  private val ReplaceWherePrefix =
    """(?is)^INSERT\s+INTO\s+(\w+)\s+REPLACE\s+WHERE\s+(.+)$""".r

  private val SourceKeywords = Seq("SELECT", "VALUES", "WITH", "TABLE")

  /** Index of the first source-query keyword (SELECT/VALUES/WITH/TABLE)
    * at TOP level — outside single-quoted literals and parentheses, on
    * word boundaries — or -1. A bare lazy-regex split would truncate a
    * condition carrying a keyword inside a string literal
    * (`note = 'handle WITH care' SELECT …`).
    */
  private def topLevelSourceStart(s: String): Int = {
    var depth = 0
    var inStr = false
    var inTick = false // backtick-quoted identifier
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inStr) {
        // Spark's default literal syntax: backslash escapes the next char
        // ('a\'b' stays one literal); doubled '' is the other escape and
        // falls out naturally (close + immediately reopen).
        if (ch == '\\') i += 1
        else if (ch == '\'') inStr = false
      }
      else if (inTick) { if (ch == '`') inTick = false }
      else if (ch == '\'') inStr = true
      else if (ch == '`') inTick = true
      else if (ch == '(') depth += 1
      else if (ch == ')') depth -= 1
      else if (depth == 0 && ch.isLetter) {
        val leftOk = i == 0 || {
          val p = s.charAt(i - 1); !p.isLetterOrDigit && p != '_'
        }
        if (leftOk && SourceKeywords.exists { k =>
          i + k.length <= s.length &&
            s.regionMatches(true, i, k, 0, k.length) &&
            (i + k.length == s.length || {
              val n = s.charAt(i + k.length); !n.isLetterOrDigit && n != '_'
            })
        }) return i
      }
      i += 1
    }
    -1
  }

  /** `INSERT INTO t REPLACE WHERE <cond> <SELECT|VALUES|WITH|TABLE …>` —
    * the cond/source boundary comes from [[topLevelSourceStart]]'s
    * quote- and paren-aware scan, so string literals and subqueries
    * inside the condition can carry source keywords safely.
    */
  private object ReplaceWhere {
    def unapply(stmt: String): Option[(String, String, String)] = stmt match {
      case ReplaceWherePrefix(t, rest) =>
        val i = topLevelSourceStart(rest)
        if (i <= 0) None
        else Some((t, rest.substring(0, i).trim, rest.substring(i).trim))
      case _ => None
    }
  }
  private val Delete =
    """(?is)^DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.*)$""".r
  private val Merge =
    ("""(?is)^MERGE\s+(WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+(\w+)(?:\s+AS)?(?:\s+(\w+))?\s+USING\s+\((.*)\)(?:\s+AS)?\s+(\w+)""" +
      """\s+ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)""" +
      """\s+(WHEN\s+.+)$""").r
  // one WHEN clause each; lazy (.+?) for the AND condition backs off until
  // a THEN followed by a recognized ACTION, so a CASE ... THEN inside the
  // condition does not cut it short
  private val MatchedClause =
    """(?is)^WHEN\s+MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+(UPDATE\s+SET\s+\*|DELETE)\s*$""".r
  private val NotMatchedClause =
    """(?is)^WHEN\s+NOT\s+MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+INSERT\s+\*\s*$""".r

  /** Parse the `WHEN ...` tail of a MERGE into matched clauses (in
    * statement order) and not-matched insert conditions. Clause boundaries
    * are the `WHEN [NOT] MATCHED` keywords themselves (a lookahead split),
    * so conditions containing CASE WHEN survive.
    */
  private def parseMergeClauses(
      tail: String): (Seq[Catalog.MatchedClause], Seq[Option[String]]) = {
    val parts = tail.split("(?i)(?=\\bWHEN\\s+(?:NOT\\s+)?MATCHED\\b)")
      .toSeq.map(_.trim).filter(_.nonEmpty)
    val parsed = parts.map {
      case NotMatchedClause(cond) => Right(Option(cond).map(_.trim))
      case MatchedClause(cond, action) =>
        Left(Catalog.MatchedClause(Option(cond).map(_.trim),
          delete = action.equalsIgnoreCase("DELETE")))
      case other => throw new IllegalArgumentException(
        "unsupported MERGE clause (expected WHEN MATCHED [AND <cond>] THEN " +
          s"UPDATE SET * | DELETE, or WHEN NOT MATCHED [AND <cond>] THEN INSERT *): $other")
    }
    (parsed.collect { case Left(m) => m }, parsed.collect { case Right(i) => i })
  }
  private val AddCol =
    """(?is)^ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)(?:\s+DEFAULT\s+(.+?))?\s*$""".r
  private val AddCheck =
    """(?is)^ALTER\s+TABLE\s+(\w+)\s+ADD\s+CHECK\s*\((.*)\)\s*$""".r
  private val RenameCol =
    """(?is)^ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*$""".r
  private val AlterType =
    """(?is)^ALTER\s+TABLE\s+(\w+)\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(.+?)\s*$""".r
  private val Update =
    """(?is)^UPDATE\s+(\w+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?$""".r
  private val Truncate =
    """(?is)^TRUNCATE\s+TABLE\s+(\w+)\s*$""".r
  private val CloneStmt =
    """(?is)^CREATE\s+TABLE\s+(\w+)\s+(?:SHALLOW\s+)?CLONE\s+(\w+)\s*$""".r
  private val Erase =
    """(?is)^ERASE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*$""".r
  private val Vacuum =
    """(?is)^VACUUM\s+(\w+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*$""".r
  private val VacuumHours =
    """(?is)^VACUUM\s+(\w+)\s+RETAIN\s+(\d+)\s+HOURS\s*$""".r
  private val ShowPartitions =
    """(?is)^SHOW\s+PARTITIONS\s+(\w+)\s*$""".r
  private val Optimize =
    """(?is)^OPTIMIZE\s+(\w+)(?:\s+FILES\s+(\d+))?\s*$""".r
  private val OptimizeWhere =
    """(?is)^OPTIMIZE\s+(\w+)(?:\s+FILES\s+(\d+))?\s+WHERE\s+(.+?)\s*$""".r
  private val OptimizeZOrder =
    """(?is)^OPTIMIZE\s+(\w+)(?:\s+FILES\s+(\d+))?\s+ZORDER\s+BY\s*\(\s*([\w\s,]+?)\s*\)\s*$""".r
  private val History =
    """(?is)^DESCRIBE\s+HISTORY\s+(\w+)\s*$""".r
  private val Drop =
    """(?is)^DROP\s+TABLE\s+(\w+)\s*$""".r
  private val ShowTables =
    """(?is)^SHOW\s+TABLES\s*$""".r
  private val ShowCreate =
    """(?is)^SHOW\s+CREATE\s+TABLE\s+(\w+)\s*$""".r
  // `DESCRIBE HISTORY t` cannot match (two tokens before the terminal \w+)
  private val Describe =
    """(?is)^DESCRIBE\s+(?:TABLE\s+)?(\w+)\s*$""".r
  private val Analyze =
    """(?is)^ANALYZE\s+TABLE\s+(\w+)\s*$""".r
  private val ShowStats =
    """(?is)^SHOW\s+STATS\s+(?:FOR\s+)?(\w+)\s*$""".r
  private val CreateView =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+((?:SELECT|WITH|TABLE|VALUES)\b.*)$""".r
  private val CreateMView =
    """(?is)^CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AS\s+((?:SELECT|WITH|TABLE|VALUES)\b.*)$""".r
  private val RefreshMView =
    """(?is)^REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s*$""".r
  private val DropMView =
    """(?is)^DROP\s+MATERIALIZED\s+VIEW\s+(\w+)\s*$""".r
  private val DropView =
    """(?is)^DROP\s+VIEW\s+(\w+)\s*$""".r
  private val Explain =
    """(?is)^EXPLAIN\s+(?:(FORMATTED|EXTENDED|COST|CODEGEN)\s+)?((?:SELECT|WITH|TABLE|VALUES)\b.*)$""".r
  private val CreateFunction =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?FUNCTION\s+(\w+)\s*(\(.*)$""".r
  private val DropFunction =
    """(?is)^DROP\s+FUNCTION\s+(\w+)\s*$""".r
  private val ShowFunctions =
    """(?is)^SHOW\s+FUNCTIONS\s*$""".r
  private val CopyInto =
    """(?is)^COPY\s+INTO\s+(\w+)\s+FROM\s+'([^']+)'(?:\s+FORMAT\s+(\w+))?(?:\s+WITH\s+QUARANTINE\s+(\w+))?\s*$""".r
  private val CopyTo =
    """(?is)^COPY\s+(\w+)\s+TO\s+'([^']+)'(?:\s+FORMAT\s+(\w+))?\s*$""".r

  /** Split on `sep` at paren/quote depth 0 — SET lists whose expressions
    * contain function calls or string literals must not split inside them.
    * `angles = true` additionally tracks `<`/`>` nesting, required for
    * column-DDL lists where complex types carry commas inside the brackets
    * (`MAP<STRING, INT>`, `STRUCT<a: INT, b: INT>`). Angle chars are
    * counted ONLY at paren depth 0 — inside parens they are comparison
    * operators (`CHECK (v >= 0)`), and type brackets never occur inside
    * parens in a column list — and a `<` only OPENS a bracket when it
    * directly follows one of the bracketed type keywords (`ARRAY` / `MAP`
    * / `STRUCT`), so a bare comparison in an unparenthesized DEFAULT
    * (`f BOOLEAN DEFAULT 1 < 2, g INT`) cannot wedge the counter open and
    * swallow every later separator. A stray `>` at angle depth 0 is
    * likewise ignored rather than driving the counter negative. It must
    * stay OFF for expression lists (SET assignments), where `<`/`>` are
    * top-level comparison operators.
    */
  private val AngleTypeKeywords = Set("ARRAY", "MAP", "STRUCT")

  /** True iff the identifier word ending just before index `i` (skipping
    * whitespace between it and the `<`) is a bracketed-type keyword.
    */
  private def angleOpensType(s: String, i: Int): Boolean = {
    var j = i - 1
    while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
    val end = j + 1
    while (j >= 0 && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j -= 1
    end > j + 1 && AngleTypeKeywords.contains(
      s.substring(j + 1, end).toUpperCase(java.util.Locale.ROOT))
  }

  private def splitTop(s: String, sep: Char, angles: Boolean = false): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var angleDepth = 0
    var inStr = false
    var last = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inStr) { if (ch == '\'') inStr = false }
      else if (ch == '\'') inStr = true
      else if (ch == '(') depth += 1
      else if (ch == ')') depth -= 1
      else if (angles && depth == 0 && ch == '<' &&
        (angleDepth > 0 || angleOpensType(s, i))) angleDepth += 1
      else if (angles && depth == 0 && ch == '>' && angleDepth > 0) angleDepth -= 1
      else if (ch == sep && depth == 0 && angleDepth == 0) {
        out += s.substring(last, i); last = i + 1
      }
      i += 1
    }
    out += s.substring(last)
    out.toSeq
  }

  private val ColDefault = """(?is)^(.+?)\s+DEFAULT\s+(.+)$""".r
  private val TableCheck = """(?is)^CHECK\s*\((.*)\)$""".r

  /** Parse a CREATE column list, honoring per-column `DEFAULT <literal>`
    * clauses (`StructType.fromDDL` has no DEFAULT syntax; NOT NULL it
    * does parse) and trailing table-level `CHECK (<expr>)` constraints —
    * required for SHOW CREATE TABLE output to round-trip back through
    * CREATE TABLE. Returns the schema plus the CHECK expressions.
    */
  private val TrailingNotNull = """(?is)^(.*?)\s+NOT\s+NULL\s*$""".r

  private def schemaWithDefaults(cols: String): (StructType, Seq[String]) = {
    // angles = true: complex column types (MAP<STRING, INT>, STRUCT<...>)
    // carry top-level-looking commas inside <>.
    val parts = splitTop(cols, ',', angles = true).map(_.trim).filter(_.nonEmpty)
    val checks = parts.collect { case TableCheck(c) => c.trim }
    val fields = parts.filter(p => TableCheck.findFirstIn(p).isEmpty).map {
      case ColDefault(colDef, dflt0) =>
        // Standard ordering puts NOT NULL after DEFAULT (`x INT DEFAULT 5
        // NOT NULL`); the lazy DEFAULT capture would otherwise swallow it
        // into the default expression and fail only at write time. But a
        // default expression genuinely ENDING in `IS NOT NULL` must keep
        // its tail — stripping it would truncate `DEFAULT x IS NOT NULL`
        // to `x IS` and wrongly mark the column non-nullable; the guard is
        // that the stripped remainder may not end in the word IS.
        val (dflt, nullable) = dflt0.trim match {
          case TrailingNotNull(d)
              if !d.trim.toUpperCase(java.util.Locale.ROOT)
                .matches("(?s).*\\bIS") => (d.trim, false)
          case d => (d, true)
        }
        val f = StructType.fromDDL(colDef).head
        org.apache.spark.sql.types.StructField(
          f.name, f.dataType, f.nullable && nullable,
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(Catalog.DefaultKey, dflt).build())
      case colDef => StructType.fromDDL(colDef).head
    }
    (StructType(fields), checks)
  }

  private val Assign = """(?s)^\s*(\w+)\s*=\s*(.+)$""".r
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
      case CloneStmt(_, _) | Erase(_, _) | ReplaceWhere(_, _, _) |
          CreateAs(_, _) | Create(_, _, _) | Insert(_, _) | Delete(_, _) |
          Merge(_, _, _, _, _, _, _, _, _, _) | AddCol(_, _, _, _) |
          AddCheck(_, _) |
          RenameCol(_, _, _) | AlterType(_, _, _) | Drop(_) |
          Update(_, _, _) | Truncate(_) | Vacuum(_, _) | VacuumHours(_, _) |
          ShowPartitions(_) | Optimize(_, _) |
          OptimizeWhere(_, _, _) | OptimizeZOrder(_, _, _) |
          History(_) | ShowTables() | ShowCreate(_) | Describe(_) |
          Analyze(_) | ShowStats(_) | CreateView(_, _, _) | DropView(_) |
          CreateMView(_, _) | RefreshMView(_) | DropMView(_) |
          CopyInto(_, _, _, _) | CopyTo(_, _, _) |
          CreateFunction(_, _, _) | DropFunction(_) | ShowFunctions() |
          Explain(_, _) => true
      case _ => false
    }
  }

  /** Register every catalog table AND view as a temp view (reads go
    * through [[Catalog.table]], so time-travel/COW resolution applies as
    * usual). Views are SQL text resolved HERE, against the current
    * catalog state; a view may reference other views, so registration
    * iterates to a fixpoint. A view whose reference no longer resolves
    * (e.g. its base table was dropped) is left unregistered — it errors
    * only when actually referenced, like an invalidated view in any SQL
    * engine, instead of poisoning every other statement.
    */
  private[graft] def registerAll(spark: SparkSession, cat: Catalog): Unit = {
    // functions first: views (and any statement) may call them. Native SQL
    // UDF registration analyzes AND inlines the body at call sites, so
    // persisted functions stay inside whole-stage codegen.
    cat.functions().foreach { f =>
      try spark.sql(s"CREATE OR REPLACE TEMPORARY FUNCTION $f ${cat.functionSql(f)}")
      catch { case _: Exception => () } // invalid defs error when referenced
    }
    cat.tables().foreach(n => cat.table(n).createOrReplaceTempView(n))
    // drop every catalog view's temp view FIRST: a temp view snapshots its
    // analyzed plan, so a view-on-view registered this round must not bind
    // to a stale registration from an earlier statement (it would keep
    // reading the base table's pre-DML state — or deleted files). The
    // fixpoint below then re-resolves dependencies bottom-up against
    // exclusively CURRENT state.
    var pending = cat.views().toList
    pending.foreach(v => spark.catalog.dropTempView(v))
    var progress = true
    while (pending.nonEmpty && progress) {
      val next = pending.filter { v =>
        try {
          spark.sql(cat.viewSql(v)).createOrReplaceTempView(v); false
        } catch { case _: org.apache.spark.sql.AnalysisException => true }
      }
      progress = next.size < pending.size
      pending = next
    }
    // anything still pending is an invalidated view (e.g. base table
    // dropped): left unregistered, it errors only when referenced
  }

  private val VersionAsOf = """(?i)\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)\b""".r
  private val TimestampAsOf = """(?is)\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'""".r

  /** Parse a time-travel timestamp literal: ISO-8601 instant
    * (`2026-08-15T00:00:00Z`) or the SQL `yyyy-MM-dd HH:mm:ss[.fff]`
    * form, interpreted as UTC (the engine's session timezone).
    */
  private def parseTravelTs(s: String): java.time.Instant = {
    val t = s.trim
    try java.time.Instant.parse(t)
    catch {
      case _: java.time.format.DateTimeParseException =>
        try java.time.LocalDateTime.parse(t.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC)
        catch {
          case _: java.time.format.DateTimeParseException =>
            // bare DATE literal (Delta accepts it): midnight UTC
            try java.time.LocalDate.parse(t).atStartOfDay
              .toInstant(java.time.ZoneOffset.UTC)
            catch {
              case _: java.time.format.DateTimeParseException =>
                throw new IllegalArgumentException(
                  s"cannot parse TIMESTAMP AS OF '$t' — accepted forms: " +
                    "ISO-8601 instant (2026-08-15T00:00:00Z), " +
                    "'yyyy-MM-dd HH:mm:ss[.fff]' (UTC), or 'yyyy-MM-dd' " +
                    "(midnight UTC)")
            }
        }
    }
  }

  /** Rewrite `<table> TIMESTAMP AS OF '<ts>'` to a view over the latest
    * commit ≤ ts ([[Catalog.tableAsOf]]). The literal itself is quoted,
    * so the VERSION-path split-on-quote trick can't apply; instead a
    * match is honored only when it starts OUTSIDE a string literal (even
    * count of quotes before it).
    */
  private def rewriteTsTravel(cat: Catalog, sql: String): String =
    TimestampAsOf.replaceAllIn(sql, m => {
      val inLiteral = sql.substring(0, m.start).count(_ == '\'') % 2 == 1
      scala.util.matching.Regex.quoteReplacement(
        if (inLiteral || !cat.exists(m.group(1))) m.matched
        else {
          val t = m.group(1)
          val v = cat.versionAt(t, parseTravelTs(m.group(2)))
          val alias = s"${t}__v$v"
          cat.tableAt(t, v).createOrReplaceTempView(alias)
          alias
        })
    })

  /** Rewrite `<table> VERSION AS OF <v>` references to temp views over
    * the requested manifest snapshot ([[Catalog.tableAt]]) — SQL-text time
    * travel, the query-side companion of DESCRIBE HISTORY / RESTORE. Only
    * names that ARE catalog tables rewrite; string literals are skipped
    * (segments between single quotes are left untouched).
    */
  private def rewriteTimeTravel(cat: Catalog, sql: String): String =
    sql.split("'", -1).zipWithIndex.map { case (seg, i) =>
      if (i % 2 == 1) seg // inside a string literal
      else VersionAsOf.replaceAllIn(seg, m => {
        val (t, v) = (m.group(1), m.group(2).toInt)
        scala.util.matching.Regex.quoteReplacement(
          if (!cat.exists(t)) m.matched
          else {
            val alias = s"${t}__v$v"
            cat.tableAt(t, v).createOrReplaceTempView(alias)
            alias
          })
      })
    }.mkString("'")

  /** Run the relational part of a statement through Spark SQL with the
    * whole catalog (tables + views) visible and `VERSION AS OF` resolved.
    */
  private def subQuery(spark: SparkSession, cat: Catalog, sql: String): DataFrame = {
    registerAll(spark, cat)
    spark.sql(rewriteTsTravel(cat, rewriteTimeTravel(cat, sql)))
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
      // before CreateAs/Create: `CREATE TABLE x CLONE y` must not fall
      // through to the column-list parser
      case CloneStmt(dst, src) =>
        status(spark, "clone", dst, cat.cloneTable(src, dst).toLong)
      case Erase(t, cond) =>
        status(spark, "erase", t, cat.eraseWhere(t, expr(cond)))
      case CreateAs(t, sel) =>
        val df = subQuery(spark, cat, sel)
        cat.create(t, df.schema)
        status(spark, "create_as", t, cat.insert(t, df))
      case Create(t, cols, part) =>
        val (sch, chks) = schemaWithDefaults(cols)
        cat.create(t, sch, Option(part))
        chks.foreach(cat.addCheck(t, _))
        status(spark, "create", t, 0L)
      case ReplaceWhere(t, cond, src) =>
        val df = subQuery(spark, cat, src)
        val sch = cat.schema(t)
        val aligned =
          if (df.columns.length == sch.fields.length) df.toDF(sch.fieldNames.toSeq: _*)
          else df
        status(spark, "replace_where", t, cat.replaceWhere(t, expr(cond), aligned))
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
        // row count comes back from the insert itself (parquet-footer
        // metadata of the files it wrote) — recounting `aligned` here
        // would re-execute the source query, which both doubles the work
        // and can report a DIFFERENT number for nondeterministic sources
        status(spark, "insert", t, cat.insert(t, aligned))
      case Delete(t, cond) =>
        status(spark, "delete", t, cat.deleteRows(t, expr(cond)))
      case Update(t, setList, cond) =>
        val assigns = splitTop(setList, ',').map {
          case Assign(c, e) => (c.trim, expr(e.trim))
          case other => throw new IllegalArgumentException(
            s"bad SET assignment (expected col = <expr>): ${other.trim}")
        }
        // no WHERE → every row matches (SQL semantics)
        val c = Option(cond).map(expr).getOrElse(lit(true))
        status(spark, "update", t, cat.updateRows(t, c, assigns))
      case Truncate(t) =>
        cat.truncate(t)
        status(spark, "truncate", t, 0L)
      case VacuumHours(t, hours) =>
        cat.vacuumRetainHours(t, hours.toLong)
        status(spark, "vacuum_hours", t, cat.versions(t).size.toLong)
      case Vacuum(t, retain) =>
        cat.vacuum(t, Option(retain).map(_.toInt).getOrElse(1))
        status(spark, "vacuum", t, cat.versions(t).size.toLong)
      case ShowPartitions(t) =>
        import spark.implicits._
        cat.partitions(t).sorted.toDF("partition")
      case OptimizeZOrder(t, files, zcols) =>
        cat.compactZOrder(t, zcols.split(",").toSeq.map(_.trim).filter(_.nonEmpty),
          Option(files).map(_.toInt).getOrElse(8))
        status(spark, "optimize_zorder", t, 0L)
      case OptimizeWhere(t, files, cond) =>
        cat.compactWhere(t, expr(cond), Option(files).map(_.toInt).getOrElse(1))
        status(spark, "optimize_where", t, 0L)
      case Optimize(t, files) =>
        cat.compact(t, Option(files).map(_.toInt).getOrElse(1))
        status(spark, "optimize", t, 0L)
      case History(t) =>
        import spark.implicits._
        cat.history(t)
          .toDF("version", "operation", "n_files")
      case Merge(evolve, t, tAlias, sel, sAlias, lq, lk, rq, rk, clauseTail) =>
        if (evolve != null) {
          // WITH SCHEMA EVOLUTION: source-only columns become new nullable
          // target columns (metadata-only ALTER, no backfill) before the
          // merge aligns the source — the Delta-style evolving-upsert shape
          val srcSchema = subQuery(spark, cat, sel).schema
          val have = cat.schema(t).fieldNames.map(_.toLowerCase).toSet
          srcSchema.fields.filterNot(f => have(f.name.toLowerCase))
            .foreach(f => cat.addColumn(t, f.name, f.dataType, "NULL"))
        }
        val ta = Option(tAlias).getOrElse(t)
        val (tk, sk) = (ta, sAlias) match {
          case (a, b) if lq.equalsIgnoreCase(a) && rq.equalsIgnoreCase(b) => (lk, rk)
          case (a, b) if lq.equalsIgnoreCase(b) && rq.equalsIgnoreCase(a) => (rk, lk)
          case _ => throw new IllegalArgumentException(
            s"MERGE ON must equate the target and source keys, got $lq.$lk = $rq.$rk")
        }
        // SQL identifiers are case-insensitive everywhere else in this
        // router (the alias match above included) — the key-name check
        // must be too, and the key handed to the catalog is resolved to
        // its canonical declared-schema spelling
        require(tk.equalsIgnoreCase(sk),
          s"MERGE routes to a single-key upsert; key must share a name on both sides ($tk vs $sk)")
        val key = cat.schema(t).fieldNames.find(_.equalsIgnoreCase(tk))
          .getOrElse(throw new IllegalArgumentException(
            s"MERGE key $tk not in schema of $t"))
        val (matchedClauses, insertClauses) = parseMergeClauses(clauseTail)
        val src = subQuery(spark, cat, sel)
        val upsertAll = // the ANSI upsert-all form keeps its dedicated path
          matchedClauses == Seq(Catalog.MatchedClause(None, delete = false)) &&
            insertClauses == Seq(None)
        val n =
          if (upsertAll) { val (m, a) = cat.merge(t, src, key); m + a }
          else {
            val (u, d, i) = cat.mergeConditional(
              t, src, key, matchedClauses, insertClauses, ta, sAlias)
            u + d + i
          }
        status(spark, "merge", t, n)
      case AddCheck(t, c) =>
        cat.addCheck(t, c.trim)
        status(spark, "add_check", t, 0L)
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
        require(!cat.materializedViewExists(t),
          s"$t is a materialized view — use DROP MATERIALIZED VIEW $t")
        cat.drop(t)
        // the temp view subQuery registered for this table would otherwise
        // keep resolving (over deleted files) for the rest of the session
        spark.catalog.dropTempView(t)
        status(spark, "drop", t, 0L)
      case ShowTables() =>
        import spark.implicits._
        val mvs = cat.materializedViews().toSet
        val ts = cat.tables().map(t =>
          (t, if (mvs(t)) "materialized_view" else "table",
            cat.partitionColumn(t).getOrElse(""), cat.currentVersion(t)))
        val vs = cat.views().map(v => (v, "view", "", 0))
        (ts ++ vs).toDF("name", "kind", "partitioned_by", "version")
      case ShowCreate(t) =>
        import spark.implicits._
        val sch = cat.schema(t)
        val cols = sch.fields.map { f =>
          val nn = if (f.nullable) "" else " NOT NULL"
          val dflt =
            if (f.metadata.contains(Catalog.DefaultKey))
              s" DEFAULT ${f.metadata.getString(Catalog.DefaultKey)}"
            else ""
          s"  ${f.name} ${f.dataType.sql}$nn$dflt"
        } ++ cat.checks(t).map(c => s"  CHECK ($c)")
        val part = cat.partitionColumn(t)
          .map(p => s"\nPARTITIONED BY ($p)").getOrElse("")
        Seq(s"CREATE TABLE $t (\n${cols.mkString(",\n")}\n)$part").toDF("ddl")
      case Describe(t) =>
        import spark.implicits._
        cat.schema(t).fields.toSeq.map { f =>
          val dflt = if (f.metadata.contains(Catalog.DefaultKey))
            f.metadata.getString(Catalog.DefaultKey) else null
          (f.name, f.dataType.sql,
            if (cat.partitionColumn(t).contains(f.name)) "partition" else "",
            dflt)
        }.toDF("column", "type", "role", "dflt")
      case Analyze(t) =>
        cat.analyze(t)
      case ShowStats(t) =>
        // `stale` flags stats computed against an older snapshot than the
        // current head — the signal to re-ANALYZE after DML
        cat.statsOf(t).getOrElse(throw new IllegalArgumentException(
          s"no statistics for $t — run ANALYZE TABLE $t first"))
          .withColumn("stale",
            col("analyzed_version") < lit(cat.currentVersion(t)))
      case CreateMView(v, sel) =>
        // definition + backing table in one statement: materialize now,
        // serve the snapshot at table-scan cost until REFRESH re-runs it
        val df = subQuery(spark, cat, sel)
        cat.create(v, df.schema)
        val n = cat.insert(v, df)
        cat.defineMaterializedView(v, sel)
        status(spark, "create_materialized_view", v, n)
      case RefreshMView(v) =>
        // full recompute of the stored definition into a fresh snapshot
        // (truncate + insert = two manifest commits, an honest refresh
        // history; the programmatic rollForward tier is the incremental
        // path for aggregate-shaped views). A failed recompute must not
        // leave the view empty: roll back to the pre-refresh snapshot.
        val sel = cat.materializedViewSql(v)
        val df = subQuery(spark, cat, sel)
        val pre = cat.currentVersion(v)
        cat.truncate(v)
        val n =
          try cat.insert(v, df)
          catch { case e: Throwable => cat.restoreVersion(v, pre); throw e }
        status(spark, "refresh_materialized_view", v, n)
      case DropMView(v) =>
        cat.dropMaterializedViewDef(v)
        cat.drop(v)
        spark.catalog.dropTempView(v)
        status(spark, "drop_materialized_view", v, 0L)
      case CreateView(orReplace, v, sel) =>
        subQuery(spark, cat, sel) // analyze now: reject an invalid definition loudly
        cat.createView(v, sel, orReplace = orReplace != null)
        status(spark, "create_view", v, 0L)
      case DropView(v) =>
        cat.dropView(v)
        spark.catalog.dropTempView(v)
        status(spark, "drop_view", v, 0L)
      case CreateFunction(orReplace, f, defText) =>
        require(orReplace != null || !cat.functionExists(f),
          s"function $f already exists")
        // validate NOW: the native registration parses and analyzes the
        // parameter list, RETURNS clause and body before anything persists
        spark.sql(s"CREATE OR REPLACE TEMPORARY FUNCTION $f ${defText.trim}")
        cat.defineFunction(f, defText.trim, orReplace = true)
        status(spark, "create_function", f, 0L)
      case DropFunction(f) =>
        cat.dropFunction(f)
        spark.sql(s"DROP TEMPORARY FUNCTION IF EXISTS $f")
        status(spark, "drop_function", f, 0L)
      case ShowFunctions() =>
        import spark.implicits._
        cat.functions().map(f => (f, cat.functionSql(f)))
          .toDF("name", "definition")
      case CopyInto(t, path, fmt, quarantine) =>
        val fmtName = Option(fmt).map(_.toLowerCase).getOrElse("parquet")
        require(quarantine == null || fmtName == "csv" || fmtName == "avro",
          s"WITH QUARANTINE is a csv/avro-decoder clause, got format $fmtName")
        val n = fmtName match {
          case "csv" if quarantine != null =>
            cat.insertCsvQuarantine(t, quarantine, path)._1
          case "csv" => cat.insertCsv(t, path)
          case "json" => cat.insertJson(t, path)
          case "orc" => cat.insertOrc(t, path)
          case "avro" if quarantine != null =>
            cat.insertAvroQuarantine(t, quarantine, path)._1
          case "avro" => cat.insertAvro(t, path)
          case "parquet" =>
            cat.insert(t, spark.read.schema(cat.schema(t)).parquet(path))
          case other => throw new IllegalArgumentException(
            s"COPY INTO format must be csv/json/orc/avro/parquet, got $other")
        }
        status(spark, "copy_into", t, n)
      case CopyTo(t, path, fmt) =>
        val df = cat.table(t)
        val n = Option(fmt).map(_.toLowerCase).getOrElse("parquet") match {
          case "csv" =>
            df.write.mode("overwrite")
              .option("header", "true").option("escape", "\"").csv(path)
            // export audit: count what actually landed, read back with the
            // declared schema (not what the source query claimed).
            // multiLine: the writer quotes embedded newlines correctly;
            // without it the reader splits them into spurious records.
            spark.read.options(Map(
              "header" -> "true", "escape" -> "\"", "multiLine" -> "true"))
              .schema(df.schema).csv(path).count()
          case "json" =>
            df.write.mode("overwrite").json(path)
            spark.read.schema(df.schema).json(path).count()
          case "orc" =>
            df.write.mode("overwrite").orc(path)
            spark.read.orc(path).count()
          case "avro" =>
            AvroCodec.writeAvro(df, path)
            AvroCodec.readAvro(spark, path, df.schema).count()
          case "parquet" =>
            df.write.mode("overwrite").parquet(path)
            spark.read.parquet(path).count()
          case other => throw new IllegalArgumentException(
            s"COPY TO format must be csv/json/orc/avro/parquet, got $other")
        }
        status(spark, "copy_to", t, n)
      case Explain(mode, q) =>
        import spark.implicits._
        val m = Option(mode).map(_.toLowerCase).getOrElse("formatted")
        Seq(subQuery(spark, cat, q).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString(m)))
          .toDF("plan")
      case Query() =>
        subQuery(spark, cat, stmt)
      case other =>
        throw new IllegalArgumentException(
          "unsupported statement (expected CREATE TABLE [AS] / CREATE [OR REPLACE] VIEW " +
            "/ INSERT INTO / DELETE FROM / UPDATE / MERGE INTO / ALTER TABLE " +
            "/ TRUNCATE TABLE / DROP TABLE / DROP VIEW / VACUUM / OPTIMIZE " +
            "/ DESCRIBE [HISTORY] / SHOW TABLES / SHOW CREATE TABLE / SHOW STATS " +
            s"/ ANALYZE TABLE / EXPLAIN / SELECT): ${other.take(80)}")
    }
  }
}
