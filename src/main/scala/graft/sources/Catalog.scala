package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import scala.jdk.CollectionConverters._

/** Table catalog + append-only ingest (SURVEY.md §2.1 S4/S8/S9, §3.2/§3.3).
  *
  * Reference semantics (hustle public API): `Table.create(name, columns,
  * partition)`, append-only `insert`, partition-granularity `delete`, and
  * catalog listings. Storage here is Hive-style partitioned Parquet under a
  * warehouse directory with the declared schema persisted in
  * `_meta/schema.json` — so partition pruning, column pruning, and filter
  * pushdown all come from Catalyst/Parquet for free, which is the entire
  * point of the Spark-native design (the reference's bitmap indexes map to
  * parquet column stats + dictionary + optional bloom filters, configured
  * at write time, not code).
  */
final class Catalog(spark: SparkSession, val warehouse: String) {

  private def tableDir(name: String) = Paths.get(warehouse, name)
  private def metaDir(name: String) = tableDir(name).resolve("_meta")
  private def dataDir(name: String) = tableDir(name).resolve("data")

  // Files.list/walk return streams backed by an open directory fd; drain
  // them under try/finally so repeated catalog calls don't leak fds.
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }
  private def walkAll(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Declare a table: fixed schema + optional partition column. */
  def create(name: String, schema: StructType, partitionBy: Option[String] = None): Unit = {
    require(!exists(name), s"table $name already exists")
    require(!viewExists(name), s"$name is a view; views and tables share a namespace")
    partitionBy.foreach(p =>
      require(schema.fieldNames.contains(p), s"partition column $p not in schema"))
    Files.createDirectories(metaDir(name))
    Files.writeString(metaDir(name).resolve("schema.json"), schema.json)
    Files.writeString(metaDir(name).resolve("partition.txt"), partitionBy.getOrElse(""))
  }

  /** Declare a table from hustle-style column-spec strings (see
    * [[ColumnSpec]]): `index`-marked columns get parquet bloom filters at
    * write time — the analog of the reference's bitmap indexes.
    * `uint64AsDecimal` opts `uint64` columns into full-range
    * `DecimalType(20,0)` semantics (values in [2^63, 2^64) round-trip).
    */
  def createFromSpecs(name: String, columnSpecs: Seq[String],
      partitionBy: Option[String] = None,
      uint64AsDecimal: Boolean = false): Unit = {
    val specs = ColumnSpec.parseAll(columnSpecs, uint64AsDecimal)
    create(name, ColumnSpec.toSchema(specs), partitionBy)
    Files.writeString(metaDir(name).resolve("indexed.txt"),
      specs.filter(_.indexed).map(_.field.name).mkString("\n"))
  }

  /** Columns marked `index` at create time (empty if created from a plain
    * schema).
    */
  def indexedColumns(name: String): Seq[String] = {
    val f = metaDir(name).resolve("indexed.txt")
    if (!Files.exists(f)) Seq.empty
    else Files.readString(f).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  def exists(name: String): Boolean = Files.exists(metaDir(name).resolve("schema.json"))

  def schema(name: String): StructType =
    DataType.fromJson(Files.readString(metaDir(name).resolve("schema.json")))
      .asInstanceOf[StructType]

  /** Add a column to the declared schema (ALTER TABLE ADD COLUMN ...
    * DEFAULT): metadata-only — existing data files are untouched, and
    * reads COALESCE the nulls parquet supplies for files written before
    * the column existed to `defaultSql`. O(1) regardless of table size,
    * which is the only ALTER discipline that works at 100 TB (a physical
    * backfill of exabyte-scale files is a migration, not a DDL).
    * Subsequent inserts may supply the column or omit it — the default
    * fills it at write time.
    *
    * Because "file predates the column" and "stored NULL" are physically
    * indistinguishable without per-file schema versions, a defaulted
    * added column is effectively NOT NULL on read: an insert that
    * explicitly supplies NULL reads back as the default. This is the
    * documented deviation from SQL's ADD COLUMN DEFAULT (where the
    * default applies only to pre-existing rows); callers that need
    * nullable semantics should add the column without relying on the
    * default or encode absence in-band.
    *
    * Re-adding a name that was previously dropped (or renamed away) does
    * NOT resurrect old file bytes: the new column gets a fresh PHYSICAL
    * name (generation-suffixed, see [[dropColumn]]), so pre-drop values
    * can never leak into it — the same hazard Iceberg/Delta prevent with
    * field IDs / column mapping.
    */
  def addColumn(name: String, colName: String,
      dataType: DataType, defaultSql: String): Unit = {
    val s = schema(name)
    require(!s.fieldNames.contains(colName), s"column $colName already exists")
    // a logical name may be reused; its PHYSICAL storage name must never
    // collide with bytes already in files (current columns or retired ones)
    val used = (s.fields.map(physicalName) ++ retired(name)).toSet
    val phys =
      if (!used.contains(colName)) colName
      else Iterator.from(retired(name).size)
        .map(g => s"${colName}__g$g").dropWhile(used.contains).next()
    val mdb = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(DefaultKey, defaultSql)
    if (phys != colName) mdb.putString(PhysicalKey, phys)
    val ns = StructType(
      s.fields :+ org.apache.spark.sql.types.StructField(
        colName, dataType, nullable = true, mdb.build()))
    Files.writeString(metaDir(name).resolve("schema.json"), ns.json)
  }

  /** Drop a column from the declared schema (ALTER TABLE DROP COLUMN):
    * metadata-only like [[addColumn]] — the bytes stay in existing files
    * but no read path projects them (and parquet's columnar layout means
    * they're never even decoded). The partition column can't be dropped.
    * The dropped PHYSICAL name is retired so a later addColumn of the
    * same logical name maps to fresh storage (no resurrection).
    */
  def dropColumn(name: String, colName: String): Unit = {
    val s = schema(name)
    require(s.fieldNames.contains(colName), s"column $colName does not exist")
    require(!partitionColumn(name).contains(colName),
      s"cannot drop partition column $colName")
    require(s.fields.length > 1, "cannot drop the last column")
    retire(name, physicalName(s.fields.find(_.name == colName).get))
    val ns = StructType(s.fields.filterNot(_.name == colName))
    Files.writeString(metaDir(name).resolve("schema.json"), ns.json)
  }

  /** Rename a column (ALTER TABLE RENAME COLUMN): metadata-only — the
    * field keeps its PHYSICAL storage name (existing files keep working,
    * new inserts keep writing it), only the logical name changes. Same
    * column-mapping discipline as [[addColumn]]/[[dropColumn]]; the
    * partition column can't be renamed (its name IS the on-disk Hive
    * directory layout).
    */
  def renameColumn(name: String, from: String, to: String): Unit = {
    val s = schema(name)
    require(s.fieldNames.contains(from), s"column $from does not exist")
    require(!s.fieldNames.contains(to), s"column $to already exists")
    require(!partitionColumn(name).contains(from),
      s"cannot rename partition column $from")
    val ns = StructType(s.fields.map { f =>
      if (f.name != from) f
      else f.copy(name = to,
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).putString(PhysicalKey, physicalName(f)).build())
    })
    Files.writeString(metaDir(name).resolve("schema.json"), ns.json)
  }

  /** Widen a column's declared type (ALTER TABLE ALTER COLUMN ... TYPE):
    * metadata-only — permitted only for the lossless widenings Spark's
    * parquet reader upcasts in the scan itself (byte→short→int→long,
    * float→double), so files written under the narrow type keep reading
    * without rewrite and new inserts write the wide type. Anything else
    * (narrowing, cross-family) is rejected loudly: it would need a
    * physical rewrite, which at 100 TB is a migration, not a DDL.
    */
  def widenColumn(name: String, colName: String, to: DataType): Unit = {
    import org.apache.spark.sql.types._
    val s = schema(name)
    val f = s.fields.find(_.name == colName)
      .getOrElse(throw new IllegalArgumentException(s"column $colName does not exist"))
    require(!partitionColumn(name).contains(colName),
      s"cannot alter partition column $colName")
    val intChain: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
    val ok = (f.dataType, to) match {
      case (a, b) if intChain.contains(a) && intChain.contains(b) =>
        intChain.indexOf(a) < intChain.indexOf(b)
      case (FloatType, DoubleType) => true
      case _ => false
    }
    require(ok, s"cannot widen ${f.dataType.simpleString} to ${to.simpleString} " +
      "(only byte→short→int→long and float→double are lossless scan-time upcasts)")
    val ns = StructType(s.fields.map(x => if (x.name == colName) x.copy(dataType = to) else x))
    Files.writeString(metaDir(name).resolve("schema.json"), ns.json)
  }

  private val DefaultKey = Catalog.DefaultKey
  private val PhysicalKey = "graft.physical"

  private def defaultOf(f: org.apache.spark.sql.types.StructField): Option[String] =
    if (f.metadata.contains(DefaultKey)) Some(f.metadata.getString(DefaultKey))
    else None

  /** The column name as stored in data files (differs from the logical
    * name after a rename, or when a dropped name was re-added).
    */
  private def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  /** Physical names that may still exist in data files but are no longer
    * part of the schema (dropped columns) — never reused for new columns.
    */
  private def retired(name: String): Seq[String] = {
    val f = metaDir(name).resolve("retired.txt")
    if (!Files.exists(f)) Seq.empty
    else Files.readString(f).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def retire(name: String, phys: String): Unit =
    Files.writeString(metaDir(name).resolve("retired.txt"),
      (retired(name) :+ phys).mkString("\n"))

  def partitionColumn(name: String): Option[String] = {
    val s = Files.readString(metaDir(name).resolve("partition.txt")).trim
    if (s.isEmpty) None else Some(s)
  }

  def tables(): Seq[String] =
    if (!Files.exists(Paths.get(warehouse))) Seq.empty
    else listDir(Paths.get(warehouse))
      .filter(p => Files.exists(p.resolve("_meta/schema.json")))
      .map(_.getFileName.toString).sorted

  // ------------------------------------------------------------------ views

  private def viewsDir = Paths.get(warehouse, "_views")
  private def viewPath(name: String) = viewsDir.resolve(s"$name.sql")

  /** Persist a named view: the SQL TEXT is the stored artifact (resolved
    * against the catalog at every read, like any SQL-engine view — a view
    * over a table sees the table's CURRENT version, and column
    * adds/renames flow through on the next read). Views live beside
    * tables in the warehouse under `_views/`, one file per view.
    */
  def createView(name: String, sql: String, orReplace: Boolean = false): Unit = {
    require(!exists(name), s"$name is a table; views and tables share a namespace")
    require(!materializedViewExists(name), s"$name is a materialized view")
    require(orReplace || !viewExists(name), s"view $name already exists")
    Files.createDirectories(viewsDir)
    Files.writeString(viewPath(name), sql)
  }

  def viewExists(name: String): Boolean = Files.exists(viewPath(name))

  def views(): Seq[String] =
    if (!Files.exists(viewsDir)) Seq.empty
    else listDir(viewsDir).map(_.getFileName.toString)
      .filter(_.endsWith(".sql")).map(_.stripSuffix(".sql")).sorted

  def viewSql(name: String): String = {
    require(viewExists(name), s"view $name does not exist")
    Files.readString(viewPath(name))
  }

  def dropView(name: String): Unit = {
    require(viewExists(name), s"view $name does not exist")
    Files.delete(viewPath(name))
  }

  // ------------------------------------------------------------- functions

  private def fnPath(name: String) = viewsDir.resolve(s"$name.fnsql")

  /** Persist a SQL function definition (the text after `CREATE FUNCTION
    * <name>` — parameter list, RETURNS clause, RETURN body). Spark's
    * native SQL UDFs analyze and INLINE the body into the calling plan
    * (scalar and TABLE functions both), so persisted functions stay
    * whole-stage-codegen-friendly — no interpreted UDF boundary. Like
    * views, the stored artifact is TEXT re-registered against the session
    * per statement.
    */
  def defineFunction(name: String, defText: String, orReplace: Boolean = false): Unit = {
    require(orReplace || !functionExists(name), s"function $name already exists")
    Files.createDirectories(viewsDir)
    Files.writeString(fnPath(name), defText)
  }

  def functionExists(name: String): Boolean = Files.exists(fnPath(name))

  def functions(): Seq[String] =
    if (!Files.exists(viewsDir)) Seq.empty
    else listDir(viewsDir).map(_.getFileName.toString)
      .filter(_.endsWith(".fnsql")).map(_.stripSuffix(".fnsql")).sorted

  def functionSql(name: String): String = {
    require(functionExists(name), s"function $name does not exist")
    Files.readString(fnPath(name))
  }

  def dropFunction(name: String): Unit = {
    require(functionExists(name), s"function $name does not exist")
    Files.delete(fnPath(name))
  }

  // ------------------------------------------------------ materialized views

  private def mviewPath(name: String) = viewsDir.resolve(s"$name.msql")

  /** Record a materialized view's definition. The caller (the SQL router)
    * owns the backing TABLE named `name` — a materialized view is exactly
    * {definition text} + {ordinary versioned catalog table holding the
    * last refresh}, so reads serve the materialized snapshot at plain
    * table-scan cost (the point of materializing) and staleness is the
    * documented semantic until REFRESH re-runs the definition. Refresh
    * history is the backing table's own manifest log.
    */
  def defineMaterializedView(name: String, sql: String): Unit = {
    require(exists(name), s"materialized view $name needs its backing table first")
    require(!viewExists(name), s"$name is already a plain view")
    Files.createDirectories(viewsDir)
    Files.writeString(mviewPath(name), sql)
  }

  def materializedViewExists(name: String): Boolean = Files.exists(mviewPath(name))

  def materializedViews(): Seq[String] =
    if (!Files.exists(viewsDir)) Seq.empty
    else listDir(viewsDir).map(_.getFileName.toString)
      .filter(_.endsWith(".msql")).map(_.stripSuffix(".msql")).sorted

  def materializedViewSql(name: String): String = {
    require(materializedViewExists(name), s"materialized view $name does not exist")
    Files.readString(mviewPath(name))
  }

  def dropMaterializedViewDef(name: String): Unit = {
    require(materializedViewExists(name), s"materialized view $name does not exist")
    Files.delete(mviewPath(name))
  }

  // ------------------------------------------------------------- statistics

  /** Compute and persist table statistics: per column, the row count,
    * null count, HLL approximate distinct count, and min/max (rendered as
    * strings; unorderable types — maps — get null bounds). ONE full-scan
    * aggregation job computes every column's stats together (partial
    * aggregation map-side, a single 1-row driver result) — the cost model
    * that holds at 100 TB, where per-column ANALYZE passes would multiply
    * the scan by the column count. Persisted as JSON under `_meta/stats`
    * with the snapshot version they describe, for cost-based decisions
    * (broadcast-side choice, `SHOW STATS`) without re-scanning.
    */
  def analyze(name: String): DataFrame = {
    val df = table(name)
    val fields = schema(name).fields
    def orderable(dt: DataType): Boolean =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)
    // avg decoded width for variable-width columns: the planner's
    // broadcast estimate MUST NOT assume a fixed 20 B per string (a
    // 10 KB-text column would be underestimated 500× and force-broadcast
    // a huge decoded table); fixed-width types report their type width.
    def widthAgg(f: org.apache.spark.sql.types.StructField)
        : org.apache.spark.sql.Column =
      f.dataType match {
        // octet_length, not length: Spark holds strings as UTF-8 bytes
        // (UTF8String), so the decoded width IS the byte count. length()
        // counts characters and underestimates multi-byte text up to 4× —
        // exactly the broadcast-OOM direction this estimate exists to
        // prevent.
        case org.apache.spark.sql.types.StringType |
            org.apache.spark.sql.types.BinaryType =>
          avg(octet_length(col(f.name)).cast("double") + 8.0)
        // nested types have no honest fixed width (defaultSize ignores
        // cardinality) — record unknown; the planner then refuses the
        // size-underestimate-dangerous broadcast direction for this table
        case _: org.apache.spark.sql.types.ArrayType |
            _: org.apache.spark.sql.types.MapType |
            _: org.apache.spark.sql.types.StructType =>
          lit(null).cast("double")
        case dt => lit(dt.defaultSize.toDouble)
      }
    val aggs = fields.toSeq.flatMap { f =>
      val c = col(f.name)
      Seq(count(c).as(s"nn_${f.name}"),
        approx_count_distinct(c).as(s"nd_${f.name}"),
        widthAgg(f).as(s"aw_${f.name}")) ++
        (if (orderable(f.dataType))
          Seq(min(c).cast("string").as(s"mn_${f.name}"),
            max(c).cast("string").as(s"mx_${f.name}"))
        else Seq(lit(null).cast("string").as(s"mn_${f.name}"),
          lit(null).cast("string").as(s"mx_${f.name}")))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*).head()
    val nRows = row.getLong(row.fieldIndex("n_rows"))
    def str(i: Int): Option[String] = if (row.isNullAt(i)) None else Some(row.getString(i))
    def width(i: Int): Option[Double] =
      if (row.isNullAt(i)) None else Some(row.getDouble(i))
    val stats = fields.toSeq.map { f =>
      (f.name, nRows,
        nRows - row.getLong(row.fieldIndex(s"nn_${f.name}")),
        row.getLong(row.fieldIndex(s"nd_${f.name}")),
        str(row.fieldIndex(s"mn_${f.name}")),
        str(row.fieldIndex(s"mx_${f.name}")),
        width(row.fieldIndex(s"aw_${f.name}")))
    }
    val out = spark.createDataFrame(stats)
      .toDF("column", "n_rows", "n_nulls", "ndv_approx", "min_v", "max_v",
        "avg_width")
      .withColumn("analyzed_version", lit(currentVersion(name)))
    out.coalesce(1).write.mode(SaveMode.Overwrite)
      .json(metaDir(name).resolve("stats").toString)
    // a pre-ANALYZE read may have memoized "no fresh stats" for this
    // snapshot — drop it so planning sees the new stats immediately
    invalidateStatsCache(name)
    statsOf(name).getOrElse(out)
  }

  /** Persisted [[analyze]] output, if the table has been analyzed. */
  def statsOf(name: String): Option[DataFrame] =
    if (!Files.exists(metaDir(name).resolve("stats"))) None
    else {
      val raw = spark.read.json(metaDir(name).resolve("stats").toString)
      // a column whose values were ALL null (e.g. min_v of a map column)
      // is absent from the inferred JSON schema — reinstate it as null
      def c(n: String, tpe: String) =
        (if (raw.columns.contains(n)) col(n) else lit(null)).cast(tpe).as(n)
      Some(raw.select(c("column", "string"), c("n_rows", "long"),
        c("n_nulls", "long"), c("ndv_approx", "long"),
        c("min_v", "string"), c("max_v", "string"),
        c("avg_width", "double"),
        c("analyzed_version", "int"))
        .orderBy("column"))
    }

  /** Append-only insert: validates + casts to the declared schema, writes
    * Hive-partitioned parquet. The cast is strict column-name matching
    * (missing column → error), mirroring the reference's declared-schema
    * inserts. Returns the number of rows written, counted from the
    * just-written files' parquet footers (metadata-only) — never by
    * re-executing the source query, whose result could differ on a second
    * run (nondeterministic sources, version-dependent reads).
    */
  def insert(name: String, df: DataFrame): Long = {
    val added = stageIn(name, projectToPhysical(name, df))
    // appends commute: commit under OCC retry so concurrent writers both
    // land (serializable — the log stays linear, content order-free)
    commitAppend(name, "insert", added)
    if (added.isEmpty) 0L
    else parquetRowCount(added.map(rel => dataDir(name).resolve(rel)))
  }

  /** Two-phase seam for the cross-process vacuum-race spec: [[stageOnly]]
    * leaves the table in exactly the state a racing writer exposes to a
    * concurrent vacuum — data files moved into the live tree, referenced
    * by NO manifest — and [[commitStaged]] publishes them later. Only the
    * phase split is test-only; both halves are the production [[insert]]
    * path verbatim, so what the spec exercises is what ships.
    */
  private[graft] def stageOnly(name: String, df: DataFrame): Seq[String] =
    stageIn(name, projectToPhysical(name, df))

  private[graft] def commitStaged(name: String, files: Seq[String]): Unit =
    commitAppend(name, "insert", files)

  /** Exact row count of freshly written parquet files from their footer
    * metadata — a driver-side footer read per file, NO Spark job (the
    * previous `spark.read.parquet(...).count()` launched a full job per
    * insert just to report the inserted-row count). O(added files) small
    * reads, the same order as the manifest commit itself; falls back to
    * the distributed count if any footer is unreadable.
    */
  private def parquetRowCount(paths: Seq[java.nio.file.Path]): Long =
    try {
      val conf = spark.sessionState.newHadoopConf()
      paths.map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p.toUri), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    } catch {
      case _: Exception =>
        spark.read.parquet(paths.map(_.toString): _*).count()
    }

  // ------------------------------------------------ version manifests

  private def versionsDir(name: String) = metaDir(name).resolve("versions")
  private def manifestPath(name: String, v: Int) =
    versionsDir(name).resolve(f"v$v%08d.txt")

  /** Committed snapshot versions, ascending. Version 0 (the empty table
    * right after [[create]]) is implicit and always readable.
    */
  def versions(name: String): Seq[Int] =
    if (!Files.exists(versionsDir(name))) Seq.empty
    else listDir(versionsDir(name)).map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toInt).sorted

  def currentVersion(name: String): Int = versions(name).lastOption.getOrElse(0)

  /** (version, operation, liveFileCount) per retained snapshot, ascending —
    * the DESCRIBE HISTORY view of the manifest log.
    */
  def history(name: String): Seq[(Int, String, Int)] =
    versions(name).map { v =>
      val lines = Files.readString(manifestPath(name, v)).split("\n").toSeq.map(_.trim)
      val op = lines.headOption.filter(_.startsWith("# "))
        .map(_.stripPrefix("# ")).getOrElse("unknown")
      (v, op, lines.count(l => l.nonEmpty && !l.startsWith("#")))
    }

  /** RESTORE TO VERSION: commit a NEW version whose manifest is snapshot
    * `v`'s file list — a metadata-only rollback (no data movement, O(1)
    * in table size), and itself time-travel-reversible: the rolled-back
    * state stays in the history. `v` must still be retained (not
    * vacuumed). Returns the new version number.
    */
  def restoreVersion(name: String, v: Int): Int = {
    val base = currentVersion(name)
    val files = manifest(name, v) // loud require if v was vacuumed/never existed
    commitVersionAt(name, base, s"restore v$v", files)
  }

  /** Shallow CLONE (Delta/Iceberg `CREATE TABLE ... CLONE` semantics):
    * `dst` becomes an independent table over `src`'s CURRENT snapshot
    * with ZERO data-byte copying — each live data file is HARDLINKED
    * into the clone's data dir (same inode; falls back to a copy on
    * filesystems without link support). O(live files) metadata work
    * regardless of table size — the only clone discipline that works at
    * 100 TB; on an object-store warehouse the same operation is a
    * manifest-pointer copy.
    *
    * Safe because data files are IMMUTABLE once committed: every
    * mutation (insert/delete/merge/compact) writes NEW part files and
    * re-points the manifest, and [[vacuum]] merely unlinks — so either
    * table vacuuming or rewriting never disturbs the other side's bytes
    * (the inode survives until its last link drops). The clone starts
    * its OWN version log at v1 (`clone <src>@v<N>`); schema, partition
    * column, indexes, retired physical names and CHECK constraints all
    * carry over.
    */
  def cloneTable(src: String, dst: String): Int = {
    require(exists(src), s"table $src does not exist")
    require(!exists(dst), s"table $dst already exists")
    require(!viewExists(dst), s"$dst is a view; views and tables share a namespace")
    val v = currentVersion(src)
    val files = manifest(src, v)
    Files.createDirectories(metaDir(dst))
    Seq("schema.json", "partition.txt", "indexed.txt", "retired.txt", "checks.txt")
      .foreach { f =>
        val p = metaDir(src).resolve(f)
        if (Files.exists(p)) Files.copy(p, metaDir(dst).resolve(f))
      }
    val sDir = dataDir(src)
    val dDir = dataDir(dst)
    files.foreach { rel =>
      val from = sDir.resolve(rel)
      val to = dDir.resolve(rel)
      Files.createDirectories(to.getParent)
      try Files.createLink(to, from)
      catch { case _: UnsupportedOperationException => Files.copy(from, to) }
    }
    commitVersion(dst, s"clone $src@v$v", files)
  }

  /** DEEP export of the table's CURRENT snapshot to `destDir` — the
    * cross-warehouse replication/backup primitive the hardlinked
    * [[cloneTable]] can't be (links need one filesystem): data files are
    * BYTE-COPIED under `destDir/data/` with their manifest-relative
    * layout, alongside the metadata sidecars and a `snapshot.txt` listing
    * exactly the exported files. O(live snapshot bytes) by construction —
    * history is NOT exported (an importer starts a fresh log, the same
    * contract as Delta's deep clone). Returns the number of files copied.
    */
  def exportTable(name: String, destDir: String): Int = {
    require(exists(name), s"table $name does not exist")
    val v = currentVersion(name)
    val files = manifest(name, v)
    val dest = Paths.get(destDir)
    require(!Files.exists(dest) || listDir(dest).isEmpty,
      s"export destination $destDir must be empty")
    Files.createDirectories(dest.resolve("meta"))
    Seq("schema.json", "partition.txt", "indexed.txt", "retired.txt", "checks.txt")
      .foreach { f =>
        val p = metaDir(name).resolve(f)
        if (Files.exists(p)) Files.copy(p, dest.resolve("meta").resolve(f))
      }
    val sDir = dataDir(name)
    files.foreach { rel =>
      val to = dest.resolve("data").resolve(rel)
      Files.createDirectories(to.getParent)
      Files.copy(sDir.resolve(rel), to)
    }
    Files.writeString(dest.resolve("snapshot.txt"),
      (s"# export $name@v$v" +: files.sorted).mkString("\n"))
    files.size
  }

  /** Import an [[exportTable]] snapshot as table `name` in THIS warehouse:
    * metadata sidecars and data files copy in, and the table starts a
    * FRESH version log at v1 (`import <srcDir>`) — by-value replication,
    * no shared inodes, no history carried. Fails if `name` exists.
    */
  def importTable(name: String, srcDir: String): Int = {
    require(!exists(name), s"table $name already exists")
    require(!viewExists(name), s"$name is a view; views and tables share a namespace")
    val src = Paths.get(srcDir)
    val snap = src.resolve("snapshot.txt")
    require(Files.exists(snap), s"$srcDir is not an exportTable snapshot")
    val files = Files.readString(snap).split("\n").toSeq
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    Files.createDirectories(metaDir(name))
    Seq("schema.json", "partition.txt", "indexed.txt", "retired.txt", "checks.txt")
      .foreach { f =>
        val p = src.resolve("meta").resolve(f)
        if (Files.exists(p)) Files.copy(p, metaDir(name).resolve(f))
      }
    val dDir = dataDir(name)
    files.foreach { rel =>
      val to = dDir.resolve(rel)
      Files.createDirectories(to.getParent)
      Files.copy(src.resolve("data").resolve(rel), to)
    }
    commitVersion(name, s"import $srcDir", files)
  }

  /** CDC change feed between two retained snapshots: the row-level
    * multiset diff `tableAt(toV) ∖ tableAt(fromV)` tagged 'insert' plus
    * the reverse tagged 'delete', in a `_change` column appended to the
    * logical schema.
    *
    * Computed FILE-GRANULARLY from the manifest diff: only files some
    * intervening commit added or removed are ever read — never the whole
    * table — so an incremental consumer pays for the churn, not the
    * corpus. Rows that merely moved files (COW rewrite survivors,
    * compaction) appear on both sides and cancel in the EXCEPT ALL, which
    * makes the feed exactly the logical snapshot diff: a pure compact()
    * between the two versions contributes nothing.
    */
  def tableChanges(name: String, fromV: Int, toV: Int): DataFrame = {
    require(fromV <= toV,
      s"tableChanges($name): fromV $fromV must be <= toV $toV")
    val from = manifest(name, fromV).toSet
    val to = manifest(name, toV).toSet
    val dir = dataDir(name)
    def readSide(files: Set[String]): DataFrame =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema(name))
      else logicalOverFiles(name, files.toSeq.sorted.map(rel => dir.resolve(rel).toString))
    val added = readSide(to -- from)
    val removed = readSide(from -- to)
    added.exceptAll(removed).withColumn(Catalog.ChangeCol, lit("insert"))
      .unionByName(removed.exceptAll(added).withColumn(Catalog.ChangeCol, lit("delete")))
  }

  /** Data files (relative to the table's data dir) live at version `v`. */
  private def manifest(name: String, v: Int): Seq[String] =
    if (v == 0) Seq.empty
    else {
      val p = manifestPath(name, v)
      require(Files.exists(p),
        s"version $v of table $name does not exist (never committed, or vacuumed)")
      Files.readString(p).split("\n").toSeq
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    }

  /** Atomic snapshot commit: write the next manifest to a temp file, then
    * rename it into place — the rename IS the commit point. A crash
    * before it leaves freshly staged data files orphaned (invisible to
    * every reader, reclaimed by [[vacuum]]); a crash after it leaves the
    * new version fully live. No reader ever observes a partial mutation —
    * the discipline that replaces the pre-manifest `.bak` swap dance.
    */
  private def commitVersion(name: String, op: String, files: Seq[String]): Int =
    commitVersionAt(name, currentVersion(name), op, files)

  /** Commit `files` as the child of snapshot `base` — the serializable
    * rewrite-op commit: `base` is the version the operation READ its
    * file list from (pinned at the operation's first state access), so
    * if any other writer committed base+1 in the meantime the
    * fail-if-exists link detects it and the operation aborts LOUDLY
    * instead of silently clobbering the concurrent change (the
    * lost-update window the old commit-time `currentVersion+1` left
    * open). Appends don't need this — they rebase via [[commitAppend]].
    */
  private[graft] def commitVersionAt(
      name: String, base: Int, op: String, files: Seq[String]): Int = {
    val v = base + 1
    if (!tryCommitAt(name, v, op, files))
      throw new IllegalStateException(
        s"concurrent commit detected for $name v$v — another writer advanced " +
          "the log past the base this operation read (its file list rewrites " +
          "a stale snapshot and cannot rebase)")
    v
  }

  /** Attempt to publish manifest `v` atomically, failing (false) if a
    * concurrent writer already claimed that version number. The commit
    * point is `link(2)` — `Files.createLink` — which atomically fails
    * with [[java.nio.file.FileAlreadyExistsException]] when the target
    * exists, unlike POSIX rename (which silently REPLACES and would make
    * a lost-update race invisible). This is the same fail-if-exists
    * discipline Delta's LogStore requires of its `write(..., overwrite =
    * false)` commits.
    */
  private def tryCommitAt(
      name: String, v: Int, op: String, files: Seq[String]): Boolean = {
    Files.createDirectories(versionsDir(name))
    // writer-unique staging name: two concurrent writers must not clobber
    // each other's tmp while racing for the same version slot
    val tmp = versionsDir(name).resolve(
      s".v$v.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.writeString(tmp, (s"# $op" +: files.sorted).mkString("\n"))
    val won =
      try { Files.createLink(manifestPath(name, v), tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    Files.deleteIfExists(tmp)
    if (won) nudgeMtime(name, v)
    won
  }

  /** Optimistic-concurrency APPEND commit (Delta's conflict-resolution
    * shape for blind appends): stage-once, then retry the manifest commit
    * against whatever HEAD is current — an insert's file list is
    * `HEAD ++ added`, and since appends only ADD files they commute with
    * any concurrent committed operation, so the rebase is always just
    * re-reading HEAD. Bounded retries turn pathological contention loud
    * instead of livelocking. Rewrite ops (delete/merge/compact) do NOT
    * get this path: their file lists are diffs against a specific base
    * snapshot and a concurrent commit invalidates them — they abort via
    * [[commitVersion]]'s fail-if-exists.
    */
  private def commitAppend(
      name: String, op: String, added: Seq[String], maxRetries: Int = 24): Int = {
    var attempt = 0
    while (attempt < maxRetries) {
      val v = currentVersion(name) + 1
      if (tryCommitAt(name, v, op, manifest(name, v - 1) ++ added)) return v
      attempt += 1
    }
    throw new IllegalStateException(
      s"append commit to $name failed after $maxRetries OCC retries — " +
        "pathological writer contention")
  }

  /** Commit-time mtime monotonicity (see body comment). */
  private def nudgeMtime(name: String, v: Int): Unit = {
    // Commit-time monotonicity (Delta's "timestamps out of order"
    // adjustment, delta-io/delta DeltaHistoryManager): TIMESTAMP AS OF
    // resolves by manifest mtime, so on filesystems with coarse mtime
    // granularity (1 s is common) two rapid commits could stamp EQUAL
    // times, making the boundary between them unaddressable. If the new
    // manifest's mtime is not strictly after its predecessor's, nudge it
    // past it — and READ THE RESULT BACK: on filesystems with coarse
    // mtime granularity a +1 ms nudge can truncate straight back to the
    // predecessor's second, so escalate (1 ms → 1 s → 2 s …) until the
    // stored value is strictly greater, mirroring Delta's loop.
    val prev = manifestPath(name, v - 1)
    if (Files.exists(prev)) {
      val prevT = Files.getLastModifiedTime(prev).toInstant
      val curP = manifestPath(name, v)
      var bumpMs = 1L
      while (!Files.getLastModifiedTime(curP).toInstant.isAfter(prevT)) {
        Files.setLastModifiedTime(curP,
          java.nio.file.attribute.FileTime.from(prevT.plusMillis(bumpMs)))
        bumpMs = if (bumpMs < 1000L) 1000L else bumpMs + 1000L
      }
    }
  }

  /** Stage a physical write under `<data>.stage_tmp`, then move the data
    * files into the live tree (Hive layout preserved; Spark's per-job
    * UUID part names make collisions impossible). Returns the moved
    * files' data-dir-relative paths — the currency of manifests. Staged
    * files are NOT readable until a subsequent [[commitVersion]] lists
    * them.
    */
  private def stageIn(name: String, projected: DataFrame): Seq[String] = {
    val dir = dataDir(name)
    Files.createDirectories(dir)
    // writer-unique staging dir: concurrent OCC appends must not clobber
    // each other's staged files before their commits race for the log
    val staged = Paths.get(dir.toString + ".stage_tmp_" +
      java.util.UUID.randomUUID().toString.take(8))
    deleteRecursively(staged)
    writeData(name, projected, staged.toString, SaveMode.Overwrite)
    val moved = walkAll(staged)
      .filter(p => Files.isRegularFile(p))
      .filterNot(p => p.getFileName.toString.startsWith("_") ||
        p.getFileName.toString.startsWith("."))
      .map { p =>
        val rel = staged.relativize(p)
        val dst = dir.resolve(rel)
        Files.createDirectories(dst.getParent)
        Files.move(p, dst)
        // restamp mtime to MOVE time: vacuum's orphan age gate keys off
        // the data file's mtime, and a move preserves the time the bytes
        // were WRITTEN in staging — for a long write job that would start
        // the orphan clock at first byte, not at publish, letting a
        // concurrent vacuum reclaim a moved-but-uncommitted file whose
        // write alone outlived the retain window. With the restamp the
        // gate's bound is move→commit, which is metadata-fast.
        Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime
          .fromMillis(System.currentTimeMillis()))
        rel.toString
      }
    deleteRecursively(staged)
    moved
  }

  /** Physically reclaim space: delete every data file not referenced by
    * the last `retainLast` manifests (old snapshot files, crash orphans,
    * stray checksum siblings), drop the older manifests, and prune
    * now-empty partition dirs. After `vacuum(name)` only the files the
    * retained versions can read remain on disk — time travel beyond them
    * is gone, which is the explicit trade a vacuum makes.
    *
    * Safe under concurrent writers (the Delta VACUUM discipline): files
    * referenced by a manifest being DROPPED are committed history and
    * are reclaimed immediately, but files referenced by NO manifest at
    * all are indistinguishable from a racing writer's moved-but-not-yet-
    * committed output, so they (and `.stage_tmp_*` staging dirs, which a
    * live writer may still be filling) are only reclaimed once older
    * than `orphanRetainMillis`. A crash orphan ages past the window and
    * gets swept on a later vacuum; an in-flight write never loses data
    * to a concurrent vacuum as long as its MOVE→commit gap is shorter
    * than the window ([[stageIn]] restamps each file's mtime at move
    * time, so the write job's duration — however long the stage phase
    * ran — does not count against the window; only the metadata-fast
    * publish→commit hop does). Pass `orphanRetainMillis = 0` only when
    * no writer can be active (tests, single-writer maintenance).
    */
  def vacuum(name: String, retainLast: Int = 1,
      orphanRetainMillis: Long = Catalog.DefaultOrphanRetainMs): Unit = {
    val dir = dataDir(name)
    if (!Files.exists(dir)) return
    val keep = math.max(1, retainLast)
    val vs = versions(name)
    val referenced = vs.flatMap(manifest(name, _)).toSet // by ANY version
    val live = vs.takeRight(keep).flatMap(manifest(name, _)).toSet
    val orphanCutoff = System.currentTimeMillis() - math.max(0L, orphanRetainMillis)
    walkAll(dir).filter(Files.isRegularFile(_)).foreach { f =>
      val fn = f.getFileName.toString
      // a .<file>.crc checksum shares the fate of its data file
      val dataRel =
        if (fn.startsWith(".") && fn.endsWith(".crc"))
          dir.relativize(f.getParent.resolve(fn.stripPrefix(".").stripSuffix(".crc"))).toString
        else dir.relativize(f).toString
      if (!live.contains(dataRel)) {
        val committedHistory = referenced.contains(dataRel)
        if (committedHistory ||
            Files.getLastModifiedTime(f).toMillis < orphanCutoff)
          Files.delete(f)
      }
    }
    // prune empty (sub)dirs, deepest first
    walkAll(dir).filter(Files.isDirectory(_)).sortBy(-_.getNameCount)
      .filter(d => d != dir && listDir(d).isEmpty)
      .foreach(Files.delete)
    vs.dropRight(keep).foreach(v => Files.deleteIfExists(manifestPath(name, v)))
    // crash-orphaned staging dirs (writer-unique names don't self-clean
    // the way the old fixed .stage_tmp did) — vacuum is the reclaim API,
    // age-gated because an ACTIVE writer's staging dir looks identical
    listDir(dir.getParent)
      .filter(_.getFileName.toString.startsWith(dir.getFileName.toString + ".stage_tmp"))
      .filter(d => Files.getLastModifiedTime(d).toMillis < orphanCutoff)
      .foreach(deleteRecursively)
  }

  /** Age-based retention (`VACUUM t RETAIN <n> HOURS`, the Delta-style
    * time form of [[vacuum]]): keep every version whose COMMIT TIME is
    * inside the window — commit time = manifest mtime, the same clock
    * `TIMESTAMP AS OF` resolves against, so "what time travel can still
    * reach" and "what vacuum keeps" agree by construction. The head
    * version is always retained. Physical reclaim delegates to the
    * count-based [[vacuum]].
    */
  def vacuumRetainHours(name: String, hours: Long): Unit = {
    require(hours >= 0, s"retention hours must be >= 0, got $hours")
    val vs = versions(name)
    if (vs.isEmpty) return
    val cutoff = System.currentTimeMillis() - hours * 3600000L
    val recent = vs.count(v =>
      Files.getLastModifiedTime(manifestPath(name, v)).toMillis >= cutoff)
    vacuum(name, retainLast = math.max(1, recent))
  }

  /** Logical columns (with write-time defaults for omitted defaulted
    * columns) cast and renamed to their PHYSICAL storage names — the
    * projection every data write goes through.
    */
  private def projectToPhysical(name: String, df: DataFrame): DataFrame = {
    val s = schema(name)
    val logical = df.select(s.fields.map { f =>
      // a column omitted by the writer takes its declared default (added
      // columns only); a missing non-defaulted column errors as before.
      val c =
        if (!df.columns.contains(f.name) && defaultOf(f).isDefined)
          expr(defaultOf(f).get).cast(f.dataType)
        else col(f.name).cast(f.dataType)
      c.as(f.name)
    }.toSeq: _*)
    // Writers address LOGICAL names; files store PHYSICAL names. The
    // constraint guard sits between default-fill and the physical rename
    // so CHECK expressions resolve against the declared logical schema.
    constraintGuard(name, logical).select(
      s.fields.map(f => col(f.name).as(physicalName(f))).toSeq: _*)
  }

  // ------------------------------------------------------------ constraints

  private def checksPath(name: String) = metaDir(name).resolve("checks.txt")

  /** Declared CHECK constraints (SQL expressions over logical columns). */
  def checks(name: String): Seq[String] =
    if (!Files.exists(checksPath(name))) Seq.empty
    else Files.readString(checksPath(name)).split("\n").toSeq
      .map(_.trim).filter(_.nonEmpty)

  /** Add a CHECK constraint: EXISTING rows are validated first (one scan;
    * ANSI `ADD CONSTRAINT ... CHECK` semantics — adding a check the data
    * already violates must fail, not silently gate only future writes).
    * Enforcement afterwards is embedded in the single write pass of every
    * insert/update/merge (see [[constraintGuard]]) — zero extra jobs per
    * write, which is what keeps constraints affordable at 100 TB ingest
    * rates. Time-travel reads and [[restoreVersion]] are NOT re-validated
    * (a restore can resurrect pre-constraint rows — the same trade the
    * mainstream lakehouse formats make).
    */
  def addCheck(name: String, check: String): Unit = {
    require(exists(name), s"table $name does not exist")
    val bad = table(name).filter(expr(check) <=> lit(false)).count()
    require(bad == 0L,
      s"cannot add CHECK ($check) to $name: $bad existing rows violate it")
    Files.writeString(checksPath(name), (checks(name) :+ check).mkString("\n"))
  }

  /** Row-level constraint enforcement, embedded in the write projection:
    * each NOT NULL column and each CHECK wraps the first schema column in
    * a `when(violated, raise_error)` guard, so validation costs one
    * per-row expression inside the write scan — never a separate
    * validation job. NULL check results pass (ANSI CHECK semantics:
    * violated only when the predicate is exactly FALSE).
    */
  private def constraintGuard(name: String, logical: DataFrame): DataFrame = {
    val s = schema(name)
    val notNull = s.fields.filter(!_.nullable).toSeq.map(f =>
      (col(f.name).isNull,
        s"NOT NULL constraint violated: column ${f.name} of $name"))
    val checked = checks(name).map(c =>
      (expr(c) <=> lit(false), s"CHECK constraint violated on $name: $c"))
    val all = notNull ++ checked
    if (all.isEmpty) logical
    else {
      val f0 = s.head
      val guarded = all.foldLeft(col(f0.name)) { case (acc, (bad, msg)) =>
        when(bad, raise_error(lit(msg))).otherwise(acc)
      }
      logical.withColumn(f0.name, guarded.cast(f0.dataType))
    }
  }

  private def writeData(name: String, projected: DataFrame,
      target: String, mode: SaveMode): Unit = {
    var writer = projected.write.mode(mode)
    // bloom filters for index-marked columns (reference's bitmap-index analog)
    indexedColumns(name).foreach { c =>
      writer = writer.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
    partitionColumn(name)
      .map(p => writer.partitionBy(p))
      .getOrElse(writer)
      .parquet(target)
  }

  /** Ingest JSON lines (the reference's `insert(phile=..., decoder=
    * json_decoder)`): schema-directed parse, optional row preprocess.
    */
  def insertJson(name: String, path: String,
      preprocess: DataFrame => DataFrame = identity): Long = {
    val raw = spark.read.schema(schema(name)).json(path)
    insert(name, preprocess(raw))
  }

  /** Ingest CSV (the reference's `insert(phile=..., decoder=csv_decoder)`):
    * schema-directed parse — columns map by POSITION against the table
    * schema (the header row, when present, is only skipped) — with
    * optional row preprocess. RFC-4180 quote-escape (`""`) by default so
    * a Spark-written CSV round-trips; override via `options`.
    */
  def insertCsv(name: String, path: String,
      // multiLine by default: quoted text values with embedded newlines
      // must not split into spurious records on ingest — correctness over
      // speed. TRADE-OFF: multiLine makes each CSV file non-splittable
      // (one task per file), so bulk ingest of few huge files should pass
      // explicit options WITHOUT multiLine (splittable, parallel) after
      // confirming the data has no embedded newlines — or split the
      // input into many files, which restores full parallelism here.
      options: Map[String, String] =
        Map("header" -> "true", "escape" -> "\"", "multiLine" -> "true"),
      preprocess: DataFrame => DataFrame = identity): Long = {
    val raw = spark.read.options(options).schema(schema(name)).csv(path)
    insert(name, preprocess(raw))
  }

  /** CSV ingest with a DEAD-LETTER path: every row whose raw text fails a
    * `try_cast` to the target schema goes — uncorrupted, as the original
    * strings plus a `_reason` column naming the failing columns — to the
    * `quarantine` table instead of poisoning the ingest or silently
    * nulling (what a plain schema-directed read does to bad cells). The
    * standard 100 TB ingest contract: the good path commits, the bad path
    * stays replayable for repair, and both splits come from ONE
    * materialized snapshot of the input — the raw read is persisted
    * (memory, spilling to local disk) before either sink writes, so the
    * two insert jobs cannot observe different bytes if the source file is
    * concurrently rewritten, and the CSV parse itself runs once. The
    * price is staging the batch on executor-local disk — the standard
    * exactly-once-ingest cost; batches should be sized accordingly.
    * Returns (inserted, quarantined).
    *
    * The quarantine table must pre-exist with the target's column NAMES
    * as string columns plus `_reason` string (validated loudly). Raw
    * NULLs are not failures — NOT NULL requiredness belongs to the
    * table's constraints, not the decoder.
    */
  def insertCsvQuarantine(
      name: String, quarantine: String, path: String,
      options: Map[String, String] =
        Map("header" -> "true", "escape" -> "\"", "multiLine" -> "true"))
      : (Long, Long) = {
    val rawSchema = org.apache.spark.sql.types.StructType(
      schema(name).fields.map(f => org.apache.spark.sql.types.StructField(
        f.name, org.apache.spark.sql.types.StringType, nullable = true)))
    quarantineSplit(name, quarantine,
      spark.read.options(options).schema(rawSchema).csv(path))
  }

  /** Avro ingest with the same dead-letter contract as
    * [[insertCsvQuarantine]]: the container decodes to STRING columns
    * ([[AvroCodec.readAvroAsStrings]] — name-mapped, logical temporals
    * rendered ISO), then the shared try_cast split routes unparseable
    * rows to `quarantine` with a `_reason`. One decode, one snapshot,
    * both sinks consistent.
    */
  def insertAvroQuarantine(
      name: String, quarantine: String, path: String): (Long, Long) =
    quarantineSplit(name, quarantine,
      AvroCodec.readAvroAsStrings(spark, path, schema(name)))

  /** The shared dead-letter split behind the CSV and Avro quarantine
    * decoders: `raw` carries the target's columns AS STRINGS; rows whose
    * cells all `try_cast` to the declared types insert into `name`, the
    * rest land in `quarantine` untouched plus a `_reason` naming the
    * failing columns. `raw` is persisted before either sink so both
    * splits observe ONE snapshot and the decode runs once.
    */
  private def quarantineSplit(
      name: String, quarantine: String,
      raw0: DataFrame): (Long, Long) = {
    val target = schema(name)
    val qSchema = schema(quarantine)
    require(
      target.fields.map(_.name).forall(n =>
        qSchema.fields.exists(f => f.name == n &&
          f.dataType == org.apache.spark.sql.types.StringType)) &&
        qSchema.fields.exists(f => f.name == "_reason" &&
          f.dataType == org.apache.spark.sql.types.StringType),
      s"quarantine table '$quarantine' must carry ${name}'s columns as " +
        "strings plus a _reason string column")
    val raw = raw0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def tryCast(f: org.apache.spark.sql.types.StructField) =
      expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})")
    def cellBad(f: org.apache.spark.sql.types.StructField) =
      col(f.name).isNotNull && tryCast(f).isNull
    val rowBad = target.fields.map(cellBad).reduce(_ || _)
    val good = raw.filter(!rowBad)
      .select(target.fields.map(f => tryCast(f).as(f.name)).toSeq: _*)
    val bad = raw.filter(rowBad)
      .select(qSchema.fields.map { f =>
        if (f.name == "_reason")
          concat_ws(",", array_compact(array(
            target.fields.map(tf =>
              when(cellBad(tf), lit(tf.name))).toSeq: _*))).as("_reason")
        else col(f.name)
      }.toSeq: _*)
    try (insert(name, good), insert(quarantine, bad))
    finally raw.unpersist()
  }

  /** Ingest ORC (interchange with ORC-producing warehouses): schema-directed
    * read — ORC is self-describing, so columns map by NAME and are cast to
    * the declared types — with optional row preprocess. Storage inside the
    * catalog stays parquet; this is the ingest decoder, not a storage mode.
    */
  def insertOrc(name: String, path: String,
      preprocess: DataFrame => DataFrame = identity): Long = {
    val raw = spark.read.schema(schema(name)).orc(path)
    insert(name, preprocess(raw))
  }

  /** Ingest Avro container files ([[AvroCodec.readAvro]] — Avro core, no
    * spark-avro module needed): self-describing like ORC, so columns map
    * by NAME; logical timestamp/date types land as Spark temporals.
    * Storage inside the catalog stays parquet.
    */
  def insertAvro(name: String, path: String,
      preprocess: DataFrame => DataFrame = identity): Long =
    insert(name, preprocess(AvroCodec.readAvro(spark, path, schema(name))))

  /** Compact a table's data files to `targetFiles` per partition (the
    * OPTIMIZE / small-files lifecycle op: streaming and per-batch inserts
    * accumulate many small files, and at scale file-open overhead and
    * footer reads come to dominate scans). Rewrites into a staging
    * directory, then swaps it in — content is unchanged (CatalogSpec
    * asserts the fingerprint; `catalog_compact`'s oracle the profile).
    * Partitioned tables keep their Hive layout, compacted per partition.
    */
  def compact(name: String, targetFiles: Int = 1): Unit = {
    val base = currentVersion(name)
    // a created-but-never-inserted table has nothing to compact
    if (manifest(name, base).isEmpty) return
    // compact rewrites the PHYSICAL bytes as-is (no default coalescing):
    // a pre-addColumn file's nulls stay nulls on disk, so compaction never
    // bakes read-time defaults into data files. The new manifest lists
    // ONLY the compacted files; the old fragments stay on disk for time
    // travel until a vacuum reclaims them.
    val added = stageIn(name, rawData(name).repartition(targetFiles))
    commitVersionAt(name, base, "compact", added)
  }

  /** Partition-scoped OPTIMIZE (`OPTIMIZE t WHERE <pred>`): compact ONLY
    * the data files that contain rows matching `condition`, leaving every
    * other file as untouched bytes in the new manifest. At 100 TB you
    * compact the hot ingest partition, not the table — a whole-table
    * rewrite is a migration. File-granular like [[deleteRows]] (one
    * bounded manifest pass finds the affected files); rewriting whole
    * affected files is content-preserving for ANY predicate, but a
    * predicate on the partition column gives the intended exact scope
    * (affected files hold only matching rows). Raw physical bytes are
    * rewritten as-is — read-time defaults are never baked in.
    */
  def compactWhere(name: String, condition: org.apache.spark.sql.Column,
      targetFiles: Int = 1): Unit = {
    val base = currentVersion(name)
    if (manifest(name, base).isEmpty) return
    val perFile = collectBounded("compactWhere", name,
      logicalWithFile(name).filter(condition)
        .groupBy(Catalog.FileCol).agg(count(lit(1)).as("n")))
    if (perFile.isEmpty) return
    val affected = perFile.map(_.getString(0)).toSeq.sorted
    val added = stageIn(name, rawOverFiles(name, affected)
      .repartition(targetFiles))
    commitVersionAt(name, base, "compact_where",
      manifest(name, base)
        .diff(relativize(name, affected)) ++ added)
  }

  /** [[compact]] with Z-ORDER clustering: rewrite the table's files
    * range-partitioned and sorted by the Morton z-value of `zcols`, so
    * each output file covers a compact hyper-rectangle of the clustered
    * dimensions and multi-dimensional range predicates skip whole files /
    * row groups through ordinary parquet min-max statistics (the
    * `OPTIMIZE ... ZORDER BY` maintenance op of the mainstream lakehouse
    * formats; see [[ZOrder]] for the interleave and the sidecar-pruned
    * standalone-directory variant). Same COW discipline as [[compact]]:
    * new manifest lists only the rewritten files, old fragments remain
    * for time travel until vacuum.
    */
  def compactZOrder(name: String, zcols: Seq[String], targetFiles: Int = 8): Unit = {
    val base = currentVersion(name)
    if (manifest(name, base).isEmpty) return
    require(zcols.nonEmpty, "ZORDER BY needs at least one column")
    val s = schema(name)
    val phys = zcols.map { c =>
      val f = s.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"z-order column $c not in schema of $name"))
      physicalName(f)
    }
    val raw = rawData(name)
    val aggs = phys.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val g = raw.agg(aggs.head, aggs.tail: _*).head()
    val dims = phys.zipWithIndex.map { case (c, i) =>
      // min/max come back null when the column is all-NULL or not castable
      // to double — reject with a diagnostic instead of a bare NPE from
      // getDouble.
      require(!g.isNullAt(2 * i) && !g.isNullAt(2 * i + 1),
        s"ZORDER BY column $c of $name has no numeric range " +
          "(all-NULL or not castable to double) — z-ordering needs " +
          "numeric/date/timestamp columns with at least one non-null value")
      (col(c), g.getDouble(2 * i), g.getDouble(2 * i + 1))
    }
    val added = stageIn(name, raw
      .withColumn("__graft_z", ZOrder.zValue(dims))
      .repartitionByRange(targetFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z"))
    commitVersionAt(name, base, s"zorder(${zcols.mkString(",")})", added)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally s.close()
    }

  /** The data files as stored at the HEAD version: physical column names,
    * no default coalescing — the read [[table]] and [[compact]] build on.
    */
  private def rawData(name: String): DataFrame =
    rawDataAt(name, currentVersion(name))

  private def rawDataAt(name: String, v: Int): DataFrame = {
    val dir = dataDir(name)
    val s = schema(name)
    spark.read
      .option("basePath", dir.toString)
      .schema(StructType(s.fields.map(f => f.copy(name = physicalName(f)))))
      .parquet(manifest(name, v).map(rel => dir.resolve(rel).toString): _*)
  }

  /** Read a table back. Partition pruning applies when filtering on the
    * partition column (`basePath` keeps the partition column in the
    * schema). Physical storage names map back to logical ones, and files
    * written before an addColumn read their nulls coalesced to the
    * declared default (per-read, no physical backfill).
    */
  def table(name: String): DataFrame = {
    val df = tableAt(name, currentVersion(name))
    applyStatsHint(name, df)
  }

  /** Feed persisted ANALYZE statistics into PLANNING: Spark's static
    * broadcast decision keys off on-disk bytes × compression factor,
    * which mis-sizes parquet in both directions — a highly-compressed
    * table under the `autoBroadcastJoinThreshold` on disk can explode
    * past executor memory when decoded (mis-broadcast → OOM at 100 TB
    * shapes), and a small-but-poorly-encoded dim can sit over the
    * threshold on disk while its in-memory footprint is fine (missed
    * broadcast → needless shuffle of the fact side). When FRESH stats
    * exist (analyzed_version == current snapshot), estimate the decoded
    * size as rowCount × schema default row width and, ONLY where that
    * estimate and the on-disk size disagree across the threshold, attach
    * the corresponding join-strategy hint (`broadcast` / `merge`) to the
    * read. Stale or absent stats change nothing — the cost model a
    * versioned lakehouse catalog feeds its planner.
    */
  private def applyStatsHint(name: String, df: DataFrame): DataFrame = {
    val thr = spark.sessionState.conf.autoBroadcastJoinThreshold
    if (thr <= 0) return df // auto-broadcast disabled: nothing to correct
    freshStats(name) match {
      case None => df
      case Some(PlannerStats(rows, width, widthComplete, disk)) =>
        // per-row overhead on top of the measured/typed column widths
        val est = (rows * (width + 8.0)).toLong
        // broadcast ONLY on a complete width estimate: a partial sum is a
        // lower bound, and under-estimating here is the direction that
        // OOMs executors. The merge hint is safe on a lower bound — if
        // even the known columns exceed the threshold, the table is too
        // big to broadcast regardless of the unknown ones.
        if (widthComplete && est <= thr && disk > thr) df.hint("broadcast")
        else if (est > thr && disk <= thr && disk > 0) df.hint("merge")
        else df
    }
  }

  /** Planner-facing digest of fresh [[analyze]] stats: row count, summed
    * avg row width (and whether every column's width is known — nested
    * types record none), and the snapshot's on-disk bytes.
    */
  private case class PlannerStats(
      rows: Long, width: Double, widthComplete: Boolean, diskBytes: Long)

  /** [[PlannerStats]] iff persisted stats describe the CURRENT snapshot —
    * driver-side file reads (no job), memoized per (table, version); the
    * disk-size sum is version-stable so it is cached alongside. Stale
    * stats return None: a post-ANALYZE write invalidates the estimate
    * rather than feeding the planner a lie. [[drop]] purges the table's
    * entries — version numbers restart after drop+create, so a stale
    * entry would otherwise describe the PREVIOUS table of the same name.
    */
  private val statsRowCache =
    scala.collection.concurrent.TrieMap[(String, Int), Option[PlannerStats]]()
  private[sources] def invalidateStatsCache(name: String): Unit =
    statsRowCache.keys.filter(_._1 == name).foreach(statsRowCache.remove)
  private def freshStats(name: String): Option[PlannerStats] = {
    val v = currentVersion(name)
    statsRowCache.getOrElseUpdate((name, v), {
      val dir = metaDir(name).resolve("stats")
      if (!Files.exists(dir)) None
      else try {
        val lines = listDir(dir)
          .filter(_.getFileName.toString.endsWith(".json"))
          .flatMap(p => Files.readString(p).split("\n"))
          .filter(_.nonEmpty)
        val nRowsR = """"n_rows"\s*:\s*(\d+)""".r
        val aVerR = """"analyzed_version"\s*:\s*(\d+)""".r
        val widthR = """"avg_width"\s*:\s*([0-9.eE+-]+)""".r
        for {
          first <- lines.headOption
          rows <- nRowsR.findFirstMatchIn(first).map(_.group(1).toLong)
          av <- aVerR.findFirstMatchIn(first).map(_.group(1).toInt)
          if av == v
          // stats written before avg_width existed parse as 0 known
          // widths over >0 columns → widthComplete = false → merge-only
          widths = lines.map(l => widthR.findFirstMatchIn(l).map(_.group(1).toDouble))
        } yield PlannerStats(
          rows,
          widths.flatten.sum,
          widths.forall(_.isDefined),
          manifest(name, v).map(rel =>
            try Files.size(dataDir(name).resolve(rel))
            catch { case _: Exception => 0L }).sum)
      } catch { case _: Exception => None }
    })
  }

  /** Time travel: read the table AS OF snapshot version `v` (0 = the
    * empty table right after create; [[versions]] lists what is
    * readable). Column mapping and defaults are applied under the
    * CURRENT declared schema — schema DDL is not itself versioned, the
    * same contract as reading old files after an ALTER: physical-name
    * mapping plus defaults make any retained snapshot readable under the
    * live schema.
    */
  def tableAt(name: String, v: Int): DataFrame = {
    val s = schema(name)
    if (manifest(name, v).isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    else toLogical(name, rawDataAt(name, v))
  }

  /** The latest retained version committed at or before `ts`. Commit
    * times are the manifests' own mtimes — the atomic rename that IS the
    * commit point stamps them, so no extra bookkeeping can drift from
    * the truth. Loud when `ts` predates the oldest retained commit
    * (either the table didn't exist yet or the version was vacuumed —
    * both mean the requested snapshot is not reconstructible).
    */
  def versionAt(name: String, ts: java.time.Instant): Int = {
    val at = versions(name).filter { v =>
      !Files.getLastModifiedTime(manifestPath(name, v)).toInstant.isAfter(ts)
    }
    require(at.nonEmpty,
      s"$name has no retained version at or before $ts " +
        s"(oldest retained commit is ${versions(name).headOption.map(v =>
          Files.getLastModifiedTime(manifestPath(name, v)).toInstant)})")
    at.last
  }

  /** Time travel by TIMESTAMP: the table as of the latest commit ≤ `ts`
    * (Delta/Iceberg `TIMESTAMP AS OF` semantics).
    */
  def tableAsOf(name: String, ts: java.time.Instant): DataFrame =
    tableAt(name, versionAt(name, ts))

  /** [[history]] plus each snapshot's commit time (manifest mtime). */
  def historyWithTime(name: String): Seq[(Int, String, Int, java.time.Instant)] =
    history(name).map { case (v, op, n) =>
      (v, op, n, Files.getLastModifiedTime(manifestPath(name, v)).toInstant)
    }

  /** Physical → logical mapping: storage names back to declared names,
    * nulls in defaulted columns coalesced to their defaults. `extra`
    * columns (e.g. a source-file tag) pass through untouched.
    */
  private def toLogical(name: String, raw: DataFrame,
      extra: Seq[String] = Seq.empty): DataFrame = {
    val s = schema(name)
    val logical = raw.select(
      (s.fields.map(f => col(physicalName(f)).as(f.name)) ++ extra.map(col)).toSeq: _*)
    s.fields.filter(defaultOf(_).isDefined).foldLeft(logical) { (df, f) =>
      df.withColumn(f.name,
        coalesce(col(f.name), expr(defaultOf(f).get).cast(f.dataType)))
    }
  }

  /** The logical table plus a `FileCol` source-file tag — the manifest
    * view row-level DML plans over.
    */
  private def logicalWithFile(name: String): DataFrame =
    toLogical(name, rawData(name).withColumn(Catalog.FileCol, input_file_name()),
      extra = Seq(Catalog.FileCol))

  /** RAW (physical-name, no default coalescing) read over the given
    * `file:` URIs — the [[rawData]] counterpart of [[logicalOverFiles]],
    * for rewrites that must preserve stored bytes semantically
    * (compaction).
    */
  private def rawOverFiles(name: String, files: Seq[String]): DataFrame = {
    val s = schema(name)
    spark.read
      .option("basePath", dataDir(name).toString)
      .schema(StructType(s.fields.map(f => f.copy(name = physicalName(f)))))
      .parquet(files: _*)
  }

  /** Read ONLY the given data files (as `file:` URIs from
    * [[logicalWithFile]]), logical view. `basePath` keeps Hive partition
    * columns resolvable, so partition values survive the rewrite.
    */
  private def logicalOverFiles(name: String, files: Seq[String]): DataFrame = {
    val s = schema(name)
    val raw = spark.read
      .option("basePath", dataDir(name).toString)
      .schema(StructType(s.fields.map(f => f.copy(name = physicalName(f)))))
      .parquet(files: _*)
    toLogical(name, raw)
  }

  /** List partition values LIVE at the head version (manifest-derived:
    * stale directories retained for time travel don't count).
    */
  def partitions(name: String): Seq[String] = partitionColumn(name) match {
    case None => Seq.empty
    case Some(p) =>
      manifest(name, currentVersion(name))
        .flatMap(_.split("/").headOption)
        .filter(_.startsWith(s"$p="))
        .map(_.stripPrefix(s"$p="))
        .distinct.sorted
  }

  /** Predicate-form delete — the reference's `t.delete(t.date == 'x')`
    * surface. The only delete granularity is a whole partition, so the
    * condition must be `<partitionColumn> === <literal>`; anything else is
    * rejected loudly (row-level deletes are not append-only semantics).
    */
  def delete(name: String, condition: org.apache.spark.sql.Column): Unit = {
    val p = partitionColumn(name)
      .getOrElse(throw new IllegalArgumentException(s"table $name is not partitioned"))
    org.apache.spark.sql.graft.Bridge.equalityParts(condition) match {
      case Some((col, v)) if col == p => deletePartition(name, String.valueOf(v))
      case _ => throw new IllegalArgumentException(
        s"delete on $name supports only `col(\"$p\") === <literal>` " +
          s"(partition-granularity, append-only storage); got: $condition")
    }
  }

  /** Partition-granularity delete (the only delete the reference has).
    * Metadata-only since the manifest log landed: the new version simply
    * stops listing the partition's files — O(1) in data size, and the
    * dropped partition stays time-travel-readable until a vacuum.
    */
  def deletePartition(name: String, value: String): Unit = {
    val p = partitionColumn(name)
      .getOrElse(throw new IllegalArgumentException(s"table $name is not partitioned"))
    val prefix = s"$p=$value/"
    val base = currentVersion(name)
    val cur = manifest(name, base)
    val remaining = cur.filterNot(_.startsWith(prefix))
    if (remaining.size != cur.size)
      commitVersionAt(name, base, s"deletePartition $p=$value", remaining)
  }

  /** Drop table + data. */
  def drop(name: String): Unit = {
    val dir = tableDir(name)
    if (Files.exists(dir))
      walkAll(dir).reverse.foreach(Files.delete)
    // version numbers restart after drop+create: purge the planner-stats
    // cache or a recreated same-name table would plan with the old one's
    // row count
    invalidateStatsCache(name)
  }

  /** Materialize a query result as a new table (the reference's
    * `nest=True`): eager write, then immediately queryable. The new
    * table's declared schema drops any source-table column-mapping /
    * default metadata — a nested result is a fresh table whose logical
    * and physical names coincide.
    */
  def nest(name: String, df: DataFrame, partitionBy: Option[String] = None): DataFrame = {
    val clean = StructType(df.schema.fields.map { f =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).remove(DefaultKey).remove(PhysicalKey).build()
      f.copy(metadata = md)
    })
    create(name, clean, partitionBy)
    insert(name, df)
    table(name)
  }

  // ------------------------------------------------------- row-level DML

  /** Driver-side scale bound for the row-level DML manifest passes.
    *
    * [[deleteRows]] and [[merge]] collect one row PER AFFECTED DATA FILE
    * (path string + matched-row count — ~200 bytes each) to plan the
    * copy-on-write rewrite; the same driver-side, file-count-sized
    * manifest discipline Delta/Iceberg commits use. That is NOT data-sized
    * (never rows), but it is unbounded in file count, so a DML whose
    * predicate touches more files than this bound fails loudly with
    * [[Catalog.ManifestScaleException]] instead of silently ballooning
    * driver memory. The default (1M files ≈ 200 MB of driver heap — about
    * where a single COW commit stops being sensible anyway) is
    * configurable via the Spark conf `graft.dml.maxAffectedFiles`; a DML
    * legitimately hitting it should be partition-granular
    * ([[deletePartition]]) or split by predicate instead.
    */
  private def maxAffectedFiles: Int =
    spark.conf.getOption("graft.dml.maxAffectedFiles").map(_.toInt)
      .getOrElse(1000000)

  /** Collect the per-file manifest pass BOUNDED: retrieves at most
    * `maxAffectedFiles + 1` rows to the driver (the aggregation itself
    * stays fully distributed), then fails loudly if the bound is hit —
    * the driver never materializes an over-bound file list.
    */
  private def collectBounded(op: String, name: String,
      perFile: DataFrame,
      rollupTotalRow: Boolean = false): Array[org.apache.spark.sql.Row] = {
    val cap = maxAffectedFiles
    // a rollup grand-total row (null in the file column) is bookkeeping
    // riding along in the same pass, not a file to rewrite — it gets a
    // seat beyond the cap and is excluded from the bound check, so a
    // merge touching exactly `cap` files still commits
    val extra = if (rollupTotalRow) 1 else 0
    val rows = perFile.take(cap + extra + 1)
    val fileRows =
      if (rollupTotalRow) rows.count(!_.isNullAt(0)) else rows.length
    if (fileRows > cap)
      throw new Catalog.ManifestScaleException(
        s"$op on $name touches more than $cap data files; a copy-on-write " +
          "rewrite of that many files in one commit is driver-unbounded — " +
          "use a partition-granularity delete, split the predicate, or " +
          "raise spark conf graft.dml.maxAffectedFiles")
    rows
  }

  /** Row-level copy-on-write DELETE (extension beyond the reference's
    * partition-granularity [[delete]] — the table-format discipline for
    * mutating an append-only store). FILE-granular: one manifest pass
    * finds the data files that actually CONTAIN matching rows, and ONLY
    * those files are rewritten (their retained rows re-staged, the
    * originals swapped out); every other file is untouched bytes. At
    * 100 TB that makes a targeted delete cost proportional to the files
    * it hits — the same copy-on-write shape Delta/Iceberg use — instead
    * of a full-table rewrite.
    *
    * SQL DELETE semantics: rows where `condition` is NULL are KEPT.
    * Returns the number of rows deleted.
    *
    * Crash discipline (same as [[compact]]): the staged rewrite is fully
    * written before any original moves; originals go to a `.bak` tree
    * before staged files move in, and `.bak` is only removed last — an
    * interruption leaves either the original files live or a recoverable
    * `.bak` copy, never silent loss.
    */
  def deleteRows(name: String, condition: org.apache.spark.sql.Column): Long = {
    val base = currentVersion(name)
    if (manifest(name, base).isEmpty) return 0L
    // manifest pass: affected files + per-file matched-row counts in ONE
    // job; driver retrieval bounded by graft.dml.maxAffectedFiles
    val perFile = collectBounded("deleteRows", name,
      logicalWithFile(name).filter(condition)
        .groupBy(Catalog.FileCol).agg(count(lit(1)).as("n")))
    if (perFile.isEmpty) return 0L
    val affected = perFile.map(_.getString(0)).toSeq.sorted
    val retained = logicalOverFiles(name, affected)
      .filter(!coalesce(condition, lit(false)))
    val added = stageIn(name, projectToPhysical(name, retained))
    commitVersionAt(name, base, "deleteRows",
      manifest(name, base).diff(relativize(name, affected)) ++ added)
    perFile.map(_.getLong(1)).sum
  }

  /** Atomic REPLACE WHERE (Delta's `INSERT INTO t REPLACE WHERE cond`):
    * delete every row matching `condition` AND insert `df`, as ONE
    * snapshot commit — readers see either the old state or the fully
    * replaced one, never the deleted-but-not-yet-inserted gap that a
    * deleteRows-then-insert sequence exposes (and a crash between the
    * two can't strand the table half-mutated). File-granular like
    * [[deleteRows]]: only files containing matching rows are rewritten;
    * the incoming batch stages alongside; one manifest swap covers both.
    * This is the idempotent-backfill primitive (re-materialize one day /
    * partition of a derived table). Returns rows deleted.
    */
  def replaceWhere(name: String, condition: org.apache.spark.sql.Column,
      df: DataFrame): Long = {
    val base = currentVersion(name)
    val cur = manifest(name, base)
    val (survivorFiles, removedCount) =
      if (cur.isEmpty) (cur, 0L)
      else {
        val perFile = collectBounded("replaceWhere", name,
          logicalWithFile(name).filter(condition)
            .groupBy(Catalog.FileCol).agg(count(lit(1)).as("n")))
        if (perFile.isEmpty) (cur, 0L)
        else {
          val affected = perFile.map(_.getString(0)).toSeq.sorted
          val retained = logicalOverFiles(name, affected)
            .filter(!coalesce(condition, lit(false)))
          val kept = stageIn(name, projectToPhysical(name, retained))
          (cur.diff(relativize(name, affected)) ++ kept,
            perFile.map(_.getLong(1)).sum)
        }
      }
    val added = stageIn(name, projectToPhysical(name, df))
    commitVersionAt(name, base, "replace_where", survivorFiles ++ added)
    removedCount
  }

  /** Right-to-be-forgotten erasure (GDPR art.17 shape): COW-delete the
    * matching rows, then PURGE history to the erased snapshot ONLY —
    * time travel / RESTORE to any pre-erasure version fails loudly, and
    * [[vacuum]] reclaims the bytes in the same call. The purge runs even
    * when the CURRENT version matches nothing: older snapshots may still
    * hold matching rows, and the call's contract is "no retained state
    * contains them", not "the head doesn't". Erasure is PER TABLE — a
    * hardlinked [[cloneTable]] fork keeps its own links to shared inodes,
    * so a compliance sweep must erase every clone (enumerate via
    * [[tables]]); the shared bytes are reclaimed when the last link
    * drops. Returns rows erased from the head snapshot.
    */
  def eraseWhere(name: String, condition: org.apache.spark.sql.Column): Long = {
    val n = deleteRows(name, condition)
    vacuum(name, retainLast = 1)
    n
  }

  /** Row-level copy-on-write UPDATE — SQL `UPDATE t SET c = e, ... WHERE
    * cond`. FILE-granular like [[deleteRows]]: one manifest pass (bounded
    * by `graft.dml.maxAffectedFiles`) finds the files containing matching
    * rows; only those are rewritten, with every SET expression evaluated
    * against the OLD row (standard SQL: assignments don't see each
    * other). Rows where `condition` is NULL are left unchanged. Updating
    * the partition column is allowed — rewritten rows simply land in
    * their new Hive partition directories. Returns rows updated.
    */
  def updateRows(name: String, condition: org.apache.spark.sql.Column,
      set: Seq[(String, org.apache.spark.sql.Column)]): Long = {
    val s = schema(name)
    require(set.nonEmpty, "UPDATE needs at least one SET assignment")
    set.foreach { case (c, _) =>
      require(s.fieldNames.contains(c), s"update column $c not in schema of $name") }
    require(set.map(_._1).distinct.size == set.size,
      "UPDATE assigns a column twice")
    val base = currentVersion(name)
    if (manifest(name, base).isEmpty) return 0L
    val perFile = collectBounded("updateRows", name,
      logicalWithFile(name).filter(condition)
        .groupBy(Catalog.FileCol).agg(count(lit(1)).as("n")))
    if (perFile.isEmpty) return 0L
    val affected = perFile.map(_.getString(0)).toSeq.sorted
    val hit = coalesce(condition, lit(false))
    val assign = set.toMap
    val rewritten = logicalOverFiles(name, affected).select(s.fields.map { f =>
      assign.get(f.name) match {
        case Some(e) => when(hit, e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
        case None => col(f.name)
      }
    }.toSeq: _*)
    val added = stageIn(name, projectToPhysical(name, rewritten))
    commitVersionAt(name, base, "updateRows",
      manifest(name, base).diff(relativize(name, affected)) ++ added)
    perFile.map(_.getLong(1)).sum
  }

  /** TRUNCATE TABLE: commit an EMPTY manifest — metadata-only and O(1) in
    * table size (no file is touched); every prior snapshot stays
    * time-travel-readable until a [[vacuum]] reclaims it, and the
    * truncation itself is reversible via [[restoreVersion]].
    */
  def truncate(name: String): Unit = {
    require(exists(name), s"table $name does not exist")
    commitVersion(name, "truncate", Seq.empty)
  }

  /** Copy-on-write MERGE (upsert) by key — SQL MERGE's `WHEN MATCHED THEN
    * UPDATE SET * / WHEN NOT MATCHED THEN INSERT *`: every stored row
    * whose `key` appears in `updates` is replaced by the update row with
    * that key, and update rows with unseen keys are appended. `updates`
    * must be key-unique (checked loudly — multiple update rows per key is
    * the ambiguity SQL MERGE rejects at runtime). A single NULL-keyed
    * update row is accepted: it matches no stored row (SQL equality never
    * matches NULL) and is inserted; two or more NULL-keyed rows are
    * rejected as duplicates of the null key group.
    *
    * The multi-NULL rejection is DELIBERATELY STRICTER than the SQL MERGE
    * contract cited above: standard MERGE's multi-match ambiguity is per
    * TARGET row, and null-keyed source rows match no target row, so a
    * standards-faithful engine would insert them all. Here the key is an
    * upsert identity — several NULL-keyed rows are indistinguishable on
    * it, which is almost always an upstream bug (a dropped join column, a
    * mis-parsed id), so the call fails loudly instead of appending
    * unidentifiable rows. Callers that genuinely want SQL's
    * insert-them-all behavior: split the NULL-keyed rows off and
    * [[insert]] them directly.
    *
    * FILE-granular like [[deleteRows]]: the manifest pass semi-joins the
    * update keys against the file-tagged table (AQE broadcasts the key
    * side when it is small — the common shape: a trickle of updates
    * against a huge table), and only files containing matched keys are
    * rewritten. Returns (matchedRows, insertedRows).
    */
  def merge(name: String, updates: DataFrame, key: String): (Long, Long) = {
    val base = currentVersion(name)
    val s = schema(name)
    require(s.fieldNames.contains(key), s"merge key $key not in schema of $name")
    // one pass over updates for both counts (was two separate jobs — at
    // scale each job is a full scan of the update set). count_distinct
    // ignores NULLs, so the null key group is counted back in explicitly
    // (max(isNull) = 1 if any) — a SINGLE NULL-keyed update row is
    // accepted, never matches any stored row (SQL equality), and is
    // inserted; two or more NULL-keyed rows are duplicates of one key
    // group and rejected, exactly the distinct().count() semantics this
    // folded pass replaced.
    val updStats = updates.agg(
      count(lit(1)).as("n"),
      (count_distinct(col(key)) +
        coalesce(max(col(key).isNull.cast("long")), lit(0L))).as("k")).head()
    val (nUpd, nKeys) = (updStats.getLong(0), updStats.getLong(1))
    require(nUpd == nKeys,
      s"merge updates must be key-unique on $key: $nUpd rows over $nKeys keys")
    val keys = updates.select(col(key)).distinct()
    val updLogical = alignUpdates(name, updates)
    if (manifest(name, currentVersion(name)).isEmpty) {
      insert(name, updLogical); return (0L, nUpd)
    }
    // rollup folds the old separate matchedKeys job (a second semi-join
    // scan of the affected files) into the manifest pass: the grand-total
    // row carries the distinct matched key count, the per-file rows the
    // rewrite set. Expand doubles only the MATCHED rows (the trickle),
    // never the full table scan.
    // fresh-aliased left side: `updates` routinely derives from this very
    // table (read-modify-write), and an unqualified post-join reference to
    // the key column would trip DetectAmbiguousSelfJoin
    val tagged = logicalWithFile(name)
      .select(col(Catalog.FileCol).as("__f"), col(key).as("__k"))
    val perFileAll = collectBounded("merge", name,
      tagged.as("t").join(keys.as("u"),
          col("t.__k") === col(s"u.$key"), "left_semi")
        .rollup(col("t.__f"))
        .agg(count(lit(1)).as("n"), count_distinct(col("t.__k")).as("nk")),
      rollupTotalRow = true)
    val perFile = perFileAll.filter(!_.isNullAt(0))
    if (perFile.isEmpty) { insert(name, updLogical); return (0L, nUpd) }
    val affected = perFile.map(_.getString(0)).toSeq.sorted
    val matched = perFile.map(_.getLong(1)).sum
    val matchedKeys = perFileAll.find(_.isNullAt(0)).map(_.getLong(2)).getOrElse(0L)
    // retained non-matched rows of the affected files + ALL update rows
    // (matched replacements and fresh inserts alike) form the staged write
    val retained = logicalOverFiles(name, affected).join(keys, Seq(key), "left_anti")
      .select(s.fieldNames.map(col).toSeq: _*)
    val added = stageIn(name, projectToPhysical(name, retained.unionByName(updLogical)))
    commitVersionAt(name, base, "merge",
      manifest(name, base).diff(relativize(name, affected)) ++ added)
    (matched, nUpd - matchedKeys)
  }

  /** Update rows in logical terms, schema order, omitted defaulted
    * columns filled — the source-side projection every merge goes through.
    */
  private def alignUpdates(name: String, updates: DataFrame): DataFrame = {
    val s = schema(name)
    updates.select(s.fields.map { f =>
      val c =
        if (!updates.columns.contains(f.name) && defaultOf(f).isDefined)
          expr(defaultOf(f).get).cast(f.dataType)
        else col(f.name).cast(f.dataType)
      c.as(f.name)
    }.toSeq: _*)
  }

  /** Copy-on-write MERGE with CONDITIONAL, MULTI-ACTION clauses — the full
    * SQL MERGE shape [[merge]]'s upsert-all form doesn't cover:
    *
    * {{{
    * WHEN MATCHED [AND <cond>] THEN UPDATE SET *   (any number)
    * WHEN MATCHED [AND <cond>] THEN DELETE
    * WHEN NOT MATCHED [AND <cond>] THEN INSERT *   (any number)
    * }}}
    *
    * SQL semantics: per matched (target row, source row) pair the FIRST
    * matched clause whose condition holds applies (UPDATE replaces the
    * target row with the source row, DELETE drops it, no applicable
    * clause keeps the target row unchanged); per unmatched source row the
    * first not-matched clause whose condition holds inserts it. Matched
    * conditions may reference both sides through `targetAlias`/
    * `sourceAlias` qualifiers (e.g. `s.v > t.v`); not-matched conditions
    * see only `sourceAlias`. `updates` must be key-unique — multiple
    * source rows matching one target row is the ambiguity SQL MERGE
    * rejects at runtime, checked loudly here.
    *
    * FILE-granular like [[merge]]: the manifest pass (bounded by
    * `graft.dml.maxAffectedFiles`) finds files containing matched keys;
    * only those are rewritten under the clause logic, every other file is
    * untouched bytes. The clause decision itself is a single codegen'd
    * CASE column over the affected-files ⋈ updates join — no per-clause
    * passes. Returns (updatedRows, deletedRows, insertedRows).
    */
  def mergeConditional(
      name: String, updates: DataFrame, key: String,
      matched: Seq[Catalog.MatchedClause],
      notMatched: Seq[Option[String]],
      targetAlias: String = "t", sourceAlias: String = "s"): (Long, Long, Long) = {
    val base = currentVersion(name)
    val s = schema(name)
    require(s.fieldNames.contains(key), s"merge key $key not in schema of $name")
    require(matched.nonEmpty || notMatched.nonEmpty,
      "MERGE needs at least one WHEN clause")
    // every matched clause except the last needs a condition — a later
    // clause behind an unconditional one is unreachable (SQL's rule)
    matched.dropRight(1).foreach(c => require(c.cond.isDefined,
      "only the last WHEN MATCHED clause may omit its AND condition " +
        "(an unconditional clause makes later ones unreachable)"))
    notMatched.dropRight(1).foreach(c => require(c.isDefined,
      "only the last WHEN NOT MATCHED clause may omit its AND condition"))
    val nUpd = updates.count()
    val keys = updates.select(col(key)).distinct()
    require(nUpd == keys.count(),
      s"merge updates must be key-unique on $key: multiple source rows " +
        "per key is the multi-match SQL MERGE rejects")
    val updLogical = alignUpdates(name, updates)
    // all NOT MATCHED actions are INSERT *, so first-match reduces to
    // any-match: one OR over the clause conditions
    def inserts(candidates: DataFrame): DataFrame =
      if (notMatched.isEmpty) candidates.limit(0)
      else {
        val cond = notMatched.map(_.map(expr).getOrElse(lit(true))).reduce(_ || _)
        candidates.alias(sourceAlias).filter(coalesce(cond, lit(false)))
      }
    if (manifest(name, currentVersion(name)).isEmpty) {
      val ins = inserts(updLogical)
      val n = insert(name, ins)
      return (0L, 0L, n)
    }
    val perFile = collectBounded("merge", name,
      logicalWithFile(name).join(keys, Seq(key), "left_semi")
        .groupBy(Catalog.FileCol).agg(count(lit(1)).as("n")))
    if (perFile.isEmpty) {
      val n = insert(name, inserts(updLogical))
      return (0L, 0L, n)
    }
    val affected = perFile.map(_.getString(0)).toSeq.sorted
    val affectedRows = logicalOverFiles(name, affected)
    // first applicable clause per pair, as one CASE chain ('keep' = no
    // clause holds, or the target row had no source match at all)
    val joined = affectedRows.alias(targetAlias).join(
      updLogical.alias(sourceAlias),
      col(s"$targetAlias.$key") === col(s"$sourceAlias.$key"), "left_outer")
    val clauseChain = matched.foldRight(lit("keep"): org.apache.spark.sql.Column) { (c, els) =>
      when(coalesce(c.cond.map(expr).getOrElse(lit(true)), lit(false)),
        lit(if (c.delete) "delete" else "update")).otherwise(els)
    }
    val act = when(col(s"$sourceAlias.$key").isNotNull, clauseChain)
      .otherwise(lit("keep"))
    val decided = joined.withColumn(Catalog.ActionCol, act)
    val actionCounts = decided.groupBy(Catalog.ActionCol).agg(count(lit(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = decided.filter(col(Catalog.ActionCol) === "keep")
      .select(s.fieldNames.map(n => col(s"$targetAlias.$n")).toSeq: _*)
    val updated = decided.filter(col(Catalog.ActionCol) === "update")
      .select(s.fieldNames.map(n => col(s"$sourceAlias.$n").as(n)).toSeq: _*)
    // source rows whose key matched NO target row (affected files contain
    // every matched key by construction)
    val ins = inserts(updLogical.join(affectedRows.select(col(key)), Seq(key), "left_anti"))
    val nIns = ins.count()
    val added = stageIn(name,
      projectToPhysical(name, kept.unionByName(updated).unionByName(ins)))
    commitVersionAt(name, base, "merge",
      manifest(name, base).diff(relativize(name, affected)) ++ added)
    (actionCounts.getOrElse("update", 0L), actionCounts.getOrElse("delete", 0L), nIns)
  }

  /** `file:` URIs (as [[logicalWithFile]] tags them) → data-dir-relative
    * manifest entries.
    */
  private def relativize(name: String, uris: Seq[String]): Seq[String] = {
    val dir = dataDir(name)
    uris.map(u => dir.relativize(Paths.get(java.net.URI.create(u))).toString)
  }
}

object Catalog {
  /** Default age gate for reclaiming files/staging dirs referenced by NO
    * manifest (see [[Catalog.vacuum]]): 24h, far beyond any stage→commit
    * gap, the Delta `deletedFileRetentionDuration` idea sized for this
    * catalog's commit latency. Committed history being dropped is NOT
    * age-gated — only never-referenced paths are.
    */
  val DefaultOrphanRetainMs: Long = 24L * 3600 * 1000

  /** Source-file tag column used by the row-level DML manifest passes. */
  private[sources] val FileCol = "__graft_src_file"

  /** Field-metadata key carrying a column's declared DEFAULT (SQL text).
    * `private[sources]` so [[CatalogSql]] can round-trip SHOW CREATE
    * TABLE output (column DEFAULTs included) back through CREATE TABLE.
    */
  private[sources] val DefaultKey = "graft.default"

  /** A row-level DML's copy-on-write plan would exceed the driver-side
    * manifest bound (`graft.dml.maxAffectedFiles`) — thrown BEFORE the
    * file list materializes on the driver.
    */
  final class ManifestScaleException(msg: String) extends RuntimeException(msg)

  /** Change-type column ('insert' | 'delete') appended by [[Catalog.tableChanges]]. */
  val ChangeCol = "_change"

  /** Per-pair decision column of [[Catalog.mergeConditional]]'s CASE chain. */
  private[sources] val ActionCol = "__graft_merge_action"

  /** One `WHEN MATCHED [AND cond] THEN UPDATE SET * | DELETE` clause. */
  final case class MatchedClause(cond: Option[String], delete: Boolean)
}
