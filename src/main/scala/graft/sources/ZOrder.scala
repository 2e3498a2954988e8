package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Z-order (Morton) clustering + stats-based file skipping: the
  * multi-dimensional data-layout optimization (Delta/Iceberg `OPTIMIZE
  * ZORDER BY` shape) for the catalog's parquet tables.
  *
  * Why: min/max statistics prune scans only when each file's value range
  * is NARROW for the filtered column. A single-column sort gives that for
  * one dimension and destroys it for every other; interleaving the bits
  * of two normalized 16-bit keys gives every file a contiguous Z-curve
  * range, i.e. a small axis-aligned rectangle in (x, y) space — a 2-D box
  * predicate then overlaps only the few files whose rectangles intersect
  * it, instead of all of them.
  *
  * Scale design: the z-value is a pure per-row codegen'd expression (32
  * shift/mask terms — no UDF); the layout pass is ONE `repartitionByRange`
  * shuffle on the z-value plus a per-partition sort, exactly the shape of
  * a table-format OPTIMIZE job at 100 TB. Only the 4 global min/max
  * doubles round-trip the driver (model-sized). Per-file stats live in a
  * sidecar here (parquet row-group footers carry the same stats at
  * execution time; a table format would store them in its manifest —
  * the sidecar stands in for that manifest and is what [[readPruned]]
  * file-prunes with at PLANNING time, the way Delta/Iceberg do).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (0,2,4,…,30). */
  private def spread16(c: Column): Column =
    (0 until 16).map(k =>
      shiftleft(shiftrightunsigned(c, k).bitwiseAND(lit(1L)), 2 * k))
      .reduce((a, b) => a.bitwiseOR(b))

  /** 32-bit Morton code of (x, y) after min/max normalization of each to
    * 16-bit integer buckets. x takes even bits, y odd bits.
    */
  def zValue2(
      x: Column, xLo: Double, xHi: Double,
      y: Column, yLo: Double, yHi: Double): Column = {
    def norm(c: Column, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(
        greatest(((c.cast("double") - lit(lo)) / lit(span)) * 65535.0, lit(0.0)),
        lit(65535.0)).cast("long")
    }
    spread16(norm(x, xLo, xHi))
      .bitwiseOR(shiftleft(spread16(norm(y, yLo, yHi)), 1))
  }

  /** Per-file min/max stats for the two z-ordered columns. */
  final case class FileStats(
      path: String, xMin: Double, xMax: Double, yMin: Double, yMax: Double)

  private def statsPath(dir: String) = Paths.get(dir, "_zorder_stats.csv")

  /** Write `df` to `dir` clustered on the Z-curve of (`xCol`, `yCol`) in
    * `numFiles` range partitions, plus the per-file stats sidecar.
    *
    * The post-write per-file stats jobs are fixture-sized bookkeeping; at
    * scale the same numbers come for free from task-side accumulators or
    * the parquet footers the write already produced.
    */
  def writeZOrdered(
      df: DataFrame, xCol: String, yCol: String, dir: String,
      numFiles: Int): Seq[FileStats] = {
    val spark = df.sparkSession
    val r = df.agg(
      min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    val (xLo, xHi, yLo, yHi) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    df.withColumn("_z", zValue2(col(xCol), xLo, xHi, col(yCol), yLo, yHi))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.matches("part-.*\\.parquet"))
      .toSeq.sortBy(_.toString)
    val stats = files.map { f =>
      val s = spark.read.parquet(f.toString).agg(
        min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
        min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
      FileStats(f.toString, s.getDouble(0), s.getDouble(1), s.getDouble(2), s.getDouble(3))
    }
    Files.writeString(statsPath(dir),
      stats.map(s => s"${s.path},${s.xMin},${s.xMax},${s.yMin},${s.yMax}")
        .mkString("", "\n", "\n"))
    stats
  }

  /** The sidecar stats written by [[writeZOrdered]]. */
  def readStats(dir: String): Seq[FileStats] =
    Files.readAllLines(statsPath(dir)).asScala.toSeq.filter(_.nonEmpty).map { line =>
      val Array(p, a, b, c, d) = line.split(",")
      FileStats(p, a.toDouble, b.toDouble, c.toDouble, d.toDouble)
    }

  /** Planning-time file pruning: read only the files whose stats overlap
    * the box `[xRange] × [yRange]` (the manifest-prune step of a table
    * format). The caller still applies the exact predicate — stats
    * overlap is necessary, not sufficient, for a row to match.
    */
  def readPruned(
      spark: SparkSession, dir: String,
      xRange: (Double, Double), yRange: (Double, Double)): DataFrame = {
    val sel = readStats(dir).filter(s =>
      s.xMax >= xRange._1 && s.xMin <= xRange._2 &&
        s.yMax >= yRange._1 && s.yMin <= yRange._2)
    if (sel.isEmpty) spark.read.parquet(dir).limit(0)
    else spark.read.parquet(sel.map(_.path): _*)
  }
}
