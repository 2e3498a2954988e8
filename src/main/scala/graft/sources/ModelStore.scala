package graft.sources

import graft.operators.Similarity.PqModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for trained model state — the train-once / serve-everywhere
  * discipline a 100 TB pipeline actually runs. An ANN index (PQ codebooks,
  * coarse-quantizer centroids, the encoded code table, the coarse
  * assignment) is TRAINED on one pass (or offline on a sample), written as
  * ordinary parquet, and every later serving query reads the index — the
  * raw corpus vectors are never touched again. Without this, every query
  * re-pays training (the dominant cost of the oracle-replay ANN rows);
  * with it, serving cost is the index scan + a broadcast-sized query-side
  * computation.
  *
  * Storage shape: everything is parquet, readable by ANY engine (the
  * portability argument that makes parquet the index format of record for
  * lakehouse ANN — same reasoning as storing Faiss-style codes in columnar
  * files). Model-sized artifacts (codebooks, centroids) round-trip through
  * model-sized `collect()`s — the sanctioned MLlib-style driver hop;
  * data-sized artifacts (codes, assignment) stay distributed end to end.
  */
object ModelStore {

  /** Write the m per-subspace PQ codebooks under `dir` as one parquet of
    * (sub, cl, spos, cm) rows plus a one-row `meta` parquet carrying the
    * shape (m, subLen) — no sidecar format to parse, no extra dependency.
    */
  def savePq(spark: SparkSession, dir: String, model: PqModel): Unit = {
    val rows = for {
      (book, j) <- model.cents.zipWithIndex
      (cl, v) <- book
      (x, p) <- v.zipWithIndex
    } yield (j, cl, p, x)
    spark.createDataFrame(rows).toDF("sub", "cl", "spos", "cm")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    spark.createDataFrame(Seq((model.m, model.subLen))).toDF("m", "sub_len")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load [[savePq]]'s layout back into a [[PqModel]] (model-sized). */
  def loadPq(spark: SparkSession, dir: String): PqModel = {
    val meta = spark.read.parquet(s"$dir/meta").head
    val (m, subLen) = (meta.getInt(0), meta.getInt(1))
    val rows = spark.read.parquet(s"$dir/codebooks")
      .select(col("sub"), col("cl"), col("spos"), col("cm")).collect()
    val cents = (0 until m).map { j =>
      rows.filter(_.getInt(0) == j)
        .groupBy(_.getLong(1)).map { case (cl, rs) =>
          cl -> (rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toVector: Seq[Double])
        }.toSeq.sortBy(_._1)
    }
    PqModel(m, subLen, cents)
  }

  /** Write a centroid table (cluster id, centroid vector) under `dir`. */
  def saveCentroids(
      spark: SparkSession, dir: String, cents: Seq[(Long, Seq[Double])]): Unit =
    spark.createDataFrame(cents).toDF("cluster", "centroid")
      .repartition(1).write.mode("overwrite").parquet(dir)

  /** Load [[saveCentroids]]'s table back (model-sized). */
  def loadCentroids(spark: SparkSession, dir: String): Seq[(Long, Seq[Double])] =
    spark.read.parquet(dir).select(col("cluster"), col("centroid")).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1).toVector: Seq[Double]))
      .sortBy(_._1).toSeq

  /** Centroid table as a DataFrame (cluster, centroid) for broadcast use. */
  def centroidsDf(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).select(col("cluster"), col("centroid"))

  /** Write a learned BPE merge table (rank, left, right, pair freq) —
    * the tokenizer-model artifact: train once on the vocab table, encode
    * any corpus forever after by applying the persisted merges in rank
    * order.
    */
  def saveMerges(spark: SparkSession, dir: String,
      merges: Seq[(Int, String, String, Long)]): Unit =
    spark.createDataFrame(merges)
      .toDF("merge_rank", "lhs", "rhs", "pair_freq")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/merges")

  /** Load [[saveMerges]]'s table back in rank order (model-sized). */
  def loadMerges(spark: SparkSession, dir: String): Seq[(Int, String, String, Long)] =
    spark.read.parquet(s"$dir/merges")
      .select(col("merge_rank"), col("lhs"), col("rhs"), col("pair_freq"))
      .collect()
      .map { r =>
        // trust boundary: downstream encoders (mergeFoldExpr /
        // greedyMatchExpr's literal vocab) interpolate these symbols into
        // SQL literals under the [a-z]-only invariant of the trainers'
        // word alphabet — enforce it HERE so a foreign or corrupted model
        // dir fails loudly instead of becoming expression injection
        val (l, rr) = (r.getString(1), r.getString(2))
        require(l.matches("^[a-z]+$") && rr.matches("^[a-z]+$"),
          s"merge symbols must be [a-z]+ (got '$l', '$rr' in $dir)")
        (r.getInt(0), l, rr, r.getLong(3))
      }
      .sortBy(_._1).toSeq

  /** Write a learned unigram-LM piece table `(piece, usage, lp)` — the
    * SentencePiece-style tokenizer model artifact, the unigram sibling of
    * [[saveMerges]].
    */
  def saveUnigram(spark: SparkSession, dir: String,
      vocab: org.apache.spark.sql.DataFrame): Unit =
    vocab.select(col("piece"), col("usage"), col("lp"))
      .repartition(1).write.mode("overwrite").parquet(s"$dir/unigram")

  /** Load [[saveUnigram]]'s piece table back as a DataFrame (stays
    * distributed — the encode side joins it, never collects it).
    */
  def loadUnigram(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"$dir/unigram").select("piece", "usage", "lp")
}
