package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the expensive queries' building
  * blocks (`runMain graft.DevTime <sfDir>`) — where does the wall-clock
  * actually go. Sibling of [[ExplainProbe]]; not part of the driver
  * contract.
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(fn: => Unit): Unit = {
      val t0 = System.nanoTime(); fn
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cp = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    // warm
    mat(cp.limit(1).toDF())
    t("cp distinct")(mat(cp))
    val cpP = cp.localCheckpoint(true)
    val deg = cpP.groupBy("p").agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2 && col("d") <= 64)
    t("deg from pinned cp")(mat(deg))
    val grouped = cpP.join(deg, "p")
      .select(col("p"), col("c"), expr("1000000L DIV d").as("w_mic"))
      .groupBy("p")
      .agg(array_sort(collect_list(col("c"))).as("cs"),
        first(col("w_mic")).as("w_mic"))
    t("grouped arrays")(mat(grouped))
    val gP = grouped.localCheckpoint(true)
    val pairs = gP.select(col("w_mic"), explode(expr(
      "flatten(transform(cs, (x, i) -> " +
        "transform(slice(cs, i + 2, size(cs) - i - 1), " +
        "y -> shiftleft(x, 32) + y)))")).as("pk"))
    t("pairs explode only")(mat(pairs))
    t("pairs count")(println("n_pairs=" + pairs.count()))
    val agg = pairs.groupBy("pk")
      .agg(count(lit(1)).as("n_common"), sum(col("w_mic")).as("ra_mic"))
    t("pair agg")(mat(agg))
    t("full query repeat")(mat(
      SparkEntry.queries("graph_link_predict_ra")(spark, sfDir)))
    t("full query repeat2")(mat(
      SparkEntry.queries("graph_link_predict_ra")(spark, sfDir)))
    spark.stop()
  }
}
