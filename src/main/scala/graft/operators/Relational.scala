package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator coverage (SURVEY.md §2.1–§2.5).
  *
  * Reference semantics (tspurway/hustle, public API — see SURVEY.md
  * provenance warning; the local reference mount was empty): projections,
  * column-vs-literal predicates with `& | ~` combinators, per-table
  * `where`, two-table equi-join, implicit GROUP BY with the five
  * aggregates (sum/count/avg/min/max), `order_by`/`limit`/`distinct`.
  * Everything here compiles to vanilla DataFrame ops so Catalyst provides
  * pushdown, pruning, partial aggregation, and join-strategy selection.
  *
  * Scale notes are attached per query: the dimension tables (region,
  * nation, supplier, part at TPC-H ratios) stay broadcastable at 100 TB;
  * fact-fact joins (orders⋈lineitem) shuffle on the join key, which is
  * the natural co-partitioning for bucketed storage.
  */
object Relational {

  private val ship9809 = expr("timestamp'1998-09-02 00:00:00'")

  val queries: Seq[Q] = Seq(
    // ---- S1 scan + A1..A6 implicit groupBy + O1 sort (TPC-H Q1 shape) ----
    Q(
      "q1_scan_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(ROUND((l_quantity)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_qty,
        |  CAST(SUM(CAST(ROUND((l_extendedprice)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_base_price,
        |  CAST(SUM(CAST(ROUND(((l_extendedprice*(1-l_discount)))*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_disc_price,
        |  CAST(SUM(CAST(ROUND(((l_extendedprice*(1-l_discount)*(1+l_tax)))*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_charge,
        |  CAST(SUM(CAST(ROUND((l_quantity)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0/COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(ROUND((l_discount)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0/COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ship9809)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_base_price"),
          Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          Det.davg(col("l_quantity")).as("avg_qty"),
          Det.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- J1 + A1 + O2 top-k (TPC-H Q3 shape); the bench headline join ----
    // Scale: customer filter is pushed below the join; orders⋈lineitem is the
    // fact-fact shuffle join; customer side is broadcast at dim scale.
    Q(
      "q3_join_agg_topk",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(ROUND(((l_extendedprice*(1-l_discount)))*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS revenue,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    ) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < expr("timestamp'1995-03-15 00:00:00'"))
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- P2/P3/P4 full predicate surface: = != < <= > >= & | ~ isin ----
    Q(
      "q_predicates",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE ((l_quantity >= 30 AND l_discount <= 0.05)
        |       OR (l_returnflag IN ('A','N') AND NOT (l_tax > 0.04)))
        |  AND l_linestatus <> 'X' AND l_suppkey > 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(
          ((col("l_quantity") >= 30 && col("l_discount") <= 0.05)
            || (col("l_returnflag").isin("A", "N") && !(col("l_tax") > 0.04)))
            && col("l_linestatus") =!= "X" && col("l_suppkey") > 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- P5 per-table where + J1 two-table equi-join (hustle's exact join shape) ----
    Q(
      "q_join_per_table_where",
      """SELECT s_name, s_acctbal, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 1000.0 AND n_regionkey <= 3
        |ORDER BY s_name""".stripMargin,
    ) { (s, d) =>
      val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 1000.0)
      val nat = Tables.nation(s, d).filter(col("n_regionkey") <= 3)
      sup.join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .select("s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    },

    // ---- J2 extension: multi-way join through the dim hierarchy ----
    Q(
      "q_multi_join_dims",
      """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CAST(ROUND((c_acctbal)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"), Det.dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy("r_name")
    },

    // ---- J2 extension: left semi join (EXISTS) ----
    Q(
      "q_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    ) { (s, d) =>
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- J2 extension: left anti join (NOT EXISTS) ----
    Q(
      "q_anti_join",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // ---- J2 extension: left outer join, nulls aggregated ----
    Q(
      "q_outer_join",
      """SELECT o_orderstatus,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(l_orderkey) AS BIGINT) AS n_matched
        |FROM orders LEFT JOIN lineitem
        |  ON o_orderkey = l_orderkey AND l_quantity > 45.0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    ) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_quantity") > 45.0, "left")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), count(col("l_orderkey")).as("n_matched"))
        .orderBy("o_orderstatus")
    },

    // ---- J2 extension: FULL outer join — unmatched rows survive from
    // BOTH sides (big-order customers outside the segment, segment
    // customers without big orders), keys coalesced. Same shuffled
    // sort-merge shape as any equi outer join; AQE free to pick the
    // strategy ----
    Q(
      "q_full_outer_join",
      """WITH o AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big
        |  FROM orders WHERE o_totalprice > 150000 GROUP BY 1),
        |c AS (SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_mktsegment = 'BUILDING')
        |SELECT COALESCE(o.o_custkey, c.c_custkey) AS custkey, o.n_big, c.c_acctbal
        |FROM o FULL JOIN c ON o.o_custkey = c.c_custkey
        |ORDER BY custkey""".stripMargin,
    ) { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_totalprice") > 150000)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_acctbal")
      o.join(c, col("o_custkey") === col("c_custkey"), "full")
        .select(coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          col("n_big"), col("c_acctbal"))
        .orderBy("custkey")
    },

    // ---- A7 distinct ----
    Q(
      "q_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- O1/O2 global sort + limit (TakeOrderedAndProject, true top-k) ----
    Q(
      "q_orderby_limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    ) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // ---- A5 min/max + avg per group ----
    Q(
      "q_minmax_agg",
      """SELECT p_brand,
        |  MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price,
        |  CAST(MIN(p_size) AS BIGINT) AS min_size, CAST(MAX(p_size) AS BIGINT) AS max_size,
        |  CAST(SUM(CAST(ROUND((p_retailprice)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0/COUNT(*) AS avg_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    ) { (s, d) =>
      Tables.part(s, d)
        .groupBy("p_brand")
        .agg(
          min("p_retailprice").as("min_price"),
          max("p_retailprice").as("max_price"),
          min("p_size").cast("long").as("min_size"),
          max("p_size").cast("long").as("max_size"),
          Det.davg(col("p_retailprice")).as("avg_price"),
        )
        .orderBy("p_brand")
    },

    // ---- U1 extension: UNION / INTERSECT / EXCEPT (distinct semantics) ----
    Q(
      "q_union",
      """SELECT n FROM (
        |  SELECT c_nationkey AS n FROM customer UNION SELECT s_nationkey AS n FROM supplier
        |) ORDER BY n""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("n"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("n")))
        .distinct()
        .orderBy("n")
    },
    Q(
      "q_intersect",
      """SELECT c_nationkey AS n FROM customer INTERSECT SELECT s_nationkey AS n FROM supplier
        |ORDER BY n""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("n"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("n")))
        .orderBy("n")
    },
    Q(
      "q_except",
      """SELECT c_nationkey AS n FROM customer EXCEPT SELECT s_nationkey AS n FROM supplier
        |ORDER BY n""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("n"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("n")))
        .orderBy("n")
    },

    // ---- A8 extension: rollup / cube (grouping keys coalesced to a
    // sentinel so NULL-ordering dialect differences can't bite) ----
    Q(
      "q_rollup",
      """SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND((l_quantity)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    },
    Q(
      "q_cube",
      """SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"))
        .orderBy("rf", "ls")
    },

    // ---- A8: GROUPING() disambiguation — a real NULL group key vs a
    // super-aggregate row are indistinguishable without it ----
    Q(
      "q_cube_grouping",
      """SELECT COALESCE(l_returnflag,'ALL') AS rf,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, g_rf, g_ls, n""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          col("g_rf"), col("g_ls"), col("n"))
        .orderBy("rf", "g_rf", "g_ls", "n")
    },

    // ---- A8: arbitrary GROUPING SETS (the general form cube/rollup are
    // sugar for) — both engines speak the same SQL here, so the Spark side
    // runs through the SQL surface (GraftSql) ----
    Q(
      "q_grouping_sets",
      """SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND((l_quantity)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    ) { (s, d) =>
      graft.sources.GraftSql.sql(s, d,
        """SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(ROUND(l_quantity*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY rf, ls""".stripMargin)
    },

    // ---- A8: ordered array aggregation (collect_list is unordered by
    // contract in BOTH engines; sorting inside the agg expression is what
    // makes it deterministic and comparable) ----
    Q(
      "q_array_agg",
      """SELECT lang, CAST(len(list(doc_id)) AS BIGINT) AS n_docs,
        |  array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
        |FROM (SELECT lang, doc_id FROM documents WHERE doc_id < 100)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    ) { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .groupBy("lang")
        .agg(
          size(collect_list(col("doc_id"))).cast("long").as("n_docs"),
          array_join(transform(array_sort(collect_list(col("doc_id"))),
            x => x.cast("string")), ",").as("doc_ids"))
        .orderBy("lang")
    },

    // ---- A8: pivot (wide aggregation) — fixed column domain so schema is
    // static; oracle emulates with conditional sums; absent combinations
    // normalized to 0 on both sides ----
    Q(
      "q_pivot",
      """SELECT source,
        |  CAST(SUM(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
        |  CAST(SUM(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
        |  CAST(SUM(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
        |  CAST(SUM(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
        |  CAST(SUM(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    ) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh"))
        .orderBy("source")
    },

    // ---- TPC-H Q5 shape: six-table join (region→nation gating BOTH the
    // supplier and customer sides, date-bounded orders, lineitem fact) —
    // the deep join tree that exercises join ordering + dim broadcasts.
    // The two tiny dims are explicit broadcasts; the three fact-side
    // joins stay AQE-planned equi joins. Revenue through Det.dsum so the
    // double sum is order-independent and engine-exact ----
    Q(
      "q_local_supplier_volume",
      s"""SELECT n_name,
         |  ${graft.Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= DATE '1996-01-01'
         |  AND o_orderdate < DATE '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .filter(expr("o_orderdate >= DATE'1996-01-01'") &&
            expr("o_orderdate < DATE'1997-01-01'")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(graft.Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- ntile quartiles: equal-frequency bucketing of customers by
    // account balance within each market segment — the W1 window-rank
    // family's distribution face. Unique (acctbal, custkey) tie-break
    // makes the bucket assignment engine-identical ----
    Q(
      "q_ntile",
      """WITH q AS (SELECT c_mktsegment,
        |    NTILE(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS quartile,
        |    c_acctbal
        |  FROM customer)
        |SELECT c_mktsegment, CAST(quartile AS BIGINT) AS quartile,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
        |FROM q GROUP BY 1, 2 ORDER BY c_mktsegment, quartile""".stripMargin,
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.customer(s, d)
        .select(col("c_mktsegment"),
          ntile(4).over(Window.partitionBy("c_mktsegment")
            .orderBy(col("c_acctbal"), col("c_custkey"))).cast("long")
            .as("quartile"),
          col("c_acctbal"))
        .groupBy("c_mktsegment", "quartile")
        .agg(count(lit(1)).as("n"),
          min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
        .orderBy("c_mktsegment", "quartile")
    },

    // ---- unpivot (melt): wide per-lang metrics back to long
    // (lang, metric, value) — the inverse reshape of q_pivot, via the
    // native Dataset.unpivot (Catalyst Expand: one pass, rows × metrics
    // output, no shuffle beyond the source aggregate). Oracle is the
    // portable UNION ALL formulation ----
    Q(
      "q_unpivot",
      """WITH w AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        |  FROM documents GROUP BY lang)
        |SELECT lang, metric, value FROM (
        |  SELECT lang, 'n_docs' AS metric, n_docs AS value FROM w
        |  UNION ALL SELECT lang, 'n_sources', n_sources FROM w
        |  UNION ALL SELECT lang, 'total_chars', total_chars FROM w)
        |ORDER BY lang, metric""".stripMargin,
    ) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("total_chars"),
          countDistinct(col("source")).as("n_sources"))
        .unpivot(Array(col("lang")),
          Array(col("n_docs"), col("total_chars"), col("n_sources")),
          "metric", "value")
        .orderBy("lang", "metric")
    },

    // ---- §2.6 extension: scalar functions (string) ----
    Q(
      "q_string_funcs",
      """SELECT p_partkey,
        |  SUBSTRING(p_name, 1, 8) AS name8,
        |  UPPER(p_brand) AS brand_u,
        |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        |  p_brand || '/' || p_type AS brand_type
        |FROM part WHERE p_size >= 40 ORDER BY p_partkey""".stripMargin,
    ) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_size") >= 40)
        .select(
          col("p_partkey"),
          substring(col("p_name"), 1, 8).as("name8"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        )
        .orderBy("p_partkey")
    },

    // ---- §2.6 extension: date parts + computed projections + CASE WHEN ----
    Q(
      "q_date_parts",
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(ROUND((o_totalprice)*1000000.0, 0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_price
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mon""".stripMargin,
    ) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"))
        .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("yr", "mon")
    },
    Q(
      "q_case_when",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY bucket, o_orderpriority""".stripMargin,
    ) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large").as("bucket"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket", "o_orderpriority")
    },

    // ---- SQL surface: same engine, SQL text in — correlated IN subquery
    // (beyond the reference's DSL, free via Catalyst decorrelation) ----
    Q(
      "q_sql_in_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |  AND o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      graft.sources.GraftSql.sql(s, d,
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          |  AND o_orderstatus = 'F'
          |ORDER BY o_orderkey""".stripMargin)
    },

    // ---- correlated EXISTS (plans as a left-semi join) ----
    Q(
      "q_sql_exists",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    ) { (s, d) =>
      graft.sources.GraftSql.sql(s, d,
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin)
    },

    // ---- scalar subquery threshold (MAX is exact in IEEE, so the
    // boundary is bit-identical cross-engine — an AVG threshold would
    // drift in ulps) ----
    Q(
      "q_sql_scalar_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.9
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      graft.sources.GraftSql.sql(s, d,
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.9
          |ORDER BY o_orderkey""".stripMargin)
    },

    // ---- row-level computed projection (no agg): IEEE double arithmetic
    // is bit-identical across engines, so no Det needed ----
    Q(
      "q_computed_projection",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS net_price,
        |  l_quantity * 2.5 + 1.0 AS adj_qty
        |FROM lineitem WHERE l_quantity > 49.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 49.0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
          (col("l_quantity") * lit(2.5) + lit(1.0)).as("adj_qty"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- RFM customer segmentation: recency / frequency / monetary
    // quartiles over the per-customer order aggregate, reported per
    // segment. NTILE(4) over a (value, custkey) TOTAL order is
    // deterministic and engine-identical (both engines deal remainder
    // rows to the leading buckets); monetary is integer micros. The
    // quartile windows are global sorts — but over the CUSTOMER-level
    // aggregate (three orders of magnitude below fact-row count); at
    // 100 TB the cut points come from approx_percentile instead (same
    // trade documented on q_mad_outliers / q_percentile) ----
    Q(
      "q_rfm_segments",
      """WITH rfm AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(MAX(o_orderdate) AS DATE)) AS BIGINT) AS r_days,
        |    CAST(COUNT(*) AS BIGINT) AS freq,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS m_mic
        |  FROM orders GROUP BY 1),
        |seg AS (
        |  SELECT custkey, m_mic,
        |    NTILE(4) OVER (ORDER BY r_days, custkey) AS r_q,
        |    NTILE(4) OVER (ORDER BY freq, custkey) AS f_q,
        |    NTILE(4) OVER (ORDER BY m_mic, custkey) AS m_q
        |  FROM rfm)
        |SELECT CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) ||
        |    CAST(m_q AS VARCHAR) AS segment,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(m_mic) AS BIGINT) AS m_mic_total
        |FROM seg GROUP BY 1 ORDER BY segment""".stripMargin,
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val rfm = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(
          datediff(to_date(max(col("o_orderdate"))),
            lit("1970-01-01").cast("date")).cast("long").as("r_days"),
          count(lit(1)).as("freq"),
          sum(floor(col("o_totalprice") * 1000000.0 + 0.5).cast("long")).as("m_mic"))
      rfm
        .withColumn("r_q", ntile(4).over(Window.orderBy("r_days", "custkey")))
        .withColumn("f_q", ntile(4).over(Window.orderBy("freq", "custkey")))
        .withColumn("m_q", ntile(4).over(Window.orderBy("m_mic", "custkey")))
        .groupBy(concat(col("r_q").cast("string"), col("f_q").cast("string"),
          col("m_q").cast("string")).as("segment"))
        .agg(count(lit(1)).as("n_customers"), sum("m_mic").as("m_mic_total"))
        .orderBy("segment")
    },

    // ---- RANGE window frame (value-based, not row-based): 7-day trailing
    // spend per customer at every order — the W1 family's time-window
    // face. A RANGE frame is keyed on the ORDER BY VALUE (epoch days), so
    // same-day ties enter the frame together and the result is
    // deterministic without a unique tie-break; the rows-based
    // formulation would be order-dependent on ties. One key-partitioned
    // window (hash exchange on custkey, linear); sums are integer micros ----
    Q(
      "q_window_range_frame",
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |    CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS BIGINT) AS p_mic
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, day,
        |  CAST(SUM(p_mic) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS trail7d_mic,
        |  CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS trail7d_n
        |FROM o ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("day"),
        floor(col("o_totalprice") * 1000000.0 + 0.5).cast("long").as("p_mic"))
      val w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-6, 0)
      o.select(col("o_orderkey"), col("o_custkey"), col("day"),
          sum(col("p_mic")).over(w).as("trail7d_mic"),
          count(lit(1)).over(w).as("trail7d_n"))
        .orderBy("o_orderkey")
    },

    // ---- market-basket association rules (Agrawal/Srikant shape) over
    // order baskets: part pairs co-purchased in the same order, with
    // support, both confidences, and lift in integer micros. The pair
    // generator is a SELF-JOIN ON THE ORDER KEY — baskets are O(lines
    // per order) wide, so pairs are ≤ C(7,2) per order: linear in the
    // fact table, never in the item vocabulary (the a-priori trick is
    // unnecessary when the basket width is bounded; at unbounded widths
    // the per-basket pair explode gets the same cap-and-salt treatment
    // as the LSH hot buckets). Ratios divide exact BIGINTs in
    // fixed-shape double expressions — engine-portable ----
    Q(
      "basket_association_rules",
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM b),
        |s AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS supp FROM b GROUP BY pk),
        |p AS (SELECT a.pk AS part_a, b2.pk AS part_b,
        |        CAST(COUNT(*) AS BIGINT) AS supp_ab
        |      FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT part_a, part_b, supp_ab,
        |  CAST(FLOOR(supp_ab * 1000000.0 / sa.supp + 0.5) AS BIGINT) AS conf_ab_mic,
        |  CAST(FLOOR(supp_ab * 1000000.0 / sb.supp + 0.5) AS BIGINT) AS conf_ba_mic,
        |  CAST(FLOOR(CAST(supp_ab * n.n_orders AS DOUBLE) * 1000000.0
        |    / CAST(sa.supp * sb.supp AS DOUBLE) + 0.5) AS BIGINT) AS lift_mic
        |FROM p JOIN s sa ON sa.pk = part_a JOIN s sb ON sb.pk = part_b
        |CROSS JOIN n
        |ORDER BY lift_mic DESC, part_a, part_b LIMIT 50""".stripMargin,
    ) { (s, d) =>
      // the deduplicated basket table feeds three consumers (order count,
      // item supports, basket arrays); its distinct aggregate's exchange
      // canonicalizes identically for all of them, so ReuseExchange
      // shuffles lineitem's (ok, pk) projection ONCE and no state is
      // pinned in the block manager (the former localCheckpoint was this
      // row's heap-pressure sensitivity: +59% at 8g vs 24g in-suite)
      val b = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val nOrders = b.agg(countDistinct(col("ok")).as("n_orders"))
      val supp = b.groupBy("pk").agg(count(lit(1)).as("supp"))
      // pair generation INLINE from per-order sorted arrays — the packed
      // 64-bit combination explode proven in GraphOps.resourceAllocation
      // TopPairs: half the work of the ok-keyed self-join (emits only
      // i<j), 8-byte aggregate keys, one less shuffle of the basket
      // table. Baskets are ≤ lines-per-order wide, so the explode is a
      // bounded ≤ C(7,2) fan-out — no repartition sizing needed.
      val pairs = b.groupBy("ok")
        .agg(array_sort(collect_list(col("pk"))).as("ps"))
        // spread the basket table before the fan-out (AQE's byte-bound
        // coalesce would explode + partial-aggregate on ~1 partition)
        .repartition(s.sparkContext.defaultParallelism)
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps) - i - 1), " +
            "y -> shiftleft(x, 32) + y)))")).as("pr"))
        .groupBy("pr").agg(count(lit(1)).as("supp_ab"))
        .filter(col("supp_ab") >= 2)
        .select(expr("shiftrightunsigned(pr, 32)").as("part_a"),
          expr("pr & 4294967295").as("part_b"), col("supp_ab"))
      pairs
        .join(supp.select(col("pk").as("part_a"), col("supp").as("sa")), "part_a")
        .join(supp.select(col("pk").as("part_b"), col("supp").as("sb")), "part_b")
        .crossJoin(broadcast(nOrders))
        .select(col("part_a"), col("part_b"), col("supp_ab"),
          floor(col("supp_ab") * 1000000.0 / col("sa") + 0.5).cast("long")
            .as("conf_ab_mic"),
          floor(col("supp_ab") * 1000000.0 / col("sb") + 0.5).cast("long")
            .as("conf_ba_mic"),
          floor((col("supp_ab") * col("n_orders")).cast("double") * 1000000.0
            / (col("sa") * col("sb")).cast("double") + 0.5).cast("long")
            .as("lift_mic"))
        .orderBy(col("lift_mic").desc, col("part_a"), col("part_b"))
        .limit(50)
    },

    // ---- MULTISET set ops (EXCEPT ALL / INTERSECT ALL): bag semantics
    // the distinct-based U1 trio can't express — multiplicities survive
    // (a part shipped 3× in 1996 and 1× in 1997 keeps 2 copies). Spark
    // plans both as one Expand + keyed count aggregate + Generate — a
    // single shuffle on the compared columns, no join, linear at any
    // scale. Output is the raw multiset; sorting by all columns gives a
    // canonical duplicate-preserving order for the hash compare ----
    Q(
      "q_except_all",
      """SELECT l_partkey FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
        |  AND l_shipdate < DATE '1997-01-01'
        |EXCEPT ALL
        |SELECT l_partkey FROM lineitem WHERE l_shipdate >= DATE '1997-01-01'
        |  AND l_shipdate < DATE '1998-01-01'
        |ORDER BY l_partkey""".stripMargin,
    ) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val a = li.filter(expr("l_shipdate >= DATE'1996-01-01'") &&
        expr("l_shipdate < DATE'1997-01-01'")).select("l_partkey")
      val b = li.filter(expr("l_shipdate >= DATE'1997-01-01'") &&
        expr("l_shipdate < DATE'1998-01-01'")).select("l_partkey")
      a.exceptAll(b).orderBy("l_partkey")
    },
    Q(
      "q_intersect_all",
      """SELECT l_partkey FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
        |  AND l_shipdate < DATE '1997-01-01'
        |INTERSECT ALL
        |SELECT l_partkey FROM lineitem WHERE l_shipdate >= DATE '1997-01-01'
        |  AND l_shipdate < DATE '1998-01-01'
        |ORDER BY l_partkey""".stripMargin,
    ) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val a = li.filter(expr("l_shipdate >= DATE'1996-01-01'") &&
        expr("l_shipdate < DATE'1997-01-01'")).select("l_partkey")
      val b = li.filter(expr("l_shipdate >= DATE'1997-01-01'") &&
        expr("l_shipdate < DATE'1998-01-01'")).select("l_partkey")
      a.intersectAll(b).orderBy("l_partkey")
    },
  )
}
