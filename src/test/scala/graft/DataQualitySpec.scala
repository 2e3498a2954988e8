package graft

import graft.operators.DataQuality
import graft.operators.DataQuality.RowCheck
import org.apache.spark.sql.functions._

/** Constraint-audit semantics on synthetic data with KNOWN violations. */
class DataQualitySpec extends SparkSpec {

  import spark.implicits._

  test("rowCheckReport counts each check independently in one pass") {
    val df = Seq(
      (Some(1L), "ok", 5.0),
      (None, "ok", -1.0),
      (Some(3L), "bad", 0.0),
      (Some(4L), "ok", 2.0),
    ).toDF("id", "status", "v")
    val rep = DataQuality.rowCheckReport(df, Seq(
      RowCheck("id.not_null", col("id").isNull),
      RowCheck("status.domain", !col("status").isin("ok")),
      RowCheck("v.positive", col("v") <= 0.0),
    )).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep === Map("id.not_null" -> 1L, "status.domain" -> 1L, "v.positive" -> 2L))
    // one aggregate over the table: the report plan has exactly one scan
    val plan = DataQuality.rowCheckReport(df, Seq(
      RowCheck("a", col("id").isNull), RowCheck("b", col("v") <= 0.0)))
      .queryExecution.optimizedPlan.toString
    assert(plan.split("\n").count(_.contains("LocalRelation")) == 1)
  }

  test("exact profile pins nondeterministic lineage BELOW the root so every branch sees the same rows") {
    // the r16 advisor's exact hole: rand() in a Filter under a clean
    // Project — the root's expressions are deterministic, so a root-only
    // gate re-executes the sample per column and the branches disagree
    val df = graft.Tables.orders(spark, sf0001)
      .filter(rand() < 0.5)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val nRows = DataQuality
      .profile(df, Seq("o_orderkey", "o_custkey", "o_totalprice"), exact = true)
      .select("n_rows").collect().map(_.getLong(0)).distinct
    assert(nRows.length == 1,
      s"branches profiled different row sets: n_rows ∈ ${nRows.mkString(",")}")
  }

  test("uniqueReport counts duplicated keys, not duplicated rows") {
    val df = Seq(1L, 2L, 2L, 2L, 3L, 3L, 4L).toDF("k")
    val rep = DataQuality.uniqueReport(df, "k", "k.unique").collect().head
    assert(rep.getString(0) === "k.unique")
    assert(rep.getLong(1) === 2L) // keys 2 and 3 are duplicated
  }

  test("fkReport counts orphaned child rows") {
    val child = Seq((1L, "a"), (2L, "b"), (9L, "c"), (9L, "d")).toDF("fk", "x")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val rep = DataQuality.fkReport(child, "fk", parent, "pk", "fk.ok").collect().head
    assert(rep.getLong(1) === 2L) // both fk=9 rows are orphans
  }

  test("dq_checks fixture row: acctbal check has real violations, rest pass") {
    val rows = SparkEntry.queries("dq_checks")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.size === 6)
    val (acctViol, acctPass) = rows("customer.c_acctbal.non_negative")
    assert(acctViol > 0L && !acctPass)
    (rows - "customer.c_acctbal.non_negative").foreach { case (name, (v, p)) =>
      assert(v === 0L && p, s"$name expected clean")
    }
  }

  test("profile_table: distinct key count equals row count, no nulls") {
    val rows = SparkEntry.queries("profile_table")(spark, sf0001).collect()
    assert(rows.length === 5)
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    val nRows = byCol("o_orderkey").getLong(1)
    assert(nRows > 0)
    rows.foreach { r =>
      assert(r.getLong(1) === nRows)      // same n_rows on every line
      assert(r.getLong(2) === 0L)         // fixture has no nulls
      assert(r.getLong(3) > 0L)           // n_distinct
    }
    assert(byCol("o_orderkey").getLong(3) === nRows) // key is unique
    assert(byCol("o_orderstatus").getLong(3) <= 3L)
  }

  test("kAnonymize suppresses exactly the groups smaller than k") {
    import spark.implicits._
    // groups: ('a','x') ×3, ('a','y') ×2, ('b','x') ×1
    val df = Seq(
      ("a", "x", 1), ("a", "x", 2), ("a", "x", 3),
      ("a", "y", 4), ("a", "y", 5),
      ("b", "x", 6),
    ).toDF("q1", "q2", "v")
    def ids(k: Int) = graft.operators.DataQuality
      .kAnonymize(df, Seq($"q1", $"q2"), k)
      .collect().map(_.getInt(2)).toSet
    assert(ids(1) == Set(1, 2, 3, 4, 5, 6)) // k=1 releases everything
    assert(ids(2) == Set(1, 2, 3, 4, 5))    // the singleton is suppressed
    assert(ids(3) == Set(1, 2, 3))
    assert(ids(4) == Set.empty)
  }

  test("dq_completeness: expected = actual + missing; sparse fixture has gaps") {
    val rows = SparkEntry.queries("dq_completeness")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5)
    rows.foreach { case (t, exp, act, miss) =>
      assert(exp == act + miss, s"$t: $exp != $act + $miss")
      assert(act >= 1L)
    }
    // 1000 events can't fill 5 types × the full hour span: gaps must show
    assert(rows.map(_._4).sum > 0L, "sparse fixture must report missing hours")
  }

  test("psiDrift: identical populations score zero, planted shift is loud") {
    import graft.operators.DataQuality
    // identical A/B per bucket → p_a == p_b → every contribution exactly 0
    val same = (0 until 40).map(i => (i.toLong % 4, (i / 4) % 2 == 0))
      .toDF("b", "a")
    val zero = DataQuality.psiDrift(same, col("b"), col("a"), buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(zero.forall { case (_, na, nb, psi) => na == nb && psi == 0L })
    // planted shift: A all in bucket 0, B all in bucket 3 → both buckets
    // carry large positive contributions (PSI contributions are
    // sign-symmetric: (pa-pb)ln(pa/pb) > 0 whenever pa != pb)
    val shifted = ((0 until 20).map(_ => (0L, true)) ++
      (0 until 20).map(_ => (3L, false))).toDF("b", "a")
    val drift = DataQuality.psiDrift(shifted, col("b"), col("a"), buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(drift(0L) > 250000L && drift(3L) > 250000L,
      s"planted shift must exceed the 0.25 action threshold per bucket: $drift")
    // out-of-range buckets clamp instead of dropping rows
    val clamped = DataQuality.psiDrift(
      Seq((-5L, true), (99L, false)).toDF("b", "a"), col("b"), col("a"), buckets = 4)
      .collect().map(_.getLong(0)).toSet
    assert(clamped == Set(0L, 3L))
  }

  test("correlationMatrix: exact linear data hits ±1, zero variance is NULL") {
    val df = (1 to 20).map(i => (i.toDouble, 2.0 * i, 100.0 - 3.0 * i, 7.0))
      .toDF("x", "y", "z", "k")
    val m = DataQuality.correlationMatrix(df, Seq(
      "x" -> 1000000.0, "y" -> 1000000.0, "z" -> 1000000.0, "k" -> 1000000.0))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(m.size === 6)
    assert(math.abs(m(("x", "y")).get - 1000000L) <= 1L)
    assert(math.abs(m(("x", "z")).get + 1000000L) <= 1L)
    assert(math.abs(m(("y", "z")).get + 1000000L) <= 1L)
    // constant column: zero variance on one side -> NULL, never a crash
    assert(m(("x", "k")) === None)
    assert(m(("y", "k")) === None)
    assert(m(("z", "k")) === None)
  }

  test("chi2Independence: exact independence scores zero, diagonal dependence is loud") {
    // 2x2 with margins 10/20 x 24/6 over N=30: every expected count is
    // integral and equals the observed count -> chi2 contributions all 0.
    val indep = (Seq.fill(8)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(16)(("b", "x")) ++ Seq.fill(4)(("b", "y"))).toDF("r", "c")
    val zero = DataQuality.chi2Independence(indep, col("r"), col("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(zero.length === 4)
    zero.foreach { case (_, _, nObs, expMic, chi2) =>
      assert(expMic === nObs * 1000000L)
      assert(chi2 === 0L)
    }
    // perfectly dependent diagonal: both observed cells deviate hard
    val dep = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("r", "c")
    val loud = DataQuality.chi2Independence(dep, col("r"), col("c"))
      .collect().map(r => r.getLong(4))
    assert(loud.forall(_ > 0L), loud.mkString(","))
  }
}
