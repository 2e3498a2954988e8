package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** AsOfJoin contract: latest right.ts <= left.ts per key, DuckDB/pandas
  * ASOF NULL semantics, reserved-name and orderability validation.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def leftDf = Seq(
    (1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 10L, "l3"),
  ).toDF("k", "ts", "ltag")

  private def rightDf = Seq(
    (1L, 5L, "r5"), (1L, 20L, "r20"), (2L, 30L, "r30"),
  ).toDF("k", "ts", "pay")

  test("asOf attaches the latest right row at-or-before each left ts") {
    val out = AsOfJoin.asOf(leftDf, rightDf, "k", "ts", "ts", Seq("pay"))
      .select(col("ltag"), col("asof.pay").as("pay"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("l1" -> Some("r5"), "l2" -> Some("r20"), "l3" -> None))
  }

  test("asOf drops NULL-ts and NULL-key right rows instead of matching them") {
    val right = Seq(
      (Some(1L), Some(100L), "late"),         // after every left row: no match
      (Some(1L), None: Option[Long], "nullts"), // must never be carried
      (None: Option[Long], Some(1L), "nullkey"),
    ).toDF("k", "ts", "pay")
    val out = AsOfJoin.asOf(leftDf, right, "k", "ts", "ts", Seq("pay"))
      .select(col("ltag"), col("asof.pay").as("pay")).collect()
    assert(out.forall(_.isNullAt(1)), "NULL-ts/key right rows leaked into matches")
    // the same guarantee must hold in EVERY scan direction: a NULL-ts
    // right row sorts first under both asc and desc_nulls_first orders,
    // so without the drop it would be carried as a phantom match
    for (dir <- Seq("forward", "nearest")) {
      val o = AsOfJoin.asOf(leftDf,
        right.filter(col("pay") =!= "late"), // keep only the poison rows
        "k", "ts", "ts", Seq("pay"), direction = dir)
        .select(col("ltag"), col("asof.pay").as("pay")).collect()
      assert(o.forall(_.isNullAt(1)),
        s"NULL-ts/key right rows leaked into $dir matches")
    }
  }

  test("asOf preserves NULL-ts / NULL-key left rows with a NULL payload") {
    val left = Seq(
      (Some(1L), Some(10L), "ok"),
      (Some(1L), None: Option[Long], "nullts"),
      (None: Option[Long], Some(10L), "nullkey"),
    ).toDF("k", "ts", "ltag")
    val out = AsOfJoin.asOf(left, rightDf, "k", "ts", "ts", Seq("pay"))
      .select(col("ltag"), col("asof.pay").as("pay"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("ok" -> Some("r5"), "nullts" -> None, "nullkey" -> None))
  }

  test("asOf rejects reserved internal column names") {
    val bad = leftDf.withColumn("__graft_asof_k", lit(1))
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asOf(bad, rightDf, "k", "ts", "ts", Seq("pay"))
    }
  }

  test("asOf rejects unorderable (map) payload columns at plan time") {
    val right = rightDf.withColumn("m", map(lit("a"), lit(1)))
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asOf(leftDf, right, "k", "ts", "ts", Seq("pay", "m"))
    }
  }

  test("asOf forward: earliest right at-or-after; inclusive tie; tail unmatched") {
    val left = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 14L, "c"),
      (1L, 25L, "d")).toDF("k", "ts", "ltag")
    val right = Seq((1L, 10L, "x"), (1L, 20L, "y")).toDF("k", "ts", "pay")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "ts", Seq("pay"),
        direction = "forward")
      .select(col("ltag"), col("asof.pay").as("pay"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("a" -> Some("x"), "b" -> Some("x"), // ts 10 inclusive
      "c" -> Some("y"), "d" -> None))
  }

  test("asOf nearest: closer side wins, equidistant ties backward, tolerance gates both") {
    val left = Seq((1L, 5L, "a"), (1L, 14L, "b"), (1L, 15L, "c"),
      (1L, 16L, "d"), (1L, 25L, "e")).toDF("k", "ts", "ltag")
    val right = Seq((1L, 10L, "x"), (1L, 20L, "y")).toDF("k", "ts", "pay")
    val near = AsOfJoin.asOf(left, right, "k", "ts", "ts", Seq("pay"),
        direction = "nearest")
      .select(col("ltag"), col("asof.pay").as("pay"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(near == Map("a" -> Some("x"), "b" -> Some("x"),
      "c" -> Some("x"), // 15 is 5 from both: tie → backward
      "d" -> Some("y"), "e" -> Some("y")))
    val tol = AsOfJoin.asOf(left, right, "k", "ts", "ts", Seq("pay"),
        direction = "nearest", tolerance = Some(lit(4L)))
      .select(col("ltag"), col("asof.pay").as("pay"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(tol == Map("a" -> None, // gap 5 > 4 both ways
      "b" -> Some("x"), // gap 4 — tolerance is inclusive
      "c" -> None, "d" -> Some("y"), "e" -> None))
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, "k", "ts", "ts", Seq("pay"), direction = "sideways")
    }
  }

  test("asOf forward/nearest preserve NULL-ts and NULL-key left rows with NULL payload") {
    val left = Seq(
      (Some(1L), Some(10L), "ok"),
      (Some(1L), None: Option[Long], "nullts"),
      (None: Option[Long], Some(10L), "nullkey"),
    ).toDF("k", "ts", "ltag")
    for (dir <- Seq("forward", "nearest")) {
      val out = AsOfJoin.asOf(left, rightDf, "k", "ts", "ts", Seq("pay"),
          direction = dir)
        .select(col("ltag"), col("asof.pay").as("pay"))
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      // forward from ts 10 → r20; nearest from 10 → r5 (gap 5 < 10)
      val okPay = if (dir == "forward") "r20" else "r5"
      assert(out == Map("ok" -> Some(okPay), "nullts" -> None, "nullkey" -> None),
        s"direction=$dir: $out")
    }
  }

  test("asOf backward tolerance nulls out stale matches only") {
    val out = AsOfJoin.asOf(leftDf, rightDf, "k", "ts", "ts", Seq("pay"),
        tolerance = Some(lit(3L)))
      .select(col("ltag"), col("asof.pay").as("pay"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // l1 at 10 matched r5 at 5: gap 5 > 3 → nulled; l2 at 20 matched r20: gap 0
    assert(out == Map("l1" -> None, "l2" -> Some("r20"), "l3" -> None))
  }

  test("rangeJoin: inclusive start, exclusive end, multi-bucket spans, no dupes") {
    import graft.operators.RangeJoin
    val points = Seq(0L, 10L, 99L, 100L, 250L, 399L, 400L).toDF("p")
    val intervals = Seq(
      (1L, 10L, 100L),  // within one bucket (width 100)
      (2L, 100L, 400L), // spans 3 buckets
      (3L, 0L, 1L),     // single-point interval
      (4L, 50L, 50L),   // empty interval: matches nothing
      (5L, 900L, 0L),   // inverted: must be dropped, not exploded descending
    ).toDF("iv", "s", "e")
    val got = RangeJoin.rangeJoin(points, "p", intervals, "s", "e", 100L)
      .select("iv", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // each match exactly once; 10 in [10,100), 99 in [10,100), 100/250/399
    // in [100,400), 400 excluded (end-exclusive), 0 in [0,1)
    assert(got.sorted == Seq((1L, 10L), (1L, 99L), (2L, 100L), (2L, 250L),
      (2L, 399L), (3L, 0L)))
  }

  test("rangeJoinKeyed: equi key bounds candidates, matches keyed naive join") {
    import graft.operators.RangeJoin
    val points = Seq((1L, 10L), (1L, 150L), (2L, 10L), (2L, 350L), (3L, 10L))
      .toDF("pk", "p")
    val intervals = Seq(
      (1L, 0L, 100L),   // key 1: catches its own p=10 only
      (2L, 0L, 400L),   // key 2: spans 4 buckets, catches 10 and 350
      (9L, 0L, 400L),   // key with no points: matches nothing
    ).toDF("ik", "s", "e")
    val got = RangeJoin.rangeJoinKeyed(points, "p", "pk",
        intervals, "s", "e", "ik", 100L)
      .select("ik", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // key 3 has no interval; key 1's p=150 is out of range — the same-time
    // point of ANOTHER key (p=10 under key 3) must NOT leak across keys
    assert(got.sorted == Seq((1L, 10L), (2L, 10L), (2L, 350L)))
  }

  test("rangeJoinKeyed: shared column names across sides resolve (r18 advisor)") {
    import graft.operators.RangeJoin
    // the NATURAL caller: both sides key by the same name, and the points
    // side even carries a column named like the interval start — bare-name
    // resolution used to throw an ambiguous-reference AnalysisException
    val points = Seq((1L, 10L, 777L), (2L, 350L, 777L))
      .toDF("user_id", "p", "s")
    val intervals = Seq((1L, 0L, 100L), (2L, 300L, 400L))
      .toDF("user_id", "s", "e")
    val got = RangeJoin.rangeJoinKeyed(points, "p", "user_id",
        intervals, "s", "e", "user_id", 100L)
      .select(col("p")).collect().map(_.getLong(0)).toSeq
    assert(got.sorted == Seq(10L, 350L))
    // unkeyed form too: points column name colliding with interval bounds
    val got2 = RangeJoin.rangeJoin(points, "p", intervals, "s", "e", 100L)
      .select(col("p"), col("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2.sorted == Seq((10L, 100L), (350L, 400L)))
  }

}
