package graft

/** The weekly-tier lifecycle rows (full streaming runs, train-then-serve
  * loops, incremental-maintenance epochs) are skipped by the per-round
  * Bench — their serving-path twins carry the perf signal — but they must
  * keep RUNNING somewhere cheap every round. Verify still oracle-checks
  * them at sf0.01; this spec pins them at sf0.001 so a broken lifecycle
  * fails the test suite too, not just the slower correctness gate.
  */
class WeeklyTierSpec extends SparkSpec {

  private val weekly = SparkEntry.allQ.filter(_.weekly)

  test("weekly tier is exactly the known lifecycle/variant rows") {
    // r16 adds the two algorithm-variant twins the r15 verdict named:
    // dedup_components_star (same oracle as dedup_components) and
    // catalog_zorder_3d (same layout discipline as catalog_zorder_prune)
    assert(weekly.map(_.name).sorted === Seq(
      "bpe_corpus_tokens", "catalog_incremental_agg", "catalog_zorder_3d",
      "dedup_components_star", "stream_dedup_embedding",
      "stream_upsert_merge", "wordpiece_encode"))
    // every weekly row is oracle-checked (never rows-only): down-tiering
    // the bench cadence must not weaken the correctness gate
    assert(weekly.forall(_.oracle.isDefined))
  }

  weekly.foreach { q =>
    test(s"lifecycle row ${q.name} still runs end-to-end (sf0.001)") {
      assert(q.run(spark, sf0001).count() > 0)
    }
  }
}
