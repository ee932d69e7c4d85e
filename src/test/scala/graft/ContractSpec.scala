package graft

/** Driver-contract wiring guards: catch entry/oracle mismatches in the
  * spec suite instead of in the driver's correctness run. */
class ContractSpec extends SparkSpec {

  test("every oracle SQL entry has a matching query entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("flagship entry returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query count matches the SURVEY inventory claim") {
    // 84 query entries as of round 4 (71 + q6/q10/q14/q15/q18/q19 +
    // mm_video_frames + q_window_nav + q_stats_family + dedup_corpus +
    // ann_sq8 + ev_retention + validate_referential); update alongside
    // SURVEY §2.
    assert(SparkEntry.queries.size === 84, s"got ${SparkEntry.queries.size}")
  }
}
