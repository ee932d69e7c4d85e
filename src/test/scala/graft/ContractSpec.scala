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
    // 94 query entries as of round 5 (round-4's 84 + the final six TPC-H
    // shapes q2/q9/q11/q16/q20/q21 + ev_session_window + q_grouping_sets
    // + ann_ivf_sq8 + knn_classify_ivf); update alongside SURVEY §2.
    assert(SparkEntry.queries.size === 94, s"got ${SparkEntry.queries.size}")
  }
}
