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
    // 156 query entries (153 at round 6 + round 7's
    // graph_pagerank_weighted + retrieval_rrf + ann_ivf_stored);
    // update alongside SURVEY §2 when adding a query.
    assert(SparkEntry.queries.size === 156, s"got ${SparkEntry.queries.size}")
  }
}
