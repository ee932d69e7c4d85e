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
    // 153 query entries (144 at the round-6 second batch + the third
    // batch's graph_triangles + graph_label_prop + text_dedup_spans +
    // text_winnow + csv_ingest + jsonl_ingest + orc_ingest +
    // ev_hopping_users + validate_version_diff); update alongside
    // SURVEY §2 when adding a query.
    assert(SparkEntry.queries.size === 153, s"got ${SparkEntry.queries.size}")
  }
}
