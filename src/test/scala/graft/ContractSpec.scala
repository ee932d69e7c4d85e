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
    // 144 query entries (135 at start of round 6 + text_bm25 + ev_cusum
    // + graph_pagerank + dedup_semantic + vec_mmr + text_containment
    // + ev_scd2 + mm_phash_dedup + mm_audio_fp_dedup); update alongside
    // SURVEY §2 when adding a query.
    assert(SparkEntry.queries.size === 144, s"got ${SparkEntry.queries.size}")
  }
}
