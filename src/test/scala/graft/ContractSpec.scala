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
    // 110 query entries as of late round 5 (101 + ann_pq + q_skew_join
    // + q_bloom_semi + dedup_survivors_inc + text_repetition
    // + vec_label_centroid + text_source_overlap + ev_hopping_agg
    // + q_equidepth + ev_gap_fill + text_fuzzy_pairs + ev_paths
    // + q_ntile_by_group + text_topk_by_source + mm_resize
    // + q_decile_share); update alongside SURVEY §2.
    assert(SparkEntry.queries.size === 117, s"got ${SparkEntry.queries.size}")
  }
}
