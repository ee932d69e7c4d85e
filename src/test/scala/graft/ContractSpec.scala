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
    // 129 query entries (117 at end of round 5 + ann_ivf_pq
    // + ev_stream_sessions + ev_stream_merge + text_decontaminate_chars
    // + vec_hard_negatives + text_stratified_split + dedup_cluster_sizes
    // + mm_keyframes + text_ngram_lm + ev_asof_tolerance
    // + text_collocations + text_compress_ratio
    // + text_quality_classifier + ev_stream_dedup + ev_stream_join
    // + dedup_stats + validate_drift + text_pipeline_corpus); update
    // alongside SURVEY §2 when adding a query.
    assert(SparkEntry.queries.size === 135, s"got ${SparkEntry.queries.size}")
  }
}
