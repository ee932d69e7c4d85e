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
    // 101 query entries as of round 5 (round-4's 94 + text_bpe_vocab +
    // text_bpe_encode + text_decontaminate + text_mixture_resample +
    // text_pack_contexts + ev_outliers + ev_value_histogram); update
    // alongside SURVEY §2.
    assert(SparkEntry.queries.size === 101, s"got ${SparkEntry.queries.size}")
  }
}
