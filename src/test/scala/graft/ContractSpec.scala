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

  test("events ts normalization accepts both long-nanos and timestamp layouts") {
    // The testdata has shipped `ts` both as raw epoch-nanos BIGINT and
    // as TIMESTAMP(MICROS); every consumer goes through
    // TableLoader.normalizeEventTs, which must produce the identical
    // (ts TIMESTAMP, ts_us BIGINT) pair from either physical layout.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    import spark.implicits._
    val us = Seq(1700000000000000L, 1700000123456789L)
    val longNanos = us.map(_ * 1000L).toDF("ts").withColumn("user_id", lit(1L))
    val tsMicros = us.toDF("us").select(timestamp_micros(col("us")).as("ts"), lit(1L).as("user_id"))
    val a = graft.sources.TableLoader.normalizeEventTs(longNanos)
    val b = graft.sources.TableLoader.normalizeEventTs(tsMicros)
    for (df <- Seq(a, b)) {
      assert(df.schema("ts").dataType === TimestampType)
      assert(df.schema("ts_us").dataType === LongType)
    }
    val ua = a.select("ts_us").as[Long].collect().sorted
    val ub = b.select("ts_us").as[Long].collect().sorted
    assert(ua.toSeq === us.sorted && ub.toSeq === us.sorted)
  }

  test("query count matches the SURVEY inventory claim") {
    // SURVEY §2 is the coverage contract: every driver query entry has
    // exactly one checked `[q]`/`[q+o]` line there (r11 closed the
    // last off-by-one — ev_streaming_parity now has its own line), so
    // the pin is read FROM the document instead of a hand-updated
    // number that can drift from it.
    // Resolve from the repo root, not the CWD: a forked test JVM can run
    // with a different working directory. build.sbt sits next to
    // SURVEY.md, so walk up from user.dir until it appears.
    val root = Iterator.iterate(
        java.nio.file.Paths.get(sys.props("user.dir")).toAbsolutePath)(_.getParent)
      .takeWhile(_ != null).take(5)
      .find(p => java.nio.file.Files.exists(p.resolve("build.sbt")))
      .getOrElse(fail("could not locate the repo root (build.sbt) above user.dir"))
    val survey = new String(java.nio.file.Files.readAllBytes(
      root.resolve("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val claimed = survey.linesIterator
      .count(l => l.startsWith("- [x]") &&
        ("""\[(q|q\+o)\]""".r.findFirstIn(l).isDefined))
    assert(SparkEntry.queries.size === claimed,
      s"SparkEntry has ${SparkEntry.queries.size} queries but SURVEY §2 " +
        s"checks $claimed [q]/[q+o] items — add/remove the §2 line")
    assert(SparkEntry.queries.size === 194, s"got ${SparkEntry.queries.size}")
  }

  test("no-oracle entries are exactly covered by row-bound + schema gates") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(SparkEntry.rowBoundSql.keySet === noOracle,
      s"rowBoundSql drift: missing=${noOracle -- SparkEntry.rowBoundSql.keySet} " +
        s"extra=${SparkEntry.rowBoundSql.keySet -- noOracle}")
    assert(SparkEntry.expectedSchema.keySet === noOracle,
      s"expectedSchema drift: missing=${noOracle -- SparkEntry.expectedSchema.keySet} " +
        s"extra=${SparkEntry.expectedSchema.keySet -- noOracle}")
    // The declared DDLs are live contracts, not stale copies: each
    // must equal the actual output schema at the spec SF.
    for ((name, ddl) <- SparkEntry.expectedSchema.toSeq.sortBy(_._1)
         if Set("q_distinct_approx", "q_heavy_hitters_approx",
           "q_percentiles_approx", "q_distinct_hll_sketch",
           "text_bpe_vocab", "text_term_freq_cms").contains(name)) {
      // (cheap subset — the full surface is exercised by the driver
      // gate, which compares every actual DDL against these strings)
      assert(SparkEntry.queries(name)(spark, Sf).schema.toDDL === ddl, name)
    }
  }
}
