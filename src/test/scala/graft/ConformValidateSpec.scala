package graft

import org.apache.spark.sql.functions._
import graft.operators.{Conform, ConformSpec, Validate}

class ConformValidateSpec extends SparkSpec {
  import spark.implicits._

  test("Conform renames, casts, code-maps, adds missing, enriches") {
    val df = Seq(("F", 10), ("M", 20), ("X", 30)).toDF("sex", "v")
    val out = Conform(df, ConformSpec(
      renames = Map("sex" -> "sex_code", "v" -> "value"),
      casts = Map("v" -> "long"),
      codeMaps = Map("sex" -> Map("F" -> 0, "M" -> 1)),
      addMissing = Seq("foa_title" -> "string"),
      enrich = Seq("period_year" -> lit(2024))))
    assert(out.columns.toSeq === Seq("sex_code", "value", "foa_title", "period_year"))
    val rows = out.collect()
    assert(rows.map(r => Option(r.get(0))).toSeq === Seq(Some(0), Some(1), None)) // unmapped -> null
    assert(out.schema("value").dataType.typeName === "long")
    assert(rows.forall(_.isNullAt(2)))
  }

  test("Validate counts violations per declarative rule") {
    import Validate._
    val df = Seq(
      (1, "ABC", 50.0), (2, "bad!", 150.0), (2, "DEF", -5.0), (3, null, 20.0)
    ).toDF("id", "code", "score")
    val rep = Validate.report("t", df, Seq(
      NotNull("code"), Regex("code", "^[A-Z]{3}$"), Range("score", 0, 100), Unique("id")))
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(rep(("not_null", "code")) === 1L)
    assert(rep(("regex", "code")) === 1L)
    assert(rep(("range", "score")) === 2L)
    assert(rep(("unique", "id")) === 2L) // both rows of the duplicated key
  }

  test("Validate.referential counts FK orphans, leaves nulls to NotNull") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(99L), Some(98L), None).toDF("fk")
    val rep = Validate.referential("child", child, "fk", "parent", parent, "pk").head
    assert(rep.getString(0) === "child" && rep.getString(1) === "ref_integrity")
    assert(rep.getString(2) === "fk->parent.pk")
    assert(rep.getLong(3) === 2L) // 99 and 98; the null is NOT an orphan
  }

  test("drift report covers every metric pair, keeps stable metrics unflagged") {
    val drift = graft.queries.IngestQueries.validateDriftQ(spark, Sf)
      .select("column", "metric", "drifted")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // 3 columns x 4 metrics, every pair present exactly once
    assert(drift.size === 12)
    // no nulls in either slice -> the null metrics never drift
    assert(Seq("o_orderstatus", "o_orderpriority", "o_custkey")
      .forall(c => drift((c, "nulls")) === 0L))
    // the slices are different months of orders: something must drift
    assert(drift.valuesIterator.sum >= 1L)
  }

  test("per-source dedup report is consistent with the corpus and survivors") {
    import graft.queries.TextQueries
    val docs = graft.sources.TableLoader.load(spark, Sf, "documents")
    val stats = TextQueries.dedupStatsQ(spark, Sf)
    val totals = stats.agg(sum("n_docs"), sum("n_survivors"), sum("n_pruned")).head
    assert(totals.getLong(0) === docs.count())
    assert(totals.getLong(0) === totals.getLong(1) + totals.getLong(2))
    // survivors per source must equal the dedup_corpus terminal per source
    val corpusBySource = graft.operators.Dedup.dedupedCorpus(docs,
        graft.operators.Dedup.ngramJaccardPairs(docs, tauBp = 6000L))
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val survBySource = stats.select("source", "n_survivors")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(survBySource === corpusBySource)
  }
}
