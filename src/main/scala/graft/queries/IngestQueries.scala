package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Conform, ConformSpec, Validate}
import graft.sources.{TableLoader, XmlRecordSource}

/** Ingest/conformance/validation/calendar queries — the reference's core
  * ETL surface (parse XML -> conform schema -> validate -> period
  * enrichment) re-expressed Spark-first and exercised end-to-end by the
  * correctness gate.
  */
object IngestQueries {

  /** Round-trip the customer table through generated flat-record XML and
    * the distributed StAX parser — proves the XML ingest path without
    * any driver-side funnel. Money goes through exact cents so the
    * round-trip is lossless. */
  def xmlIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fields = Seq("c_custkey", "c_name", "c_nationkey", "acct_cents", "c_mktsegment")
    val asStrings = TableLoader.load(spark, dir, "customer").select(
      col("c_custkey").cast("string"),
      col("c_name"),
      col("c_nationkey").cast("string"),
      (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").cast("string"),
      col("c_mktsegment"))
      .as[(String, String, String, String, String)]
    val xmlDocs = asStrings.mapPartitions { it =>
      val rows = it.map(r => fields.zip(Seq(r._1, r._2, r._3, r._4, r._5)))
      if (rows.isEmpty) Iterator.empty
      else Iterator.single(XmlRecordSource.renderXml("record", rows))
    }
    XmlRecordSource.read(xmlDocs, "record", fields)
      .select(
        col("c_custkey").cast("long"),
        col("c_name"),
        col("c_nationkey").cast("int"),
        col("acct_cents").cast("long"),
        col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Typed orders slice for the format round-trips: longs, strings,
    * and a real DATE column — the types whose text/binary encodings
    * differ across formats and therefore prove reader fidelity. */
  private def ordersSlice(spark: SparkSession, dir: String): DataFrame =
    TableLoader.load(spark, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"), to_date(col("o_orderdate")).as("o_date"))

  /** One-time per input dir: materialize `df` under the lake root in
    * `fmt` (staging + rename, so concurrent runs can't see a
    * half-written fixture — the same discipline as the stream-source
    * fixture). */
  private def formatFixture(spark: SparkSession, dir: String, fmt: String)(
      write: String => Unit): String =
    graft.sinks.LakeRoot.fixture(spark,
      graft.sinks.LakeRoot.root(spark, dir, s"fmt_${fmt}_v1"))(write)

  /** CSV ingest round-trip: the orders slice is written as
    * header-carrying CSV (quoting, date rendering, text escaping all
    * exercised for real) and read back through Spark's csv source with
    * an explicit schema — the result must equal the parquet original.
    * Distributed end to end: the fixture is written partitioned and
    * read split-per-file; no driver funnel. */
  def csvIngest(spark: SparkSession, dir: String): DataFrame = {
    val src = formatFixture(spark, dir, "csv") { p =>
      ordersSlice(spark, dir).write.option("header", "true").csv(p)
    }
    spark.read.option("header", "true")
      .schema("o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, " +
        "o_orderpriority STRING, o_date DATE")
      .csv(src)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), date_format(col("o_date"), "yyyy-MM-dd").as("o_date"))
      .orderBy(col("o_orderkey"))
  }

  /** JSON-lines ingest round-trip: same slice through the json source
    * (name-based field binding, typed date parse from the string
    * rendering). The shape every web-scrape/training-data drop lands
    * in before it reaches the lake. */
  def jsonlIngest(spark: SparkSession, dir: String): DataFrame = {
    val src = formatFixture(spark, dir, "jsonl") { p =>
      ordersSlice(spark, dir).write.json(p)
    }
    spark.read
      .schema("o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, " +
        "o_orderpriority STRING, o_date DATE")
      .json(src)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), date_format(col("o_date"), "yyyy-MM-dd").as("o_date"))
      .orderBy(col("o_orderkey"))
  }

  /** ORC ingest round-trip: the customer table (including the DOUBLE
    * account balance, preserved bit-exactly by the binary format)
    * through Spark's orc source; cents are derived AFTER the read, so
    * a hash match proves the double survived the container. Output
    * shape mirrors xml_ingest. */
  def orcIngest(spark: SparkSession, dir: String): DataFrame = {
    val src = formatFixture(spark, dir, "orc") { p =>
      TableLoader.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
        .write.orc(p)
    }
    spark.read.orc(src)
      .select(
        col("c_custkey").cast("long"),
        col("c_name"),
        col("c_nationkey").cast("int"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("acct_cents"),
        col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val SegmentCodes: Seq[(String, Int)] = Seq(
    "AUTOMOBILE" -> 0, "BUILDING" -> 1, "FURNITURE" -> 2,
    "HOUSEHOLD" -> 3, "MACHINERY" -> 4)

  /** Declarative conformance (rename/cast/code-map/add-missing/enrich) —
    * the `preprocess_ratings_data` semantics on customer. */
  def schemaConform(spark: SparkSession, dir: String): DataFrame = {
    val spec = ConformSpec(
      renames = Map(
        "c_custkey" -> "customer_id", "c_name" -> "customer_name",
        "c_nationkey" -> "nation_id", "c_acctbal" -> "acctbal",
        "c_mktsegment" -> "segment_code"),
      casts = Map("c_acctbal" -> "decimal(18,2)", "c_custkey" -> "long"),
      codeMaps = Map("c_mktsegment" -> SegmentCodes.toMap),
      addMissing = Seq("loyalty_tier" -> "string"),
      enrich = Seq("period_year" -> lit(1995), "period_month" -> lit(6)))
    Conform(TableLoader.load(spark, dir, "customer"), spec)
      // exact integer cents in the OUTPUT (decimal stays internal): the
      // oracle comparator sees only engine-agnostic BIGINTs.
      .withColumn("acctbal_cents", (col("acctbal") * 100).cast("long"))
      .drop("acctbal")
      .orderBy(col("customer_id"))
  }

  /** Declarative data-model validation (Patito-model analog): one row per
    * rule with its distributed violation count. */
  def validateConstraints(spark: SparkSession, dir: String): DataFrame = {
    import Validate._
    val orders = Validate.report("orders", TableLoader.load(spark, dir, "orders"), Seq(
      NotNull("o_custkey"),
      Enum("o_orderstatus", Seq("O", "F", "P")),
      Range("o_totalprice", 0, 400000),
      Unique("o_orderkey")))
    val customer = Validate.report("customer", TableLoader.load(spark, dir, "customer"), Seq(
      NotNull("c_mktsegment"),
      Regex("c_name", "^Customer#[0-9]+$"),
      Range("c_acctbal", -1000, 8000),
      Unique("c_custkey")))
    orders.unionAll(customer).orderBy(col("table"), col("rule"), col("column"))
  }

  /** Referential-integrity validation across the lake's FK graph: one
    * row per relationship with its distributed orphan count (LEFT ANTI
    * equijoin per FK — no driver-side key sets). Completes the
    * Patito-model analog: row rules + uniqueness (validate_constraints)
    * + cross-table references (here). */
  def validateReferential(spark: SparkSession, dir: String): DataFrame = {
    def tbl(n: String) = TableLoader.load(spark, dir, n)
    val checks = Seq(
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation", "n_regionkey", "region", "r_regionkey"))
    checks.map { case (ct, cc, pt, pc) =>
      Validate.referential(ct, tbl(ct), cc, pt, tbl(pt), pc)
    }.reduce(_ unionAll _).orderBy(col("table"), col("column"))
  }

  /** Column profiling over customer (EDA/data-quality surface). */
  def profileQ(spark: SparkSession, dir: String): DataFrame =
    Validate.profile("customer", TableLoader.load(spark, dir, "customer"),
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
      .orderBy(col("column"), col("metric"))

  /** Snapshot drift report: per-column profile deltas between two
    * period slices of the same table — the schema/distribution drift
    * check a pipeline runs before appending a new period to the lake.
    * Two scans with the date range pushed into parquet, one tiny join
    * keyed (column, metric); output bounded by columns x metrics.
    * Profiled columns are ints/strings only, so the stringified
    * values compare exactly cross-engine. */
  def validateDriftQ(spark: SparkSession, dir: String): DataFrame = {
    val o = TableLoader.load(spark, dir, "orders")
    val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
    def slice(y: String) = o.where(col("o_orderdate") >= lit(s"$y-01-01").cast("date") &&
      col("o_orderdate") < lit(s"${y.toInt + 1}-01-01").cast("date"))
    val p1 = Validate.profile("orders", slice("1995"), cols)
      .select(col("column"), col("metric"), col("value").as("v_1995"))
    val p2 = Validate.profile("orders", slice("1996"), cols)
      .select(col("column"), col("metric"), col("value").as("v_1996"))
    p1.join(p2, Seq("column", "metric"))
      .withColumn("drifted", when(col("v_1995") <=> col("v_1996"), 0L).otherwise(1L))
      .orderBy(col("column"), col("metric"))
  }

  /** Version-to-version change report, end to end through the
    * snapshot-versioned table: two deterministic corpus versions are
    * COMMITTED to a versioned fixture (v1 = the documents projection;
    * v2 drops doc_id % 17, bumps n_chars for % 13, adds re-keyed
    * copies of % 19), and `VersionedTable.diff` must classify every
    * key as added/removed/updated — the "what changed between the
    * corpus my model trained on and today's" question. Because both
    * versions are pure functions of the documents table, the DuckDB
    * oracle re-derives the exact classification without reading any
    * fixture — a hash match proves commit, pinned read, content
    * hashing, and the three-way outer-join classification all
    * composed correctly. */
  def versionDiffQ(spark: SparkSession, dir: String): DataFrame = {
    val fx = graft.sinks.LakeRoot.fixture(spark,
      graft.sinks.LakeRoot.root(spark, dir, "vtq_v1")) { staging =>
      val d = TableLoader.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val v2 = d.where(pmod(col("doc_id"), lit(17L)) =!= 0)
        .withColumn("n_chars",
          when(pmod(col("doc_id"), lit(13L)) === 0, col("n_chars") + 1)
            .otherwise(col("n_chars")))
        .unionByName(d.where(pmod(col("doc_id"), lit(19L)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      graft.sinks.VersionedTable.commit(d, staging)
      graft.sinks.VersionedTable.commit(v2, staging)
      ()
    }
    graft.sinks.VersionedTable
      .diff(spark, fx, from = 0L, to = 1L, keyCols = Seq("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Month-calendar generation (dates.py analog) left-joined with order
    * activity — includes empty months, exact cents. */
  def periodCalendar(spark: SparkSession, dir: String): DataFrame = {
    val months = spark.range(1).select(
      explode(sequence(
        lit("1995-01-01").cast("date"),
        lit("2001-12-01").cast("date"),
        expr("interval 1 month"))).as("month_start"))
    val activity = TableLoader.load(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long").as("total_cents"))
    months.join(activity, col("month_start") === col("m"), "left")
      .select(col("month_start"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_cents"), lit(0L)).as("total_cents"))
      .orderBy(col("month_start"))
  }
}
