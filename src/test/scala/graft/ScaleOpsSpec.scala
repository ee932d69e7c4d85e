package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sinks.BucketedTables

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAggregate equals direct aggregation") {
    val df = spark.read.parquet(s"$Sf/lineitem.parquet")
    val direct = df.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(df, Seq("l_returnflag"), salts = 8,
      tieBreakers = Seq(col("l_orderkey"), col("l_linenumber")),
      partials = Map("q" -> sum(col("l_quantity")), "n" -> count(lit(1))))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("replicatedJoin equals plain join") {
    val fact = spark.read.parquet(s"$Sf/orders.parquet").select("o_custkey", "o_orderkey")
    val dim = spark.read.parquet(s"$Sf/customer.parquet").select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = fact.join(dim, "o_custkey").count()
    val repl = Skew.replicatedJoin(fact, dim, "o_custkey", salts = 4,
      hotKeys = Seq(1L, 2L, 3L)).count()
    assert(repl === plain)
  }

  test("bucketed join plan has no shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val ord = spark.read.parquet(s"$Sf/orders.parquet").select("o_orderkey", "o_custkey")
    val li = spark.read.parquet(s"$Sf/lineitem.parquet").select("l_orderkey", "l_quantity")
    BucketedTables.writeBucketed(ord, "g_orders_b", "o_orderkey", 8)
    BucketedTables.writeBucketed(li, "g_lineitem_b", "l_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = BucketedTables.bucketedJoin(spark, "g_orders_b", "g_lineitem_b",
        "o_orderkey", "l_orderkey")
      assert(joined.count() === li.count())
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"), s"unexpected shuffle:\n$physical")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("GraftExtensions installs native functions via spark.sql.extensions") {
    // the shared test session is built by GraftSession, which sets the
    // extensions conf — SQL-level access must resolve without manual
    // registration.
    val r = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d, " +
        "size(shingle_hashes('a b c d', 3)) AS s, " +
        "size(simhash_bits('a b c d')) AS b").head
    assert(r.getDouble(0) === 11.0)
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 64)
  }
}
