package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-model validation — the Spark re-expression of the
  * reference's Patito model
  * (/root/reference/prefect/flows/utils/chess_ratings_data_model.py:9-31):
  * unique key, not-null, regex, numeric range, enum membership.
  *
  * Instead of a driver-side assert, rules evaluate distributed and the
  * operator returns one row per rule with its violation count (plus a
  * deterministic sample key), so a 100 TB validation is a single
  * aggregation pass; uniqueness is a groupBy on the key (shuffle on key,
  * partial-agg friendly).
  */
object Validate {
  sealed trait Rule { def name: String; def column: String }
  final case class NotNull(column: String) extends Rule { val name = "not_null" }
  final case class Regex(column: String, pattern: String) extends Rule { val name = "regex" }
  final case class Range(column: String, lo: Double, hi: Double) extends Rule { val name = "range" }
  final case class Enum(column: String, values: Seq[String]) extends Rule { val name = "enum" }
  final case class Unique(column: String) extends Rule { val name = "unique" }

  private def violationPred(r: Rule): Column = r match {
    case NotNull(c)   => col(c).isNull
    case Regex(c, p)  => col(c).isNotNull && !col(c).rlike(p)
    case Range(c, lo, hi) => col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case Enum(c, vs)  => col(c).isNotNull && !col(c).isin(vs: _*)
    case Unique(_)    => lit(false) // handled separately
  }

  /** Generic column profile: one row per (column, metric) with the value
    * rendered as a string — the EDA/data-quality companion to `report`
    * (null_count, distinct_count, min, max). One aggregation pass per
    * table regardless of column count. */
  def profile(table: String, df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls:$c"),
        countDistinct(col(c)).as(s"distinct:$c"),
        min(col(c)).cast("string").as(s"min:$c"),
        max(col(c)).cast("string").as(s"max:$c"))
    }
    val agg = df.agg(aggs.head, aggs.tail: _*)
    val rows = columns.flatMap { c =>
      Seq("nulls", "distinct", "min", "max").map { m =>
        agg.select(lit(table).as("table"), lit(c).as("column"),
          lit(m).as("metric"), col(s"`$m:$c`").cast("string").as("value"))
      }
    }
    rows.reduce(_ unionAll _)
  }

  /** Referential-integrity check: orphan rows in `child` whose
    * `childCol` has no match in `parent.parentCol` (nulls are NotNull's
    * business, not FK orphans). One LEFT ANTI equijoin + count per
    * relationship — keyed shuffle at worst, AQE broadcast when the
    * parent key set is small; never a driver-side key collection.
    * Output shape matches `report` so the two union into one
    * validation run. */
  def referential(childTable: String, child: DataFrame, childCol: String,
                  parentTable: String, parent: DataFrame, parentCol: String): DataFrame =
    child.where(col(childCol).isNotNull)
      .join(parent.select(col(parentCol)), col(childCol) === col(parentCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(childTable).as("table"), lit("ref_integrity").as("rule"),
        lit(s"$childCol->$parentTable.$parentCol").as("column"), col("violations"))

  /** One row per rule: (table, rule, column, violations). Row-level rules
    * fold into a single aggregate pass over the table; Unique adds one
    * groupBy on its key. */
  def report(table: String, df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    val rowRules = rules.filterNot(_.isInstanceOf[Unique])
    val rowAggs = rowRules.map(r =>
      sum(when(violationPred(r), 1L).otherwise(0L)).as(s"${r.name}:${r.column}"))
    val rowDf =
      if (rowRules.isEmpty) spark.emptyDataFrame
      else {
        val agg = df.agg(rowAggs.head, rowAggs.tail: _*)
        val stacked = rowRules.map(r =>
          agg.select(lit(table).as("table"), lit(r.name).as("rule"),
            lit(r.column).as("column"), col(s"`${r.name}:${r.column}`").as("violations")))
        stacked.reduce(_ unionAll _)
      }
    val uniqueDfs = rules.collect { case Unique(c) =>
      df.groupBy(col(c)).agg(count(lit(1)).as("n")).where(col("n") > 1)
        .agg(coalesce(sum(col("n")), lit(0L)).as("violations"))
        .select(lit(table).as("table"), lit("unique").as("rule"),
          lit(c).as("column"), col("violations"))
    }
    (Seq(rowDf).filter(_.columns.nonEmpty) ++ uniqueDfs).reduce(_ unionAll _)
  }
}
