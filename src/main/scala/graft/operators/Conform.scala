package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative schema conformance — the Spark-first re-expression of the
  * reference's `preprocess_ratings_data` + `add_missing_columns`
  * (/root/reference/prefect/flows/ingest_web_to_gcs.py:27-37,100-135):
  * rename map, add-missing-nullable-columns, casts, code maps (e.g.
  * sex F/M -> 0/1), and constant enrichment columns (period year/month).
  *
  * One `select` projection — Catalyst collapses it into the scan, so
  * conformance is free at 100 TB (no extra pass, pruned columns never
  * read).
  */
final case class ConformSpec(
    renames: Map[String, String] = Map.empty,
    casts: Map[String, String] = Map.empty,
    codeMaps: Map[String, Map[String, Int]] = Map.empty,
    addMissing: Seq[(String, String)] = Seq.empty, // (name, typeName) -> null column
    enrich: Seq[(String, Column)] = Seq.empty,
    // Sentinel-to-null per source column, applied before the cast — the
    // reference nulls birth_year 0 before use (ingest_web_to_gcs.py:117).
    nullIf: Map[String, String] = Map.empty)

object Conform {
  def apply(df: DataFrame, spec: ConformSpec): DataFrame = {
    val base = df.columns.toSeq.map { c =>
      val renamed = spec.renames.getOrElse(c, c)
      val src = col(c)
      val mapped = spec.codeMaps.get(c) match {
        case Some(m) =>
          m.foldRight(lit(null).cast("int")) { case ((k, v), els) =>
            when(src === k, lit(v)).otherwise(els)
          }
        case None => src
      }
      val nulled = spec.nullIf.get(c).fold(mapped)(v => nullif(mapped, lit(v)))
      val casted = spec.casts.get(c).fold(nulled)(t => nulled.cast(t))
      casted.as(renamed)
    }
    val missing = spec.addMissing
      .filterNot { case (n, _) => df.columns.contains(n) }
      .map { case (n, t) => lit(null).cast(t).as(n) }
    val extra = spec.enrich.map { case (n, c) => c.as(n) }
    df.select(base ++ missing ++ extra: _*)
  }
}
