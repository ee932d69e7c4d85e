package graft.sinks

import org.apache.spark.sql.SparkSession

/** Where derived lake state lives — stored indexes, frozen trained
  * models, streaming fixtures. Configurable via `spark.graft.lake.root`
  * (a cluster deployment points it at the lake filesystem, next to the
  * tables it derives from); defaults to `target/graft-lake` under the
  * working directory — NOT `java.io.tmpdir`, whose lifetime and
  * per-host locality are wrong for state that must survive restarts
  * and be visible to every executor.
  *
  * Roots are keyed by the input dataset directory (hashed) so state
  * derived from different scale factors never collides; callers append
  * a fixture version to `name` so a contract change invalidates old
  * state instead of misreading it. */
object LakeRoot {
  def root(spark: SparkSession, dir: String, name: String): String = {
    val base = spark.conf.getOption("spark.graft.lake.root")
      .getOrElse(new java.io.File("target/graft-lake").getAbsolutePath)
    new java.io.File(
      new java.io.File(base, Integer.toHexString(dir.hashCode)), name)
      .getAbsolutePath
  }
}
