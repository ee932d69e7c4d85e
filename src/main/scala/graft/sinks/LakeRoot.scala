package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Where derived lake state lives — stored indexes, frozen trained
  * models, streaming fixtures. Configurable via `spark.graft.lake.root`
  * (a cluster deployment points it at the lake filesystem — an absolute
  * URI such as `hdfs://nn/lake` or `s3a://bucket/lake` — next to the
  * tables it derives from); defaults to `target/graft-lake` under the
  * working directory — NOT `java.io.tmpdir`, whose lifetime and
  * per-host locality are wrong for state that must survive restarts
  * and be visible to every executor.
  *
  * All path composition and fixture staging here goes through the
  * Hadoop `Path`/`FileSystem` API, never `java.io.File`: a `File` wrap
  * treats `hdfs://nn/lake` as a RELATIVE local path and mangles it to
  * `$CWD/hdfs:/nn/lake`, silently breaking the cluster contract (the
  * exact bug this object once had — LakeRootSpec pins scheme
  * preservation now).
  *
  * Roots are keyed by the input dataset directory (hashed) so state
  * derived from different scale factors never collides; callers append
  * a fixture version to `name` so a contract change invalidates old
  * state instead of misreading it. */
object LakeRoot {
  def root(spark: SparkSession, dir: String, name: String): String = {
    val base = spark.conf.getOption("spark.graft.lake.root")
      .getOrElse(new java.io.File("target/graft-lake").getAbsolutePath)
    child(child(base, Integer.toHexString(dir.hashCode)), name)
  }

  /** Scheme-preserving path composition: `hdfs://nn/lake` + `x` →
    * `hdfs://nn/lake/x` (a `java.io.File` composition would yield
    * `$CWD/hdfs:/nn/lake/x`). */
  def child(base: String, name: String): String =
    new Path(new Path(base), name).toString

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fsOf(spark, path).exists(new Path(path))

  def mkdirs(spark: SparkSession, path: String): Unit = {
    fsOf(spark, path).mkdirs(new Path(path))
    ()
  }

  /** One-time fixture materialization with the lake's staging
    * discipline: if `target` already exists it is returned untouched;
    * otherwise `write` produces the fixture at a sibling staging path
    * which is RENAMED into place — atomic on HDFS-like stores, so a
    * concurrent first run never observes a torn fixture. The rename is
    * [[VersionedTable.renameNoNest]]-guarded: a loser of the
    * exists-check race would otherwise "succeed" by nesting its staging
    * copy INSIDE the winner's fixture (Hadoop rename-into-existing
    * moves the source under the target); here the loser recovers and
    * discards its copy, and the winner's fixture serves. */
  def fixture(spark: SparkSession, target: String)(write: String => Unit): String = {
    val f = fsOf(spark, target)
    val p = new Path(target)
    if (!f.exists(p)) {
      // Per-attempt UUID staging (the VersionedTable.commit discipline):
      // a FIXED staging path would let two concurrent first runs write
      // into each other's staging and rename a torn mix into place — the
      // rename guard below protects only the rename, not the write.
      val staging = new Path(p.getParent,
        s".${p.getName}-staging-${java.util.UUID.randomUUID.toString.take(12)}")
      write(staging.toString)
      VersionedTable.renameNoNest(f, staging, p) match {
        case VersionedTable.Renamed => ()
        case VersionedTable.LostRace =>
          f.delete(staging, true) // benign: another run won; its copy serves
        case VersionedTable.RenameFailed =>
          f.delete(staging, true)
          throw new java.io.IOException(
            s"fixture rename $staging -> $p failed without contention")
      }
    }
    target
  }
}
