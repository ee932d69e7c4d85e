package graft

import graft.sinks.LakeRoot

/** Pins the cluster contract of the lake-root composition: a conf'd
  * `spark.graft.lake.root` with a filesystem scheme (`hdfs://`,
  * `s3a://`) must survive into every derived path — the old
  * `java.io.File` composition silently rewrote `hdfs://nn/lake` to
  * `$CWD/hdfs:/nn/lake` (a relative LOCAL path), so the documented
  * "point the conf at the lake filesystem" deployment was false. Also
  * pins the shared fixture staging helper (write-once, stage+rename,
  * idempotent re-entry). */
class LakeRootSpec extends SparkSpec {

  private def withRoot[A](conf: String)(f: org.apache.spark.sql.SparkSession => A): A = {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.lake.root", conf)
    f(s2)
  }

  test("scheme'd conf roots compose scheme-preservingly") {
    val hex = Integer.toHexString("/data/sfX".hashCode)
    withRoot("hdfs://nn:8020/lake") { s =>
      assert(LakeRoot.root(s, "/data/sfX", "ivf_cent_v2") ===
        s"hdfs://nn:8020/lake/$hex/ivf_cent_v2")
    }
    withRoot("s3a://bucket/graft/lake") { s =>
      assert(LakeRoot.root(s, "/data/sfX", "pagerank_state_v1") ===
        s"s3a://bucket/graft/lake/$hex/pagerank_state_v1")
    }
  }

  test("default root is a local absolute path; child composes under it") {
    val r = LakeRoot.root(spark, "/data/sfX", "n")
    assert(r.startsWith("/") || r.startsWith("file:"),
      s"default lake root must be absolute-local, got $r")
    assert(LakeRoot.child("hdfs://nn/lake", "edges") === "hdfs://nn/lake/edges")
    assert(LakeRoot.child("/abs/lake", "a/b") === "/abs/lake/a/b")
  }

  test("fixture: writes once via staging+rename, idempotent thereafter") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lakeroot").toString
    val target = LakeRoot.child(tmp, "fx")
    var writes = 0
    def make(): String = LakeRoot.fixture(spark, target) { staging =>
      writes += 1
      // the staging path, not the target, must receive the write
      assert(staging !== target)
      spark.range(3).write.mode("overwrite").parquet(staging)
    }
    val p1 = make()
    assert(p1 === target)
    assert(spark.read.parquet(p1).count() === 3L)
    val p2 = make()
    assert(p2 === target && writes === 1, "second call must not rewrite")
    // no staging leftovers
    val leftovers = new java.io.File(tmp).listFiles().map(_.getName).toSet
    assert(leftovers === Set("fx"))
  }
}
