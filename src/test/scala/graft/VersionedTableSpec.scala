package graft

import graft.sinks.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  test("commits are immutable pinned versions; diff explains row-level change") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt").toString + "/table"

    val v1data = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    val v1 = VersionedTable.commit(v1data.toDF("id", "name", "score"), root)
    assert(v1 === 0L)
    assert(VersionedTable.versions(spark, root) === Seq(0L))

    // v2: update id=2, remove id=3, add id=4
    val v2data = Seq((1L, "a", 10L), (2L, "b", 25L), (4L, "d", 40L))
    val v2 = VersionedTable.commit(v2data.toDF("id", "name", "score"), root)
    assert(v2 === 1L)
    assert(VersionedTable.latestVersion(spark, root) === Some(1L))

    // pinned read of v1 is unchanged by the later commit
    val v1read = VersionedTable.read(spark, root, Some(0L))
      .as[(Long, String, Long)].collect().toSet
    assert(v1read === v1data.toSet)
    // default read is the latest
    val latest = VersionedTable.read(spark, root)
      .as[(Long, String, Long)].collect().toSet
    assert(latest === v2data.toSet)

    val changes = VersionedTable.diff(spark, root, from = 0L, to = 1L, keyCols = Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(changes === Map(2L -> "updated", 3L -> "removed", 4L -> "added"))

    // identical content commits cleanly as a new version and diffs empty
    val v3 = VersionedTable.commit(v2data.toDF("id", "name", "score"), root)
    assert(v3 === 2L)
    assert(VersionedTable.diff(spark, root, 1L, 2L, Seq("id")).count() === 0L)
  }

  test("read with no versions fails loudly; empty root lists no versions") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt_empty").toString + "/t"
    assert(VersionedTable.versions(spark, root).isEmpty)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root)
    }
  }
}
