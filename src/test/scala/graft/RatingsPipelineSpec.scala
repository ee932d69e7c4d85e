package graft

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import graft.pipeline.RatingsPipeline
import graft.sources.XmlRecordSource

class RatingsPipelineSpec extends SparkSpec {

  private def writeRatingsZip(dir: File, name: String, players: Seq[Map[String, String]]): Unit = {
    val xml = XmlRecordSource.renderXml("player",
      players.iterator.map(_.toSeq))
    val z = new ZipOutputStream(new FileOutputStream(new File(dir, name)))
    z.putNextEntry(new ZipEntry(name.replace(".zip", ".xml")))
    z.write(xml.getBytes("UTF-8"))
    z.closeEntry(); z.close()
  }

  private def player(id: Int, nameStr: String, fed: String, sex: String, rating: Int,
                     birthday: Int): Map[String, String] = Map(
    "fideid" -> id.toString, "name" -> nameStr, "country" -> fed, "sex" -> sex,
    "title" -> "GM", "rating" -> rating.toString, "games" -> "10", "k" -> "20",
    "birthday" -> birthday.toString)

  test("end-to-end: zip XML -> conform -> validate -> lake -> leaderboard") {
    val zipDir = Files.createTempDirectory("ratingszips").toFile
    val lake = Files.createTempDirectory("ratingslake").toFile.getAbsolutePath + "/ratings"
    writeRatingsZip(zipDir, "jan24.zip", Seq(
      player(1, "Alice", "USA", "F", 2700, 1990),
      player(2, "Bob", "GER", "M", 2650, 1985),
      player(3, "Carol", "USA", "F", 2710, 1995),
      player(3, "Carol-Dup", "USA", "F", 2711, 1995), // unique violation
      player(4, "Dora", "XXXX", "F", 2500, 1850)      // regex + range violations
    ))
    val report = RatingsPipeline.ingestPeriod(spark, zipDir.getAbsolutePath + "/*.zip",
      lake, 2024, 1)
    val rep = report.collect().map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(rep(("unique", "fide_id")) === 2L)
    assert(rep(("regex", "fide_federation")) === 1L)
    assert(rep(("range", "birth_year")) === 1L)
    assert(rep(("range", "period_month")) === 0L)

    val lakeDf = spark.read.parquet(lake)
    assert(lakeDf.count() === 5)
    assert(lakeDf.columns.contains("foa_title")) // add-missing column
    assert(lakeDf.where(col("sex") === 0).count() === 4) // F -> 0 code-map

    val lb = RatingsPipeline.leaderboard(spark, lake, 2024, 1, k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(lb.toSeq.contains(("USA", 1, 3L))) // Carol (2710) tops USA
    assert(lb.count(_._1 == "USA") === 2)
  }

  test("ingestPeriodXmlDir: DSv2 path lands the same lake layout") {
    val xmlDir = Files.createTempDirectory("ratingsxml").toFile
    val lake = Files.createTempDirectory("ratingslake3").toFile.getAbsolutePath + "/ratings"
    Files.writeString(new File(xmlDir, "mar24.xml").toPath,
      XmlRecordSource.renderXml("player", Seq(
        player(1, "Alice", "USA", "F", 2700, 1990).toSeq,
        player(2, "Bob", "GER", "M", 2650, 1985).toSeq).iterator))
    RatingsPipeline.ingestPeriodXmlDir(spark, xmlDir.getAbsolutePath + "/*.xml",
      lake, 2024, 3)
    val lakeDf = spark.read.parquet(lake)
    assert(lakeDf.count() === 2)
    assert(lakeDf.where(col("fide_federation") === "GER").count() === 1)
    assert(new File(lake + "/period_year=2024/period_month=3").exists())
  }

  test("birth_year 0 conforms to null, not a range violation") {
    val zipDir = Files.createTempDirectory("ratingszips4").toFile
    val lake = Files.createTempDirectory("ratingslake4").toFile.getAbsolutePath + "/ratings"
    writeRatingsZip(zipDir, "apr24.zip", Seq(
      player(1, "Alice", "USA", "F", 2700, 1990),
      player(2, "Unknown", "GER", "M", 2500, 0))) // FIDE unknown-birth-year sentinel
    val report = RatingsPipeline.ingestPeriod(spark, zipDir.getAbsolutePath + "/*.zip",
      lake, 2024, 4)
    val rep = report.collect().map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(rep(("range", "birth_year")) === 0L) // 0 is unknown, not year 0
    val lakeDf = spark.read.parquet(lake)
    assert(lakeDf.where(col("fide_id") === 2 && col("birth_year").isNull).count() === 1)
  }

  test("retry runs until success and surfaces the last error after exhaustion") {
    import graft.pipeline.TaskRunner
    var calls = 0
    val slept = collection.mutable.ArrayBuffer.empty[Long]
    val out = TaskRunner.retry(attempts = 3, backoffMs = 100, sleep = slept.+=(_)) { () =>
      calls += 1
      if (calls < 3) sys.error(s"flaky $calls")
      "ok"
    }
    assert(out === "ok" && calls === 3)
    assert(slept.toSeq === Seq(100L, 200L)) // exponential backoff
    val ex = intercept[RuntimeException] {
      TaskRunner.retry(attempts = 2, backoffMs = 1, sleep = _ => ())(() => sys.error("always"))
    }
    assert(ex.getMessage === "always")
  }

  test("ingestPeriodCached skips unchanged input and re-runs on changed input") {
    import graft.pipeline.TaskRunner
    val zipDir = Files.createTempDirectory("ratingszips5").toFile
    val lake = Files.createTempDirectory("ratingslake5").toFile.getAbsolutePath + "/ratings"
    val cache = Files.createTempDirectory("ratingscache5").toFile.getAbsolutePath
    val glob = zipDir.getAbsolutePath + "/*.zip"
    writeRatingsZip(zipDir, "may24.zip", Seq(player(1, "Alice", "USA", "F", 2700, 1990)))
    val first = RatingsPipeline.ingestPeriodCached(spark, glob, lake, 2024, 5, cache)
    assert(first.isDefined, "first run must ingest")
    assert(spark.read.parquet(lake).count() === 1)
    val second = RatingsPipeline.ingestPeriodCached(spark, glob, lake, 2024, 5, cache)
    assert(second.isEmpty, "unchanged input must be memoized")
    // a new archive changes the listing fingerprint -> re-ingest
    writeRatingsZip(zipDir, "may24b.zip", Seq(player(2, "Bob", "GER", "M", 2650, 1985)))
    assert(TaskRunner.inputFingerprint(spark, glob) !==
      TaskRunner.inputFingerprint(spark, zipDir.getAbsolutePath + "/may24.zip"))
    val third = RatingsPipeline.ingestPeriodCached(spark, glob, lake, 2024, 5, cache)
    assert(third.isDefined, "changed input must re-run")
    assert(spark.read.parquet(lake).count() === 2)
  }

  test("memoize withholds the marker when the input changed under the body") {
    import graft.pipeline.TaskRunner
    val cache = Files.createTempDirectory("memocache").toFile.getAbsolutePath
    var runs = 0
    // revalidate disagrees with the pre-fingerprint -> no marker written
    assert(TaskRunner.memoize(spark, cache, "t", "fp0", () => "fp1") { runs += 1 })
    assert(runs === 1)
    // next call must run again (input changed mid-body, nothing recorded)
    assert(TaskRunner.memoize(spark, cache, "t", "fp0", () => "fp0") { runs += 1 })
    assert(runs === 2)
    // now the marker stuck -> third call skips
    assert(!TaskRunner.memoize(spark, cache, "t", "fp0", () => "fp0") { runs += 1 })
    assert(runs === 2)
  }

  test("missingPeriods plans the backfill via anti join") {
    val zipDir = Files.createTempDirectory("ratingszips2").toFile
    val lake = Files.createTempDirectory("ratingslake2").toFile.getAbsolutePath + "/ratings"
    writeRatingsZip(zipDir, "feb24.zip", Seq(player(1, "Alice", "USA", "F", 2700, 1990)))
    RatingsPipeline.ingestPeriod(spark, zipDir.getAbsolutePath + "/*.zip", lake, 2024, 2)
    val missing = RatingsPipeline.missingPeriods(spark, lake, 2024, 1, 2024, 4)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(missing === Seq((2024, 1), (2024, 3), (2024, 4)))
  }
}
