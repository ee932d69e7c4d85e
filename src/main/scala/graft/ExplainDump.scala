package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `explain("formatted")` for a set of declared queries
  * to files, one Spark session for all of them.
  * Usage: runMain graft.ExplainDump <outDir> <suffix> <sfDir> q1,q2,...
  * Writes <outDir>/<query>_<suffix>.txt for each query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      println("usage: runMain graft.ExplainDump <outDir> <suffix> <sfDir> q1,q2,...")
      sys.exit(2)
    }
    val Array(outDir, suffix, sfDir, list) = args.take(4)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = GraftSession.getOrCreate()
    val mode = ExplainMode.fromString("formatted")
    list.split(",").filter(_.nonEmpty).foreach { name =>
      val txt =
        try SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(mode)
        catch { case e: Throwable => s"ERROR building $name: ${e.getMessage}" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[explaindump] wrote $name ($suffix), ${txt.length} chars")
    }
    spark.stop()
  }
}
