package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one query and print its formatted plan.
  * Usage: runMain graft.Explain <queryName> [sfDir] [explain|time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val mode = if (args.length > 2) args(2) else "time"
    val spark = GraftSession.getOrCreate()
    if (mode == "explain") SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    else {
      // Time construction + count: several queries do eager work at
      // DataFrame construction (checkpointed pair plans, driver-side
      // codebook training, fixture builds), which is what Bench times
      // too — timing only count() would hide it.
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[explain] $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
