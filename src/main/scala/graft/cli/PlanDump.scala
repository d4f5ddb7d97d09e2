package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: dump `.explain("formatted")` for named SparkEntry gate
  * queries to files (the optimization-round plan evidence —
  * plans/rNN/<query>_{before,after}.txt). Runs each query's DataFrame
  * construction but no action beyond the explain itself, on a session
  * configured exactly like graft.Bench's.
  *
  * Usage: runMain graft.cli.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...|all]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names =
      if (args.length < 4 || args(3) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    def explainOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      try {
        // eager helpers (bm25 family) hand their real distributed plan
        // through the hook right before collecting; lazily-built queries
        // never call it and the returned frame's plan is the real one
        var hooked: String = null
        graft.entry.EntryQueries.planHook = df => hooked = explainOf(df)
        val df = fn(spark, sfDir)
        graft.entry.EntryQueries.planHook = null
        val plan = if (hooked != null) hooked else explainOf(df)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"PLANDUMP $name ok (${plan.linesIterator.size} lines)")
      } catch {
        case e: Throwable => println(s"PLANDUMP $name FAILED: ${e.getMessage}")
      } finally graft.entry.EntryQueries.planHook = null
    }
    spark.stop()
  }
}
