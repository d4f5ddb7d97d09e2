package graft.cli

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev probe: time individual SparkEntry gate queries in isolation
  * (the full graft.Bench run takes ~8 min — this is the fast feedback
  * loop while optimizing one operator).
  *
  * Usage: runMain graft.cli.OpProbe <sfDir> <query>[,<query>...] [reps]
  */
object OpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // mirror graft.Bench's session exactly (split sizing changes scan
      // task counts and therefore the plans this probe times)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"OPPROBE $name%-24s best=${secs.min}%.3f all=${secs.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
