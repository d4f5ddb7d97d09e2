package graft.cli
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val docsPath = args(1)
    System.setProperty("java.io.tmpdir", "/dev/shm/graftbench")
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.local.dir", "/dev/shm/graftbench")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name cores=$cores secs=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val docs = s.read.parquet(docsPath)
    t("read-only")(docs.agg(count(lit(1))).head())
    t("tokenize-count")(docs.select(explode(graft.functions.TokensExpression.tokens($"text")).as("term")).agg(count(lit(1))).head())
    t("tf-agg-nowrite")(docs.select($"docId", $"dl", explode(graft.functions.TokensExpression.tokens($"text")).as("term"))
      .groupBy($"docId", $"term").agg(count(lit(1)).cast("int").as("tf"), first($"dl").as("dl"))
      .agg(count(lit(1))).head())
    t("tf-agg-write")(docs.select($"docId", $"dl", explode(graft.functions.TokensExpression.tokens($"text")).as("term"))
      .groupBy($"docId", $"term").agg(count(lit(1)).cast("int").as("tf"), first($"dl").as("dl"))
      .write.mode("overwrite").parquet(s"/dev/shm/graftbench/probe-tf-$cores"))
    s.stop()
  }
}
