package graft.cli
import org.apache.spark.sql.SparkSession
import graft.fixtures.TranscriptGen
object GenInput {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    TranscriptGen.dataset(s, seed = 7L, nConvs = args(1).toLong, partitions = 128)
      .write.mode("overwrite").parquet(args(0))
    s.stop()
  }
}
