package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).collect().length
      println(f"[timeq] $name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
