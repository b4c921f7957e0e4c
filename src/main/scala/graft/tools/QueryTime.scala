package graft.tools

/** Times one named SparkEntry query repeatedly: runMain graft.tools.QueryTime <name> [sfDir] [runs] */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[qt] $name run=$i rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
