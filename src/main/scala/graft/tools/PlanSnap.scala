package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for the named SparkEntry queries to
  * <outDir>/<query>_<tag>.txt — the before/after plan evidence for an
  * optimization round.
  * Usage: runMain graft.tools.PlanSnap <tag> <outDir> <query>[,<query>...]
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = args(1)
    val names =
      if (args.length > 2 && args(2) != "all") args(2).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"[plansnap] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
