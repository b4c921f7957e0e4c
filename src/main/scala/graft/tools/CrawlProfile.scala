package graft.tools

import graft.crawl.{CrawlConfig, CrawlDriver, SyntheticWeb}
import org.apache.spark.sql.SparkSession

/** Profiling surface for the wave loop at a given core count:
  *   sbt "runMain graft.tools.CrawlProfile <cores> <parseIters> [maxUrls] [k=v ...]"
  * trailing k=v pairs become spark confs (e.g. spark.sql.adaptive.enabled=false)
  */
object CrawlProfile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val parseIters = if (args.length > 1) args(1).toLong else 3000000L
    val maxUrls = if (args.length > 2) args(2).toLong else 60000L
    val extra = args.drop(3).filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"crawl-profile-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val web = SyntheticWeb.WebConfig(hosts = 64, pagesPerHost = 2001,
      parseWorkIters = parseIters)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(60000, web), budgetPerHost = 1000,
      maxWaves = 2, maxUrls = maxUrls, web = web,
      robots = SyntheticWeb.robotsFixture(web))
    // warm-up: small crawl to JIT the wave loop, then repeated timed runs
    val warmWeb = web.copy(pagesPerHost = 101)
    CrawlDriver.run(spark,
      CrawlConfig(SyntheticWeb.seedUrls(2000, warmWeb), 1000, 2, 6000, warmWeb,
        SyntheticWeb.robotsFixture(warmWeb)),
      java.nio.file.Files.createTempDirectory("warm").toString)
    (1 to 2).foreach { i =>
      val root = java.nio.file.Files.createTempDirectory(s"profile-$cores").toString
      val t0 = System.nanoTime()
      val h = CrawlDriver.run(spark, cfg, root,
        CrawlDriver.EngineConfig(verbose = true))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[profile] run=$i cores=$cores parseIters=$parseIters fetched=${h.fetchedTotal} " +
        f"waves=${h.wavesRun} secs=$secs%.1f urls_per_sec=${h.fetchedTotal / secs}%.0f")
    }
    spark.stop()
  }
}
