package graft.tools

import graft.crawl._
import graft.functions.CanonicalUrl

/** CLI smoke surface for the crawl semantics: runs the sequential oracle
  * (and, once implemented, the Spark engine) on a small deterministic web
  * and prints a summary. Usage:
  *   sbt "runMain graft.tools.CrawlDemo [nSeeds] [budget] [maxWaves]"
  */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val nSeeds = if (args.length > 0) args(0).toInt else 24
    val budget = if (args.length > 1) args(1).toInt else 2
    val maxWaves = if (args.length > 2) args(2).toInt else 100
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(nSeeds, web), budget, maxWaves,
      web = web, robots = SyntheticWeb.robotsFixture(web))
    val (res, totals) = new RefCrawler(cfg).run()
    println(s"[oracle] waves=${totals.size} fetched=${res.trace.size} " +
      s"seen=${res.seen.size} docs=${res.docs.size}")
    totals.take(5).foreach(t => println(s"[oracle] $t"))
    res.trace.take(5).foreach(t => println(s"[oracle] trace $t"))
    val hosts = res.seen.groupBy(CanonicalUrl.host).map { case (h, s) => h -> s.size }
    println(s"[oracle] seen-by-host=${hosts.toSeq.sortBy(_._1)}")
  }
}
