package graft.tools

import graft.crawl._
import graft.functions.CanonicalUrl

/** CLI smoke surface for the crawl semantics: runs the sequential oracle
  * and the Spark engine on a small deterministic web and prints a summary.
  * Usage:
  *   sbt "runMain graft.tools.CrawlDemo [nSeeds] [budget] [maxWaves] [fetchRobots] [dupGroups]"
  * With fetchRobots=true the crawl ACQUIRES robots rules itself (fetches
  * each host's robots.txt through the PageFetcher on first encounter)
  * instead of receiving a rule fixture — results must be identical.
  * dupGroups>0 collapses the synthetic content space to that many distinct
  * page bodies (mirror injection) and turns CONTENT-SEEN dedup on —
  * duplicate fetches are traced but store no doc and follow no links.
  */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val nSeeds = if (args.length > 0) args(0).toInt else 24
    val budget = if (args.length > 1) args(1).toInt else 2
    val maxWaves = if (args.length > 2) args(2).toInt else 100
    val fetchRobots = args.length > 3 && args(3).toBoolean
    val dupGroups = if (args.length > 4) args(4).toInt else 0
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30,
      dupContentGroups = dupGroups)
    // robots rules via the full text path: synthesized robots.txt -> parser
    // (fetch mode passes NO rules — the crawl acquires them per host)
    val robots =
      if (fetchRobots) Nil
      else graft.functions.RobotsTxt.syntheticRobotsTxt(web)
        .flatMap { case (h, txt) => graft.functions.RobotsTxt.parse(h, txt).rules }
        .toSeq.sortBy(r => (r.host, r.rule_order))
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(nSeeds, web), budget, maxWaves,
      web = web, robots = robots, fetchRobotsTxt = fetchRobots,
      contentDedup = dupGroups > 0)
    if (fetchRobots) println("[demo] robots mode: ACQUIRED by the crawl (fetchRobotsTxt)")
    if (dupGroups > 0)
      println(s"[demo] content-seen dedup ON (mirror web: $dupGroups distinct bodies)")
    val (res, totals) = new RefCrawler(cfg).run()
    println(s"[oracle] waves=${totals.size} fetched=${res.trace.size} " +
      s"seen=${res.seen.size} docs=${res.docs.size} dups=${res.duplicates.size}")
    totals.take(5).foreach(t => println(s"[oracle] $t"))
    res.trace.take(5).foreach(t => println(s"[oracle] trace $t"))
    val hosts = res.seen.groupBy(CanonicalUrl.host).map { case (h, s) => h -> s.size }
    println(s"[oracle] seen-by-host=${hosts.toSeq.sortBy(_._1)}")

    // distributed engine on the same config
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("crawl-demo")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("crawldemo").toString
    val t0 = System.nanoTime()
    val handle = CrawlDriver.run(spark, cfg, root,
      CrawlDriver.EngineConfig(verbose = true))
    val secs = (System.nanoTime() - t0) / 1e9
    val er = CrawlDriver.result(spark, root)
    println(f"[engine] waves=${handle.wavesRun} fetched=${er.trace.size} " +
      f"seen=${er.seen.size} docs=${er.docs.size} dups=${er.duplicates.size} " +
      f"secs=$secs%.1f urls_per_sec=${er.trace.size / secs}%.1f")
    val ok = er.trace == res.trace && er.seen == res.seen &&
      er.docs.map(d => (d.doc_id, d.spans)) == res.docs.map(d => (d.doc_id, d.spans)) &&
      er.duplicates == res.duplicates
    println(s"[engine] oracle-equal=$ok store=$root")

    // snapshot maintenance demo: compact the append-accumulated seen table
    val store = new graft.sources.SnapshotStore(root, spark)
    val dirsBefore = store.currentManifest.get.tables("seen").dataDirs.size
    store.compact("seen")
    val dirsAfter = store.currentManifest.get.tables("seen").dataDirs.size
    println(s"[engine] compact(seen): dataDirs $dirsBefore -> $dirsAfter " +
      s"rows=${store.read("seen").count()}")

    // expiry (deletion-safe dedup) demo: forget one fetched URL
    val victim = er.trace.head.canonical_url
    val removed = CrawlDriver.expire(spark, root, Seq(victim))
    println(s"[engine] expire($victim): removed=$removed " +
      s"stillSeen=${store.read("seen").where(s"canonical_url = '$victim'").count()}")

    spark.stop()
    if (!ok) sys.exit(1)
  }
}
