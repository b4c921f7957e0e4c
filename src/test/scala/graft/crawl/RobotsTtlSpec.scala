package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Wave-scripted robots fetcher: pages serve `"<url> body"` with fixed
  * outlinks; `http://a.test/robots.txt` serves the body scripted for the
  * LARGEST key <= the fetch wave (None below the first key). Top-level
  * case class — an inner class would capture the non-serializable suite.
  */
case class TtlRobotsFetcher(links: Map[String, Seq[String]] = Map.empty,
                            robotsByWave: Map[Int, String] = Map.empty)
    extends PageFetcher {
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    (Vector(Span("text", s"$url body", null, 0)),
      links.getOrElse(url, Nil).toVector)
  override def fetchRobots(host: String, wave: Int): Option[String] =
    if (host != "a.test") None
    else robotsByWave.keys.filter(_ <= wave)
      .maxOption.map(robotsByWave)
  override def fetchRobots(host: String): Option[String] = fetchRobots(host, 0)
}

/** Robots TTL ([[CrawlConfig.robotsTtlWaves]], the RFC 9309 §2.4
  * cache-validity rule, oracle model point 16): a robots resolution
  * expires ttl waves after it was fetched; stale PENDING hosts re-fetch
  * at wave start (fresh Crawl-delay binds at that wave's selection),
  * stale CANDIDATE hosts at their next admission appearance (fresh rules
  * bind). Bodies may vary with the fetch wave. Engine == oracle
  * bit-exact in both robots distributions.
  */
class RobotsTtlSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlttl").toString

  import CrawlTestUtil.assertEqualResults

  private def summaryByWave(root: String, key: String): Map[Int, Long] = {
    val store = new graft.sources.SnapshotStore(root, spark)
    (1L to store.currentVersion.get).map(store.manifest)
      .flatMap(m => m.summary.get(key).map(c => m.summary("wave").toInt -> c.toLong))
      .toMap
  }

  test("explicit fixture: the seed host's robots flips to deny+Crawl-delay " +
    "mid-crawl — the TTL re-fetch picks it up at wave start, the new " +
    "budget binds at that wave's selection, already-admitted URLs still " +
    "fetch, new discoveries are denied — engine == oracle in BOTH robots " +
    "modes, wave_robots_refetched in summaries") {
    val fetcher = TtlRobotsFetcher(
      links = Map(
        "http://a.test/s" -> Seq("/p1", "/p2", "/p3"),
        "http://a.test/p1" -> Seq("/q1"),
        "http://a.test/q1" -> Seq("/p9")),
      robotsByWave = Map(
        0 -> "User-agent: *\nAllow: /\n",
        3 -> "User-agent: *\nDisallow: /p\nCrawl-delay: 60\n"))
    // ttl=3: seed resolution (wave 0) expires at wave 3, exactly when the
    // body has flipped. wavePeriodSeconds=60 maps Crawl-delay 60 -> budget 1.
    val cfg = CrawlConfig(Seq("http://a.test/s"), budgetPerHost = 2,
      maxWaves = 8, fetcherOverride = Some(fetcher), fetchRobotsTxt = true,
      robotsTtlWaves = 3, wavePeriodSeconds = 60.0)
    val (o, totals) = new RefCrawler(cfg).run()
    def fetchWave(u: String) = o.trace.filter(_.canonical_url == u).map(_.wave)
    // wave 1: s (admits p1 p2 p3 under allow-all). wave 2 (budget 2):
    // p1 p2 — p1 admits q1. wave 3: STALE -> re-fetch -> deny /p +
    // budget 1: pending p3 (depth 1) outranks q1 (depth 2); p3 fetches,
    // q1 defers. wave 4: q1 fetches, its /p9 discovery is DENIED.
    assert(fetchWave("http://a.test/s") === Seq(1))
    assert(fetchWave("http://a.test/p1") === Seq(2))
    assert(fetchWave("http://a.test/p2") === Seq(2))
    assert(fetchWave("http://a.test/p3") === Seq(3))
    assert(fetchWave("http://a.test/q1") === Seq(4))
    assert(o.seen.contains("http://a.test/p9") && fetchWave("http://a.test/p9").isEmpty,
      "post-flip discovery must be admitted-denied (in seen, never traced)")
    // re-fetches: wave 3 (pending host stale). Waves 4..6 the resolution
    // from wave 3 is fresh until wave 6 — by then the frontier drained.
    val refetchByWave = totals.map(t => t.wave -> t.robots_refetched).toMap
    assert(refetchByWave(3) === 1L)
    assert(refetchByWave.filter(_._1 != 3).values.forall(_ == 0L))

    for (eng <- Seq(CrawlDriver.EngineConfig(),
                    CrawlDriver.EngineConfig(robotsStorage = "table"))) {
      val root = tmp()
      CrawlDriver.run(spark, cfg, root, eng)
      assertEqualResults(o, CrawlDriver.result(spark, root))
      val byWave = summaryByWave(root, "wave_robots_refetched")
      totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.robots_refetched,
        s"wave ${t.wave} robots_refetched (${eng.robotsStorage})"))
    }
  }

  test("ttl=0 never re-fetches: volatile robots bodies stay whatever the " +
    "first fetch saw — engine == oracle, zero wave_robots_refetched") {
    val web = SyntheticWeb.WebConfig(hosts = 6, pagesPerHost = 25,
      volatileRobotsPct = 50)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(12, web), budgetPerHost = 3,
      maxWaves = 8, web = web, fetchRobotsTxt = true)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.forall(_.robots_refetched == 0L))
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    assert(summaryByWave(root, "wave_robots_refetched").values.forall(_ == 0L))
  }

  test("engine == oracle under TTL + volatile robots bodies + " +
    "failure/redirect injection on the hash web, across parallelism, in " +
    "table mode, and in the full 10^10 config with mid-crawl resume " +
    "(acquisition waves read back from robots_hosts)") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30,
      transientFailPct = 12, redirectPct = 8, volatileRobotsPct = 40)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(16, web), budgetPerHost = 2,
      maxWaves = 12, web = web, fetchRobotsTxt = true, robotsTtlWaves = 2)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.map(_.robots_refetched).sum > 0,
      "no robots re-fetch ever fired — fixture weak")

    for (parts <- Seq("8", "3")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, cfg, root)
        assertEqualResults(o, CrawlDriver.result(spark, root))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    // table mode + per-wave refetch counters
    val rootT = tmp()
    CrawlDriver.run(spark, cfg, rootT,
      CrawlDriver.EngineConfig(robotsStorage = "table"))
    assertEqualResults(o, CrawlDriver.result(spark, rootT))
    val byWave = summaryByWave(rootT, "wave_robots_refetched")
    totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.robots_refetched,
      s"wave ${t.wave} robots_refetched (table)"))
    // full 10^10 config, killed mid-crawl AFTER re-fetches began, resumed:
    // staleness rebuilds from the wave-stamped robots_hosts table — the
    // unbroken oracle stays the spec (table mode persists robots state)
    val splitAt = totals.find(_.robots_refetched > 0).get.wave
    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table",
      contentStorage = "store")
    val root = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = splitAt), root, eng)
    CrawlDriver.resume(spark, cfg, root, eng)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("broadcast-mode resume forgets robots state (inherent recency): " +
    "engine run+resume == phased oracle with clearAllResolvedOnSwitch — " +
    "pending hosts re-resolve at the resumed wave, the TTL clock restarts " +
    "there") {
    val web = SyntheticWeb.WebConfig(hosts = 6, pagesPerHost = 25,
      volatileRobotsPct = 40)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(12, web), budgetPerHost = 2,
      maxWaves = 10, web = web, fetchRobotsTxt = true, robotsTtlWaves = 2)
    val split = 4
    val (o, _) = new RefCrawler(cfg)
      .runPhased(split, cfg.copy(), clearAllResolvedOnSwitch = true)
    val root = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = split), root)
    CrawlDriver.resume(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("config validation: ttl must be >= 0 and requires fetchRobotsTxt") {
    assertThrows[IllegalArgumentException](
      CrawlConfig(Seq("http://a.test/x"), budgetPerHost = 1,
        fetchRobotsTxt = true, robotsTtlWaves = -1))
    assertThrows[IllegalArgumentException](
      CrawlConfig(Seq("http://a.test/x"), budgetPerHost = 1,
        robotsTtlWaves = 2))
  }
}
