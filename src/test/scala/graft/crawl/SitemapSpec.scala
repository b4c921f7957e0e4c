package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Scripted fetcher with explicit robots + sitemap bodies per host.
  * Top-level case class — an inner class would capture the suite.
  */
case class SiteFetcher(links: Map[String, Seq[String]],
                       robots: Map[String, String] = Map.empty,
                       sitemaps: Map[String, String] = Map.empty)
    extends PageFetcher {
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    (Vector(Span("text", s"body of $url", null, 0)),
      links.getOrElse(url, Nil).toVector)
  override def fetchRobots(host: String): Option[String] = robots.get(host)
  override def fetchSitemap(host: String): Option[String] = sitemaps.get(host)
}

/** Sitemap ingestion ([[CrawlConfig.fetchSitemaps]], the Nutch/Heritrix
  * sitemap-processor shape, oracle model point 13): every host, on its
  * first-EVER candidate appearance (seeds included), is probed ONCE for
  * `/sitemap.xml` — robots-gated on that path — and its same-host entries
  * admit AFTER the wave's page-derived candidates, ordered (host, entry
  * index) at depth 1, through the standard scope → depth → seen-dedup →
  * host-cap → robots guards. Probed hosts persist in the wave-stamped
  * `sitemap_hosts` table; resume reads it back; flag-off runs record
  * nothing. Engine == oracle bit-exact.
  */
class SitemapSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlsm").toString

  import CrawlTestUtil.assertEqualResults

  private def summaryByWave(root: String, key: String): Map[Int, Long] = {
    val store = new graft.sources.SnapshotStore(root, spark)
    (1L to store.currentVersion.get).map(store.manifest)
      .flatMap(m => m.summary.get(key).map(c => m.summary("wave").toInt -> c.toLong))
      .toMap
  }

  private def sitemapHostWaves(root: String): Map[String, Int] = {
    val store = new graft.sources.SnapshotStore(root, spark)
    store.read("sitemap_hosts").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
  }

  test("explicit fixture: seed hosts probe at wave 0 and entries admit " +
    "after the seeds; a wave-1 host's entries admit after that wave's page " +
    "links (page sighting wins the dedup); robots gate the probe " +
    "(/sitemap.xml disallowed, deny-all) and deny individual entries; " +
    "cross-host and duplicate locs drop — engine == oracle, probed hosts " +
    "in sitemap_hosts, entry counts in summaries") {
    val fetcher = SiteFetcher(
      links = Map(
        "http://a.test/s" -> Seq("http://e.test/p1", "http://e.test/p2")),
      robots = Map(
        "a.test" -> "User-agent: *\nDisallow: /sm2\n",
        "b.test" -> "User-agent: *\nDisallow: /sitemap.xml\n",
        "c.test" -> "User-agent: *\nDisallow: /\n"),
      sitemaps = Map(
        "a.test" -> ("<urlset><url><loc>http://a.test/sm1</loc></url>" +
          "<url><loc>http://a.test/sm2</loc></url>" +
          "<url><loc>http://a.test/sm1</loc></url>" + // duplicate
          "<url><loc>http://b.test/x</loc></url></urlset>"), // cross-host
        "b.test" -> "<urlset><url><loc>http://b.test/q1</loc></url></urlset>",
        "e.test" -> ("<urlset><url><loc>http://e.test/p2</loc></url>" +
          "<url><loc>http://e.test/p9</loc></url></urlset>")))
    val cfg = CrawlConfig(
      Seq("http://a.test/s", "http://b.test/s", "http://c.test/s",
        "http://d.test/s"),
      budgetPerHost = 5, maxWaves = 1000, fetcherOverride = Some(fetcher),
      fetchRobotsTxt = true, fetchSitemaps = true)
    val (o, totals) = new RefCrawler(cfg).run()

    // wave-0 probes: a allowed (only /sm2 denied) → sm1 admitted, sm2
    // denied-at-admission (seen only), dup + cross-host dropped; b's probe
    // is robots-gated off (q1 never enters); c is deny-all (its seed is
    // denied too); d serves nothing
    assert(o.seen === Set(
      "http://a.test/s", "http://b.test/s", "http://c.test/s",
      "http://d.test/s", "http://a.test/sm1", "http://a.test/sm2",
      "http://e.test/p1", "http://e.test/p2", "http://e.test/p9"))
    assert(!o.seen.contains("http://b.test/q1"))
    // wave 1 trace: seeds (priority 0, seed order) then a's sitemap entry
    // (priority=depth 1); wave 2: e.test's pages — p9 (the wave-1 probe of
    // first-encountered e.test) admitted AFTER the page links p1/p2
    assert(o.trace === Seq(
      TraceRow(1, 1, "a.test", "http://a.test/s"),
      TraceRow(1, 2, "b.test", "http://b.test/s"),
      TraceRow(1, 3, "d.test", "http://d.test/s"),
      TraceRow(1, 4, "a.test", "http://a.test/sm1"),
      TraceRow(2, 1, "e.test", "http://e.test/p1"),
      TraceRow(2, 2, "e.test", "http://e.test/p2"),
      TraceRow(2, 3, "e.test", "http://e.test/p9")))
    // e.test's loc /p2 collides with a page link of the same wave: the
    // page sighting wins, the loc counts deduped
    val t1 = totals.find(_.wave == 1).get
    assert(t1.sitemap_urls === 2L, "e.test entries evaluated at wave 1")
    assert(t1.discovered === 3L && t1.deduped === 1L)
    assert(totals.filter(_.wave != 1).forall(_.sitemap_urls == 0L))

    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    assert(sitemapHostWaves(root) === Map(
      "a.test" -> 0, "b.test" -> 0, "c.test" -> 0, "d.test" -> 0,
      "e.test" -> 1))
    val byWave = summaryByWave(root, "wave_sitemap_urls")
    totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.sitemap_urls,
      s"wave ${t.wave} sitemap_urls"))
  }

  test("maxDepth=0 depth-caps every sitemap entry (depth 1); entries also " +
    "pass the scope filter — engine == oracle") {
    val fetcher = SiteFetcher(
      links = Map.empty,
      sitemaps = Map("a.test" ->
        ("<urlset><url><loc>http://a.test/sm1</loc></url>" +
          "<url><loc>http://a.test/skip.jpg</loc></url></urlset>")))
    val base = CrawlConfig(Seq("http://a.test/s"), budgetPerHost = 5,
      maxWaves = 10, fetcherOverride = Some(fetcher), fetchRobotsTxt = true,
      fetchSitemaps = true)
    // depth cap at 0: the entry is evaluated (counts sitemap_urls via the
    // wave-1 probe? no — seed-phase counters are discarded) and capped
    val cfgCap = base.copy(maxDepth = 0)
    val (oCap, _) = new RefCrawler(cfgCap).run()
    assert(oCap.seen === Set("http://a.test/s"), "depth-0 cap admits no entry")
    val rootCap = tmp()
    CrawlDriver.run(spark, cfgCap, rootCap)
    assertEqualResults(oCap, CrawlDriver.result(spark, rootCap))
    // scope: the .jpg entry is filtered, sm1 admits
    val cfgScope = base.copy(scope = UrlScope(denySuffixes = Seq(".jpg")))
    val (oScope, _) = new RefCrawler(cfgScope).run()
    assert(oScope.seen === Set("http://a.test/s", "http://a.test/sm1"))
    val rootScope = tmp()
    CrawlDriver.run(spark, cfgScope, rootScope)
    assertEqualResults(oScope, CrawlDriver.result(spark, rootScope))
  }

  private def hashWeb = SyntheticWeb.WebConfig(hosts = 16, pagesPerHost = 30,
    sitemapHostPct = 60, redirectPct = 10, transientFailPct = 10,
    permanentFailPct = 5)

  test("engine == oracle on the sitemap-serving hash web combined with " +
    "robots + redirect + failure injection, across parallelism, and the " +
    "full 10^10 engine config with mid-run resume (probed-host state " +
    "rebuilt from the sitemap_hosts table)") {
    val web = hashWeb
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(6, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web),
      fetchRobotsTxt = true, fetchSitemaps = true)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.map(_.sitemap_urls).sum > 0, "no entries evaluated — fixture weak")
    assert(totals.filter(_.wave > 2).map(_.sitemap_urls).sum > 0,
      "no post-wave-2 probes — resume leg would be vacuous")
    val (oOff, _) = new RefCrawler(cfg.copy(fetchSitemaps = false)).run()
    assert(o.seen.size > oOff.seen.size,
      "sitemaps should admit URLs the link graph alone does not reach")

    for (parts <- Seq("8", "3")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, cfg, root)
        assertEqualResults(o, CrawlDriver.result(spark, root))
        val byWave = summaryByWave(root, "wave_sitemap_urls")
        totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.sitemap_urls,
          s"wave ${t.wave} sitemap_urls"))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    // full 10^10 engine config, killed after wave 2 and resumed: the
    // resumed run must NOT re-probe phase-1 hosts (sitemap_hosts read
    // back) and must keep probing newly met ones
    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table")
    val root = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = 2), root, eng)
    CrawlDriver.resume(spark, cfg, root, eng)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    assert(sitemapHostWaves(root).values.exists(_ > 2),
      "no post-resume probe — fixture weak")
  }

  test("sitemaps ENABLED AT RESUME probe hosts on their next candidate " +
    "re-encounter (the flag-off phase recorded nothing) — engine == " +
    "phased oracle") {
    val web = hashWeb.copy(hosts = 8, redirectPct = 0, transientFailPct = 0,
      permanentFailPct = 0)
    val cfg1 = CrawlConfig(SyntheticWeb.seedUrls(10, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, fetchRobotsTxt = true)
    val cfg2 = cfg1.copy(fetchSitemaps = true)
    val (o, totals) = new RefCrawler(cfg1).runPhased(2, cfg2)
    assert(totals.filter(_.wave <= 2).forall(_.sitemap_urls == 0L))
    assert(totals.filter(_.wave > 2).map(_.sitemap_urls).sum > 0,
      "phase-2 probes never happened — fixture weak")
    val root = tmp()
    CrawlDriver.run(spark, cfg1.copy(maxWaves = 2), root)
    CrawlDriver.resume(spark, cfg2, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("probed-state join strategy branch: broadcast-hinted under the row " +
    "bound, forced-withheld above it — counters pin the branch, outputs " +
    "identical") {
    val web = hashWeb.copy(hosts = 8, redirectPct = 0, transientFailPct = 0,
      permanentFailPct = 0)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(8, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, fetchSitemaps = true)
    val (o, _) = new RefCrawler(cfg).run()
    val rootH = tmp()
    val hH = CrawlDriver.run(spark, cfg, rootH)
    assert(hH.sitemapHintsApplied > 0 && hH.sitemapHintsWithheld === 0)
    assertEqualResults(o, CrawlDriver.result(spark, rootH))
    val rootW = tmp()
    val hW = CrawlDriver.run(spark, cfg, rootW,
      CrawlDriver.EngineConfig(robotsBroadcastMaxRows = 0))
    assert(hW.sitemapHintsWithheld > 0 && hW.sitemapHintsApplied === 0)
    assertEqualResults(o, CrawlDriver.result(spark, rootW))
  }

  test("distributed seed ingest (runWithSeedTable) probes seed hosts at " +
    "wave 0 with the host cap and scope in force — == the sequential " +
    "oracle, in broadcast and table robots modes") {
    import spark.implicits._
    val web = hashWeb.copy(hosts = 6)
    val w = web
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(30, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web),
      fetchRobotsTxt = true, fetchSitemaps = true,
      maxUrlsPerHost = 12, scope = UrlScope(denyPatterns = Seq("/p/2[0-9]$")))
    val (o, _) = new RefCrawler(cfg).run()
    // every host is a seed host here, so all probes happen at wave 0
    // (whose counters are discarded) — assert the effect on seen instead
    val (oOff, _) = new RefCrawler(cfg.copy(fetchSitemaps = false)).run()
    assert(o.seen.size > oOff.seen.size,
      "wave-0 probes admitted nothing — fixture weak")
    val seedsDf = spark.range(0, 30, 1, 4)
      .map(i => (SyntheticWeb.seedUrl(i, w), i)).toDF("url", "seed_seq")
    for (eng <- Seq(CrawlDriver.EngineConfig(),
        CrawlDriver.EngineConfig(robotsStorage = "table"))) {
      val root = tmp()
      CrawlDriver.runWithSeedTable(spark, cfg.copy(seeds = Nil), root,
        seedsDf, eng)
      assertEqualResults(o, CrawlDriver.result(spark, root))
    }
  }

  test("flag OFF is invariant on a sitemap-serving web: no probes, no " +
    "sitemap_hosts rows, zero summary counts") {
    val web = hashWeb.copy(hosts = 6, redirectPct = 0, transientFailPct = 0,
      permanentFailPct = 0)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(6, web), budgetPerHost = 3,
      maxWaves = 1000, web = web)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.forall(_.sitemap_urls == 0L))
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val store = new graft.sources.SnapshotStore(root, spark)
    assert(store.read("sitemap_hosts").count() === 0L)
    assert(summaryByWave(root, "wave_sitemap_urls").values.forall(_ == 0L))
  }
}
