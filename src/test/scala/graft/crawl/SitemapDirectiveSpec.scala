package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.functions.{RobotsTxt, Sitemap}

/** robots.txt `Sitemap:` directive discovery (sitemaps.org submission,
  * the Nutch/Heritrix sitemap-discovery order): when the crawl fetches
  * robots at all, a host's sitemap probe consults the robots body served
  * at probe time — same-host `Sitemap:` declarations, in declaration
  * order, each fetched once and expanded at its own URL (index bodies
  * included) WITHOUT a per-path robots gate (the declaration is the
  * host's explicit submission) — and falls back to the robots-gated
  * well-known `/sitemap.xml` probe only when nothing is declared.
  * Engine == oracle bit-exact; one shared
  * [[graft.functions.Sitemap.discover]] definition.
  */
class SitemapDirectiveSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlsmd").toString

  import CrawlTestUtil.assertEqualResults

  private def urlset(locs: String*): String =
    "<urlset>" + locs.map(l => s"<url><loc>$l</loc></url>").mkString + "</urlset>"

  test("RobotsTxt.sitemapUrls: declaration order, case-insensitive field, " +
    "comments stripped, group-independent, cross-host dropped, raw forms " +
    "canonicalized, duplicates keep first") {
    val body =
      """User-agent: *
        |Disallow: /private
        |Sitemap: http://a.test/sm-one.xml
        |sitemap: http://A.TEST:80/sm-two.xml   # comment
        |User-agent: other
        |SITEMAP: http://b.test/cross.xml
        |Sitemap: http://a.test/sm-one.xml
        |Sitemap:
        |""".stripMargin
    assert(RobotsTxt.sitemapUrls("a.test", body) === Vector(
      "http://a.test/sm-one.xml", "http://a.test/sm-two.xml"))
    assert(RobotsTxt.sitemapUrls("a.test", "User-agent: *\nDisallow: /x\n")
      === Vector.empty)
  }

  test("Sitemap.discover: declared list preempts the well-known probe " +
    "(which is NOT fetched), each declared URL fetched once without a " +
    "path gate; empty declarations fall back to the gated probe") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val bodies = Map(
      "http://a.test/d1.xml" -> urlset("http://a.test/u1"),
      "http://a.test/d2.xml" -> urlset("http://a.test/u2"))
    val out = Sitemap.discover("a.test",
      Seq("http://a.test/d1.xml", "http://a.test/d2.xml", "http://a.test/d1.xml"),
      wellKnownOk = false, // gate denied — declared fetches unaffected
      fetchWellKnown = () => throw new IllegalStateException("well-known probed"),
      fetchAt = { u => calls += u; bodies.get(u) })
    assert(out === Vector("http://a.test/u1", "http://a.test/u2"))
    assert(calls.toSeq === Seq("http://a.test/d1.xml", "http://a.test/d2.xml"))

    // no declarations: gated fallback — denied probes nothing
    assert(Sitemap.discover("a.test", Nil, wellKnownOk = false,
      () => throw new IllegalStateException("gated off"),
      _ => throw new IllegalStateException("no children")) === Vector.empty)
    assert(Sitemap.discover("a.test", Nil, wellKnownOk = true,
      () => Some(urlset("http://a.test/w1")),
      _ => throw new IllegalStateException("no children")) ===
      Vector("http://a.test/w1"))
  }

  test("explicit fixture: declared sitemaps (incl. an index) admit in " +
    "declaration order even when /sitemap.xml is robots-DENIED and the " +
    "well-known body is ignored — engine == oracle") {
    val fetcher = SiteIndexFetcher(
      links = Map.empty,
      robots = Map("a.test" ->
        ("User-agent: *\nDisallow: /sitemap.xml\n" +
          "Sitemap: http://a.test/d1.xml\n" +
          "Sitemap: http://a.test/idx.xml\n")),
      sitemaps = Map("a.test" -> urlset("http://a.test/NEVER")),
      sitemapsAt = Map(
        "http://a.test/d1.xml" -> urlset("http://a.test/u1"),
        "http://a.test/idx.xml" ->
          ("<sitemapindex><sitemap><loc>http://a.test/idx-c.xml</loc>" +
            "</sitemap></sitemapindex>"),
        "http://a.test/idx-c.xml" -> urlset("http://a.test/u2")))
    val cfg = CrawlConfig(Seq("http://a.test/s"), budgetPerHost = 10,
      maxWaves = 1000, fetcherOverride = Some(fetcher), fetchRobotsTxt = true,
      fetchSitemaps = true)
    val (o, _) = new RefCrawler(cfg).run()
    assert(o.seen === Set("http://a.test/s", "http://a.test/u1",
      "http://a.test/u2"))
    assert(o.trace === Seq(
      TraceRow(1, 1, "a.test", "http://a.test/s"),
      TraceRow(1, 2, "a.test", "http://a.test/u1"),
      TraceRow(1, 3, "a.test", "http://a.test/u2")))
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  private def hashWeb = SyntheticWeb.WebConfig(hosts = 16, pagesPerHost = 30,
    sitemapHostPct = 60, sitemapIndexPct = 40, sitemapDirectivePct = 50,
    redirectPct = 10, transientFailPct = 10)

  test("engine == oracle on a hash web mixing declared sitemaps (urlset + " +
    "index + cross-host + well-known-as-declared) with well-known-only " +
    "hosts, across parallelism and the full 10^10 config with mid-run " +
    "resume; also under volatile robots + TTL re-fetch") {
    val web = hashWeb
    // fixture strength: some host declares, and declared fetches yield
    // entries; some sitemap-serving host declares nothing (fallback path)
    val declaring = (0 until web.hosts).flatMap { i =>
      val hn = s"host$i.test"
      SyntheticWeb.robotsTxt(hn, web)
        .map(b => (hn, RobotsTxt.sitemapUrls(hn, b))).filter(_._2.nonEmpty)
    }
    assert(declaring.nonEmpty, "no declaring host — fixture weak")
    val f = SyntheticFetcher(web)
    assert(declaring.exists { case (hn, ds) =>
      Sitemap.discover(hn, ds, wellKnownOk = false,
        () => None, f.fetchSitemapAt).nonEmpty
    }, "declared sitemaps all empty — fixture weak")
    assert((0 until web.hosts).exists { i =>
      val hn = s"host$i.test"
      !declaring.exists(_._1 == hn) && SyntheticWeb.sitemapTxt(hn, web).isDefined
    }, "no fallback-path host — fixture weak")

    val cfg = CrawlConfig(SyntheticWeb.seedUrls(6, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web),
      fetchRobotsTxt = true, fetchSitemaps = true)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.map(_.sitemap_urls).sum > 0, "no entries evaluated")

    for (parts <- Seq("8", "3")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, cfg, root)
        assertEqualResults(o, CrawlDriver.result(spark, root))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table")
    val root = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = 2), root, eng)
    CrawlDriver.resume(spark, cfg, root, eng)
    assertEqualResults(o, CrawlDriver.result(spark, root))

    // volatile robots bodies + TTL: the probe reads the body served at
    // the probe wave on BOTH sides, whatever the TTL refetch cycle does
    val webV = web.copy(volatileRobotsPct = 30)
    val cfgV = cfg.copy(web = webV, seeds = SyntheticWeb.seedUrls(6, webV),
      robotsTtlWaves = 2)
    val (oV, _) = new RefCrawler(cfgV).run()
    val rootV = tmp()
    CrawlDriver.run(spark, cfgV, rootV, eng)
    assertEqualResults(oV, CrawlDriver.result(spark, rootV))
  }

  test("distributed seed ingest (runWithSeedTable) honors directives for " +
    "wave-0 seed-host probes — == the sequential oracle, broadcast and " +
    "table robots modes") {
    import spark.implicits._
    val web = hashWeb.copy(hosts = 6, redirectPct = 0, transientFailPct = 0)
    val w = web
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(30, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web),
      fetchRobotsTxt = true, fetchSitemaps = true)
    val (o, _) = new RefCrawler(cfg).run()
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

  test("fetchRobotsTxt=false never consults directives: a " +
    "directive-serving web crawls identically to the directive-free web " +
    "under fixture robots — engine == oracle == directive-free run") {
    val web = hashWeb.copy(redirectPct = 0, transientFailPct = 0, hosts = 8)
    val webOff = web.copy(sitemapDirectivePct = 0)
    val mk = (w: SyntheticWeb.WebConfig) => CrawlConfig(
      SyntheticWeb.seedUrls(5, w), budgetPerHost = 2, maxWaves = 1000,
      web = w, robots = SyntheticWeb.robotsFixture(w), fetchSitemaps = true)
    val (o, _) = new RefCrawler(mk(web)).run()
    val (oOff, _) = new RefCrawler(mk(webOff)).run()
    assertEqualResults(oOff, o) // robots bodies unread → identical crawls
    val root = tmp()
    CrawlDriver.run(spark, mk(web), root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }
}
