package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.functions.Sitemap

/** [[SiteFetcher]] plus scripted CHILD sitemap bodies (index-file
  * support). Top-level case class — an inner class would capture the
  * suite.
  */
case class SiteIndexFetcher(links: Map[String, Seq[String]],
                            robots: Map[String, String] = Map.empty,
                            sitemaps: Map[String, String] = Map.empty,
                            sitemapsAt: Map[String, String] = Map.empty)
    extends PageFetcher {
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    (Vector(Span("text", s"body of $url", null, 0)),
      links.getOrElse(url, Nil).toVector)
  override def fetchRobots(host: String): Option[String] = robots.get(host)
  override def fetchSitemap(host: String): Option[String] = sitemaps.get(host)
  override def fetchSitemapAt(url: String): Option[String] = sitemapsAt.get(url)
}

/** [[SyntheticFetcher]] that REFUSES child sitemap fetches — proves the
  * urlset path never touches the new signature (legacy-fetcher
  * invariance).
  */
case class NoChildFetcher(web: SyntheticWeb.WebConfig) extends PageFetcher {
  private val inner = SyntheticFetcher(web)
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    inner.fetchParse(url)
  override def fetchAttempt(url: String, attempt: Int): FetchOutcome =
    inner.fetchAttempt(url, attempt)
  override def fetchAttempt(url: String, attempt: Int, generation: Int): FetchOutcome =
    inner.fetchAttempt(url, attempt, generation)
  override def fetchRobots(host: String): Option[String] = inner.fetchRobots(host)
  override def fetchRobots(host: String, wave: Int): Option[String] =
    inner.fetchRobots(host, wave)
  override def fetchSitemap(host: String): Option[String] = inner.fetchSitemap(host)
  override def fetchSitemapAt(url: String): Option[String] =
    throw new IllegalStateException(s"fetchSitemapAt on a urlset-only web: $url")
}

/** Sitemap INDEX files (sitemaps.org `<sitemapindex>`, the documented
  * out-of-scope gap closed in r5): an index body at the well-known probe
  * path expands — inside the host's single robots-gated probe — to the
  * concatenation of its same-host children's urlset entries in index
  * document order, each child fetched once via
  * [[PageFetcher.fetchSitemapAt]]. Cross-host children are dropped
  * BEFORE any fetch, repeated child locs fetch once, a child that is
  * itself an index is ignored (the sitemaps.org nested-index rule = the
  * loop guard), and an unserved child contributes nothing. A plain
  * urlset body never calls the new signature, so legacy fetchers are
  * untouched. Engine == oracle bit-exact through the existing admission
  * machinery (the expansion is upstream of candidate-row construction,
  * shared by both sides).
  */
class SitemapIndexSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlsmidx").toString

  import CrawlTestUtil.assertEqualResults

  private def urlset(locs: String*): String =
    "<urlset>" + locs.map(l => s"<url><loc>$l</loc></url>").mkString + "</urlset>"

  private def index(locs: String*): String =
    "<sitemapindex>" +
      locs.map(l => s"<sitemap><loc>$l</loc></sitemap>").mkString +
      "</sitemapindex>"

  test("Sitemap.expand: urlset passes through with ZERO child fetches; an " +
    "index concatenates same-host children in document order, fetching " +
    "each child once — cross-host children never fetched, nested-index " +
    "children ignored, unserved children empty") {
    val flat = urlset("http://a.test/u1", "http://a.test/u2")
    assert(Sitemap.expand("a.test", flat,
      _ => throw new IllegalStateException("child fetch on urlset")) ===
      Vector("http://a.test/u1", "http://a.test/u2"))

    val idx = index(
      "http://a.test/sitemap-1.xml",
      "http://A.TEST/sitemap-2.xml",   // raw form: resolves + canonicalizes
      "http://a.test/sitemap-1.xml",   // duplicate child: fetched once
      "http://b.test/sitemap-1.xml",   // cross-host: dropped pre-fetch
      "http://a.test/sitemap.xml",     // self-reference: index body → ignored
      "http://a.test/missing.xml")     // unserved: None
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val bodies = Map(
      "http://a.test/sitemap-1.xml" ->
        urlset("http://a.test/c1a", "http://b.test/x", "http://a.test/c1b"),
      "http://a.test/sitemap-2.xml" ->
        urlset("/c2a", "http://a.test/c2b"), // relative loc: resolves vs CHILD url
      "http://a.test/sitemap.xml" -> idx)
    val out = Sitemap.expand("a.test", idx, { u => calls += u; bodies.get(u) })
    assert(out === Vector(
      "http://a.test/c1a", "http://a.test/c1b", // child 1 (cross-host x dropped)
      "http://a.test/c2a", "http://a.test/c2b")) // child 2, relative resolved
    assert(calls.toSeq === Seq(
      "http://a.test/sitemap-1.xml", "http://a.test/sitemap-2.xml",
      "http://a.test/sitemap.xml", "http://a.test/missing.xml"),
      "each distinct same-host child fetched exactly once, in doc order; " +
        "cross-host child never fetched")
  }

  test("explicit fixture: an index host's entries admit in " +
    "child-concatenation order after the wave's page candidates; " +
    "duplicate entries across children dedup at admission — engine == " +
    "oracle, probed host recorded once") {
    val fetcher = SiteIndexFetcher(
      links = Map.empty,
      sitemaps = Map("a.test" -> index(
        "http://a.test/sitemap-1.xml",
        "http://a.test/sitemap-2.xml",
        "http://a.test/sitemap-1.xml",  // dup child
        "http://b.test/sitemap-1.xml",  // cross-host
        "http://a.test/sitemap.xml",    // self-index
        "http://a.test/missing.xml")),  // unserved
      sitemapsAt = Map(
        "http://a.test/sitemap-1.xml" -> urlset(
          "http://a.test/i1", "http://a.test/i2"),
        "http://a.test/sitemap-2.xml" -> urlset(
          "http://a.test/i3", "http://a.test/i1"))) // i1 dups at admission
    val cfg = CrawlConfig(Seq("http://a.test/s"), budgetPerHost = 10,
      maxWaves = 1000, fetcherOverride = Some(fetcher), fetchRobotsTxt = true,
      fetchSitemaps = true)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(o.seen === Set("http://a.test/s", "http://a.test/i1",
      "http://a.test/i2", "http://a.test/i3"))
    assert(o.trace === Seq(
      TraceRow(1, 1, "a.test", "http://a.test/s"),
      TraceRow(1, 2, "a.test", "http://a.test/i1"),
      TraceRow(1, 3, "a.test", "http://a.test/i2"),
      TraceRow(1, 4, "a.test", "http://a.test/i3")))
    assert(totals.map(_.sitemap_urls).sum === 0L,
      "seed-phase (wave-0) probe counters are discarded by design")
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val store = new graft.sources.SnapshotStore(root, spark)
    val probed = store.read("sitemap_hosts").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(probed === Map("a.test" -> 0),
      "one probe for the index host; the cross-host child's host is never probed")
  }

  private def hashWeb = SyntheticWeb.WebConfig(hosts = 16, pagesPerHost = 30,
    sitemapHostPct = 70, sitemapIndexPct = 60, redirectPct = 10,
    transientFailPct = 10, permanentFailPct = 5)

  test("engine == oracle on a hash web where most sitemaps are INDEX " +
    "files (robots + redirect + failure injection in force), across " +
    "parallelism, and the full 10^10 engine config with mid-run resume") {
    val web = hashWeb
    // fixture strength: the web must actually serve index files whose
    // expansion yields entries
    val served = (0 until web.hosts).flatMap { i =>
      SyntheticWeb.sitemapTxt(s"host$i.test", web).map(b => (s"host$i.test", b))
    }
    assert(served.exists { case (_, b) => Sitemap.isIndex(b) }, "no index host")
    assert(served.exists { case (_, b) => !Sitemap.isIndex(b) }, "no urlset host")
    val f = SyntheticFetcher(web)
    assert(served.filter { case (_, b) => Sitemap.isIndex(b) }.exists {
      case (h, b) => Sitemap.expand(h, b, f.fetchSitemapAt).nonEmpty
    }, "every index expanded empty — fixture weak")

    val cfg = CrawlConfig(SyntheticWeb.seedUrls(6, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web),
      fetchRobotsTxt = true, fetchSitemaps = true)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.map(_.sitemap_urls).sum > 0, "no entries evaluated")
    assert(totals.filter(_.wave > 2).map(_.sitemap_urls).sum > 0,
      "no post-wave-2 probes — resume leg would be vacuous")

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
  }

  test("sitemapIndexPct=0 web is byte-invariant AND never calls " +
    "fetchSitemapAt — a legacy fetcher (urlset-only, throwing child " +
    "fetch) runs the identical crawl") {
    val web = hashWeb.copy(sitemapIndexPct = 0, redirectPct = 0,
      transientFailPct = 0, permanentFailPct = 0, hosts = 8)
    val plain = CrawlConfig(SyntheticWeb.seedUrls(5, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, fetchRobotsTxt = true, fetchSitemaps = true)
    val (o, _) = new RefCrawler(plain).run() // oracle on the default fetcher
    val guarded = plain.copy(fetcherOverride = Some(NoChildFetcher(web)))
    val root = tmp()
    CrawlDriver.run(spark, guarded, root) // throws if any child fetch happens
    assertEqualResults(o, CrawlDriver.result(spark, root))
    // and the oracle side never calls it either
    val (o2, _) = new RefCrawler(guarded).run()
    assertEqualResults(o, o2)
  }
}
