package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** URL scope filters ([[UrlScope]], Nutch urlfilter / Heritrix scope):
  * discovered links are checked on their resolved absolute form BEFORE the
  * depth cap and the seen-set — out-of-scope URLs never enter the crawl;
  * seeds bypass scope. Engine == sequential oracle bit-exact; per-wave
  * filtered counts ride the commit summaries.
  */
class UrlScopeSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlscope").toString

  import CrawlTestUtil.assertEqualResults

  test("allows(): suffix deny is case-insensitive, pattern deny is " +
    "unanchored find, allow-list requires a match when set") {
    val s = UrlScope(denySuffixes = Seq(".JPG", ".pdf"),
      denyPatterns = Seq("logout", "/private/"),
      allowPatterns = Seq("^http://host[0-3]\\.test/"))
    assert(!s.allows("http://host0.test/a/photo.jpg"))
    assert(!s.allows("http://host1.test/doc.PDF"))
    assert(!s.allows("http://host2.test/user/logout?next=/"))
    assert(!s.allows("http://host3.test/private/x"))
    assert(!s.allows("http://evil.test/clean"))
    assert(s.allows("http://host0.test/jpg/page")) // suffix, not substring
    assert(UrlScope().allows("anything://at.all"))
  }

  test("explicit fixture: filtered links (suffix / pattern / allow-miss) " +
    "never enter seen; a redirect into an out-of-scope target is dropped; " +
    "seeds bypass scope — engine == oracle, summaries roll up") {
    val seedA = "http://host0.test/logout" // matches a deny pattern: seeds bypass
    val seedR = "http://host1.test/r"
    val keep = "http://host0.test/keep"
    val fetcher = MapFetcher(
      links = Map(
        seedA -> Seq("/x.jpg", "/keep", "http://evil.test/page", "/logout2"),
        keep -> Nil),
      redirects = Map(seedR -> "/gone.jpg"))
    val cfg = CrawlConfig(Seq(seedA, seedR), budgetPerHost = 2,
      maxWaves = 1000, fetcherOverride = Some(fetcher),
      scope = UrlScope(denySuffixes = Seq(".jpg"),
        denyPatterns = Seq("logout"),
        allowPatterns = Seq("^http://host[0-3]\\.test/")))
    val (o, totals) = new RefCrawler(cfg).run()
    // only the two seeds + keep ever enter the crawl
    assert(o.seen === Set(seedA, seedR, keep))
    assert(o.trace.map(_.canonical_url).toSet === Set(seedA, keep))
    // wave 1: 3 filtered outlinks of seedA + seedR's filtered redirect target
    assert(totals.find(_.wave == 1).get.scope_filtered === 4L)
    assert(totals.find(_.wave == 1).get.redirected === 1L)
    assert(totals.map(_.scope_filtered).sum === 4L)

    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val store = new graft.sources.SnapshotStore(root, spark)
    val byWave = (1L to store.currentVersion.get).map(store.manifest)
      .flatMap(m => m.summary.get("wave_scope_filtered").map(c =>
        m.summary("wave").toInt -> c.toLong)).toMap
    totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.scope_filtered,
      s"wave ${t.wave} scope_filtered"))
  }

  test("path-trap guards: maxPathSegments bounds path depth, " +
    "maxSegmentRepeat bounds consecutive segment repetition (Heritrix " +
    "TooManyPathSegments / PathologicalPath) — allows() semantics plus a " +
    "self-link-trap crawl fixture, engine == oracle") {
    val deep = UrlScope(maxPathSegments = 3)
    assert(deep.allows("http://h.test/a/b/c"))
    assert(deep.allows("http://h.test/a/b/c?q=/x/y/z/w")) // query not path
    assert(!deep.allows("http://h.test/a/b/c/d"))
    val rep = UrlScope(maxSegmentRepeat = 2)
    assert(rep.allows("http://h.test/a/a"))
    assert(rep.allows("http://h.test/a/b/a/b")) // non-consecutive
    assert(!rep.allows("http://h.test/a/a/a"))
    assert(!rep.allows("http://h.test/x/cal/cal/cal/y"))
    assert(UrlScope(maxSegmentRepeat = 1).allows("http://h.test/a/b"))
    assert(!UrlScope(maxSegmentRepeat = 1).allows("http://h.test/a/a"))
    // the /a/a/a... self-link trap: the crawl follows the chain only to
    // the guard and the deep branch only to the segment bound
    val fetcher = MapFetcher(Map(
      "http://t.test/a" -> Seq("/a/a", "/x/y/z/w"),
      "http://t.test/a/a" -> Seq("/a/a/a", "/a/b/a")))
    val cfg = CrawlConfig(Seq("http://t.test/a"), budgetPerHost = 4,
      maxWaves = 1000, fetcherOverride = Some(fetcher),
      scope = UrlScope(maxPathSegments = 3, maxSegmentRepeat = 2))
    val (o, totals) = new RefCrawler(cfg).run()
    assert(o.seen === Set("http://t.test/a", "http://t.test/a/a",
      "http://t.test/a/b/a"))
    assert(totals.find(_.wave == 1).get.scope_filtered === 1L) // /x/y/z/w
    assert(totals.find(_.wave == 2).get.scope_filtered === 1L) // /a/a/a
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("URL-shape guards: maxUrlLength bounds total length, maxQueryParams " +
    "bounds '&'-separated query parameters (faceted-search trap) — allows() " +
    "semantics plus a query-explosion crawl fixture, engine == oracle") {
    val len = UrlScope(maxUrlLength = 24)
    assert(len.allows("http://h.test/p/12345678")) // exactly 24
    assert(!len.allows("http://h.test/p/123456789"))
    val qp = UrlScope(maxQueryParams = 2)
    assert(qp.allows("http://h.test/s"))
    assert(qp.allows("http://h.test/s?a=1&b=2"))
    assert(qp.allows("http://h.test/s?a=1&&b=2")) // empty token is a separator
    assert(!qp.allows("http://h.test/s?a=1&b=2&c=3"))
    assert(!qp.allows("http://h.test/s?a&b&c")) // key-only params count
    // faceted-search trap: each page mints one more facet toggle; the
    // guard stops the chain at 2 params, the length bound kills the
    // generated monster URL
    val fetcher = MapFetcher(Map(
      "http://f.test/s" -> Seq("/s?a=1", "/verylong/generated/x123456789"),
      "http://f.test/s?a=1" -> Seq("/s?a=1&b=2"),
      "http://f.test/s?a=1&b=2" -> Seq("/s?a=1&b=2&c=3")))
    val cfg = CrawlConfig(Seq("http://f.test/s"), budgetPerHost = 4,
      maxWaves = 1000, fetcherOverride = Some(fetcher),
      scope = UrlScope(maxUrlLength = 28, maxQueryParams = 2))
    val (o, totals) = new RefCrawler(cfg).run()
    assert(o.seen === Set("http://f.test/s", "http://f.test/s?a=1",
      "http://f.test/s?a=1&b=2"))
    assert(totals.find(_.wave == 1).get.scope_filtered === 1L) // long URL
    assert(totals.find(_.wave == 3).get.scope_filtered === 1L) // 3rd param
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("engine == oracle with scope + depth cap + redirect/failure injection " +
    "on the hash web, across parallelism and the full 10^10 config + resume; " +
    "the filter binds and filtered URLs stay out of every table") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30,
      redirectPct = 15, transientFailPct = 10)
    val scope = UrlScope(denyPatterns = Seq("/p/1[0-9]$"))
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web),
      maxDepth = 4, scope = scope)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.map(_.scope_filtered).sum > 0, "scope never bound — fixture weak")
    assert(totals.map(_.depth_capped).sum > 0, "cap never bound — fixture weak")
    // no out-of-scope URL in any output — except seeds, which bypass scope
    // (and some DO match the deny pattern here, pinning the bypass)
    val seedSet = cfg.seeds.map(graft.functions.CanonicalUrl.canonicalize).toSet
    assert(o.seen.forall(u => scope.allows(u) || seedSet.contains(u)),
      "an out-of-scope non-seed URL entered seen")
    assert(seedSet.exists(u => !scope.allows(u)),
      "no seed matched the deny pattern — bypass not exercised")

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
}
