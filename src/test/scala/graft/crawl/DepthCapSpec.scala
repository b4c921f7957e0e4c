package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Explicit-adjacency fetcher: each page's outlinks come from a map
  * (absent = leaf); URLs in `redirects` 3xx to their Location instead.
  * Top-level case class — an inner class would capture (and fail to
  * serialize) the suite.
  */
case class MapFetcher(links: Map[String, Seq[String]],
                      redirects: Map[String, String] = Map.empty)
    extends PageFetcher {
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    (Vector(Span("text", s"body of $url", "", 0)),
      links.getOrElse(url, Nil).toVector)
  override def fetchAttempt(url: String, attempt: Int): FetchOutcome =
    redirects.get(url) match {
      case Some(raw) => Redirected(raw)
      case None      => super.fetchAttempt(url, attempt)
    }
}

/** Depth-cap semantics ([[CrawlConfig.maxDepth]]): a candidate whose depth
  * would exceed maxDepth is dropped AT DISCOVERY — it never enters the
  * seen-set, so a later discovery through a shallower path can still admit
  * it (the check precedes the seen check on both sides, so an already-seen
  * capped link counts as capped, not deduped). Engine == oracle bit-exact;
  * per-wave capped counts ride the commit summaries.
  */
class DepthCapSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawldepth").toString

  import CrawlTestUtil.assertEqualResults

  test("capped-then-shallower-readmit: a URL first reached past maxDepth is " +
    "dropped without entering seen, then admitted and fetched via a later " +
    "shallower path — engine == oracle, capped counts in summaries") {
    val x = "http://host2.test/x"
    val fetcher = MapFetcher(Map(
      // fast chain on host0 reaches x at depth 3 (capped at maxDepth=2)
      "http://host0.test/a" -> Seq("/b"),
      "http://host0.test/b" -> Seq("/c"),
      "http://host0.test/c" -> Seq(x),
      // slow path on host1: budget 1 defers t5 to wave 6, which links to x
      // at depth 2 — AFTER the capped sighting (wave 3)
      "http://host1.test/s" -> Seq("/t1", "/t2", "/t3", "/t4", "/t5"),
      "http://host1.test/t5" -> Seq(x),
      // x itself links one past the cap again (stays capped forever)
      x -> Seq("/y")))
    val cfg = CrawlConfig(
      Seq("http://host0.test/a", "http://host1.test/s"),
      budgetPerHost = 1, maxWaves = 1000, maxDepth = 2,
      fetcherOverride = Some(fetcher))
    val (o, totals) = new RefCrawler(cfg).run()
    val traced = o.trace.map(r => r.canonical_url -> r.wave).toMap
    // x was capped in wave 3 (c fetched) and admitted in wave 6 (t5 fetched)
    assert(totals.find(_.wave == 3).get.depth_capped === 1L, "x not capped at wave 3")
    assert(traced.contains(x), "x never fetched despite the shallower path")
    assert(traced(x) === 7, "x should be fetched the wave after t5 admits it")
    // y stays capped: in no table, and counted capped at x's fetch wave
    assert(!o.seen.contains("http://host2.test/y"))
    assert(totals.find(_.wave == 7).get.depth_capped === 1L)
    assert(totals.map(_.depth_capped).sum === 2L)

    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val store = new graft.sources.SnapshotStore(root, spark)
    val byWave = (1L to store.currentVersion.get).map(store.manifest)
      .flatMap(m => m.summary.get("wave_depth_capped").map(c =>
        m.summary("wave").toInt -> c.toLong)).toMap
    totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.depth_capped,
      s"wave ${t.wave} depth_capped"))
  }

  test("engine == oracle under maxDepth on the hash web, combined with " +
    "redirect + failure injection, across parallelism and engine modes; " +
    "the cap binds (fewer URLs than uncapped) and seeds always admit") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30,
      redirectPct = 15, transientFailPct = 15, permanentFailPct = 5)
    def cfg(maxDepth: Int) =
      CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
        maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web),
        maxDepth = maxDepth)
    val (capped, cappedTotals) = new RefCrawler(cfg(2)).run()
    val (uncapped, _) = new RefCrawler(cfg(Int.MaxValue)).run()
    assert(cappedTotals.map(_.depth_capped).sum > 0, "cap never bound — fixture weak")
    assert(capped.seen.size < uncapped.seen.size)
    assert(capped.trace.nonEmpty, "seeds (depth 0) must still crawl")

    for (parts <- Seq("8", "3")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, cfg(2), root)
        assertEqualResults(capped, CrawlDriver.result(spark, root))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    // full 10^10 engine config + resume across the cap
    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table")
    val root = tmp()
    CrawlDriver.run(spark, cfg(2).copy(maxWaves = 2), root, eng)
    CrawlDriver.resume(spark, cfg(2), root, eng)
    assertEqualResults(capped, CrawlDriver.result(spark, root))
  }

  test("maxDepth = 0 fetches exactly the seeds; negative maxDepth rejected") {
    val web = SyntheticWeb.WebConfig(hosts = 4, pagesPerHost = 10)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(6, web), budgetPerHost = 10,
      maxWaves = 1000, web = web, maxDepth = 0)
    val (o, _) = new RefCrawler(cfg).run()
    assert(o.trace.nonEmpty && o.trace.forall(_.wave == 1))
    assert(o.seen.size === o.trace.size)
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    assertThrows[IllegalArgumentException] {
      CrawlConfig(Seq("http://h.test/"), budgetPerHost = 1, maxDepth = -1)
    }
  }
}
