package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ADAPTIVE revisit intervals ([[CrawlConfig.revisitAdaptive]], the Nutch
  * AdaptiveFetchSchedule shape, oracle model point 15): each URL's
  * re-fetch interval halves when its content changed (floored at
  * minWaves) and doubles when it didn't (capped at maxWaves), starting
  * from the fixed interval `revisitEveryWaves`. The per-URL state
  * (interval + previous fingerprint) rides the frontier/schedule rows
  * themselves — no registry, no join. Engine == oracle bit-exact.
  */
class AdaptiveRevisitSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawladaptive").toString

  import CrawlTestUtil.assertEqualResults

  test("explicit fixture: a volatile page's interval halves to minWaves " +
    "and stays there; a static page's interval doubles to maxWaves — " +
    "exact per-URL fetch-wave sequences, engine == oracle") {
    // seeds only (no links): the schedule arithmetic is the whole crawl.
    // v (volatile) changes every generation; s never changes.
    val fetcher = RevisitFetcher(volatile = Set("http://a.test/v"))
    val cfg = CrawlConfig(Seq("http://a.test/v", "http://b.test/s"),
      budgetPerHost = 5, maxWaves = 20, fetcherOverride = Some(fetcher),
      revisitEveryWaves = 2,
      revisitAdaptive = Some(AdaptiveRevisit(minWaves = 1, maxWaves = 8)))
    val (o, totals) = new RefCrawler(cfg).run()
    def fetchWaves(u: String) = o.trace.filter(_.canonical_url == u).map(_.wave)
    // v: gen 0 at wave 1 schedules at the initial interval (due 3); every
    // re-fetch CHANGED -> halve: 2/2=1, then 1/2=0 floored at min 1 —
    // from wave 3 on it re-fetches every wave
    assert(fetchWaves("http://a.test/v") === (Seq(1) ++ (3 to 20)))
    // s: gen 0 at wave 1 -> due 3; UNCHANGED re-fetches double 2->4->8,
    // capped at max 8: waves 1, 3, 7, 15 (next due 23 > maxWaves)
    assert(fetchWaves("http://b.test/s") === Seq(1, 3, 7, 15))
    // and against the fixed-interval run the static page is fetched LESS
    // (10 fetches at N=2 vs 4 adaptive) — adaptation observably bites
    val (oFixed, _) = new RefCrawler(cfg.copy(revisitAdaptive = None)).run()
    assert(oFixed.trace.count(_.canonical_url == "http://b.test/s") === 10)
    assert(totals.nonEmpty)

    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("engine == oracle under adaptive revisit + contentDedup + volatile " +
    "pages + failure/redirect injection on the hash web, across " +
    "parallelism and the full 10^10 config (revisitStorage=store) with " +
    "mid-recrawl resume") {
    val web = SyntheticWeb.WebConfig(hosts = 6, pagesPerHost = 30,
      transientFailPct = 15, redirectPct = 8, volatileUrlPct = 40)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(15, web), budgetPerHost = 3,
      maxWaves = 16, web = web, robots = SyntheticWeb.robotsFixture(web),
      revisitEveryWaves = 2, contentDedup = true,
      revisitAdaptive = Some(AdaptiveRevisit(minWaves = 1, maxWaves = 8)))
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.map(_.revisits).sum > 0, "revisits never fired — fixture weak")
    assert(o.duplicates.exists(d => d.dup_of == d.canonical_url),
      "no unchanged revisit detected — fixture weak")
    // adaptation must actually diverge from the fixed schedule
    val (oFixed, _) = new RefCrawler(cfg.copy(revisitAdaptive = None)).run()
    assert(o.trace !== oFixed.trace, "adaptive == fixed trace — fixture weak")

    for (parts <- Seq("8", "3")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, cfg, root)
        assertEqualResults(o, CrawlDriver.result(spark, root))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    // full 10^10 config incl. store-mode schedule (adaptive appends carry
    // a RANGE of due waves; with minWaves=1 the in-flight delta arm goes
    // live), killed mid-recrawl and resumed: per-due-wave counts and the
    // carried (interval, fingerprint) state rebuild from revisit_due
    val splitAt = {
      val w = totals.find(_.revisits > 0).get.wave
      w + 1 // past the first adaptation, so resumed rows carry real state
    }
    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table",
      contentStorage = "store", revisitStorage = "store")
    val root = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = splitAt), root, eng)
    CrawlDriver.resume(spark, cfg, root, eng)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("adaptive toggled at RESUME: enabling in phase 2 adapts forward " +
    "only (outstanding entries adapt from the initial interval and read " +
    "their first adaptive re-fetch as changed); disabling keeps the " +
    "schedule and fixes future intervals — engine == phased oracle") {
    val web = SyntheticWeb.WebConfig(hosts = 5, pagesPerHost = 20,
      volatileUrlPct = 30)
    val fixed = CrawlConfig(SyntheticWeb.seedUrls(12, web), budgetPerHost = 3,
      maxWaves = 14, web = web, contentDedup = true, revisitEveryWaves = 2)
    val adaptive = fixed.copy(
      revisitAdaptive = Some(AdaptiveRevisit(minWaves = 1, maxWaves = 8)))
    // enable at resume: phase-1 schedule rows carry no adaptive state
    val (onAt4, totOn) = new RefCrawler(fixed).runPhased(4, adaptive)
    assert(totOn.filter(_.wave > 4).map(_.revisits).sum > 0,
      "phase-2 revisits never fired — fixture weak")
    val rootOn = tmp()
    CrawlDriver.run(spark, fixed.copy(maxWaves = 4), rootOn)
    CrawlDriver.resume(spark, adaptive, rootOn)
    assertEqualResults(onAt4, CrawlDriver.result(spark, rootOn))
    // disable at resume: outstanding due waves keep their adaptive values,
    // future scheduling reverts to the fixed interval
    val (offAt4, _) = new RefCrawler(adaptive).runPhased(4, fixed)
    val rootOff = tmp()
    CrawlDriver.run(spark, adaptive.copy(maxWaves = 4), rootOff)
    CrawlDriver.resume(spark, fixed, rootOff)
    assertEqualResults(offAt4, CrawlDriver.result(spark, rootOff))
  }

  test("config validation: adaptive requires revisitEveryWaves > 0 within " +
    "[minWaves, maxWaves]; bounds must be sane") {
    assertThrows[IllegalArgumentException](AdaptiveRevisit(minWaves = 0))
    assertThrows[IllegalArgumentException](
      AdaptiveRevisit(minWaves = 4, maxWaves = 2))
    assertThrows[IllegalArgumentException](
      CrawlConfig(Seq("http://a.test/x"), budgetPerHost = 1,
        revisitAdaptive = Some(AdaptiveRevisit())))
    assertThrows[IllegalArgumentException](
      CrawlConfig(Seq("http://a.test/x"), budgetPerHost = 1,
        revisitEveryWaves = 16,
        revisitAdaptive = Some(AdaptiveRevisit(minWaves = 1, maxWaves = 8))))
  }
}
