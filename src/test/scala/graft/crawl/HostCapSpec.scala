package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.functions.CanonicalUrl

/** Per-host admission-cap semantics ([[CrawlConfig.maxUrlsPerHost]], the
  * Heritrix max-documents-per-host anti-trap guard): a host's cumulative
  * admissions — its seen-set entries, robots-denied included, seeds
  * included — are bounded. Checked AFTER the seen-dedup and BEFORE robots;
  * within a wave the first (cap − prior) NEW urls of the host in admission
  * order win; capped urls never enter seen (a later-wave re-discovery
  * counts capped again); seeds bypass the check but count toward it; the
  * engine rebuilds counts from the seen table on resume. Engine == oracle
  * bit-exact; per-wave capped counts ride the commit summaries.
  */
class HostCapSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlhostcap").toString

  import CrawlTestUtil.assertEqualResults

  private def summaryByWave(root: String, key: String): Map[Int, Long] = {
    val store = new graft.sources.SnapshotStore(root, spark)
    (1L to store.currentVersion.get).map(store.manifest)
      .flatMap(m => m.summary.get(key).map(c => m.summary("wave").toInt -> c.toLong))
      .toMap
  }

  test("explicit fixture: in-wave admission order wins under the cap; " +
    "robots-denied admissions count toward it; a capped URL re-discovered " +
    "in a later wave counts capped again; a later in-wave sighting counts " +
    "deduped — engine == oracle, capped counts in summaries") {
    val fetcher = MapFetcher(Map(
      // hostA: seed s counts 1; wave 1 candidates p1..p4 in document order
      // — room = cap(3) − 1 = 2, so p1,p2 admit, p3,p4 cap
      "http://hosta.test/s" -> Seq("/p1", "/p2", "/p3", "/p4"),
      // wave 2: hostA is full — p3 caps AGAIN (re-discovery), p5 caps
      "http://hosta.test/p1" -> Seq("/p3"),
      "http://hosta.test/p2" -> Seq("/p5"),
      // hostC seed: a SECOND wave-1 sighting of p3 (deduped, not capped)
      // and of p1 (deduped)
      "http://hostc.test/s2" -> Seq("http://hosta.test/p3", "http://hosta.test/p1"),
      // hostB: denied /d1 occupies seen and counts toward the cap —
      // d1(denied), e1 admit fill the host (seed + 2 = 3); e2 then caps
      "http://hostb.test/s" -> Seq("/d1", "/e1"),
      "http://hostb.test/e1" -> Seq("/e2")))
    val cfg = CrawlConfig(
      Seq("http://hosta.test/s", "http://hostc.test/s2", "http://hostb.test/s"),
      budgetPerHost = 2, maxWaves = 1000,
      robots = Seq(RobotsRule("hostb.test", "/d", allow = false, 0)),
      fetcherOverride = Some(fetcher), maxUrlsPerHost = 3)
    val (o, totals) = new RefCrawler(cfg).run()
    val w1 = totals.find(_.wave == 1).get
    assert(w1.host_capped === 2L, "wave 1 should cap exactly p3, p4")
    assert(w1.deduped === 2L, "s2's sightings of p3/p1 must count deduped")
    assert(w1.robots_denied === 1L, "d1 denied at admission")
    // wave 2 fetches p1, p2 (hostA budget 2) and e1: p3 caps AGAIN, p5 and
    // e2 cap — the earlier capped sighting left no seen entry
    assert(totals.find(_.wave == 2).get.host_capped === 3L)
    assert(!o.seen.contains("http://hosta.test/p3"))
    assert(!o.seen.contains("http://hostb.test/e2"))
    assert(o.seen.contains("http://hostb.test/d1"), "denied occupies seen")
    assert(!o.trace.exists(_.canonical_url == "http://hostb.test/d1"))

    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val byWave = summaryByWave(root, "wave_host_capped")
    totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.host_capped,
      s"wave ${t.wave} host_capped"))
  }

  test("engine == oracle under maxUrlsPerHost on the hash web, combined " +
    "with robots + redirect + failure injection, across parallelism and " +
    "the full 10^10 engine config with resume (counts rebuilt from seen); " +
    "the cap binds") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30,
      redirectPct = 15, transientFailPct = 15, permanentFailPct = 5)
    def cfg(cap: Long) =
      CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
        maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web),
        maxUrlsPerHost = cap)
    val (capped, cappedTotals) = new RefCrawler(cfg(7)).run()
    val (uncapped, _) = new RefCrawler(cfg(Long.MaxValue)).run()
    assert(cappedTotals.map(_.host_capped).sum > 0, "cap never bound — fixture weak")
    assert(capped.seen.size < uncapped.seen.size)
    assert(capped.trace.nonEmpty, "seeds must still crawl")

    for (parts <- Seq("8", "3")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, cfg(7), root)
        assertEqualResults(capped, CrawlDriver.result(spark, root))
        val byWave = summaryByWave(root, "wave_host_capped")
        cappedTotals.foreach(t =>
          assert(byWave.getOrElse(t.wave, 0L) === t.host_capped,
            s"wave ${t.wave} host_capped"))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    // full 10^10 engine config + resume across the cap (the resumed run
    // re-derives per-host counts from the committed seen table)
    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table")
    val root = tmp()
    CrawlDriver.run(spark, cfg(7).copy(maxWaves = 2), root, eng)
    CrawlDriver.resume(spark, cfg(7), root, eng)
    assertEqualResults(capped, CrawlDriver.result(spark, root))

    // the counts-join strategy branch, both regimes pinned by counters:
    // broadcast-hinted under the host bound, forced-withheld above it
    // (robotsBroadcastMaxRows=0 models the >2^20-host shuffled regime) —
    // outputs identical either way
    val rootH = tmp()
    val hH = CrawlDriver.run(spark, cfg(7), rootH)
    assert(hH.capHintsApplied > 0 && hH.capHintsWithheld === 0)
    assertEqualResults(capped, CrawlDriver.result(spark, rootH))
    val rootW = tmp()
    val hW = CrawlDriver.run(spark, cfg(7), rootW,
      CrawlDriver.EngineConfig(robotsBroadcastMaxRows = 0))
    assert(hW.capHintsWithheld > 0 && hW.capHintsApplied === 0)
    assertEqualResults(capped, CrawlDriver.result(spark, rootW))
  }

  test("cap introduced at RESUME: phase-1 admissions from an UNCAPPED run " +
    "count toward a cap configured only in phase 2 — engine (counts " +
    "rebuilt from seen) == phased oracle") {
    val web = SyntheticWeb.WebConfig(hosts = 6, pagesPerHost = 40)
    val cfg1 = CrawlConfig(SyntheticWeb.seedUrls(18, web), budgetPerHost = 3,
      maxWaves = 1000, web = web)
    val cfg2 = cfg1.copy(maxUrlsPerHost = 9)
    val (o, totals) = new RefCrawler(cfg1).runPhased(2, cfg2)
    // the phase-2 cap must bind against counts accumulated in phase 1
    assert(totals.filter(_.wave > 2).map(_.host_capped).sum > 0,
      "phase-2 cap never bound — fixture weak")
    assert(totals.filter(_.wave <= 2).forall(_.host_capped == 0))
    val root = tmp()
    CrawlDriver.run(spark, cfg1.copy(maxWaves = 2), root)
    CrawlDriver.resume(spark, cfg2, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("expire() frees cap room: deleting a full host's seen rows lets a " +
    "resumed crawl admit new URLs on it (counts rebuild from seen), and " +
    "the expired URL itself re-caps once the host refills — engine-only " +
    "(the oracle has no expire)") {
    // hostA cap 3: wave 1 fetches seed s, admits p1,p2 (seed counts),
    // caps p3,p4; p2 links p3 and p1 for the post-expire waves
    val fetcher = MapFetcher(Map(
      "http://hosta.test/s" -> Seq("/p1", "/p2", "/p3", "/p4"),
      "http://hosta.test/p2" -> Seq("/p3", "/p1")))
    val cfg = CrawlConfig(Seq("http://hosta.test/s"), budgetPerHost = 4,
      maxWaves = 1000, fetcherOverride = Some(fetcher), maxUrlsPerHost = 3)
    val root = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = 1), root)
    val store = new graft.sources.SnapshotStore(root, spark)
    import spark.implicits._
    assert(store.read("seen").as[SeenRow].collect().map(_.canonical_url).toSet ===
      Set("http://hosta.test/s", "http://hosta.test/p1", "http://hosta.test/p2"))
    // expire p1: hostA drops to 2 admissions — one slot of room again
    assert(CrawlDriver.expire(spark, root, Seq("http://hosta.test/p1")) === 1L)
    CrawlDriver.resume(spark, cfg, root)
    val res = CrawlDriver.result(spark, root)
    // p2's wave-2 fetch re-discovers p3 (admission order first — takes the
    // freed slot) and p1 (host full again — capped, stays out of seen)
    assert(res.seen === Set("http://hosta.test/s", "http://hosta.test/p2",
      "http://hosta.test/p3"))
    assert(res.trace.map(_.canonical_url).contains("http://hosta.test/p3"))
    assert(!res.seen.contains("http://hosta.test/p1"))
    val byWave = summaryByWave(root, "wave_host_capped")
    assert(byWave.values.sum === 3L, "p3+p4 capped in wave 1, p1 re-capped post-expire")
  }

  test("maxUrlsPerHost = 0 fetches exactly the seeds (seeds bypass the cap " +
    "but fill every host); negative cap rejected") {
    val web = SyntheticWeb.WebConfig(hosts = 4, pagesPerHost = 10)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(6, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, maxUrlsPerHost = 0)
    val (o, _) = new RefCrawler(cfg).run()
    assert(o.trace.nonEmpty)
    assert(o.seen === cfg.seeds.map(CanonicalUrl.canonicalize).toSet)
    assert(o.trace.size === o.seen.size)
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    assertThrows[IllegalArgumentException] {
      CrawlConfig(Seq("http://h.test/"), budgetPerHost = 1, maxUrlsPerHost = -1)
    }
  }
}
