package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Failure-scripted fetcher: `failuresFor(url)` = how many transient
  * failures the URL serves before succeeding (attempt 0-based: attempts
  * below the count fail); absent = always succeeds. Outlinks from `links`.
  * Top-level case class — an inner class would capture (and fail to
  * serialize) the suite.
  */
case class FailingFetcher(failuresFor: Map[String, Int],
                          links: Map[String, Seq[String]] = Map.empty)
    extends PageFetcher {
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    (Vector(Span("text", s"body of $url", "", 0)),
      links.getOrElse(url, Nil).toVector)
  override def fetchAttempt(url: String, attempt: Int): FetchOutcome =
    if (attempt < failuresFor.getOrElse(url, 0)) TransientFetchError
    else super.fetchAttempt(url, attempt)
}

/** Per-host transient-failure backoff ([[CrawlConfig.hostBackoff]], the
  * server-overload guard, oracle model point 12): `failureThreshold`
  * CONSECUTIVE transient failures on a host (frontier order, accumulated
  * across waves; any non-transient outcome resets) quarantine it for
  * `backoffWaves` waves — its pending URLs sit those waves out (counted
  * backoff_deferred) and re-enter unchanged. Evaluated at END of wave;
  * entering quarantine resets the count. State persists in the
  * `host_health` table (latest-wave-wins) and rebuilds on resume. Engine ==
  * oracle bit-exact; per-wave deferred counts ride the commit summaries.
  */
class HostBackoffSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlbackoff").toString

  import CrawlTestUtil.assertEqualResults

  private def summaryByWave(root: String, key: String): Map[Int, Long] = {
    val store = new graft.sources.SnapshotStore(root, spark)
    (1L to store.currentVersion.get).map(store.manifest)
      .flatMap(m => m.summary.get(key).map(c => m.summary("wave").toInt -> c.toLong))
      .toMap
  }

  test("explicit fixture: two consecutive transient failures quarantine " +
    "the host for backoffWaves waves (pending URLs backoff-deferred, the " +
    "healthy host keeps crawling), re-entry retries resume the attempt " +
    "count, and a quarantine can trigger repeatedly — engine == oracle, " +
    "deferred counts in summaries") {
    val fetcher = FailingFetcher(
      // p1 succeeds on its 3rd attempt, p2 on its 4th
      failuresFor = Map("http://a.test/p1" -> 2, "http://a.test/p2" -> 3),
      links = Map(
        "http://a.test/s" -> Seq("/p1", "/p2", "/p3"),
        "http://b.test/s" -> Seq("/q1", "/q2"),
        "http://b.test/q1" -> Seq("/q3")))
    val cfg = CrawlConfig(Seq("http://a.test/s", "http://b.test/s"),
      budgetPerHost = 2, maxWaves = 1000, fetcherOverride = Some(fetcher),
      maxFetchAttempts = 5,
      hostBackoff = Some(HostBackoff(failureThreshold = 2, backoffWaves = 2)))
    val (o, totals) = new RefCrawler(cfg).run()
    def t(w: Int) = totals.find(_.wave == w).get
    // wave 1: seeds fetch fine. wave 2: a.test serves p1(T), p2(T) —
    // 2 consecutive ≥ threshold → quarantined through wave 4; b.test
    // keeps crawling (q1, q2 then q3)
    assert(t(2).backoff_deferred === 0L)
    assert(t(3).backoff_deferred === 3L, "p1(requeued), p2(requeued), p3 sit out")
    assert(t(4).backoff_deferred === 3L)
    assert(t(3).fetched + t(4).fetched >= 1L, "b.test crawls through the quarantine")
    // wave 5: a.test re-enters — p1 (attempt 1) and p2 (attempt 1) both
    // fail transiently again → second quarantine through wave 7
    assert(t(5).backoff_deferred === 0L)
    assert(t(6).backoff_deferred === 3L)
    assert(t(7).backoff_deferred === 3L)
    // wave 8: p1 succeeds (attempt 2) — the reset keeps the trailing run
    // at 1 (p2's third failure) < threshold, so no third quarantine; p2
    // succeeds at wave 9 (attempt 3), then p3
    assert(t(8).backoff_deferred === 0L)
    assert(t(8).fetched === 1L)
    assert(totals.filter(_.wave > 8).forall(_.backoff_deferred == 0L))
    assert(o.trace.exists(r => r.canonical_url == "http://a.test/p1" && r.wave == 8))
    assert(o.errors.isEmpty, "every scripted URL eventually succeeds")
    assert(o.seen.contains("http://a.test/p3"))

    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val byWave = summaryByWave(root, "wave_backoff_deferred")
    totals.foreach(x => assert(byWave.getOrElse(x.wave, 0L) === x.backoff_deferred,
      s"wave ${x.wave} backoff_deferred"))
  }

  test("end-of-wave evaluation: a mid-wave threshold crossing followed by " +
    "a success does NOT quarantine (trailing run resets); the same " +
    "failures with the success FIRST do — and the count accumulates " +
    "across waves when no reset intervenes") {
    // one host, budget 3, threshold 2: frontier order is seed order
    def run(seedOrder: Seq[String], fails: Map[String, Int]) = {
      val cfg = CrawlConfig(seedOrder, budgetPerHost = 3, maxWaves = 1000,
        fetcherOverride = Some(FailingFetcher(fails)), maxFetchAttempts = 2,
        hostBackoff = Some(HostBackoff(failureThreshold = 2, backoffWaves = 3)))
      (cfg, new RefCrawler(cfg).run())
    }
    val fails = Map("http://h.test/t1" -> 1, "http://h.test/t2" -> 1)
    // T, T, S within the wave: the success lands AFTER both failures in
    // frontier order → trailing run 0 → no quarantine; the requeued t1/t2
    // succeed at wave 2
    val (cfgA, (oA, totA)) = run(
      Seq("http://h.test/t1", "http://h.test/t2", "http://h.test/ok"), fails)
    assert(totA.forall(_.backoff_deferred == 0L), "T,T,S must not quarantine")
    assert(totA.size === 2)
    // S, T, T: the trailing run is 2 → quarantined for 3 waves
    val (cfgB, (oB, totB)) = run(
      Seq("http://h.test/ok", "http://h.test/t1", "http://h.test/t2"), fails)
    assert(totB.find(_.wave == 2).get.backoff_deferred === 2L)
    assert(totB.find(_.wave == 4).get.backoff_deferred === 2L)
    assert(totB.find(_.wave == 5).map(_.fetched) === Some(2L))
    // cross-wave accumulation: budget 1, two separate waves each serving
    // one transient — no reset between → quarantine after the second
    val cfgC = CrawlConfig(
      Seq("http://h.test/t1", "http://h.test/t2", "http://h.test/ok"),
      budgetPerHost = 1, maxWaves = 1000,
      fetcherOverride = Some(FailingFetcher(fails)), maxFetchAttempts = 2,
      hostBackoff = Some(HostBackoff(failureThreshold = 2, backoffWaves = 2)))
    val (oC, totC) = new RefCrawler(cfgC).run()
    // wave 1: t1 T (consec 1); wave 2: t1 retry SUCCEEDS (reset) — then t2
    // T at wave 3, ok at 4, t2 retry at 5... threshold never hit via t1.
    // Scripted instead: t1 fails once, t2 fails once; budget 1 orders
    // t1,t1,t2,ok,t2 — resets intervene, so no quarantine here either.
    assert(totC.forall(_.backoff_deferred == 0L))
    // force it: both URLs ALWAYS fail (exhausted at maxFetchAttempts=2);
    // waves 1..2 serve t1 T, t1 T (exhausts) — consec 2 → quarantine
    val cfgD = cfgC.copy(fetcherOverride = Some(FailingFetcher(
      Map("http://h.test/t1" -> 99, "http://h.test/t2" -> 99))))
    val (oD, totD) = new RefCrawler(cfgD).run()
    assert(totD.find(_.wave == 2).get.backoff_deferred === 0L)
    assert(totD.find(_.wave == 3).get.backoff_deferred === 2L,
      "t1's two attempts across waves 1-2 accumulate to the threshold")
    assert(oD.errors.map(_.kind).distinct === Seq("transient_exhausted"))

    for ((cfg, o) <- Seq((cfgA, oA), (cfgB, oB), (cfgC, oC), (cfgD, oD))) {
      val root = tmp()
      CrawlDriver.run(spark, cfg, root)
      assertEqualResults(o, CrawlDriver.result(spark, root))
    }
  }

  test("engine == oracle under hostBackoff on the hash web with " +
    "redirect/failure injection, across parallelism and the full 10^10 " +
    "engine config with mid-quarantine resume (state rebuilt from " +
    "host_health); the hint branches both pin") {
    val web = SyntheticWeb.WebConfig(hosts = 6, pagesPerHost = 30,
      redirectPct = 10, transientFailPct = 35, permanentFailPct = 5)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(18, web), budgetPerHost = 3,
      maxWaves = 40, web = web, robots = SyntheticWeb.robotsFixture(web),
      hostBackoff = Some(HostBackoff(failureThreshold = 2, backoffWaves = 2)))
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.map(_.backoff_deferred).sum > 0, "backoff never bound — fixture weak")
    // a quarantine must span the resume boundary below for the read-back
    // path to be load-bearing
    val resumeAt = totals.find(_.backoff_deferred > 0).get.wave
    assert(resumeAt <= 6, "quarantine too late for a cheap resume split")

    for (parts <- Seq("8", "3")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        val h = CrawlDriver.run(spark, cfg, root)
        assertEqualResults(o, CrawlDriver.result(spark, root))
        assert(h.healthHintsApplied > 0 && h.healthHintsWithheld === 0)
        val byWave = summaryByWave(root, "wave_backoff_deferred")
        totals.foreach(t =>
          assert(byWave.getOrElse(t.wave, 0L) === t.backoff_deferred,
            s"wave ${t.wave} backoff_deferred"))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    // full 10^10 engine config, killed INSIDE a quarantine window and
    // resumed: the resumed run must keep the host quarantined (latest-
    // wave-wins read-back of host_health)
    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table")
    val root = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = resumeAt), root, eng)
    CrawlDriver.resume(spark, cfg, root, eng)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val byWave = summaryByWave(root, "wave_backoff_deferred")
    totals.foreach(t =>
      assert(byWave.getOrElse(t.wave, 0L) === t.backoff_deferred,
        s"wave ${t.wave} backoff_deferred (resumed)"))
    // forced-withheld regime (robotsBroadcastMaxRows=0 models the beyond-
    // bound health dimension): same output, other branch pinned
    val rootW = tmp()
    val hW = CrawlDriver.run(spark, cfg, rootW,
      CrawlDriver.EngineConfig(robotsBroadcastMaxRows = 0))
    assert(hW.healthHintsWithheld > 0 && hW.healthHintsApplied === 0)
    assertEqualResults(o, CrawlDriver.result(spark, rootW))
  }

  test("backoff toggled at RESUME: enabling in phase 2 starts every host " +
    "healthy (phase-1 failures recorded nothing); disabling in phase 2 " +
    "ignores a live phase-1 quarantine — engine == phased oracle both ways") {
    val web = SyntheticWeb.WebConfig(hosts = 5, pagesPerHost = 25,
      transientFailPct = 35)
    val base = CrawlConfig(SyntheticWeb.seedUrls(15, web), budgetPerHost = 3,
      maxWaves = 30, web = web)
    val bk = Some(HostBackoff(failureThreshold = 2, backoffWaves = 3))
    // enable at resume
    val (onAt2, totOn) = new RefCrawler(base).runPhased(2, base.copy(hostBackoff = bk))
    assert(totOn.filter(_.wave > 2).map(_.backoff_deferred).sum > 0,
      "phase-2 backoff never bound — fixture weak")
    val rootOn = tmp()
    CrawlDriver.run(spark, base.copy(maxWaves = 2), rootOn)
    CrawlDriver.resume(spark, base.copy(hostBackoff = bk), rootOn)
    assertEqualResults(onAt2, CrawlDriver.result(spark, rootOn))
    // disable at resume, split INSIDE a quarantine window
    val withBk = base.copy(hostBackoff = bk)
    val (_, totBk) = new RefCrawler(withBk).run()
    val splitAt = totBk.find(_.backoff_deferred > 0).get.wave
    val (offAt, _) = new RefCrawler(withBk).runPhased(splitAt, base)
    val rootOff = tmp()
    CrawlDriver.run(spark, withBk.copy(maxWaves = splitAt), rootOff)
    CrawlDriver.resume(spark, base, rootOff)
    assertEqualResults(offAt, CrawlDriver.result(spark, rootOff))
  }

  test("config validation: threshold and backoffWaves must be >= 1") {
    assertThrows[IllegalArgumentException](HostBackoff(0, 1))
    assertThrows[IllegalArgumentException](HostBackoff(1, 0))
  }
}
