package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The core correctness gate (SURVEY.md §5.1): the distributed engine must
  * equal the sequential oracle bit-for-bit on trace (crawl ordering), seen
  * (URL-seen set) and docs (per-row span-sequence equality on
  * (kind, text, media_ref, order)) — BASELINE.json north_rule/input_hint.
  */
/** Test fetcher: the synthetic web plus extra `Crawl-delay:` lines on
  * chosen hosts' robots.txt — exercises delay->budget acquisition.
  */
case class DelayRobotsFetcher(web: SyntheticWeb.WebConfig,
                              delays: Map[String, Double]) extends PageFetcher {
  override def fetchParse(u: String): (IndexedSeq[Span], IndexedSeq[String]) =
    SyntheticWeb.fetchParse(u, web)
  override def fetchRobots(h: String): Option[String] = {
    val base = SyntheticWeb.robotsTxt(h, web)
    delays.get(h) match {
      case Some(d) => Some(base.getOrElse("User-agent: *\n") + s"Crawl-delay: $d\n")
      case None    => base
    }
  }
}

/** Fetcher serving CHANGED robots bodies (phase 2 of the recency test):
  * per-host full replacement — Some(body) overrides, None means the host
  * now serves nothing; hosts absent from the map keep the synthetic web's
  * bodies. Top-level: fetchers are broadcast-serialized into the parse
  * stage.
  */
case class ChangedRobotsFetcher(web: SyntheticWeb.WebConfig,
                                bodies: Map[String, Option[String]]) extends PageFetcher {
  override def fetchParse(u: String): (IndexedSeq[Span], IndexedSeq[String]) =
    SyntheticWeb.fetchParse(u, web)
  override def fetchRobots(h: String): Option[String] =
    bodies.getOrElse(h, SyntheticWeb.robotsTxt(h, web))
}

class CrawlEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def mkCfg(nSeeds: Int, budget: Int, hosts: Int = 8, pages: Int = 30,
                    maxWaves: Int = 1000): CrawlConfig = {
    val web = SyntheticWeb.WebConfig(hosts = hosts, pagesPerHost = pages)
    CrawlConfig(SyntheticWeb.seedUrls(nSeeds, web), budget, maxWaves,
      web = web, robots = SyntheticWeb.robotsFixture(web))
  }

  private def tmp(): String = Files.createTempDirectory("crawl").toString

  import CrawlTestUtil.assertEqualResults

  private def runBoth(cfg: CrawlConfig,
                      eng: CrawlDriver.EngineConfig = CrawlDriver.EngineConfig())
  : (CrawlResult, CrawlResult, String) = {
    val (oracleRes, _) = new RefCrawler(cfg).run()
    val root = tmp()
    CrawlDriver.run(spark, cfg, root, eng)
    (oracleRes, CrawlDriver.result(spark, root), root)
  }

  test("engine == oracle on the standard config") {
    val (o, e, _) = runBoth(mkCfg(nSeeds = 24, budget = 2))
    assertEqualResults(o, e)
  }

  test("engine == oracle with budget 1 (politeness-serialized)") {
    val (o, e, _) = runBoth(mkCfg(nSeeds = 16, budget = 1, hosts = 4, pages = 20))
    assertEqualResults(o, e)
  }

  test("engine == oracle under different shuffle parallelism (determinism)") {
    val cfg = mkCfg(nSeeds = 24, budget = 3)
    val (oracleRes, _) = new RefCrawler(cfg).run()
    for (parts <- Seq("3", "13")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, cfg, root)
        assertEqualResults(oracleRes, CrawlDriver.result(spark, root))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("bloom off == bloom on == tiny bloom forced to high FP rate") {
    val cfg = mkCfg(nSeeds = 16, budget = 2, hosts = 4, pages = 20)
    val (oracleRes, _) = new RefCrawler(cfg).run()
    val engines = Seq(
      CrawlDriver.EngineConfig(seenFilter = "none"),
      CrawlDriver.EngineConfig(seenFilter = "bloom"),
      CrawlDriver.EngineConfig(seenFilter = "cuckoo"),
      CrawlDriver.EngineConfig(seenFilter = "cuckoo", bloomShards = 2, bloomItemsPerShard = 16),
      // 2 shards x 16 bytes: FP-saturated — exactness must not depend on FP rate
      CrawlDriver.EngineConfig(seenFilter = "bloom", bloomShards = 2,
        bloomItemsPerShard = 4, bloomFpp = 0.5),
      // 10^10-scale path: anti-join scans shard-clustered seen parquet
      CrawlDriver.EngineConfig(seenStorage = "store"))
    engines.foreach { eng =>
      val root = tmp()
      CrawlDriver.run(spark, cfg, root, eng)
      assertEqualResults(oracleRes, CrawlDriver.result(spark, root))
    }
  }

  test("LAZY filter distribution == oracle, with ZERO whole-filter broadcasts " +
    "(bloom + cuckoo, incl. mid-run distributed compaction)") {
    val cfg = mkCfg(nSeeds = 16, budget = 2, hosts = 4, pages = 20)
    val (oracleRes, _) = new RefCrawler(cfg).run()
    val engines = Seq(
      CrawlDriver.EngineConfig(filterDistribution = "lazy"),
      CrawlDriver.EngineConfig(filterDistribution = "lazy", seenFilter = "cuckoo"),
      // compactFiltersEvery=2 forces several compaction generations mid-run
      CrawlDriver.EngineConfig(filterDistribution = "lazy", compactFiltersEvery = 2,
        bloomShards = 4),
      // lazy probe + store-scanned seen: the full 10^10 configuration where
      // neither the filter nor the seen-set is ever driver- or cache-resident
      CrawlDriver.EngineConfig(filterDistribution = "lazy", seenStorage = "store"))
    engines.foreach { eng =>
      val loads0 = graft.sources.FilterShardStore.shardLoads.get()
      val root = tmp()
      val handle = CrawlDriver.run(spark, cfg, root, eng)
      assertEqualResults(oracleRes, CrawlDriver.result(spark, root))
      assert(handle.filterBroadcasts === 0,
        s"lazy mode must never broadcast the whole filter ($eng)")
      assert(graft.sources.FilterShardStore.shardLoads.get() > loads0,
        s"no shard files were lazily loaded — probe not exercised ($eng)")
    }
  }

  test("lazy filter: resume rebuilds a fresh base generation distributed and " +
    "equals the uninterrupted run") {
    val cfg = mkCfg(nSeeds = 24, budget = 2)
    val (oracleRes, _) = new RefCrawler(cfg).run()
    val root = tmp()
    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy")
    CrawlDriver.run(spark, cfg.copy(maxWaves = 3), root, eng)
    val h = CrawlDriver.resume(spark, cfg, root, eng)
    assert(h.filterBroadcasts === 0)
    assertEqualResults(oracleRes, CrawlDriver.result(spark, root))
  }

  test("long crawl: seen slices re-root onto the store, plan width stays " +
    "bounded, output == oracle (20+ waves)") {
    val cfg = mkCfg(nSeeds = 4, budget = 1, hosts = 4, pages = 30)
    val (oracleRes, _) = new RefCrawler(cfg).run()
    val root = tmp()
    val h = CrawlDriver.run(spark, cfg, root,
      CrawlDriver.EngineConfig(rerootSeenEvery = 3))
    assert(h.wavesRun >= 20, s"fixture too small: ${h.wavesRun} waves")
    assert(h.maxSeenSlices <= 4,
      s"slice union grew to ${h.maxSeenSlices} — re-rooting not engaged")
    assertEqualResults(oracleRes, CrawlDriver.result(spark, root))
  }

  test("merge-on-read pending == oracle; delta chain compacts; resume merges") {
    val cfg = mkCfg(nSeeds = 24, budget = 2)
    val (oracleRes, _) = new RefCrawler(cfg).run()
    // full run in MOR mode with a tight compaction threshold
    val eng = CrawlDriver.EngineConfig(pendingStorage = "mor", compactPendingEvery = 3)
    val root = tmp()
    CrawlDriver.run(spark, cfg, root, eng)
    assertEqualResults(oracleRes, CrawlDriver.result(spark, root))
    val store = new graft.sources.SnapshotStore(root, spark)
    val m = store.currentManifest.get
    assert(m.tables.contains("pending_base") && m.tables.contains("pending_delta"))
    assert(m.tables("pending_delta").dataDirs.size < 3,
      s"delta chain never compacted: ${m.tables("pending_delta").dataDirs}")
    // resume path exercises the merge-on-read reconstruction
    val root2 = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = 2), root2, eng)
    CrawlDriver.resume(spark, cfg, root2, eng)
    assertEqualResults(oracleRes, CrawlDriver.result(spark, root2))
    // the MOR merge is a delta-sized ANTI-JOIN, not a groupBy shuffle of
    // the whole base+delta set
    val morPlan = CrawlDriver.readPending(spark, new graft.sources.SnapshotStore(root2, spark))
      .queryExecution.optimizedPlan.toString
    assert(morPlan.contains("LeftAnti"), s"MOR merge lost the anti-join:\n$morPlan")
    assert(!morPlan.contains("Aggregate"), s"MOR merge pays a groupBy:\n$morPlan")
  }

  test("store-mode seen: shard IN-filter is pushed to the parquet scan") {
    import org.apache.spark.sql.functions._
    val cfg = mkCfg(nSeeds = 16, budget = 2, hosts = 4, pages = 20)
    val root = tmp()
    CrawlDriver.run(spark, cfg, root, CrawlDriver.EngineConfig(seenStorage = "store"))
    val store = new graft.sources.SnapshotStore(root, spark)
    val plan = store.read("seen").filter(col("shard").isin(1, 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(shard"),
      s"shard filter not pushed to seen scan:\n$plan")
  }

  test("resume from mid-crawl checkpoint equals uninterrupted run") {
    val cfg = mkCfg(nSeeds = 24, budget = 2)
    val (oracleRes, _) = new RefCrawler(cfg).run()
    val root = tmp()
    // run only 3 waves, "crash", then resume to completion
    CrawlDriver.run(spark, cfg.copy(maxWaves = 3), root)
    val mid = CrawlDriver.result(spark, root)
    assert(mid.trace.nonEmpty && mid.trace.map(_.wave).max === 3)
    CrawlDriver.resume(spark, cfg, root)
    assertEqualResults(oracleRes, CrawlDriver.result(spark, root))
  }

  test("maxUrls cap: engine == oracle") {
    val (o, e, _) = runBoth(mkCfg(nSeeds = 24, budget = 2).copy(maxUrls = 30))
    assertEqualResults(o, e)
  }

  test("per-host budget overrides (Crawl-delay mapping): engine == oracle, budgets hold") {
    val base = mkCfg(nSeeds = 24, budget = 3)
    val overrides = Map("host0.test" -> 1, "host3.test" -> 5,
      "host5.test" -> graft.functions.RobotsTxt.budgetForDelay(30.0, wavePeriodSeconds = 60))
    val cfg = base.copy(hostBudgets = overrides)
    val (o, _) = new RefCrawler(cfg).run()
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    // budget caps hold per host per wave
    o.trace.groupBy(t => (t.wave, t.host)).foreach { case ((w, h), rows) =>
      assert(rows.size <= cfg.budgetFor(h), s"wave $w host $h over budget")
    }
    assert(o.trace.groupBy(t => (t.wave, t.host))
      .exists { case ((_, h), rows) => h == "host3.test" && rows.size > 3 },
      "host3 override never exercised above the default budget")
  }

  test("medium scale: engine == oracle on a ~3k-URL crawl (SURVEY §5.1 matrix)") {
    val web = SyntheticWeb.WebConfig(hosts = 32, pagesPerHost = 100, hotHost = 3)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(320, web), budgetPerHost = 50,
      maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web))
    val (o, _) = new RefCrawler(cfg).run()
    assert(o.trace.size > 2000, s"fixture too small: ${o.trace.size}")
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("robots.txt ACQUISITION: rules come only from robots pages fetched " +
    "by the crawl itself — engine == oracle == fixture-mode, incl. a host " +
    "whose fetched robots denies the page that discovered it; resume re-resolves") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val denyAllHost = s"host${web.hosts - 1}.test"
    val fetchCfg = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = Nil, fetchRobotsTxt = true)
    val (oFetch, totals) = new RefCrawler(fetchCfg).run()
    // the fetched rules actually fire...
    assert(totals.map(_.robots_denied).sum > 0, "no robots denial ever happened")
    // ...including the deny-all host: discovered (it IS in seen), its robots
    // fetched, and the very page that discovered it denied — never fetched
    assert(oFetch.seen.exists(_.contains(denyAllHost)),
      "deny-all host never encountered — fixture too weak")
    assert(!oFetch.trace.exists(_.host == denyAllHost),
      "deny-all host was fetched despite its robots.txt")
    // fetch-mode == fixture-mode (the robots pages parse to the fixture rules)
    val (oFix, _) = new RefCrawler(fetchCfg.copy(
      robots = SyntheticWeb.robotsFixture(web), fetchRobotsTxt = false)).run()
    assert(oFetch.trace === oFix.trace && oFetch.seen === oFix.seen,
      "acquired-rules crawl must equal fixture-rules crawl")
    // distributed engine bit-equal in acquisition mode
    val root = tmp()
    CrawlDriver.run(spark, fetchCfg, root)
    assertEqualResults(oFetch, CrawlDriver.result(spark, root))
    // resume: robots state is NOT persisted — hosts re-resolve lazily
    val root2 = tmp()
    CrawlDriver.run(spark, fetchCfg.copy(maxWaves = 3), root2)
    CrawlDriver.resume(spark, fetchCfg, root2)
    assertEqualResults(oFetch, CrawlDriver.result(spark, root2))
  }

  test("robots.txt acquisition: config rules are the fallback for hosts " +
    "serving no robots.txt, fetched rules win where present") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    // host0 serves no robots.txt -> config fallback must deny its /p/2*;
    // host1 serves one -> its fetched rules apply (config has none for it)
    val fallback = Seq(RobotsRule("host0.test", "/p/2", allow = false, 0))
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = fallback, fetchRobotsTxt = true)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.map(_.robots_denied).sum > 0)
    assert(!o.trace.exists(t => t.host == "host0.test" &&
      CanonicalUrlPath(t.canonical_url).startsWith("/p/2")),
      "config fallback rule did not fire on the robots-less host")
    assert(!o.trace.exists(t => t.host == "host1.test" &&
      CanonicalUrlPath(t.canonical_url).startsWith("/p/1") &&
      !CanonicalUrlPath(t.canonical_url).startsWith("/p/12")),
      "fetched rules did not fire on the robots-serving host")
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  private def CanonicalUrlPath(u: String): String =
    graft.functions.CanonicalUrl.path(u)

  test("Crawl-delay ACQUISITION: fetched delays map to per-host politeness " +
    "budgets (override > delay > default), engine == oracle, resume " +
    "re-acquires budgets for pending hosts") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val delays = Map("host0.test" -> 30.0, "host2.test" -> 60.0) // -> budgets 2, 1
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 4,
      maxWaves = 1000, web = web, robots = Nil, fetchRobotsTxt = true,
      fetcherOverride = Some(DelayRobotsFetcher(web, delays)))
    val (o, _) = new RefCrawler(cfg).run()
    // fetched delays actually bind selection
    o.trace.groupBy(t => (t.wave, t.host)).foreach { case ((w, h), rows) =>
      val cap = delays.get(h)
        .map(d => graft.functions.RobotsTxt.budgetForDelay(d, 60.0)).getOrElse(4)
      assert(rows.size <= cap, s"wave $w host $h over acquired budget $cap")
    }
    assert(o.trace.exists(_.host == "host0.test"), "delayed host never crawled")
    assert(o.trace.groupBy(t => (t.wave, t.host)).exists {
      case ((_, h), rows) => !delays.contains(h) && rows.size > 2
    }, "no host ever exceeded the delayed caps — budgets not distinguishable")
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    // resume: the first resumed selection needs the delay budgets BEFORE
    // any candidate resolution — the resume pre-pass re-acquires them
    val root2 = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = 2), root2)
    CrawlDriver.resume(spark, cfg, root2)
    assertEqualResults(o, CrawlDriver.result(spark, root2))
  }

  test("robots probe is host-keyed: 10^4-host rule dimension, engine == " +
    "oracle, map probe == naive full-scan semantics") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 20)
    val live = SyntheticWeb.robotsFixture(web)
    // 10^4 rules on hosts the crawl never visits: with the old per-URL
    // full-list scan this costs 10^4 comparisons per candidate row; the
    // host-keyed map probes only the visited host's bucket
    val offSite = (0 until 10000).map(i =>
      RobotsRule(s"offsite$i.example", "/", allow = false, 1000 + i))
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(16, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = live ++ offSite)
    val (o, _) = new RefCrawler(cfg).run()
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    // semantic guard: the host-keyed probe equals the naive flat scan
    val all = live ++ offSite
    val byHost = RobotsEval.byHost(all)
    def naive(host: String, path: String): Boolean = {
      val matching = all.filter(r => r.host == host && path.startsWith(r.path_prefix))
      if (matching.isEmpty) true
      else matching.minBy(r => (-r.path_prefix.length, r.rule_order)).allow
    }
    val probes = Seq(("host1.test", "/p/15"), ("host1.test", "/p/12"),
      ("host7.test", "/p/3"), ("host0.test", "/p/9"),
      ("offsite42.example", "/x"), ("unknown.example", "/y"))
    probes.foreach { case (h, p) =>
      assert(RobotsEval.allowed(byHost.getOrElse(h, Nil), p) === naive(h, p),
        s"probe semantics diverge for $h$p")
    }
  }

  test("robots as SNAPSHOT TABLES (robotsStorage=table): join-based " +
    "admission == oracle in fixture mode; rules persisted with lineage") {
    val cfg = mkCfg(nSeeds = 16, budget = 2, hosts = 4, pages = 20)
    val (o, _) = new RefCrawler(cfg).run()
    val root = tmp()
    CrawlDriver.run(spark, cfg, root, CrawlDriver.EngineConfig(robotsStorage = "table"))
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val store = new graft.sources.SnapshotStore(root, spark)
    assert(store.read("robots_rules").count() === cfg.robots.size.toLong,
      "config rules not persisted as crawl state")
  }

  test("robots as SNAPSHOT TABLES + ACQUISITION (+ Crawl-delay budgets): " +
    "fully distributed resolution == oracle; resume reads rules back from " +
    "the store; the full 10^10 config (lazy+mor+store+table) stays bit-green") {
    import spark.implicits._
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val delays = Map("host0.test" -> 30.0, "host2.test" -> 60.0) // budgets 2, 1
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 4,
      maxWaves = 1000, web = web, robots = Nil, fetchRobotsTxt = true,
      fetcherOverride = Some(DelayRobotsFetcher(web, delays)))
    val (o, _) = new RefCrawler(cfg).run()
    val eng = CrawlDriver.EngineConfig(robotsStorage = "table")
    val root = tmp()
    CrawlDriver.run(spark, cfg, root, eng)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val store = new graft.sources.SnapshotStore(root, spark)
    assert(store.read("robots_rules").count() > 0, "no acquired rules persisted")
    assert(store.read("robots_hosts").filter($"budget".isNotNull).count() === 2L,
      "Crawl-delay budgets not persisted")
    // resume: robots state comes back from the TABLE — no refetch pre-pass
    val root2 = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = 2), root2, eng)
    CrawlDriver.resume(spark, cfg, root2, eng)
    assertEqualResults(o, CrawlDriver.result(spark, root2))
    // the full 10^10 configuration: nothing (filter, seen, frontier, robots)
    // is ever driver- or cache-resident whole
    val engFull = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table")
    val root3 = tmp()
    val h = CrawlDriver.run(spark, cfg, root3, engFull)
    assert(h.filterBroadcasts === 0)
    assertEqualResults(o, CrawlDriver.result(spark, root3))
  }

  test("table-robots with the broadcast hint WITHHELD (robotsBroadcastMaxRows" +
    "=0, the 10^7-host shuffled-join regime): bit-green, and the engine " +
    "really took the no-hint branch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = Nil, fetchRobotsTxt = true)
    val (o, _) = new RefCrawler(cfg).run()
    // strategy-only knob: outputs must be identical with the hint withheld
    val root = tmp()
    val h = CrawlDriver.run(spark, cfg, root,
      CrawlDriver.EngineConfig(robotsStorage = "table", robotsBroadcastMaxRows = 0))
    assertEqualResults(o, CrawlDriver.result(spark, root))
    assert(h.robotsHintsWithheld > 0 && h.robotsHintsApplied === 0,
      s"no-hint branch not exercised: applied=${h.robotsHintsApplied} " +
        s"withheld=${h.robotsHintsWithheld}")
    // the default threshold keeps the hint on at sandbox host counts
    val root2 = tmp()
    val h2 = CrawlDriver.run(spark, cfg, root2,
      CrawlDriver.EngineConfig(robotsStorage = "table"))
    assert(h2.robotsHintsApplied > 0 && h2.robotsHintsWithheld === 0)
    // plan probe: the engine's join shape without the hint — a host-keyed
    // dimension that unions an RDD-backed delta (no size stats) does NOT
    // broadcast; the planner shuffles on host, the right 10^7-host shape
    val store = new graft.sources.SnapshotStore(root, spark)
    val delta = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      store.read("robots_hosts").schema)
    val hostsAll = store.read("robots_hosts").unionByName(delta)
      .groupBy($"host").agg(max(struct($"wave", $"budget")).as("__s"))
      .select($"host", $"__s.budget".as("__tb"))
    val plan = store.read("trace").join(hostsAll, Seq("host"), "left")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"unhinted host join still broadcasts:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled host join:\n$plan")
  }

  test("ROBOTS RECENCY (table mode): a host's robots BODY changes between " +
    "run and resume-with-refetch — latest-wave-wins resolution, engine == " +
    "phased oracle, and the change demonstrably matters") {
    import spark.implicits._
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val cfg1 = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = Nil, fetchRobotsTxt = true)
    // phase 2: host0 (served NOTHING before) now denies /p/2* and slows to
    // budget 1 via Crawl-delay; host1 (had deny-/p/1 allow-/p/12) now
    // serves NOTHING (allow-all); host2 flips to deny-all
    val changed = ChangedRobotsFetcher(web, Map(
      "host0.test" -> Some("User-agent: *\nDisallow: /p/2\nCrawl-delay: 60\n"),
      "host1.test" -> None,
      "host2.test" -> Some("User-agent: *\nDisallow: /\n")))
    val cfg2 = cfg1.copy(fetcherOverride = Some(changed), refetchRobotsOnResume = true)
    val (oPhased, _) = new RefCrawler(cfg1).runPhased(2, cfg2)
    // the change must actually matter, or this test proves nothing
    val (oPlain, _) = new RefCrawler(cfg1).run()
    assert(oPhased.trace !== oPlain.trace,
      "changed robots bodies did not alter the crawl — fixture too weak")
    // the new deny binds at ADMISSION: host0 /p/2* URLs admitted AFTER the
    // switch are denied — in seen but never fetched (URLs admitted before
    // the switch legitimately still fetch). The plain oracle (host0 serves
    // nothing, no config rules) never denies a host0 URL.
    def deniedHost0(r: CrawlResult): Set[String] =
      r.seen.filter(u => u.contains("host0.test") &&
        CanonicalUrlPath(u).startsWith("/p/2")) --
        r.trace.map(_.canonical_url).toSet
    assert(deniedHost0(oPhased).nonEmpty,
      "no host0 /p/2* URL was denied after the switch — new rules never bound")
    assert(deniedHost0(oPlain).isEmpty,
      "plain oracle denied host0 URLs — fixture assumption broken")
    // the refetched Crawl-delay (60s -> budget 1) binds selection post-switch
    val post = oPhased.trace.filter(_.wave > 2)
    post.groupBy(t => (t.wave, t.host)).foreach { case ((w, h), rows) =>
      if (h == "host0.test")
        assert(rows.size <= 1, s"wave $w host0 over refetched Crawl-delay budget")
    }
    assert(post.exists(_.host == "host0.test"),
      "host0 never selected post-switch — budget assertion vacuous")
    // engine: run 2 waves under fetcher A, resume under fetcher B + refetch.
    // The refetch pre-pass is FULLY DISTRIBUTED: the pending-host dimension
    // must never be collected to the driver (the 10^7-host regime) —
    // pinned by the resume-collect counter staying flat.
    val eng = CrawlDriver.EngineConfig(robotsStorage = "table")
    val root = tmp()
    CrawlDriver.run(spark, cfg1.copy(maxWaves = 2), root, eng)
    val collects0 = CrawlDriver.resumeHostCollects.get()
    CrawlDriver.resume(spark, cfg2, root, eng)
    assert(CrawlDriver.resumeHostCollects.get() === collects0,
      "table-mode refetch resume collected a host dimension to the driver")
    assertEqualResults(oPhased, CrawlDriver.result(spark, root))
    // the robots tables carry BOTH fetch events for a refetched host, and
    // the resumed wave's rows supersede (latest-wave-wins)
    val store = new graft.sources.SnapshotStore(root, spark)
    val host0Waves = store.read("robots_hosts").filter($"host" === "host0.test")
      .select($"wave").distinct().as[Int].collect().sorted
    assert(host0Waves.length >= 2 && host0Waves.last === 3,
      s"refetch event not recorded at the resumed wave: ${host0Waves.toSeq}")
    // ...and the full 10^10 engine config replays the same phased crawl
    val engFull = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table")
    val root2 = tmp()
    CrawlDriver.run(spark, cfg1.copy(maxWaves = 2), root2, engFull)
    CrawlDriver.resume(spark, cfg2, root2, engFull)
    assertEqualResults(oPhased, CrawlDriver.result(spark, root2))
  }

  test("ROBOTS RECENCY (broadcast mode): robots state is NOT persisted, so " +
    "recency is inherent — after bodies change, resume re-resolves pending " +
    "hosts up front and every other host on re-encounter; engine == " +
    "clear-all phased oracle") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val cfg1 = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = Nil, fetchRobotsTxt = true)
    val changed = ChangedRobotsFetcher(web, Map(
      "host0.test" -> Some("User-agent: *\nDisallow: /p/2\nCrawl-delay: 60\n"),
      "host1.test" -> None,
      "host2.test" -> Some("User-agent: *\nDisallow: /\n")))
    // no refetch flag: broadcast mode forgets robots state on resume anyway
    val cfg2 = cfg1.copy(fetcherOverride = Some(changed))
    val (o, _) = new RefCrawler(cfg1).runPhased(2, cfg2, clearAllResolvedOnSwitch = true)
    val (oPlain, _) = new RefCrawler(cfg1).run()
    assert(o.trace !== oPlain.trace, "changed bodies did not alter the crawl")
    val root = tmp()
    CrawlDriver.run(spark, cfg1.copy(maxWaves = 2), root)
    val collects0 = CrawlDriver.resumeHostCollects.get()
    CrawlDriver.resume(spark, cfg2, root)
    // broadcast mode legitimately pays a driver host collect on resume
    // (its robots state is driver-resident by design) — the counter seam
    // must actually fire here, or the table-mode zero-assertions are vacuous
    assert(CrawlDriver.resumeHostCollects.get() > collects0,
      "resume-collect counter seam never fired on the broadcast path")
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("MODE-SWITCH resume (table): a store written in FIXTURE mode resumed " +
    "in FETCH mode — pending hosts' missing fetch events are acquired " +
    "up front, so acquired Crawl-delay budgets bind at the FIRST resumed " +
    "selection; engine == phased oracle") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val cfg1 = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 4,
      maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web))
    val delays = Map("host0.test" -> 30.0, "host2.test" -> 60.0) // -> budgets 2, 1
    val cfg2 = cfg1.copy(robots = Nil, fetchRobotsTxt = true,
      fetcherOverride = Some(DelayRobotsFetcher(web, delays)))
    val (o, _) = new RefCrawler(cfg1).runPhased(2, cfg2)
    // pre-switch, host0 ran over the (future) delay cap — so the cap
    // binding post-switch is an observable change, not a vacuous bound
    assert(o.trace.filter(_.wave <= 2).groupBy(t => (t.wave, t.host))
      .exists { case ((_, h), rows) => h == "host0.test" && rows.size > 2 },
      "host0 never exceeded the delay cap pre-switch — change not observable")
    o.trace.filter(_.wave > 2).groupBy(t => (t.wave, t.host)).foreach {
      case ((w, h), rows) =>
        val cap = delays.get(h).map(d =>
          graft.functions.RobotsTxt.budgetForDelay(d, 60.0)).getOrElse(4)
        assert(rows.size <= cap, s"wave $w host $h over post-switch budget $cap")
    }
    assert(o.trace.exists(t => t.wave == 3 && t.host == "host0.test"),
      "host0 not selected at the first resumed wave — timing assertion vacuous")
    val eng = CrawlDriver.EngineConfig(robotsStorage = "table")
    val root = tmp()
    CrawlDriver.run(spark, cfg1.copy(maxWaves = 2), root, eng)
    val collects0 = CrawlDriver.resumeHostCollects.get()
    CrawlDriver.resume(spark, cfg2, root, eng)
    assert(CrawlDriver.resumeHostCollects.get() === collects0,
      "mode-switch resume collected a host dimension to the driver")
    assertEqualResults(o, CrawlDriver.result(spark, root))
    // the mode switch recorded fetch events at the resumed wave for the
    // previously event-less pending hosts
    import spark.implicits._
    val store = new graft.sources.SnapshotStore(root, spark)
    assert(store.read("robots_hosts").filter($"wave" === 3).count() > 0,
      "no fetch events acquired at the resumed wave")
  }

  test("re-root on MOR delta-only waves + table robots acquisition: the " +
    "release discipline must not free blocks the unmaterialized newPending " +
    "checkpoint still recomputes through (20+ waves, frequent re-roots)") {
    // Trigger shape: seenStorage=cached + pendingStorage=mor with a
    // compaction threshold the run never reaches (every wave appends a
    // delta, so the commit never materializes newPending), frequent
    // re-roots (rerootSeenEvery=2), and in-crawl robots acquisition with a
    // single-host seed so new-host acquisitions trickle across waves —
    // maximizing the chance a re-root wave's newPending plan references a
    // robots-res checkpoint promoted into ckptPrev the wave before.
    val web = SyntheticWeb.WebConfig(hosts = 4, pagesPerHost = 30)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(1, web), budgetPerHost = 1,
      maxWaves = 1000, web = web, robots = Nil, fetchRobotsTxt = true)
    val (o, _) = new RefCrawler(cfg).run()
    val root = tmp()
    val h = CrawlDriver.run(spark, cfg, root, CrawlDriver.EngineConfig(
      pendingStorage = "mor", robotsStorage = "table",
      rerootSeenEvery = 2, compactPendingEvery = 1000))
    assert(h.wavesRun >= 20, s"fixture too small: ${h.wavesRun} waves")
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("two-phase numbering FORCED per wave (seqWindowMax=0, the >2^20-row " +
    "scale path): trace + discovery ranks bit-green, and the internal " +
    "ranged checkpoints release cleanly across MOR re-root waves") {
    // Every wave's trace numbering AND discovery numbering take the
    // range-partition path (normally only above 2^20 rows), exercising the
    // onCheckpoint registration + two-generation release: a premature free
    // would surface as a missing-checkpoint-block job failure, a wrong
    // rank as an EQ mismatch. Run both the default engine and the
    // nastiest release interplay (MOR delta-only waves + table robots
    // acquisition + frequent re-roots — the combo where newPending stays
    // a lazy checkpoint recomputing through the wave's plans).
    val web = SyntheticWeb.WebConfig(hosts = 4, pagesPerHost = 30)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(8, web), budgetPerHost = 1,
      maxWaves = 1000, web = web, robots = Nil, fetchRobotsTxt = true)
    val (o, _) = new RefCrawler(cfg).run()
    for (eng <- Seq(
        CrawlDriver.EngineConfig(seqWindowMax = 0),
        CrawlDriver.EngineConfig(seqWindowMax = 0, pendingStorage = "mor",
          robotsStorage = "table", rerootSeenEvery = 2,
          compactPendingEvery = 1000))) {
      val root = tmp()
      val h = CrawlDriver.run(spark, cfg, root, eng)
      assert(h.wavesRun >= 10, s"fixture too small: ${h.wavesRun} waves")
      assertEqualResults(o, CrawlDriver.result(spark, root))
    }
  }

  test("wave metrics roll up to oracle per-wave totals") {
    import spark.implicits._
    val cfg = mkCfg(nSeeds = 24, budget = 2)
    val (_, oracleTotals) = new RefCrawler(cfg).run()
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    val store = new graft.sources.SnapshotStore(root, spark)
    val m = store.read("metrics").as[WaveMetrics].collect()
    val byWave = m.groupBy(_.wave)
    oracleTotals.foreach { t =>
      val rows = byWave(t.wave)
      assert(rows.map(_.fetched).sum === t.fetched, s"wave ${t.wave} fetched")
      assert(rows.map(_.discovered).sum === t.discovered, s"wave ${t.wave} discovered")
      assert(rows.map(_.deduped).sum === t.deduped, s"wave ${t.wave} deduped")
      assert(rows.map(_.robots_denied).sum === t.robots_denied, s"wave ${t.wave} denied")
      assert(rows.map(_.budget_deferred).sum === t.budget_deferred, s"wave ${t.wave} deferred")
    }
    // per-partition lineage present: fetch rows tagged with partition ids
    assert(m.exists(_.partition_id >= 0))
  }
}
