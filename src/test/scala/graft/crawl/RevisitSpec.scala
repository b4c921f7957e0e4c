package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Generation-scripted fetcher: pages serve `"<url> body"` (or
  * `"<url> gen <g>"` when the URL is in `volatile`), outlinks =
  * `links(url)` plus any `genLinks((url, generation))` extras — a changed
  * page that links somewhere new on a re-fetch. Top-level case class: an
  * inner class would capture (and fail to serialize) the suite.
  */
case class RevisitFetcher(volatile: Set[String] = Set.empty,
                          links: Map[String, Seq[String]] = Map.empty,
                          genLinks: Map[(String, Int), Seq[String]] = Map.empty)
    extends PageFetcher {
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    fetchAt(url, 0)
  private def fetchAt(url: String, gen: Int): (IndexedSeq[Span], IndexedSeq[String]) = {
    val body = if (volatile(url)) s"$url gen $gen" else s"$url body"
    val ls = links.getOrElse(url, Nil) ++ genLinks.getOrElse((url, gen), Nil)
    (Vector(Span("text", body, null, 0)), ls.toVector)
  }
  override def fetchAttempt(url: String, attempt: Int, generation: Int): FetchOutcome = {
    val (s, l) = fetchAt(url, generation)
    Fetched(s, l)
  }
}

/** REVISIT scheduling ([[CrawlConfig.revisitEveryWaves]], the Nutch
  * re-fetch-interval recrawl loop, oracle model point 14): every successful
  * fetch re-enters the frontier N waves later (attempts reset,
  * generation+1, same ordering keys), is re-fetched under the standard
  * semantics — changed pages append wave-stamped doc VERSIONS and their
  * links enter discovery; with contentDedup on, unchanged pages read as
  * content duplicates of their own earlier fetch (the not-modified
  * signal) — and waves with nothing pending and nothing due are SILENT.
  * The schedule persists in the `revisit_due` table and resumes. Engine ==
  * oracle bit-exact.
  */
class RevisitSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlrevisit").toString

  import CrawlTestUtil.assertEqualResults

  private def summaryByWave(root: String, key: String): Map[Int, Long] = {
    val store = new graft.sources.SnapshotStore(root, spark)
    (1L to store.currentVersion.get).map(store.manifest)
      .flatMap(m => m.summary.get(key).map(c => m.summary("wave").toInt -> c.toLong))
      .toMap
  }

  test("explicit fixture: successes re-fetch every N waves with " +
    "generation+1; a volatile page's changed generation discovers a NEW " +
    "link; doc versions accumulate wave-stamped — engine == oracle, " +
    "wave_revisits in summaries") {
    val fetcher = RevisitFetcher(
      volatile = Set("http://a.test/s"),
      links = Map("http://a.test/s" -> Seq("/p1")),
      genLinks = Map(("http://a.test/s", 1) -> Seq("/p2")))
    val cfg = CrawlConfig(Seq("http://a.test/s"), budgetPerHost = 5,
      maxWaves = 8, fetcherOverride = Some(fetcher), revisitEveryWaves = 2)
    val (o, totals) = new RefCrawler(cfg).run()
    def fetchWaves(u: String) = o.trace.filter(_.canonical_url == u).map(_.wave)
    // s fetched at 1, revisited at 3,5,7; p1 (found wave 1) at 2,4,6,8;
    // p2 (found by s's CHANGED generation 1 at wave 3) at 4,6,8
    assert(fetchWaves("http://a.test/s") === Seq(1, 3, 5, 7))
    assert(fetchWaves("http://a.test/p1") === Seq(2, 4, 6, 8))
    assert(fetchWaves("http://a.test/p2") === Seq(4, 6, 8))
    // every re-fetch stores a version (no contentDedup here); the volatile
    // page's versions differ, the stable pages' versions are byte-equal
    val sDocs = o.docs.filter(_.doc_id == "http://a.test/s")
    assert(sDocs.size === 4)
    assert(sDocs.map(_.spans.head.text).distinct.size === 4, "volatile page changes per generation")
    val p1Docs = o.docs.filter(_.doc_id == "http://a.test/p1")
    assert(p1Docs.size === 4)
    assert(p1Docs.map(_.spans.head.text).distinct.size === 1, "stable page never changes")
    // revisits counter: wave 3 re-enters s; wave 4 re-enters p1 (+p2 first
    // fetch is a discovery, not a revisit)
    def t(w: Int) = totals.find(_.wave == w).get
    assert(t(3).revisits === 1L)
    assert(t(4).revisits === 1L)
    assert(t(5).revisits === 1L)
    assert(t(6).revisits === 2L, "p1 and p2 both due")

    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val byWave = summaryByWave(root, "wave_revisits")
    totals.foreach(x => assert(byWave.getOrElse(x.wave, 0L) === x.revisits,
      s"wave ${x.wave} revisits"))
  }

  test("SILENT waves: with nothing pending and nothing due the crawl " +
    "sleeps to the next due wave — no totals row, no commit; maxUrls and " +
    "maxWaves still stop it — engine == oracle") {
    val fetcher = RevisitFetcher() // no links: the frontier is seeds-only
    val cfg = CrawlConfig(Seq("http://a.test/x", "http://b.test/y"),
      budgetPerHost = 5, maxWaves = 11, fetcherOverride = Some(fetcher),
      revisitEveryWaves = 4)
    val (o, totals) = new RefCrawler(cfg).run()
    // fetch waves: 1, 5, 9 — waves 2-4, 6-8, 10-11 are silent (10 and 11
    // die at maxWaves with the wave-13 revisits still outstanding)
    assert(totals.map(_.wave) === Seq(1, 5, 9))
    assert(totals.map(_.fetched) === Seq(2L, 2L, 2L))
    assert(totals.map(_.revisits) === Seq(0L, 2L, 2L))
    assert(o.trace.map(_.wave).distinct === Seq(1, 5, 9))
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    // the engine committed ONLY the executed waves (silent waves cost no
    // commit at all)
    assert(summaryByWave(root, "wave_fetched").keySet === Set(1, 5, 9))

    // maxUrls binds mid-recrawl: 3 fetches allowed -> waves 1 and 5 run
    // (wave 5 overshoots to 4 total like the oracle's at-wave-start check)
    val cfg2 = cfg.copy(maxUrls = 3)
    val (o2, tot2) = new RefCrawler(cfg2).run()
    assert(tot2.map(_.wave) === Seq(1, 5))
    val root2 = tmp()
    CrawlDriver.run(spark, cfg2, root2)
    assertEqualResults(o2, CrawlDriver.result(spark, root2))
  }

  test("contentDedup interplay: an UNCHANGED revisit is a content " +
    "duplicate of the URL's own earlier fetch (self-aliasing duplicates " +
    "row, no new doc version, links not re-explored); a volatile page " +
    "stores a new version every generation — engine == oracle") {
    val fetcher = RevisitFetcher(
      volatile = Set("http://a.test/v"),
      links = Map("http://a.test/s" -> Seq("/v", "/q")))
    val cfg = CrawlConfig(Seq("http://a.test/s"), budgetPerHost = 5,
      maxWaves = 6, fetcherOverride = Some(fetcher), revisitEveryWaves = 2,
      contentDedup = true)
    val (o, _) = new RefCrawler(cfg).run()
    // s fetched 1,3,5; v and q fetched 2,4,6. Unchanged pages (s, q) dup
    // against THEMSELVES on every revisit; the volatile v never dups.
    val dupsBy = o.duplicates.groupBy(_.canonical_url)
    assert(dupsBy.keySet === Set("http://a.test/s", "http://a.test/q"))
    assert(o.duplicates.forall(d => d.dup_of == d.canonical_url),
      "an unchanged revisit aliases the URL's own first fetch")
    assert(dupsBy("http://a.test/s").map(_.wave).sorted === Seq(3, 5))
    assert(dupsBy("http://a.test/q").map(_.wave).sorted === Seq(4, 6))
    // doc versions: one for each unchanged page, one PER GENERATION for v
    assert(o.docs.count(_.doc_id == "http://a.test/s") === 1)
    assert(o.docs.count(_.doc_id == "http://a.test/q") === 1)
    assert(o.docs.count(_.doc_id == "http://a.test/v") === 3)
    // every fetch is traced, duplicate or not
    assert(o.trace.count(_.canonical_url == "http://a.test/s") === 3)

    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("engine == oracle under revisit + contentDedup + volatile pages + " +
    "failure/redirect injection on the hash web, across parallelism and " +
    "the full 10^10 config with mid-recrawl resume (schedule read back " +
    "from revisit_due)") {
    val web = SyntheticWeb.WebConfig(hosts = 6, pagesPerHost = 30,
      transientFailPct = 15, redirectPct = 8, volatileUrlPct = 40)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(15, web), budgetPerHost = 3,
      maxWaves = 16, web = web, robots = SyntheticWeb.robotsFixture(web),
      revisitEveryWaves = 3, contentDedup = true)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.map(_.revisits).sum > 0, "revisits never fired — fixture weak")
    assert(o.duplicates.exists(d => d.dup_of == d.canonical_url),
      "no unchanged revisit detected — fixture weak")
    assert(o.docs.groupBy(_.doc_id).exists(_._2.size > 1),
      "no changed revisit stored a second version — fixture weak")

    for (parts <- Seq("8", "3")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, cfg, root)
        assertEqualResults(o, CrawlDriver.result(spark, root))
        val byWave = summaryByWave(root, "wave_revisits")
        totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.revisits,
          s"wave ${t.wave} revisits"))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    // full 10^10 engine config, killed mid-recrawl AFTER revisits began
    // and resumed: the outstanding schedule must rebuild from revisit_due
    val splitAt = totals.find(_.revisits > 0).get.wave
    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table",
      contentStorage = "store")
    val root = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = splitAt), root, eng)
    CrawlDriver.resume(spark, cfg, root, eng)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val byWave = summaryByWave(root, "wave_revisits")
    totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.revisits,
      s"wave ${t.wave} revisits (resumed)"))
  }

  test("revisitStorage=store: due entries are scanned from the revisit_due " +
    "table (no resident schedule) — EQ at N=1, where the in-flight delta " +
    "arm is live every wave, and at N=3 with mid-recrawl resume, both in " +
    "the full 10^10 config") {
    val web = SyntheticWeb.WebConfig(hosts = 6, pagesPerHost = 25,
      transientFailPct = 10, volatileUrlPct = 35)
    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table",
      contentStorage = "store", revisitStorage = "store")
    // N=1: a row scheduled at wave w is due at w+1, BEFORE its carrying
    // commit has been awaited — every due read exercises the delta arm
    val cfg1 = CrawlConfig(SyntheticWeb.seedUrls(12, web), budgetPerHost = 3,
      maxWaves = 10, web = web, robots = SyntheticWeb.robotsFixture(web),
      revisitEveryWaves = 1, contentDedup = true)
    val (o1, t1) = new RefCrawler(cfg1).run()
    assert(t1.map(_.revisits).sum > 0, "no revisits fired — fixture weak")
    val root1 = tmp()
    CrawlDriver.run(spark, cfg1, root1, eng)
    assertEqualResults(o1, CrawlDriver.result(spark, root1))
    // N=3 with a kill AFTER revisits began and a store-mode resume: the
    // counts rebuild from the table group-by, entries never go resident
    val cfg3 = cfg1.copy(revisitEveryWaves = 3, maxWaves = 14)
    val (o3, t3) = new RefCrawler(cfg3).run()
    val splitAt = t3.find(_.revisits > 0).get.wave
    val root3 = tmp()
    CrawlDriver.run(spark, cfg3.copy(maxWaves = splitAt), root3, eng)
    CrawlDriver.resume(spark, cfg3, root3, eng)
    assertEqualResults(o3, CrawlDriver.result(spark, root3))
    val byWave = summaryByWave(root3, "wave_revisits")
    t3.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.revisits,
      s"wave ${t.wave} revisits (store mode, resumed)"))
  }

  test("revisit toggled at RESUME: enabling in phase 2 schedules only " +
    "phase-2 fetches (phase-1 recorded nothing); disabling in phase 2 " +
    "drops the outstanding schedule — engine == phased oracle both ways") {
    val web = SyntheticWeb.WebConfig(hosts = 5, pagesPerHost = 20,
      volatileUrlPct = 30)
    val base = CrawlConfig(SyntheticWeb.seedUrls(12, web), budgetPerHost = 3,
      maxWaves = 12, web = web, contentDedup = true)
    val withRv = base.copy(revisitEveryWaves = 2)
    // enable at resume
    val (onAt3, totOn) = new RefCrawler(base).runPhased(3, withRv)
    assert(totOn.filter(_.wave > 3).map(_.revisits).sum > 0,
      "phase-2 revisits never fired — fixture weak")
    val rootOn = tmp()
    CrawlDriver.run(spark, base.copy(maxWaves = 3), rootOn)
    CrawlDriver.resume(spark, withRv, rootOn)
    assertEqualResults(onAt3, CrawlDriver.result(spark, rootOn))
    // disable at resume: outstanding phase-1 schedule is dropped, the
    // crawl drains its frontier and stops
    val (offAt3, totOff) = new RefCrawler(withRv).runPhased(3, base)
    assert(totOff.filter(_.wave > 3).forall(_.revisits == 0L))
    val rootOff = tmp()
    CrawlDriver.run(spark, withRv.copy(maxWaves = 3), rootOff)
    CrawlDriver.resume(spark, base, rootOff)
    assertEqualResults(offAt3, CrawlDriver.result(spark, rootOff))
  }

  test("config validation: revisitEveryWaves must be >= 0") {
    assertThrows[IllegalArgumentException](
      CrawlConfig(Seq("http://a.test/x"), budgetPerHost = 1,
        revisitEveryWaves = -1))
  }
}
