package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Serializable fixture fetcher with EXPLICIT content identity: a page's
  * span sequence derives from its content key (shared key = bit-identical
  * content at different URLs, the mirror shape), links stay per-URL.
  * Top-level case class — an inner class would capture the suite.
  */
case class ContentFetcher(links: Map[String, Seq[String]],
                          contentKey: Map[String, String]) extends PageFetcher {
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    (Vector(Span("text", "body " + contentKey.getOrElse(url, url), null, 0)),
      links.getOrElse(url, Nil).toVector)
}

/** Content-seen dedup semantics ([[CrawlConfig.contentDedup]], the Mercator
  * content-seen test / anti-mirror guard, oracle model point 11): a
  * successful fetch whose span fingerprint was already seen is traced (the
  * fetch consumed its politeness slot) but contributes NO document and NO
  * outlinks, and lands in the `duplicates` alias table with the owning URL
  * (first fetch of that content; within a wave, first in frontier order).
  * State persists in the `content_seen` table and rebuilds on resume; runs
  * with the flag off record nothing. Engine == oracle bit-exact.
  */
class ContentDedupSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlcdup").toString

  import CrawlTestUtil.assertEqualResults

  private def summaryByWave(root: String, key: String): Map[Int, Long] = {
    val store = new graft.sources.SnapshotStore(root, spark)
    (1L to store.currentVersion.get).map(store.manifest)
      .flatMap(m => m.summary.get(key).map(c => m.summary("wave").toInt -> c.toLong))
      .toMap
  }

  test("explicit fixture: in-wave winner is first in frontier order; " +
    "cross-wave dups point at the original owner; duplicates are traced " +
    "but store no doc and follow no links — engine == oracle, dup counts " +
    "in summaries, alias rows carry the shared fingerprint") {
    val fetcher = ContentFetcher(
      links = Map(
        "http://hosta.test/s1" -> Seq("/p1", "/p2"),
        "http://hostb.test/s2" -> Seq("/q1"), // never followed: s2 is a dup
        "http://hosta.test/p1" -> Seq("/p3"),
        "http://hosta.test/p2" -> Seq("/p4")), // never followed: p2 is a dup
      contentKey = Map(
        "http://hosta.test/s1" -> "K1",
        "http://hostb.test/s2" -> "K1", // in-wave mirror of s1
        "http://hosta.test/p1" -> "K2",
        "http://hosta.test/p2" -> "K1", // cross-wave mirror of s1
        "http://hosta.test/p3" -> "K2")) // cross-wave mirror of p1
    val cfg = CrawlConfig(
      Seq("http://hosta.test/s1", "http://hostb.test/s2"),
      budgetPerHost = 2, maxWaves = 1000,
      fetcherOverride = Some(fetcher), contentDedup = true)
    val (o, totals) = new RefCrawler(cfg).run()

    def h(key: String) = ContentHash.ofSpans(Vector(Span("text", "body " + key, null, 0)))
    assert(o.duplicates === Seq(
      DuplicateRow(1, "http://hostb.test/s2", "hostb.test", "http://hosta.test/s1", h("K1")),
      DuplicateRow(2, "http://hosta.test/p2", "hosta.test", "http://hosta.test/s1", h("K1")),
      DuplicateRow(3, "http://hosta.test/p3", "hosta.test", "http://hosta.test/p1", h("K2"))))
    // duplicates ARE traced (the fetch happened) but store no doc
    assert(o.trace.map(_.canonical_url).toSet ===
      Set("http://hosta.test/s1", "http://hostb.test/s2", "http://hosta.test/p1",
        "http://hosta.test/p2", "http://hosta.test/p3"))
    assert(o.docs.map(_.doc_id) === Seq("http://hosta.test/s1", "http://hosta.test/p1"))
    // a duplicate's links are never explored
    assert(!o.seen.contains("http://hostb.test/q1"))
    assert(!o.seen.contains("http://hosta.test/p4"))
    assert(totals.map(t => t.wave -> t.content_dup).toMap === Map(1 -> 1L, 2 -> 1L, 3 -> 1L))

    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
    val byWave = summaryByWave(root, "wave_content_dup")
    totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.content_dup,
      s"wave ${t.wave} content_dup"))
  }

  test("engine == oracle on the mirror-injected hash web combined with " +
    "robots + redirect + failure injection, across parallelism, and the " +
    "full 10^10 engine config with mid-run resume (content-seen state " +
    "rebuilt from the content_seen table)") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30,
      dupContentGroups = 40, redirectPct = 10, transientFailPct = 10,
      permanentFailPct = 5)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web),
      contentDedup = true)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.map(_.content_dup).sum > 0, "no dups hit — fixture weak")
    val (oOff, _) = new RefCrawler(cfg.copy(contentDedup = false)).run()
    assert(o.docs.size < oOff.docs.size,
      "dedup should store strictly fewer docs than the same crawl without it")

    for (parts <- Seq("8", "3")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, cfg, root)
        assertEqualResults(o, CrawlDriver.result(spark, root))
        val byWave = summaryByWave(root, "wave_content_dup")
        totals.foreach(t => assert(byWave.getOrElse(t.wave, 0L) === t.content_dup,
          s"wave ${t.wave} content_dup"))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    // full 10^10 engine config — incl. contentStorage="store" (the
    // registry is scanned shard-pruned from the content_seen table each
    // wave, never resident) — killed after wave 2 and resumed: the
    // resumed run must dedup against phase-1 content via the table
    val eng = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table",
      contentStorage = "store")
    val root = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = 2), root, eng)
    CrawlDriver.resume(spark, cfg, root, eng)
    val res = CrawlDriver.result(spark, root)
    assertEqualResults(o, res)
    assert(res.duplicates.exists(_.wave > 2), "no post-resume dup — fixture weak")

    // store-mode registry alone (default engine otherwise): bit-equal to
    // the chained-state run
    val rootS = tmp()
    CrawlDriver.run(spark, cfg, rootS,
      CrawlDriver.EngineConfig(contentStorage = "store"))
    assertEqualResults(o, CrawlDriver.result(spark, rootS))
  }

  test("dedup ENABLED AT RESUME dedups only against content fetched from " +
    "then on (the flag-off phase recorded no fingerprints) — engine == " +
    "phased oracle") {
    val web = SyntheticWeb.WebConfig(hosts = 6, pagesPerHost = 30,
      dupContentGroups = 25)
    val cfg1 = CrawlConfig(SyntheticWeb.seedUrls(18, web), budgetPerHost = 3,
      maxWaves = 1000, web = web)
    val cfg2 = cfg1.copy(contentDedup = true)
    val (o, totals) = new RefCrawler(cfg1).runPhased(2, cfg2)
    assert(totals.filter(_.wave <= 2).forall(_.content_dup == 0))
    assert(totals.filter(_.wave > 2).map(_.content_dup).sum > 0,
      "phase-2 dedup never bound — fixture weak")
    assert(o.duplicates.nonEmpty)
    val root = tmp()
    CrawlDriver.run(spark, cfg1.copy(maxWaves = 2), root)
    CrawlDriver.resume(spark, cfg2, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("state-join strategy branch: broadcast-hinted under the row bound, " +
    "forced-withheld above it — counters pin the branch, outputs identical") {
    val web = SyntheticWeb.WebConfig(hosts = 6, pagesPerHost = 25,
      dupContentGroups = 20)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(12, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, contentDedup = true)
    val (o, _) = new RefCrawler(cfg).run()
    val rootH = tmp()
    val hH = CrawlDriver.run(spark, cfg, rootH)
    assert(hH.contentHintsApplied > 0 && hH.contentHintsWithheld === 0)
    assertEqualResults(o, CrawlDriver.result(spark, rootH))
    val rootW = tmp()
    val hW = CrawlDriver.run(spark, cfg, rootW,
      CrawlDriver.EngineConfig(robotsBroadcastMaxRows = 0))
    assert(hW.contentHintsWithheld > 0 && hW.contentHintsApplied === 0)
    assertEqualResults(o, CrawlDriver.result(spark, rootW))
  }

  test("resuming a store-mode crawl with a DIFFERENT bloomShards fan is " +
    "rejected loudly — the persisted shard column would silently mis-prune " +
    "whole bands; the same fan resumes fine and non-store modes tolerate " +
    "the change") {
    val web = SyntheticWeb.WebConfig(hosts = 4, pagesPerHost = 15,
      dupContentGroups = 8)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(6, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, contentDedup = true)
    val root = tmp()
    CrawlDriver.run(spark, cfg.copy(maxWaves = 1), root,
      CrawlDriver.EngineConfig(bloomShards = 8, contentStorage = "store"))
    assertThrows[IllegalArgumentException] {
      CrawlDriver.resume(spark, cfg, root,
        CrawlDriver.EngineConfig(bloomShards = 4, contentStorage = "store"))
    }
    assertThrows[IllegalArgumentException] {
      CrawlDriver.resume(spark, cfg, root,
        CrawlDriver.EngineConfig(bloomShards = 4, seenStorage = "store"))
    }
    CrawlDriver.resume(spark, cfg, root,
      CrawlDriver.EngineConfig(bloomShards = 8, contentStorage = "store"))
    val (o, _) = new RefCrawler(cfg).run()
    assertEqualResults(o, CrawlDriver.result(spark, root))
    // a fan change in the non-store modes recomputes pmod fresh — allowed
    CrawlDriver.resume(spark, cfg, root, CrawlDriver.EngineConfig(bloomShards = 4))
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("flag off: mirror-injected web crawls identically to the pre-dedup " +
    "engine — empty duplicates table, mirrored docs all stored") {
    val web = SyntheticWeb.WebConfig(hosts = 5, pagesPerHost = 20,
      dupContentGroups = 15)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(10, web), budgetPerHost = 2,
      maxWaves = 1000, web = web)
    val (o, totals) = new RefCrawler(cfg).run()
    assert(totals.forall(_.content_dup == 0) && o.duplicates.isEmpty)
    val root = tmp()
    CrawlDriver.run(spark, cfg, root)
    val res = CrawlDriver.result(spark, root)
    assertEqualResults(o, res)
    assert(res.duplicates.isEmpty)
    // the mirrors really are mirrors: distinct docs < distinct contents
    val distinctContents = res.docs.map(d => ContentHash.ofSpans(d.spans)).toSet
    assert(distinctContents.size < res.docs.size,
      "no mirrored content stored — injection broken")
  }
}
