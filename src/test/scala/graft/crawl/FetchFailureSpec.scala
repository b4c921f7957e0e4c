package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Fetch-failure + bounded-retry semantics (SURVEY §1.4 extension): a
  * transient failure requeues the URL (same frontier keys, attempts+1)
  * until maxFetchAttempts total attempts, then errors; a permanent failure
  * errors immediately. Errored URLs stay in seen, are never traced/parsed,
  * and land in the `errors` table. Trace seq stays dense 1..n per wave
  * over SUCCESSES in frontier order. Engine == sequential oracle
  * bit-for-bit on trace/seen/docs/errors under failure injection — the
  * contract a real-HTTP fetcher drops into.
  */
class FetchFailureSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlfail").toString

  import CrawlTestUtil.assertEqualResults

  // transient 25% per (url, attempt) re-rolls on retry; permanent 8% of
  // URLs fail every attempt — both hash-derived, identical everywhere
  private val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30,
    transientFailPct = 25, permanentFailPct = 8)
  private def cfg(maxAttempts: Int = 3) =
    CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = SyntheticWeb.robotsFixture(web),
      maxFetchAttempts = maxAttempts)

  test("failure fixture is strong: both error kinds occur, retries recover, " +
    "errored URLs stay in seen and are never traced") {
    val (o, totals) = new RefCrawler(cfg()).run()
    val kinds = o.errors.map(_.kind).toSet
    assert(kinds.contains("permanent"), "no permanent error ever happened")
    assert(kinds.contains("transient_exhausted"), "no retry chain ever exhausted")
    // some traced URL transiently failed its FIRST attempt and succeeded on
    // a retry — the requeue path demonstrably recovers
    val recovered = o.trace.map(_.canonical_url).filter(u =>
      SyntheticWeb.fetchOutcome(u, 0, web) == TransientFetchError)
    assert(recovered.nonEmpty, "no URL ever recovered via retry")
    // exhausted retries carry the full attempt count
    assert(o.errors.filter(_.kind == "transient_exhausted").forall(_.attempts == 3))
    assert(o.errors.filter(_.kind == "permanent").forall(_.attempts == 1))
    // errored URLs: admitted (in seen), never fetched
    val traced = o.trace.map(_.canonical_url).toSet
    o.errors.foreach { e =>
      assert(o.seen.contains(e.canonical_url), s"${e.canonical_url} not in seen")
      assert(!traced.contains(e.canonical_url), s"${e.canonical_url} was traced")
    }
    // trace seq stays dense over successes
    o.trace.groupBy(_.wave).foreach { case (w, rows) =>
      assert(rows.map(_.seq).sorted === (1L to rows.size).toSeq,
        s"wave $w trace seq not dense")
    }
    // fetched totals count successes only
    assert(totals.map(_.fetched).sum === o.trace.size.toLong)
  }

  test("engine == oracle under failure injection (trace/seen/docs/errors), " +
    "at two parallelism levels; metrics roll up") {
    import spark.implicits._
    val c = cfg()
    val (o, oracleTotals) = new RefCrawler(c).run()
    assert(o.errors.nonEmpty)
    for (parts <- Seq("8", "3")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, c, root)
        assertEqualResults(o, CrawlDriver.result(spark, root))
        if (parts == "8") {
          val store = new graft.sources.SnapshotStore(root, spark)
          val m = store.read("metrics").as[WaveMetrics].collect().groupBy(_.wave)
          oracleTotals.foreach { t =>
            val rows = m(t.wave)
            assert(rows.map(_.fetched).sum === t.fetched, s"wave ${t.wave} fetched")
            assert(rows.map(_.discovered).sum === t.discovered, s"wave ${t.wave} discovered")
            assert(rows.map(_.budget_deferred).sum === t.budget_deferred,
              s"wave ${t.wave} deferred")
          }
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("failures + resume mid-crawl: requeued attempt counts persist through " +
    "the pending table (COW and MOR composite-key merge) and the full " +
    "10^10 config replays the same crawl") {
    val c = cfg()
    val (o, _) = new RefCrawler(c).run()
    val engines = Seq(
      CrawlDriver.EngineConfig(),
      CrawlDriver.EngineConfig(pendingStorage = "mor", compactPendingEvery = 1000),
      CrawlDriver.EngineConfig(filterDistribution = "lazy",
        pendingStorage = "mor", seenStorage = "store", robotsStorage = "table"))
    engines.foreach { eng =>
      val root = tmp()
      CrawlDriver.run(spark, c.copy(maxWaves = 3), root, eng)
      CrawlDriver.resume(spark, c, root, eng)
      assertEqualResults(o, CrawlDriver.result(spark, root))
    }
    // a requeue really crossed the resume boundary: some URL transient-
    // failed in waves 1-3 and was traced (succeeded) after wave 3
    val post = o.trace.filter(_.wave > 3).map(_.canonical_url).toSet
    assert(post.exists(u => SyntheticWeb.fetchOutcome(u, 0, web) == TransientFetchError),
      "no requeued URL recovered after the resume boundary — fixture too weak")
  }

  test("maxFetchAttempts=1: transient failures error immediately (no retry), " +
    "engine == oracle") {
    val c = cfg(maxAttempts = 1)
    val (o, _) = new RefCrawler(c).run()
    assert(o.errors.exists(_.kind == "transient_exhausted"))
    assert(o.errors.forall(_.attempts == 1))
    val root = tmp()
    CrawlDriver.run(spark, c, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("failures interact with robots acquisition: fetch-mode crawl with " +
    "failure injection stays bit-green (robots fetches are not subject to " +
    "the page failure channel)") {
    val fc = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
      maxWaves = 1000, web = web, robots = Nil, fetchRobotsTxt = true,
      maxFetchAttempts = 3)
    val (o, _) = new RefCrawler(fc).run()
    assert(o.errors.nonEmpty)
    val root = tmp()
    CrawlDriver.run(spark, fc, root, CrawlDriver.EngineConfig(robotsStorage = "table"))
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }
}
