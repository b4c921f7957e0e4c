package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** DISTRIBUTED seed ingest (EngineConfig.seedIngestLocalMax exceeded, or
  * [[CrawlDriver.runWithSeedTable]]): a 10^7-URL recrawl seed list as a
  * local relation stalls the driver (ConvertToLocalRelation evaluates
  * wave-0 single-threaded, measured), so big lists canonicalize, dedup,
  * number and pass robots admission as Spark jobs. The path must be OUTPUT-
  * INVARIANT: these tests force it at sandbox scale (seedIngestLocalMax=0)
  * and pin bit-equality against the sequential oracle — and hence against
  * the driver-side path, which the rest of the suite pins to the same
  * oracle — across robots/storage modes, with canonical-form duplicate
  * seeds, denied seeds, and fetch-failure injection in the mix.
  */
class SeedIngestSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("seedingest").toString

  import CrawlTestUtil.assertEqualResults

  // seed list with CANONICAL-FORM duplicates (seedUrls cycles 5 spellings of
  // the same page set) and enough hosts that the deny-all fixture host and
  // Crawl-delay hosts participate
  private val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
  private def cfg(fetchRobots: Boolean) = CrawlConfig(
    SyntheticWeb.seedUrls(40, web), budgetPerHost = 2, maxWaves = 1000,
    web = web,
    robots = if (fetchRobots) Nil else SyntheticWeb.robotsFixture(web),
    fetchRobotsTxt = fetchRobots)

  private def forceDistributed(eng: CrawlDriver.EngineConfig) =
    eng.copy(seedIngestLocalMax = 0)

  test("distributed seed path == oracle: fixture robots, default engine " +
    "(dup/uncanonical/denied seeds; filter built from seen0, not in-process)") {
    val c = cfg(fetchRobots = false)
    val (o, _) = new RefCrawler(c).run()
    val root = tmp()
    CrawlDriver.run(spark, c, root, forceDistributed(CrawlDriver.EngineConfig()))
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("distributed seed path == oracle: fixture robots as TABLE") {
    val c = cfg(fetchRobots = false)
    val (o, _) = new RefCrawler(c).run()
    val root = tmp()
    CrawlDriver.run(spark, c, root,
      forceDistributed(CrawlDriver.EngineConfig(robotsStorage = "table")))
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("distributed seed path == oracle: robots ACQUISITION, broadcast mode") {
    val c = cfg(fetchRobots = true)
    val (o, _) = new RefCrawler(c).run()
    val root = tmp()
    CrawlDriver.run(spark, c, root, forceDistributed(CrawlDriver.EngineConfig()))
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("distributed seed path == oracle: robots acquisition + FULL 10^10 " +
    "config (lazy+mor+store+table) + fetch-failure injection, and resume") {
    val failWeb = web.copy(transientFailPct = 25, permanentFailPct = 8)
    val c = CrawlConfig(SyntheticWeb.seedUrls(40, failWeb), budgetPerHost = 2,
      maxWaves = 1000, web = failWeb, robots = Nil, fetchRobotsTxt = true,
      maxFetchAttempts = 3)
    val (o, _) = new RefCrawler(c).run()
    assert(o.errors.nonEmpty, "failure fixture too weak")
    val eng = forceDistributed(CrawlDriver.EngineConfig(
      filterDistribution = "lazy", pendingStorage = "mor",
      seenStorage = "store", robotsStorage = "table"))
    val root = tmp()
    CrawlDriver.run(spark, c.copy(maxWaves = 2), root, eng)
    CrawlDriver.resume(spark, c, root, eng)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("runWithSeedTable (seeds as a DataFrame) == run with the equivalent " +
    "in-order Seq") {
    import spark.implicits._
    val c = cfg(fetchRobots = true)
    val (o, _) = new RefCrawler(c).run()
    val w = web
    val seedsDf = spark.range(0, 40, 1, 4)
      .map(i => (SyntheticWeb.seedUrl(i, w), i)).toDF("url", "seed_seq")
    val root = tmp()
    CrawlDriver.runWithSeedTable(spark, c.copy(seeds = Nil), root, seedsDf,
      CrawlDriver.EngineConfig(robotsStorage = "table"))
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("the two-phase seed numbering really engages: distributed dense " +
    "discovery_time equals first-occurrence order at multiple shuffle widths") {
    val c = cfg(fetchRobots = false)
    val (o, _) = new RefCrawler(c).run()
    for (parts <- Seq("7", "32")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val root = tmp()
        CrawlDriver.run(spark, c, root, forceDistributed(CrawlDriver.EngineConfig()))
        assertEqualResults(o, CrawlDriver.result(spark, root))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
