package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Test fetcher with EXPLICIT redirects layered over the synthetic web.
  * Top-level case class: an inner class would capture (and fail to
  * serialize) the suite.
  */
case class ChainFetcher(web: SyntheticWeb.WebConfig,
                        redirects: Map[String, String]) extends PageFetcher {
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    SyntheticWeb.fetchParse(url, web)
  override def fetchAttempt(url: String, attempt: Int): FetchOutcome =
    redirects.get(url) match {
      case Some(raw) => Redirected(raw)
      case None      => super.fetchAttempt(url, attempt)
    }
}

/** HTTP-redirect semantics (RefCrawler model point 8): a redirected fetch
  * consumed its politeness slot but produced no document — the source
  * stays in seen, is never traced/parsed/retried and is not an error; the
  * Location target re-enters the frontier as the page's single discovered
  * link (resolve → canonicalize → seen-dedup → robots admission, depth+1),
  * so chains follow across waves and loops terminate at the seen-set.
  * Engine == sequential oracle bit-for-bit under hash-derived injection
  * and under explicit chains/loops/denied targets.
  */
class RedirectSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("crawlredir").toString

  import CrawlTestUtil.assertEqualResults

  private val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30,
    redirectPct = 20)
  private def cfg(w: SyntheticWeb.WebConfig = web) =
    CrawlConfig(SyntheticWeb.seedUrls(24, w), budgetPerHost = 2,
      maxWaves = 1000, web = w, robots = SyntheticWeb.robotsFixture(w))

  private def redirectsOf(w: SyntheticWeb.WebConfig, urls: Iterable[String]) =
    urls.filter(u => SyntheticWeb.fetchOutcome(u, 0, w)
      .isInstanceOf[Redirected])

  test("redirect fixture is strong: redirects occur and chain; sources stay " +
    "in seen, are never traced/parsed/errored; targets get fetched") {
    val (o, totals) = new RefCrawler(cfg()).run()
    val sources = redirectsOf(web, o.seen).toSet
    assert(sources.size > 5, s"only ${sources.size} redirects — fixture too weak")
    // a chain exists: some redirect's canonical target itself redirects
    val targets = sources.map { u =>
      val Redirected(raw) = SyntheticWeb.fetchOutcome(u, 0, web): @unchecked
      graft.functions.CanonicalUrl.resolve(u, raw)
    }
    assert(targets.exists(sources.contains), "no redirect chain ever formed")
    val traced = o.trace.map(_.canonical_url).toSet
    sources.foreach { u =>
      assert(!traced.contains(u), s"redirect source $u was traced")
    }
    assert(o.docs.forall(d => !sources.contains(d.doc_id)), "redirect source parsed")
    assert(o.errors.forall(e => !sources.contains(e.canonical_url)),
      "redirect recorded as error")
    // a target reached through a redirect really got fetched
    assert(targets.exists(traced.contains), "no redirect target ever fetched")
    // trace stays dense over successes; fetched counts successes only
    o.trace.groupBy(_.wave).foreach { case (w, rows) =>
      assert(rows.map(_.seq).sorted === (1L to rows.size).toSeq,
        s"wave $w trace seq not dense")
    }
    assert(totals.map(_.fetched).sum === o.trace.size.toLong)
  }

  test("engine == oracle under redirect injection, alone and combined with " +
    "failure injection, at two parallelism levels; metrics roll up") {
    import spark.implicits._
    val combined = web.copy(transientFailPct = 20, permanentFailPct = 5)
    for (w <- Seq(web, combined)) {
      val c = cfg(w)
      val (o, oracleTotals) = new RefCrawler(c).run()
      assert(redirectsOf(w, o.seen).nonEmpty)
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
              assert(rows.map(_.discovered).sum === t.discovered,
                s"wave ${t.wave} discovered (redirect targets count)")
              assert(rows.map(_.deduped).sum === t.deduped, s"wave ${t.wave} deduped")
              assert(rows.map(_.robots_denied).sum === t.robots_denied,
                s"wave ${t.wave} denied")
            }
            // per-wave redirect counts ride the commit summaries; they must
            // roll up to the oracle's (and be nonzero somewhere — fixture)
            val byWave = (1L to store.currentVersion.get)
              .map(store.manifest).flatMap { man =>
                man.summary.get("wave_redirected").map { r =>
                  man.summary("wave").toInt -> r.toLong
                }
              }.toMap
            oracleTotals.foreach { t =>
              assert(byWave.getOrElse(t.wave, 0L) === t.redirected,
                s"wave ${t.wave} redirected")
            }
            assert(oracleTotals.map(_.redirected).sum > 0)
          }
        } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
    }
  }

  test("explicit chains: multi-hop chain follows across waves, a redirect " +
    "loop terminates at the seen-set, a redirect into a robots-denied " +
    "target is admitted to seen only — engine == oracle") {
    val w = SyntheticWeb.WebConfig(hosts = 4, pagesPerHost = 12)
    val a = "http://host0.test/p/1"; val b = "http://host0.test/p/2"
    val c = "http://host1.test/p/3"
    val x = "http://host2.test/p/5"; val y = "http://host2.test/p/6"
    val d = "http://host3.test/p/7"; val denied = "http://host3.test/deny/1"
    val fetcher = ChainFetcher(w, Map(
      a -> "/p/2",                       // a -> b: absolute-path reference
      b -> "HTTP://HOST1.TEST:80/p/3",   // b -> c: needs canonicalization
      x -> y, y -> x,                    // loop
      d -> denied))                      // into a denied path
    val conf = CrawlConfig(Seq(a, x, d), budgetPerHost = 2, maxWaves = 1000,
      web = w, robots = Seq(RobotsRule("host3.test", "/deny", allow = false, 0)),
      fetcherOverride = Some(fetcher))
    val (o, _) = new RefCrawler(conf).run()
    val traced = o.trace.map(_.canonical_url).toSet
    // chain: a and b consumed slots but were never traced; c was fetched
    assert(Seq(a, b, x, y, d).forall(o.seen.contains))
    assert(Seq(a, b, x, y, d).forall(u => !traced.contains(u)))
    assert(traced.contains(c), "end of the redirect chain never fetched")
    // loop: both in seen, crawl terminated (we got here), no errors for them
    assert(o.errors.isEmpty)
    // denied target: in seen (admission), never fetched
    assert(o.seen.contains(denied) && !traced.contains(denied))
    // the redirects ALIAS TABLE records every hop with resolved targets —
    // including the loop edges and the hop into the denied target
    val edges = o.redirects.map(r => r.canonical_url -> r.target_url).toSet
    assert(edges === Set(a -> b, b -> c, x -> y, y -> x, d -> denied))
    assert(o.redirects.forall(r => graft.functions.CanonicalUrl.host(r.canonical_url) == r.host))
    val root = tmp()
    CrawlDriver.run(spark, conf, root)
    assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("redirects cross the resume boundary and survive the full 10^10 " +
    "config; robots-acquisition interplay stays bit-green") {
    val c = cfg()
    val (o, _) = new RefCrawler(c).run()
    val engines = Seq(
      CrawlDriver.EngineConfig(),
      CrawlDriver.EngineConfig(filterDistribution = "lazy",
        pendingStorage = "mor", seenStorage = "store", robotsStorage = "table"))
    engines.foreach { eng =>
      val root = tmp()
      CrawlDriver.run(spark, c.copy(maxWaves = 2), root, eng)
      CrawlDriver.resume(spark, c, root, eng)
      assertEqualResults(o, CrawlDriver.result(spark, root))
    }
    // a redirect target admitted in waves 1-2 really got fetched after the
    // boundary, so a chain demonstrably crossed the resume
    val post = o.trace.filter(_.wave > 2).map(_.canonical_url).toSet
    val sources = redirectsOf(web, o.seen)
    val targets = sources.map { u =>
      val Redirected(raw) = SyntheticWeb.fetchOutcome(u, 0, web): @unchecked
      graft.functions.CanonicalUrl.resolve(u, raw)
    }
    assert(targets.exists(post.contains),
      "no redirect target fetched after the resume boundary — fixture too weak")
    // fetch-mode robots acquisition with redirects (table distribution)
    val fc = cfg().copy(robots = Nil, fetchRobotsTxt = true)
    val (of, _) = new RefCrawler(fc).run()
    val root = tmp()
    CrawlDriver.run(spark, fc, root, CrawlDriver.EngineConfig(robotsStorage = "table"))
    assertEqualResults(of, CrawlDriver.result(spark, root))
  }
}
