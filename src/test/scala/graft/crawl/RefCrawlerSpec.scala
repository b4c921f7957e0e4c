package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CanonicalUrl

class RefCrawlerSpec extends AnyFunSuite {

  private def cfg(nSeeds: Int = 24, budget: Int = 2, maxWaves: Int = 50) = {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    CrawlConfig(
      seeds = SyntheticWeb.seedUrls(nSeeds, web),
      budgetPerHost = budget,
      maxWaves = maxWaves,
      web = web,
      robots = SyntheticWeb.robotsFixture(web))
  }

  test("deterministic: two runs produce identical results") {
    val (r1, t1) = new RefCrawler(cfg()).run()
    val (r2, t2) = new RefCrawler(cfg()).run()
    assert(r1 === r2)
    assert(t1 === t2)
  }

  test("terminates and visits the closed page space at most once each") {
    val (r, _) = new RefCrawler(cfg()).run()
    assert(r.trace.nonEmpty)
    val urls = r.trace.map(_.canonical_url)
    assert(urls.distinct.size === urls.size, "a URL was fetched twice")
    urls.foreach(u => assert(r.seen.contains(u)))
  }

  test("per-host budget holds in every wave") {
    val (r, _) = new RefCrawler(cfg(budget = 3)).run()
    r.trace.groupBy(t => (t.wave, t.host)).foreach { case ((w, h), rows) =>
      assert(rows.size <= 3, s"wave $w host $h over budget: ${rows.size}")
    }
  }

  test("trace seq is 1..n within each wave, in frontier order") {
    val (r, _) = new RefCrawler(cfg()).run()
    r.trace.groupBy(_.wave).foreach { case (_, rows) =>
      assert(rows.map(_.seq) === (1L to rows.size.toLong))
    }
  }

  test("robots: deny-all host is never fetched; /p/1-prefix denial honored") {
    val c = cfg()
    val denyAll = s"host${c.web.hosts - 1}.test"
    val (r, _) = new RefCrawler(c).run()
    assert(!r.trace.exists(_.host === denyAll))
    // host1: /p/1* denied except the /p/12* allow-override
    r.trace.filter(_.host === "host1.test").foreach { t =>
      val p = CanonicalUrl.path(t.canonical_url)
      if (p.startsWith("/p/1") && !p.startsWith("/p/12"))
        fail(s"robots-denied URL fetched: ${t.canonical_url}")
    }
  }

  test("maxUrls caps fetch count (checked at wave starts)") {
    val (rFull, _) = new RefCrawler(cfg()).run()
    val (rCap, _) = new RefCrawler(cfg().copy(maxUrls = 20)).run()
    assert(rCap.trace.size < rFull.trace.size)
    // prefix property: the capped trace is a prefix of the full trace
    assert(rFull.trace.take(rCap.trace.size) === rCap.trace)
  }

  test("docs: one per fetched URL, spans well-formed and ordered") {
    val (r, _) = new RefCrawler(cfg()).run()
    assert(r.docs.map(_.doc_id) === r.trace.map(_.canonical_url))
    r.docs.foreach { d =>
      d.spans.zipWithIndex.foreach { case (s, i) =>
        assert(s.offset === i)
        if (s.kind == "text") { assert(s.text != null && s.media_ref == null) }
        else { assert(s.kind === "media"); assert(s.media_ref != null && s.text == null) }
      }
    }
  }

  test("hot-host skew exists in discovered link targets") {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30, hotHost = 2)
    val c = CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 4,
      maxWaves = 30, web = web, robots = Nil)
    val (r, _) = new RefCrawler(c).run()
    val byHost = r.seen.groupBy(CanonicalUrl.host).map { case (k, v) => k -> v.size }
    val hot = byHost.getOrElse("host2.test", 0)
    val others = (byHost - "host2.test").values
    assert(hot >= others.max, s"hot host not hottest: hot=$hot others=$byHost")
  }
}
