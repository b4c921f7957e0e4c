package graft.tools

import graft.crawl.{CrawlConfig, CrawlDriver, SyntheticWeb}
import org.apache.spark.sql.SparkSession

/** Quick A/B timing of engine configurations on the wide-wave bench crawl
  * (one warm + one timed run per mode, one shared session) — for iterating
  * on a single mode without paying the full Bench scaling matrix.
  * Usage: sbt "runMain graft.tools.CrawlModeBench [cores] [parseIters] [mode ...]"
  * Modes: fixture | fetch | table | scale | scale-table | hostcap | cdup
  * | cdup-store (cdup with contentStorage="store": the registry scanned
  * shard-pruned from the content_seen table each wave, never resident)
  * | backoff (hostcap = fixture + a maxUrlsPerHost high enough to never
  * bind: the full cap machinery — per-host window, counts join, chained
  * checkpoint — runs every wave, so fixture-vs-hostcap is its pure
  * overhead. cdup = fixture + contentDedup on the unique-content web: no
  * fingerprint ever matches, but every success is hashed, window-ranked,
  * state-joined and appended to content_seen — the WORST case for state
  * growth and the pure overhead of the content-seen machinery. backoff =
  * fixture + hostBackoff on the failure-free web: no host ever fails, so
  * the per-wave trailing-failure aggregate runs with nothing to find —
  * the healthy-crawl overhead of the backoff machinery. sitemap = fixture
  * + fetchSitemaps on a web serving NO sitemaps: every host is still
  * probed once on first encounter and the probed-state anti-join +
  * chained checkpoint run every wave — the pure overhead of the sitemap
  * machinery. revisit = fixture + revisitEveryWaves LONGER than the run:
  * every success is scheduled — the schedule-state checkpoint + count +
  * revisit_due append run every wave — but nothing ever comes due, so
  * the fetch workload is identical to fixture and the delta is the pure
  * overhead of the revisit machinery. adaptive = revisit +
  * revisitAdaptive: same no-revisit-fires workload, plus the per-success
  * span fingerprinting, the adaptive schedule expressions and the
  * per-due-wave groupBy-collect — adaptive-vs-revisit is the pure
  * overhead of interval adaptation. ttl = fetch + robotsTtlWaves=1, the
  * WORST-case robots churn: every host's resolution expires every wave,
  * so the stale-pending query + distributed re-fetch + broadcast swap
  * run at full host width each wave — ttl-vs-fetch bounds the refetch
  * machinery's cost from above; a real ttl amortizes it 1/ttl.
  * sitemap-serve = fetch + fetchSitemaps on a web where HALF the hosts
  * serve sitemaps (40% of those as INDEX files, 40% declaring via
  * robots `Sitemap:` directives): full discovery active — probe
  * anti-join, directive body reads, child fetches, entry admission.
  * NOT a pure A/B vs fetch (the discovered entries change the
  * workload); it measures throughput with the machinery fully hot.)
  */
object CrawlModeBench {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val iters = if (args.length > 1) args(1).toLong else 8000000L
    val modes = if (args.length > 2) args.drop(2).toSeq
                else Seq("fixture", "table")
    val spark = SparkSession.builder()
      .master(s"local[$cores]").appName("crawl-mode-bench")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cfgOf(pages: Int, seeds: Int, cap: Long, fetchRobots: Boolean) = {
      val web = SyntheticWeb.WebConfig(hosts = 64, pagesPerHost = pages,
        parseWorkIters = iters)
      val base = CrawlConfig(SyntheticWeb.seedUrls(seeds, web), 1000, 2, cap,
        web = web, robots = SyntheticWeb.robotsFixture(web))
      if (fetchRobots) base.copy(robots = Nil, fetchRobotsTxt = true) else base
    }
    def engOf(mode: String): (CrawlDriver.EngineConfig, Boolean) = mode match {
      case "fixture"     => (CrawlDriver.EngineConfig(), false)
      case "hostcap"     => (CrawlDriver.EngineConfig(), false)
      case "cdup"        => (CrawlDriver.EngineConfig(), false)
      case "backoff"     => (CrawlDriver.EngineConfig(), false)
      case "sitemap"     => (CrawlDriver.EngineConfig(), false)
      case "revisit"     => (CrawlDriver.EngineConfig(), false)
      case "adaptive"    => (CrawlDriver.EngineConfig(), false)
      case "cdup-store"  => (CrawlDriver.EngineConfig(contentStorage = "store"), false)
      case "fetch"         => (CrawlDriver.EngineConfig(), true)
      case "ttl"           => (CrawlDriver.EngineConfig(), true)
      case "sitemap-serve" => (CrawlDriver.EngineConfig(), true)
      case "table"       => (CrawlDriver.EngineConfig(robotsStorage = "table"), true)
      case "scale"       => (CrawlDriver.EngineConfig(filterDistribution = "lazy",
        pendingStorage = "mor", seenStorage = "store"), false)
      case "scale-table" => (CrawlDriver.EngineConfig(filterDistribution = "lazy",
        pendingStorage = "mor", seenStorage = "store", robotsStorage = "table"), true)
      case other => throw new IllegalArgumentException(s"unknown mode '$other'")
    }

    modes.foreach { m =>
      val (eng, fetch) = engOf(m)
      def withCap(c: CrawlConfig): CrawlConfig =
        if (m == "hostcap") c.copy(maxUrlsPerHost = 1L << 40)
        else if (m == "cdup" || m == "cdup-store") c.copy(contentDedup = true)
        else if (m == "backoff") c.copy(hostBackoff =
          Some(graft.crawl.HostBackoff(failureThreshold = 3, backoffWaves = 2)))
        else if (m == "sitemap") c.copy(fetchSitemaps = true)
        else if (m == "revisit") c.copy(revisitEveryWaves = 1000)
        else if (m == "adaptive") c.copy(revisitEveryWaves = 1000,
          revisitAdaptive = Some(graft.crawl.AdaptiveRevisit(
            minWaves = 1, maxWaves = 2048)))
        else if (m == "ttl") c.copy(robotsTtlWaves = 1)
        else if (m == "sitemap-serve") c.copy(fetchSitemaps = true,
          web = c.web.copy(sitemapHostPct = 50, sitemapIndexPct = 40,
            sitemapDirectivePct = 40))
        else c
      // warm (small), then timed (the Bench wide-wave regime)
      CrawlDriver.run(spark, withCap(cfgOf(101, 2000, 5000, fetch)),
        java.nio.file.Files.createTempDirectory("cmb-warm").toString, eng)
      val cfg = withCap(cfgOf(2001, 60000, 60000, fetch))
      val root = java.nio.file.Files.createTempDirectory("cmb").toString
      val t0 = System.nanoTime()
      val h = CrawlDriver.run(spark, cfg, root, eng)
      val secs = (System.nanoTime() - t0) / 1e9
      import org.apache.spark.sql.functions._
      val deduped = h.store.read("metrics").agg(sum("deduped")).head().getLong(0)
      println(f"[mode-bench] mode=$m fetched=${h.fetchedTotal} deduped=$deduped " +
        f"secs=$secs%.1f urls_per_sec=${(h.fetchedTotal + deduped) / secs}%.0f")
    }
    spark.stop()
  }
}
