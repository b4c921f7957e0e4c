package graft.tools

import graft.crawl.{CrawlConfig, CrawlDriver, SyntheticWeb}
import org.apache.spark.graftshim.CoreShim
import org.apache.spark.sql.SparkSession

/** Long-crawl ENDURANCE probe for the release machinery (checkpoint
  * two-generation queue, robots-res release, seen-slice re-rooting, cache
  * unpersists): runs a 40+-wave crawl in the FULL 10^10-scale engine
  * configuration (lazy filters + MOR pending + store-scanned seen +
  * robots-as-table with in-crawl acquisition) and records block-manager
  * storage-memory usage at every wave end. The claim under test — bounded
  * block-manager usage over unbounded waves — is published as the
  * early-vs-late high-water comparison (BASELINE.md): if any release queue
  * leaked, the curve grows linearly with wave count.
  *
  * Also runs the default (cached-seen, COW) config, whose slice re-rooting
  * is the machinery most exercised by frequent waves.
  *
  * Usage: sbt "runMain graft.tools.EnduranceProbe [cores] [maxWaves] [pagesPerHost] [legFilter]"
  * legFilter: run only legs whose label contains the substring.
  */
object EnduranceProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val maxWaves = if (args.length > 1) args(1).toInt else 40
    val pages = if (args.length > 2) args(2).toInt else 400
    val legFilter = if (args.length > 3) Some(args(3)) else None
    val spark = SparkSession.builder()
      .master(s"local[$cores]").appName("endurance-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // budget 1/host -> ~hosts fetches per wave, so the frontier drains
    // slowly and the run is wave-bound, exactly what the release queues see
    // on a months-long recrawl
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = pages)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(4, web), budgetPerHost = 1,
      maxWaves = maxWaves, web = web, robots = Nil, fetchRobotsTxt = true)

    def probe(label: String, eng: CrawlDriver.EngineConfig,
              rerootNote: String, c: CrawlConfig = cfg): Unit = {
      if (legFilter.exists(f => !label.contains(f))) return
      val root = java.nio.file.Files.createTempDirectory(s"endur-$label").toString
      val samples = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      val t0 = System.nanoTime()
      val h = CrawlDriver.run(spark, c, root, eng, onWaveEnd = { w =>
        val (used, _) = CoreShim.storageMemory(spark.sparkContext)
        samples += ((w, used))
        if (w % 5 == 0) println(f"[endurance] $label wave=$w storage_used=${used / 1e6}%.1f MB")
        if (w % 10 == 0) {
          val census = CoreShim.blockSummary(spark.sparkContext).toSeq.sorted
            .map { case (k, (n, b)) => f"$k=$n(${b / 1e6}%.1f MB)" }.mkString(" ")
          println(s"[endurance] $label wave=$w blocks: $census")
        }
      })
      val secs = (System.nanoTime() - t0) / 1e9
      val vals = samples.map(_._2)
      val firstQ = vals.take(math.max(1, vals.size / 4)).max
      val lastQ = vals.takeRight(math.max(1, vals.size / 4)).max
      println(f"[endurance] $label waves=${h.wavesRun} fetched=${h.fetchedTotal} " +
        f"secs=$secs%.1f $rerootNote")
      println(f"[endurance] $label storage high-water: first-quartile " +
        f"${firstQ / 1e6}%.1f MB, last-quartile ${lastQ / 1e6}%.1f MB, " +
        f"late/early ratio ${lastQ.toDouble / math.max(1L, firstQ)}%.2f " +
        f"(flat curve = bounded release machinery)")
      println("[endurance] " + label + " per-wave MB: " +
        samples.map { case (w, u) => f"$w:${u / 1e6}%.0f" }.mkString(" "))
    }

    probe("scale-mode", CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table"),
      "(lazy+mor+store+table)")
    probe("cached-mode", CrawlDriver.EngineConfig(rerootSeenEvery = 8),
      "(default broadcast/cow/cached, re-root every 8)")
    // forces every wave's trace/discovery numbering onto the two-phase
    // range-partition path (normally >2^20 rows), so its internal ranged
    // checkpoints enter the release cycle — a leak there grows the curve
    probe("scale-mode-2phase", CrawlDriver.EngineConfig(
      filterDistribution = "lazy", pendingStorage = "mor",
      seenStorage = "store", robotsStorage = "table", seqWindowMax = 0),
      "(lazy+mor+store+table, forced two-phase numbering)")
    // content-seen dedup legs, unique-content web (worst-case registry
    // growth: every fetch adds a fingerprint): the chained-state registry
    // is EXPECTED to grow with total fetched content (it IS the registry
    // — the reason store mode exists); the store-mode leg must stay flat
    // like every other bounded-release curve
    val cdup = cfg.copy(contentDedup = true)
    probe("cdup-state", CrawlDriver.EngineConfig(
      filterDistribution = "lazy", pendingStorage = "mor",
      seenStorage = "store", robotsStorage = "table"),
      "(registry = chained checkpoints; growth ∝ fetched content is the expected shape)",
      c = cdup)
    probe("cdup-store", CrawlDriver.EngineConfig(
      filterDistribution = "lazy", pendingStorage = "mor",
      seenStorage = "store", robotsStorage = "table", contentStorage = "store"),
      "(registry = per-wave pruned table scan; must stay flat)", c = cdup)
    // host-backoff leg under SUSTAINED failure injection (every wave sees
    // transients, hosts keep cycling into and out of quarantine): the
    // chained health checkpoints and the host_health appends enter the
    // release cycle every wave. PASS METRIC: the rdd-kind line of the
    // block census (what the release queues manage) stays flat; the
    // high-water RATIO is GC-timing-sensitive — broadcast pieces
    // accumulate until driver GC lets ContextCleaner reclaim them (the
    // session-7 adjudication; a 1.5–4x ratio with a flat rdd census is
    // that artifact, not a leak)
    probe("backoff", CrawlDriver.EngineConfig(
      filterDistribution = "lazy", pendingStorage = "mor",
      seenStorage = "store", robotsStorage = "table"),
      "(hostBackoff under 30% transient injection; pass = flat rdd census)",
      c = cfg.copy(
        web = web.copy(transientFailPct = 30),
        maxFetchAttempts = 4,
        hostBackoff = Some(graft.crawl.HostBackoff(failureThreshold = 2,
          backoffWaves = 2))))
    // sitemap leg on a WIDE host space reached gradually (few seeds,
    // budget 1, cross-host links): new hosts keep appearing for many
    // waves, so the probe fetch, the probed-state re-checkpoint chain
    // (supersededSm) and the sitemap_hosts appends enter the release
    // cycle repeatedly — a leak in any of them grows the rdd census
    val smWeb = web.copy(hosts = 80, sitemapHostPct = 60)
    probe("sitemap", CrawlDriver.EngineConfig(
      filterDistribution = "lazy", pendingStorage = "mor",
      seenStorage = "store", robotsStorage = "table"),
      "(fetchSitemaps on an 80-host web met gradually; pass = flat rdd census)",
      c = cfg.copy(web = smWeb, seeds = SyntheticWeb.seedUrls(4, smWeb),
        fetchSitemaps = true))
    // revisit leg: the recrawl loop IS the unbounded-waves case — every
    // success re-schedules itself, so the frontier never drains and the
    // revisit-state chain (supersededRevisit) + revisit_due appends enter
    // the release cycle EVERY wave. Volatile pages keep doc versions and
    // discovery churning; content dedup runs in store mode so the only
    // resident registry is the schedule itself. Table growth (revisit_due,
    // docs versions) is durable-side and expected; pass = flat rdd census.
    val rvWeb = web.copy(volatileUrlPct = 30)
    probe("revisit", CrawlDriver.EngineConfig(
      filterDistribution = "lazy", pendingStorage = "mor",
      seenStorage = "store", robotsStorage = "table", contentStorage = "store"),
      "(revisitEveryWaves=3 + 30% volatile + cdup-store; pass = flat rdd census)",
      c = cfg.copy(web = rvWeb, seeds = SyntheticWeb.seedUrls(4, rvWeb),
        revisitEveryWaves = 3, contentDedup = true))
    // adaptive-revisit leg: the same never-draining recrawl with per-URL
    // interval adaptation — the carried (interval, fingerprint) columns
    // ride every frontier/schedule row and the per-due-wave counts job
    // runs every scheduling wave; pass = flat rdd census like revisit
    probe("adaptive", CrawlDriver.EngineConfig(
      filterDistribution = "lazy", pendingStorage = "mor",
      seenStorage = "store", robotsStorage = "table", contentStorage = "store"),
      "(revisit N=3 adaptive [1,8] + 30% volatile + cdup-store; pass = flat rdd census)",
      c = cfg.copy(web = rvWeb, seeds = SyntheticWeb.seedUrls(4, rvWeb),
        revisitEveryWaves = 3, contentDedup = true,
        revisitAdaptive = Some(graft.crawl.AdaptiveRevisit(minWaves = 1,
          maxWaves = 8))))
    // robots-TTL leg: worst-case churn (ttl=1 — every pending host's
    // resolution expires every wave), volatile bodies so the re-fetched
    // rules actually change: the per-wave ttlRes checkpoint, the stale
    // semi-join and the growing robots_rules/robots_hosts appends enter
    // the release cycle every wave; pass = flat rdd census (table growth
    // is durable-side and expected)
    val ttlWeb = web.copy(volatileRobotsPct = 40)
    probe("ttl", CrawlDriver.EngineConfig(
      filterDistribution = "lazy", pendingStorage = "mor",
      seenStorage = "store", robotsStorage = "table"),
      "(robotsTtlWaves=1 + 40% volatile robots; pass = flat rdd census)",
      c = cfg.copy(web = ttlWeb, seeds = SyntheticWeb.seedUrls(4, ttlWeb),
        robotsTtlWaves = 1))
    spark.stop()
  }
}
