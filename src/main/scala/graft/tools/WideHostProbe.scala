package graft.tools

import graft.crawl.{CrawlConfig, CrawlDriver, SyntheticWeb}
import org.apache.spark.sql.SparkSession

/** 10^5-HOST synthetic probe of the full 10^10-scale engine configuration
  * (lazy filters + MOR pending + store-scanned seen + robots-as-TABLE with
  * in-crawl acquisition): the host DIMENSION is the thing the table-robots
  * machinery exists for, and the unit tests exercise it only at 4–64
  * hosts. One seed per host, so wave 1 alone fetches `hosts` URLs and the
  * robots tables carry `hosts` host rows + ~0.4·hosts rule rows through
  * the join-based selection/admission path.
  *
  * Runs the SAME input twice — broadcast-hinted host joins (default
  * threshold) and hint WITHHELD (`robotsBroadcastMaxRows=0`, the 10^7-host
  * shuffled-join regime) — asserting identical outputs and reporting wall
  * time for both (recorded in BASELINE.md).
  *
  * With a 4th arg `cap` > 0, two host-cap legs run after the hint pair:
  * `cap-loose` (cap = 10 × pagesPerHost, never binds — output asserted
  * identical to the uncapped hinted leg, so the delta is pure overhead of
  * the per-host window + counts join + chained counts checkpoint at this
  * host width; past 2^20 hosts the counts join auto-degrades to the
  * shuffled regime exactly like the robots hint) and `cap-bound` (cap =
  * the arg — asserts no host exceeds it in seen, the operator's invariant
  * at width).
  *
  * Usage: sbt "runMain graft.tools.WideHostProbe [cores] [hosts] [maxWaves] [cap]"
  */
object WideHostProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val hosts = if (args.length > 1) args(1).toInt else 100000
    val maxWaves = if (args.length > 2) args(2).toInt else 2
    val cap = if (args.length > 3) args(3).toLong else 0L
    val spark = SparkSession.builder()
      .master(s"local[$cores]").appName("wide-host-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val web = SyntheticWeb.WebConfig(hosts = hosts, pagesPerHost = 6)
    val cfg = CrawlConfig(Nil /* seeds arrive as a TABLE below */,
      budgetPerHost = 2,
      maxWaves = maxWaves, maxUrls = 3L * hosts, web = web,
      robots = Nil, fetchRobotsTxt = true)
    // seeds GENERATED distributed (pure function of the index) and fed as a
    // table — at 10^7 hosts the list must never exist on the driver
    def seedsDf = {
      import spark.implicits._
      val w = web
      spark.range(0, hosts.toLong,  1,
          math.max(cores, hosts / 200000))
        .map(i => (SyntheticWeb.seedUrl(i, w), i))
        .toDF("url", "seed_seq")
    }
    val engFull = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table")

    // small warm-up (JIT + session init)
    val warmWeb = SyntheticWeb.WebConfig(hosts = 512, pagesPerHost = 6)
    CrawlDriver.run(spark,
      CrawlConfig(SyntheticWeb.seedUrls(512, warmWeb), 2, 2, 1536, warmWeb,
        robots = Nil, fetchRobotsTxt = true),
      java.nio.file.Files.createTempDirectory("whp-warm").toString, engFull)

    import ProbeUtil.contentHash

    def timed(label: String, eng: CrawlDriver.EngineConfig,
              c: CrawlConfig = cfg): (Long, Long, String, String) = {
      val root = java.nio.file.Files.createTempDirectory(s"whp-$label").toString
      val t0 = System.nanoTime()
      val h = CrawlDriver.runWithSeedTable(spark, c, root, seedsDf, eng)
      val secs = (System.nanoTime() - t0) / 1e9
      import org.apache.spark.sql.functions._
      val deduped = h.store.read("metrics").agg(sum("deduped")).head().getLong(0)
      val nRules = h.store.read("robots_rules").count()
      val nHosts = h.store.read("robots_hosts").count()
      println(f"[wide-host] $label hosts=$hosts fetched=${h.fetchedTotal} " +
        f"deduped=$deduped robots_rules=$nRules robots_hosts=$nHosts " +
        f"hints_applied=${h.robotsHintsApplied} hints_withheld=${h.robotsHintsWithheld} " +
        f"cap_hints=${h.capHintsApplied}/${h.capHintsWithheld} " +
        f"secs=$secs%.1f urls_per_sec=${(h.fetchedTotal + deduped) / secs}%.0f")
      (h.fetchedTotal, deduped,
        contentHash(h.store.read("trace")), contentHash(h.store.read("seen")))
    }

    val a = timed("hinted", engFull)
    val b = timed("withheld", engFull.copy(robotsBroadcastMaxRows = 0))
    require(a == b, s"strategy knob changed output: $a vs $b")
    println("[wide-host] outputs identical across hint regimes " +
      "(trace + seen content hashes, order-independent)")

    if (cap > 0) {
      // never-binding cap: same output as the uncapped hinted leg — the
      // timing delta is the cap machinery's pure overhead at this width
      val loose = timed("cap-loose", engFull,
        cfg.copy(maxUrlsPerHost = 10L * web.pagesPerHost))
      require(loose == a, s"non-binding cap changed output: $loose vs $a")
      println("[wide-host] cap-loose output identical to uncapped")
      // binding cap: the operator's invariant — no host exceeds it in seen
      val boundRoot = java.nio.file.Files.createTempDirectory("whp-cap-bound").toString
      val t0 = System.nanoTime()
      val h = CrawlDriver.runWithSeedTable(spark,
        cfg.copy(maxUrlsPerHost = cap), boundRoot, seedsDf, engFull)
      val secs = (System.nanoTime() - t0) / 1e9
      import org.apache.spark.sql.functions._
      val worst = h.store.read("seen").groupBy(col("host_hash"))
        .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0)
      require(worst <= cap, s"cap violated: a host has $worst seen rows > $cap")
      println(f"[wide-host] cap-bound cap=$cap fetched=${h.fetchedTotal} " +
        f"max_seen_per_host=$worst " +
        f"cap_hints=${h.capHintsApplied}/${h.capHintsWithheld} secs=$secs%.1f")
    }
    spark.stop()
  }
}
