package graft.tools

import graft.crawl.{CrawlConfig, CrawlDriver, SyntheticWeb}
import org.apache.spark.sql.SparkSession

/** SEED-INGEST probe (DESIGN.md stage 0): measures wave-0 ingest —
  * canonicalize, first-occurrence dedup, dense discovery numbering, robots
  * acquisition + admission, wave-0 commit — through the DISTRIBUTED path
  * ([[CrawlDriver.runWithSeedTable]], seeds generated executor-side from
  * the index) in the full 10^10-scale engine configuration, vs the
  * driver-side local path at a size the driver can still stomach.
  * `maxWaves=0` stops after the wave-0 commit lands, so the number is pure
  * ingest. Outputs (pending + seen content hashes) are asserted identical
  * between the two paths at the comparison size.
  *
  * Host/page space uses COPRIME moduli (9973 × 10007) so ~every seed index
  * maps to a distinct canonical page (the 5 canonical-form spellings still
  * cycle, exercising canonicalization); the host dimension is ~10^4, so
  * table-robots acquisition fetches ~10^4 robots.txt distributed.
  *
  * Usage: sbt "runMain graft.tools.SeedIngestProbe [cores] [nSeeds] [compareLocalN]"
  *   compareLocalN = 0 skips the driver-side leg (for 10^7+ where the
  *   local-relation stall is the thing the distributed path exists to avoid)
  */
object SeedIngestProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val nSeeds = if (args.length > 1) args(1).toLong else 2000000L
    val compareLocalN = if (args.length > 2) args(2).toLong else 1000000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]").appName("seed-ingest-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val web = SyntheticWeb.WebConfig(hosts = 9973, pagesPerHost = 10007)
    def cfgOf(seeds: Seq[String]) = CrawlConfig(seeds, budgetPerHost = 2,
      maxWaves = 0, web = web, robots = Nil, fetchRobotsTxt = true)
    val engFull = CrawlDriver.EngineConfig(filterDistribution = "lazy",
      pendingStorage = "mor", seenStorage = "store", robotsStorage = "table")

    def seedsDf(n: Long) = {
      import spark.implicits._
      val w = web
      spark.range(0, n, 1, math.max(cores, (n / 200000L).toInt))
        .map(i => (SyntheticWeb.seedUrl(i, w), i))
        .toDF("url", "seed_seq")
    }

    import ProbeUtil.contentHash

    // warm-up (JIT + session init)
    CrawlDriver.runWithSeedTable(spark, cfgOf(Nil),
      java.nio.file.Files.createTempDirectory("sip-warm").toString,
      seedsDf(50000), engFull)

    def report(label: String, n: Long, secs: Double,
               h: CrawlDriver.RunHandle): (String, String, Long) = {
      val pend = CrawlDriver.readPending(spark, h.store)
      val stats = (contentHash(pend), contentHash(h.store.read("seen")),
        h.store.read("seen").count())
      println(f"[seed-ingest] $label n=$n admitted_pending_hash=${stats._1} " +
        f"seen=${stats._3} secs=$secs%.1f seeds_per_sec=${n / secs}%.0f")
      stats
    }

    // distributed leg at the full size
    val rootD = java.nio.file.Files.createTempDirectory("sip-dist").toString
    val t0 = System.nanoTime()
    val hD = CrawlDriver.runWithSeedTable(spark, cfgOf(Nil), rootD,
      seedsDf(nSeeds), engFull)
    report("distributed", nSeeds, (System.nanoTime() - t0) / 1e9, hD)

    if (compareLocalN > 0) {
      // same size through BOTH paths: the driver-side list (seeds collected
      // once here, the thing the distributed path avoids) and the seed
      // table — outputs must be identical. Distributed leg runs FIRST: the
      // local leg's 10^6-string driver collection + single-threaded
      // local-relation evaluation leaves GC/writeback contention that
      // would distort a timing taken right after it (measured 3x)
      val rootC = java.nio.file.Files.createTempDirectory("sip-distc").toString
      val t2 = System.nanoTime()
      val hC = CrawlDriver.runWithSeedTable(spark, cfgOf(Nil), rootC,
        seedsDf(compareLocalN), engFull)
      val b = report("distributed-cmp", compareLocalN, (System.nanoTime() - t2) / 1e9, hC)
      val localSeeds = (0L until compareLocalN).map(SyntheticWeb.seedUrl(_, web))
      val rootL = java.nio.file.Files.createTempDirectory("sip-local").toString
      val t1 = System.nanoTime()
      val hL = CrawlDriver.run(spark, cfgOf(localSeeds), rootL,
        engFull.copy(seedIngestLocalMax = Long.MaxValue))
      val a = report("driver-local", compareLocalN, (System.nanoTime() - t1) / 1e9, hL)
      require(a == b, s"ingest paths diverge at n=$compareLocalN: $a vs $b")
      println("[seed-ingest] outputs identical across ingest paths " +
        "(pending + seen content hashes, order-independent)")
    }
    spark.stop()
  }
}
