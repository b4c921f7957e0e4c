package graft.tools

import graft.crawl.{CrawlConfig, CrawlDriver, SyntheticWeb}
import org.apache.spark.sql.SparkSession

/** HOT-HOST SKEW probe of the Q3 salted repartition (north_star: "salted
  * repartitioning on host-hash to break hot-domain skew"). The EQ suite
  * pins that `saltFanout` never changes output; this probe MEASURES the
  * skew it exists to break, under a controlled worst case the organic
  * synthetic-web tests can't reach:
  *
  *  - one wave whose selected URLs are 50% a single hot host (seed-table
  *    driven, so the wave composition is exact, not emergent);
  *  - `parseWorkIters` injects the deterministic per-page fetch+parse CPU
  *    a real crawler pays (~1 ns/iter), making partition imbalance the
  *    wall-clock term;
  *  - salted (`saltFanout=64`, default) vs UNSALTED (`saltFanout=1`, the
  *    engine a naive host-hash repartition would be) on the same input.
  *
  * Reports wall seconds and, from the per-partition metrics table the wave
  * committed, the max-partition share of fetched URLs — unsalted must pin
  * ~the hot fraction in one partition, salted ~1/nParts — and asserts
  * trace/seen/docs content equality across the two (strategy-only knob).
  * Results recorded in BASELINE.md.
  *
  * Usage: sbt "runMain graft.tools.SkewProbe [cores] [hotUrls] [coldHosts] [spinIters]"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val hotUrls = if (args.length > 1) args(1).toInt else 100000
    val coldHosts = if (args.length > 2) args(2).toInt else 99
    val spin = if (args.length > 3) args(3).toLong else 100000L // ~100 µs/page
    val spark = SparkSession.builder()
      .master(s"local[$cores]").appName("skew-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import ProbeUtil.contentHash

    val total = 2 * hotUrls // hot host owns exactly half the wave
    val web = SyntheticWeb.WebConfig(hosts = coldHosts + 1,
      pagesPerHost = hotUrls, hotHost = 0, parseWorkIters = spin)
    val cfg = CrawlConfig(Nil /* seeds arrive as a table */,
      budgetPerHost = Int.MaxValue, // selection must not shave the skew
      maxWaves = 1, maxUrls = 4L * hotUrls, web = web, robots = Nil)
    // seed i < hotUrls -> host0 page i; the rest round-robin the cold hosts
    def seedsDf = {
      import spark.implicits._
      val (hot, cold) = (hotUrls, coldHosts)
      spark.range(0, total.toLong, 1, cores)
        .map { i =>
          val url =
            if (i < hot) SyntheticWeb.canonicalPage(0, i.toInt)
            else SyntheticWeb.canonicalPage(1 + ((i - hot) % cold).toInt,
              ((i - hot) / cold).toInt)
          (url, i)
        }
        .toDF("url", "seed_seq")
    }

    // warm-up (JIT + session init) at 1/20 scale
    CrawlDriver.run(spark,
      cfg.copy(seeds = SyntheticWeb.seedUrls(math.max(64, total / 20), web),
        web = web.copy(parseWorkIters = 0)),
      java.nio.file.Files.createTempDirectory("skew-warm").toString)

    def timed(label: String, saltFanout: Int): (Double, String) = {
      import org.apache.spark.sql.functions._
      var best = Double.MaxValue
      var hashes = ""
      (1 to 2).foreach { _ => // min-of-2: drop one-off writeback stalls
        val root = java.nio.file.Files.createTempDirectory(s"skew-$label").toString
        val t0 = System.nanoTime()
        val h = CrawlDriver.runWithSeedTable(spark, cfg, root, seedsDf,
          CrawlDriver.EngineConfig(saltFanout = saltFanout))
        val secs = (System.nanoTime() - t0) / 1e9
        val Array(maxPart, sumAll) = h.store.read("metrics")
          .filter(col("wave") === 1)
          .agg(max("fetched"), sum("fetched")).head()
          .toSeq.map(_.asInstanceOf[Long]).toArray
        require(sumAll == total.toLong, s"wave fetched $sumAll != $total")
        println(f"[skew] $label fanout=$saltFanout fetched=$sumAll " +
          f"secs=$secs%.1f urls_per_sec=${sumAll / secs}%.0f " +
          f"max_partition_share=${maxPart.toDouble / sumAll}%.4f")
        if (secs < best) best = secs
        hashes = contentHash(h.store.read("trace")) + "/" +
          contentHash(h.store.read("seen")) + "/" +
          contentHash(h.store.read("docs"))
      }
      (best, hashes)
    }

    val (saltedSecs, saltedHash) = timed("salted", saltFanout = 64)
    val (unsaltedSecs, unsaltedHash) = timed("unsalted", saltFanout = 1)
    require(saltedHash == unsaltedHash,
      s"saltFanout changed output: $saltedHash vs $unsaltedHash")
    println(f"[skew] outputs identical (trace/seen/docs content hashes); " +
      f"unsalted/salted wall ratio = ${unsaltedSecs / saltedSecs}%.2fx " +
      f"(cores=$cores hot_share=0.5 spin=${spin}/page)")
    spark.stop()
  }
}
