package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CanonicalUrl
import graft.sources.SnapshotStore
import java.nio.file.Files

/** Expiry/recrawl (deletion-safe dedup) and snapshot compaction. */
class ExpireAndCompactSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def cfg(maxWaves: Int = 1000) = {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    CrawlConfig(SyntheticWeb.seedUrls(24, web), budgetPerHost = 2,
      maxWaves = maxWaves, web = web, robots = SyntheticWeb.robotsFixture(web))
  }

  test("expired URL is rediscovered and refetched exactly once more") {
    val full = cfg()
    val (oracleRes, _) = new RefCrawler(full).run()
    // find a URL fetched early that a LATER page links to (deterministic web)
    val fetchWave = oracleRes.trace.map(t => t.canonical_url -> t.wave).toMap
    val candidate = oracleRes.trace.iterator.flatMap { t =>
      if (t.wave < 3) Iterator.empty
      else SyntheticWeb.fetchParse(t.canonical_url, full.web)._2.iterator
        .map(raw => CanonicalUrl.resolve(t.canonical_url, raw))
        .filter(u => fetchWave.get(u).exists(w => w <= 2 && w < t.wave))
        .map(u => (u, t.wave))
    }.toSeq.headOption
    assert(candidate.isDefined, "fixture produced no early-fetched, later-linked URL")
    val (victim, linkerWave) = candidate.get

    // crawl up to just before the linker's wave, expire the victim, resume
    val root = Files.createTempDirectory("expire").toString
    CrawlDriver.run(spark, full.copy(maxWaves = linkerWave - 1), root)
    val before = CrawlDriver.result(spark, root)
    assert(before.trace.exists(_.canonical_url == victim), "victim not yet fetched")
    val removed = CrawlDriver.expire(spark, root, Seq(victim))
    assert(removed === 1L)
    val store = new SnapshotStore(root, spark)
    import spark.implicits._
    assert(store.read("seen").filter($"canonical_url" === victim).count() === 0)

    CrawlDriver.resume(spark, full, root)
    val after = CrawlDriver.result(spark, root)
    val fetches = after.trace.count(_.canonical_url == victim)
    assert(fetches === 2, s"victim fetched $fetches times, expected 2 (original + recrawl)")
    assert(after.seen.contains(victim), "victim must re-enter the seen-set")
    assert(after.docs.count(_.doc_id == victim) === 2)
    // everything NOT expired is still fetched at most once
    val others = after.trace.filterNot(_.canonical_url == victim).map(_.canonical_url)
    assert(others.distinct.size === others.size)
  }

  test("expire works on a merge-on-read frontier (rewrites as a compaction point)") {
    val root = Files.createTempDirectory("expire-mor").toString
    val c = cfg(maxWaves = 3)
    val eng = CrawlDriver.EngineConfig(pendingStorage = "mor", compactPendingEvery = 100)
    CrawlDriver.run(spark, c, root, eng)
    val store = new SnapshotStore(root, spark)
    import spark.implicits._
    val victim = store.read("seen").select($"canonical_url")
      .orderBy($"canonical_url").head.getString(0)
    val pendingBefore = CrawlDriver.readPending(spark, store).count()
    val removed = CrawlDriver.expire(spark, root, Seq(victim))
    assert(removed === 1L)
    // frontier still readable post-expire; deltas compacted away
    val m = store.currentManifest.get
    assert(m.tables("pending_delta").dataDirs.isEmpty ||
      store.read("pending_delta").count() === 0)
    assert(CrawlDriver.readPending(spark, store).count() <= pendingBefore)
    assert(store.read("seen").filter($"canonical_url" === victim).count() === 0)
    // crawl continues fine in MOR mode after the expiry commit
    CrawlDriver.resume(spark, c.copy(maxWaves = 5), root, eng)
    assert(CrawlDriver.result(spark, root).trace.nonEmpty)
  }

  test("large-batch expire (10^5 targets) runs through the anti-join path " +
    "with identical semantics") {
    val root = Files.createTempDirectory("expire-big").toString
    CrawlDriver.run(spark, cfg(maxWaves = 3), root)
    val store = new SnapshotStore(root, spark)
    import spark.implicits._
    val victims = store.read("seen").select($"canonical_url")
      .orderBy($"canonical_url").limit(5).as[String].collect().toSeq
    val seenBefore = store.read("seen").count()
    val pendingBefore = CrawlDriver.readPending(spark, store)
      .select($"canonical_url").as[String].collect().toSet
    // 10^5 targets, almost all absent — far past ExpireJoinThreshold
    val bogus = (0 until 100000).map(i => s"http://nowhere$i.example/x")
    val removed = CrawlDriver.expire(spark, root, bogus ++ victims)
    assert(removed === victims.size.toLong,
      s"expected exactly the ${victims.size} present victims removed")
    assert(store.read("seen").count() === seenBefore - victims.size)
    assert(store.read("seen")
      .filter($"canonical_url".isin(victims: _*)).count() === 0)
    // pending ⊆ seen invariant held through the join path
    val pendingAfter = CrawlDriver.readPending(spark, store)
      .select($"canonical_url").as[String].collect().toSet
    assert(pendingAfter === pendingBefore -- victims)
  }

  test("rollbackTo a mid-crawl wave + resume == the uninterrupted crawl " +
    "(the rollback snapshot carries the wave counters, so the resumed loop " +
    "re-runs the undone waves deterministically)") {
    val full = cfg()
    val (o, _) = new RefCrawler(full).run()
    val root = Files.createTempDirectory("rollback").toString
    CrawlDriver.run(spark, full, root)
    val store = new SnapshotStore(root, spark)
    // find the snapshot version that committed wave 2 (wave 0 = seeds)
    val v2 = (0L to store.currentVersion.get)
      .find(v => store.manifest(v).summary("wave") == "2").get
    assert(store.currentVersion.get > v2, "crawl too short for a mid-crawl rollback")
    store.rollbackTo(v2)
    assert(store.currentManifest.get.summary("wave") === "2")
    // the undone waves' trace rows are gone from the CURRENT view
    import spark.implicits._
    assert(store.read("trace").as[TraceRow].collect().forall(_.wave <= 2))
    CrawlDriver.resume(spark, full, root)
    CrawlTestUtil.assertEqualResults(o, CrawlDriver.result(spark, root))
  }

  test("expireSnapshots keeps the current state readable, drops stale COW dirs") {
    val root = Files.createTempDirectory("gc").toString
    CrawlDriver.run(spark, cfg(), root)
    val store = new SnapshotStore(root, spark)
    val before = store.read("seen").count()
    val traceBefore = store.read("trace").count()
    val removed = store.expireSnapshots(keepLast = 1)
    // superseded pending COW rewrites + old manifests must go
    assert(removed.exists(_.startsWith("data/pending/")), s"no pending dirs GC'd: $removed")
    assert(removed.exists(_.startsWith("manifests/")))
    // current state fully intact (append-table dirs all still referenced)
    assert(store.read("seen").count() === before)
    assert(store.read("trace").count() === traceBefore)
    assert(store.read("pending").count() === 0)
  }

  test("compaction shrinks seen to one data dir; time-travel unaffected") {
    val root = Files.createTempDirectory("compact").toString
    CrawlDriver.run(spark, cfg(), root)
    val store = new SnapshotStore(root, spark)
    val vBefore = store.currentVersion.get
    val dirsBefore = store.currentManifest.get.tables("seen").dataDirs.size
    assert(dirsBefore > 2, "expected accumulated seen dirs")
    val rowsBefore = store.read("seen").collect().map(_.getString(0)).sorted.toSeq

    store.compact("seen")
    assert(store.currentManifest.get.tables("seen").dataDirs.size === 1)
    val rowsAfter = store.read("seen").collect().map(_.getString(0)).sorted.toSeq
    assert(rowsAfter === rowsBefore, "compaction changed data")
    // time travel to the pre-compaction version still reads the old layout
    assert(store.read("seen", Some(vBefore)).count() === rowsBefore.size.toLong)
    // resume-critical summary keys survived the compaction commit
    val s = store.currentManifest.get.summary
    assert(s.contains("wave") && s.contains("next_discovery_seq") && s.contains("fetched_total"))
  }
}
