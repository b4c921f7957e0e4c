package graft.crawl

import graft.functions.CanonicalUrl
import graft.operators._
import graft.sources.SnapshotStore
import graft.util.XxHash64

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The distributed crawl engine: a Spark-native URL frontier + fetch
  * scheduler (SURVEY.md §3 E1). Each wave is a typed Dataset transform
  * (no RDDs); state lives in snapshot tables (pending / seen / trace /
  * docs / metrics) committed atomically per wave with per-partition
  * lineage + metrics; the run is resumable from any committed wave.
  *
  * Must match [[RefCrawler]] bit-for-bit on trace, seen and docs under the
  * same config at ANY parallelism level (BASELINE.json north_rule). Every
  * order-bearing step therefore ends in an explicit deterministic sort key
  * — never partition order.
  *
  * Scale design (10^10-URL frontier):
  *  - per-host budget selection is a window top-K over host_hash — one
  *    shuffle of the PENDING set, partitioned by host, never the seen-set;
  *  - the seen-set is only touched by (a) a broadcast sharded-bloom probe
  *    (executor-local, no shuffle) and (b) an anti-join of the bloom-maybe
  *    残 rows only (AQE handles skew);
  *  - trace/discovery numbering uses a two-phase range-partitioned rank
  *    (no single-partition global window);
  *  - hot-host parse/fetch skew is broken by salted repartitioning before
  *    the fetch map (budget selection stays unsalted per-host);
  *  - pending is copy-on-write partition-bucketed by host_hash; seen, docs,
  *    trace and metrics are append-only logs in the snapshot store.
  */
object CrawlDriver {

  /** Engine knobs independent of crawl semantics (must not change output).
    * seenFilter: "bloom" (default), "cuckoo" (deletion-safe variant — same
    * no-false-negative pre-filter contract, supports expiry for recrawl),
    * or "none" (every candidate goes through the exact anti-join).
    */
  case class EngineConfig(
      bloomShards: Int = 16,
      bloomItemsPerShard: Long = 1L << 16,
      bloomFpp: Double = 0.01,
      /** salt fan applied to every host before the parse stage */
      saltFanout: Int = 64,
      seenFilter: String = "bloom",
      /** "cached": seen-set anti-joins run against in-memory slices (right
        * at sandbox scale). "store": every wave scans the snapshot store's
        * shard-clustered seen files with a shard IN-filter pushed to
        * parquet — the 10^10-scale path where seen cannot be cached and
        * the scan must prune to the shards the bloom-maybe rows touch. */
      seenStorage: String = "cached",
      verbose: Boolean = false)

  case class RunHandle(store: SnapshotStore, wavesRun: Int, fetchedTotal: Long)

  /** Deterministic global 0-based rank by `order` columns: two-phase
    * range-partition + per-partition offset (SURVEY.md §2.5 Q4) — avoids a
    * single-partition global window so numbering scales with cores.
    * `order` must be a total order (unique key).
    */
  def withGlobalSeq(df: DataFrame, order: Seq[String], out: String,
                    sizeHint: Long = Long.MaxValue): DataFrame = {
    val cols = order.map(col)
    // small inputs: a single-partition window is cheaper than three stages
    // and yields the identical (deterministic) numbering; the two-phase
    // path is for the multi-million-row waves of a real frontier
    if (sizeHint <= (1L << 20)) {
      return df.withColumn(out,
        row_number().over(Window.orderBy(cols: _*)).cast("long") - 1L)
    }
    val n = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    // localCheckpoint: the offsets job and the final join BOTH consume
    // `ranged` — checkpointing materializes the range partitioning once, so
    // the numbering cannot be skewed by a nondeterministic upstream or a
    // cache eviction re-running the sort differently, and the sort/shuffle
    // is paid once instead of twice.
    val ranged = df
      .repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    // per-partition counts are n tiny rows: the single-partition running-sum
    // window below is over those n rows, never the data
    val offsets = ranged
      .groupBy(col("__pid")).count()
      .withColumn("__off",
        sum(col("count")).over(Window.orderBy(col("__pid"))) - col("count"))
      .select(col("__pid"), col("__off"))
    ranged
      .join(broadcast(offsets), "__pid")
      .withColumn(out,
        row_number().over(Window.partitionBy(col("__pid")).orderBy(cols: _*))
          .cast("long") + col("__off") - 1L)
      .drop("__pid", "__off")
  }

  /** Run a crawl from scratch (or resume, see [[resume]]) writing snapshots
    * under `storeRoot`. Returns the store for inspection.
    */
  def run(spark: SparkSession, cfg: CrawlConfig, storeRoot: String,
          eng: EngineConfig = EngineConfig()): RunHandle = {
    import spark.implicits._
    val store = new SnapshotStore(storeRoot, spark)

    // ---- wave 0: seed admission (robots checked at admission, like the oracle)
    val robotsB = spark.sparkContext.broadcast(cfg.robots)
    def robotsAllowed(url: String, robots: Seq[RobotsRule]): Boolean = {
      val host = CanonicalUrl.host(url)
      val path = CanonicalUrl.path(url)
      val matching = robots.filter(r => r.host == host && path.startsWith(r.path_prefix))
      if (matching.isEmpty) true
      else matching.minBy(r => (-r.path_prefix.length, r.rule_order)).allow
    }

    // seed order defines discovery_time; canonicalize then first-occurrence
    // dedup preserving seed order (driver-side: the seed list is small by
    // definition — it is operator input, not crawl state)
    val seedsCanonical: Seq[(String, Long)] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      cfg.seeds.foreach(s => seen += CanonicalUrl.canonicalize(s))
      seen.toSeq.zipWithIndex.map { case (u, i) => (u, i.toLong) }
    }
    val seedRows = seedsCanonical.map { case (u, seq) =>
      val h = CanonicalUrl.host(u)
      (u, h, XxHash64.hashString(h), 0, seq, 0, robotsAllowed(u, cfg.robots))
    }
    val seedDf = seedRows
      .toDF("canonical_url", "host", "host_hash", "priority", "discovery_time", "depth", "allowed")

    val pending0 = seedDf.filter($"allowed").drop("allowed")
      .as[FrontierEntry]
    // seen rows carry their filter-shard and are clustered by it on disk,
    // so a shard IN-filter prunes parquet row groups (store-mode dedup)
    val seen0 = seedDf.select($"canonical_url", $"host_hash")
      .withColumn("shard", pmod($"host_hash", lit(eng.bloomShards.toLong)).cast("int"))

    store.beginCommit()
      .replace("pending", pending0.toDF())
      .append("seen", seen0.repartition(col("shard")).sortWithinPartitions("shard"))
      .declare("trace", org.apache.spark.sql.Encoders.product[TraceRow].schema)
      .declare("docs", org.apache.spark.sql.Encoders.product[Doc].schema)
      .declare("metrics", org.apache.spark.sql.Encoders.product[WaveMetrics].schema)
      .summary("wave" -> "0",
        "seeds" -> seedsCanonical.size.toString,
        "admitted" -> seedRows.size.toString,
        "next_discovery_seq" -> seedRows.size.toString,
        "fetched_total" -> "0")
      .commit()

    loop(spark, cfg, store, eng, robotsB)
  }

  /** Resume from the CURRENT snapshot of an existing store. */
  def resume(spark: SparkSession, cfg: CrawlConfig, storeRoot: String,
             eng: EngineConfig = EngineConfig()): RunHandle = {
    val store = new SnapshotStore(storeRoot, spark)
    require(store.currentVersion.nonEmpty, s"nothing to resume at $storeRoot")
    val robotsB = spark.sparkContext.broadcast(cfg.robots)
    loop(spark, cfg, store, eng, robotsB)
  }

  // ---------------------------------------------------------------------
  private def loop(spark: SparkSession, cfg: CrawlConfig, store: SnapshotStore,
                   eng: EngineConfig,
                   robotsB: org.apache.spark.broadcast.Broadcast[Seq[RobotsRule]]): RunHandle = {
    import spark.implicits._

    val fetcher = cfg.fetcher
    val defaultBudget = cfg.budgetPerHost
    val hostBudgetsB = spark.sparkContext.broadcast(cfg.hostBudgets)
    val budgetOf = udf((host: String) =>
      hostBudgetsB.value.getOrElse(host, defaultBudget))

    // Seen-filter plumbing, shared by bloom and cuckoo: the shard build is
    // an executor-side Aggregator grouped by host-hash shard — only S tiny
    // serialized shards ever reach the driver, never the URL strings.
    val nsh = eng.bloomShards
    def buildShardAgg(): org.apache.spark.sql.Column = eng.seenFilter match {
      case "bloom" =>
        val proto = BloomShard.sized(eng.bloomItemsPerShard, eng.bloomFpp)
        udaf(new BloomBuildAggregator(proto.bits.length, proto.numHashes))
          .apply($"canonical_url")
      case "cuckoo" =>
        val proto = CuckooFilter.sized(eng.bloomItemsPerShard)
        udaf(new CuckooBuildAggregator(proto.numBucketsPow2)).apply($"canonical_url")
      case other => throw new IllegalArgumentException(s"no shard agg for '$other'")
    }
    def emptyFilter(): ShardedSeenFilter = eng.seenFilter match {
      case "bloom"  => ShardedBloom.sized(nsh, eng.bloomItemsPerShard, eng.bloomFpp)
      case "cuckoo" => ShardedCuckoo.sized(nsh, eng.bloomItemsPerShard)
      case _        => AlwaysMaybe
    }
    def mergeShards(base: ShardedSeenFilter,
                    rows: Array[org.apache.spark.sql.Row]): ShardedSeenFilter = base match {
      case b: ShardedBloom =>
        val c = b.copyOf()
        rows.foreach(r => c.mergeShardBytes(r.getInt(0), r.getAs[Array[Byte]]("bits")))
        c
      case ck: ShardedCuckoo =>
        val c = ck.copyOf()
        rows.foreach(r => c.mergeShardBytes(r.getInt(0), r.getAs[Array[Byte]]("bits")))
        c
      case other => other
    }
    val useFilter = eng.seenFilter != "none"
    val filter0: ShardedSeenFilter =
      if (!useFilter) AlwaysMaybe
      else {
        val rows = store.read("seen")
          .withColumn("__shard", pmod($"host_hash", lit(nsh.toLong)).cast("int"))
          .groupBy($"__shard").agg(buildShardAgg().as("bits"))
          .collect()
        mergeShards(emptyFilter(), rows)
      }
    var bloomB = spark.sparkContext.broadcast(filter0)

    val m = store.currentManifest.get
    var wave = m.summary("wave").toInt + 1
    var nextSeq = m.summary("next_discovery_seq").toLong
    var fetchedTotal = m.summary("fetched_total").toLong
    var wavesRun = 0

    // Wave-to-wave state is chained through CACHED DataFrames (the snapshot
    // store is the durable/resume copy, written asynchronously off the
    // critical path): `pendingDF` is the live frontier plan; `seenSlices`
    // is the seen-set as a union of per-wave cached slices (the base slice
    // is the store's seen table — on a 10^10-URL frontier that base stays
    // on disk and only the bloom probe keeps the anti-join cheap; slices
    // would be re-rooted onto the store periodically on a long crawl).
    var pendingDF: DataFrame = store.read("pending")
    var seenSlices: Vector[DataFrame] =
      Vector(store.read("seen").select($"canonical_url", $"host_hash").cache())
    // commit of wave k-1 + its bloom delta, in flight while wave k computes
    var inFlight: scala.concurrent.Future[Option[ShardedSeenFilter]] =
      scala.concurrent.Future.successful(None)
    var prevWaveCaches: List[DataFrame] = Nil

    def awaitInFlight(): Unit = {
      scala.concurrent.Await
        .result(inFlight, scala.concurrent.duration.Duration.Inf)
        .foreach { merged =>
          val old = bloomB
          bloomB = spark.sparkContext.broadcast(merged)
          old.destroy()
        }
      inFlight = scala.concurrent.Future.successful(None)
      prevWaveCaches.foreach(_.unpersist())
      prevWaveCaches = Nil
    }

    var done = false
    var carriedPendingCount: Option[Long] = None
    while (!done) {
      val pending = pendingDF.as[FrontierEntry]
      // the new pending count is derivable from the previous wave's
      // arithmetic (deferred + admitted) — saves one job per wave
      val pendingCount = carriedPendingCount.getOrElse(pending.count())
      if (pendingCount == 0 || wave > cfg.maxWaves || fetchedTotal >= cfg.maxUrls) {
        awaitInFlight()
        done = true
      } else {
        val waveT0 = System.nanoTime()
        // ---- Q1/Q2: per-host budget selection (one shuffle of pending only)
        val hostWin = Window.partitionBy($"host_hash")
          .orderBy($"priority", $"discovery_time", $"canonical_url")
        val ranked = pending.toDF().withColumn("__rk", row_number().over(hostWin)).cache()
        val selectedRaw = ranked.filter($"__rk" <= budgetOf($"host")).drop("__rk")
        val deferred = ranked.filter($"__rk" > budgetOf($"host")).drop("__rk").as[FrontierEntry]

        // ---- Q4: wave trace numbering (two-phase rank, no global window)
        val selected = withGlobalSeq(selectedRaw,
          Seq("priority", "discovery_time", "canonical_url"), "__seq0",
          sizeHint = pendingCount)
          .withColumn("trace_seq", $"__seq0" + 1L).drop("__seq0")
          .cache()

        // ---- Q3: salted repartition before the fetch/parse map — parse is
        // the expensive, order-free stage and must never inherit the
        // (possibly single-partition) numbering layout. UNIFORM salting:
        // every host's URLs spread over `saltFanout` salts, so (a) host
        // count alone cannot under-partition the wave and (b) a hot domain
        // cannot pin a partition — skew handling without a per-wave
        // histogram job. (A real fetcher trading connection reuse for
        // balance would lower the fan; it never changes output — budget
        // selection above stayed strictly per-host.) 8x partitions keep
        // parse tasks fine-grained so the stage tail is one small task,
        // not a third scheduling round of the CPU-heavy parse.
        val nParts = 8 * math.max(1, spark.sessionState.conf.numShufflePartitions)
        val salted = selected
          .withColumn("__salt", pmod(xxhash64($"canonical_url"), lit(eng.saltFanout.toLong)))
          .repartition(nParts, $"host_hash", $"__salt")
          .drop("__salt")

        // ---- S3 + T1: fetch + parse (typed map over the synthetic web) and
        // per-partition fetch/parse lineage metrics
        val parsed = salted
          .select($"canonical_url", $"depth", $"trace_seq")
          .as[(String, Int, Long)]
          .mapPartitions { it =>
            it.map { case (url, depth, seq) =>
              val (spans, raw) = fetcher.fetchParse(url)
              val base = url
              // resolve + canonicalize outlinks in document order
              val links = raw.map(r => CanonicalUrl.resolve(base, r))
              (url, depth, seq, spans, links,
                org.apache.spark.TaskContext.getPartitionId())
            }
          }
          .toDF("canonical_url", "depth", "trace_seq", "spans", "links", "__pid")
          .cache()

        // coalesce: the parse stage runs at 8x-cores granularity for tail
        // smoothing, but the docs FILES should be one per core, not 8
        val wDocs = parsed.select($"canonical_url".as("doc_id"), $"spans")
          .coalesce(math.max(1, spark.sessionState.conf.numShufflePartitions))
          .as[Doc]
        val wTrace = selected
          .select(lit(wave).as("wave"), $"trace_seq".as("seq"), $"host", $"canonical_url")
          .as[TraceRow]

        // ---- outlink candidates with (trace_seq, link_idx) provenance
        // (coalesced off the fine-grained parse blocks: the dedup chain is
        // cheap per row — 8x-cores task granularity would be pure overhead)
        val candidates = parsed
          .coalesce(math.max(1, spark.sessionState.conf.numShufflePartitions))
          .select($"trace_seq", $"depth", posexplode_outer($"links").as(Seq("link_idx", "url")))
          .filter($"url".isNotNull)
          .withColumn("host", udf((u: String) => CanonicalUrl.host(u)).apply($"url"))
          .withColumn("host_hash", xxhash64($"host"))
          .select($"url".as("canonical_url"), $"host", $"host_hash",
            ($"depth" + 1).as("depth"), $"trace_seq", $"link_idx")

        val tFetch0 = System.nanoTime()
        // one job over the cached parse output: per-partition fetch lineage
        // counts AND the candidate-link total (map-side agg, tiny result)
        val fetchStats = parsed.groupBy($"__pid")
          .agg(count(lit(1)).as("n"), sum(size($"links")).as("cands"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        val fetchedThisWave = fetchStats.map(_._2).sum
        val candTotal = fetchStats.map(_._3).sum

        // the previous wave's commit + bloom delta must land before the
        // bloom probe below (a stale bloom could answer "definitely new"
        // for a URL admitted last wave — a false negative); the selection
        // and fetch stages above overlapped with that write.
        awaitInFlight()

        // ---- D1/D2: first-occurrence dedup across the wave (covers in-page):
        // keep the (trace_seq, link_idx)-minimal sighting per canonical_url
        val firstSeen = candidates
          .groupBy($"canonical_url")
          .agg(min(struct($"trace_seq", $"link_idx", $"host", $"host_hash", $"depth")).as("f"))
          .select($"canonical_url", $"f.host".as("host"), $"f.host_hash".as("host_hash"),
            $"f.depth".as("depth"), $"f.trace_seq".as("trace_seq"), $"f.link_idx".as("link_idx"))

        // ---- D3: broadcast bloom pre-filter (executor-local, no shuffle of seen)
        val bloomLocal = bloomB
        val mightBeSeen = udf((url: String, hh: Long) => bloomLocal.value.mightContain(url, hh))
        val tagged =
          if (useFilter)
            firstSeen.withColumn("__maybe", mightBeSeen($"canonical_url", $"host_hash")).cache()
          else firstSeen.withColumn("__maybe", lit(true)).cache()
        val definitelyNew = tagged.filter(!$"__maybe").drop("__maybe")
        val maybeSeen = tagged.filter($"__maybe").drop("__maybe")

        // ---- D4: exact anti-join of ONLY the bloom-maybe rows vs seen.
        // cached mode: in-memory slices. store mode (the 10^10-scale path):
        // scan the shard-clustered seen parquet, pruned by the shards the
        // maybe-rows actually touch (pushed to the parquet reader).
        val seenTbl =
          if (eng.seenStorage == "store") {
            val activeShards = maybeSeen
              .select(pmod($"host_hash", lit(nsh.toLong)).cast("int").as("s"))
              .distinct().as[Int].collect()
            val base = store.read("seen")
            val pruned =
              if (activeShards.length < nsh) base.filter($"shard".isin(activeShards.map(Integer.valueOf): _*))
              else base
            pruned.select($"canonical_url")
          } else seenSlices.map(_.select($"canonical_url")).reduce(_ unionByName _)
        val confirmedNew = maybeSeen.join(seenTbl, Seq("canonical_url"), "left_anti")
        val newUrls = definitelyNew.unionByName(confirmedNew)

        // ---- discovery numbering: global rank in (trace_seq, link_idx) order
        val numbered = withGlobalSeq(newUrls, Seq("trace_seq", "link_idx"), "__rank",
          sizeHint = candTotal)
          .withColumn("discovery_time", $"__rank" + lit(nextSeq))
          .withColumn("priority", $"depth")
          .drop("__rank", "trace_seq", "link_idx")

        // ---- robots at admission (like the oracle): denied occupy seen only
        val rb = robotsB
        val allowedUdf = udf((u: String) => {
          val host = CanonicalUrl.host(u)
          val path = CanonicalUrl.path(u)
          val matching = rb.value.filter(r => r.host == host && path.startsWith(r.path_prefix))
          if (matching.isEmpty) true
          else matching.minBy(r => (-r.path_prefix.length, r.rule_order)).allow
        })
        val tFetchMs = (System.nanoTime() - tFetch0) / 1e6
        val tDedup0 = System.nanoTime()
        val withRobots = numbered.withColumn("__allowed", allowedUdf($"canonical_url")).cache()
        val admitted = withRobots.filter($"__allowed")
          .select($"canonical_url", $"host", $"host_hash", $"priority", $"discovery_time", $"depth")
          .as[FrontierEntry]
        // one job: discovered + denied together
        val robotsCounts = withRobots.groupBy($"__allowed").count().collect()
          .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
        val discovered = robotsCounts.values.sum
        val denied = robotsCounts.getOrElse(false, 0L)

        val tDedupMs = (System.nanoTime() - tDedup0) / 1e6
        val tCommit0 = System.nanoTime()
        // localCheckpoint (lazy) truncates the logical plan — the wave-to-
        // wave chain would otherwise nest every prior wave's plan and blow
        // up the optimizer. Materialized by the commit write below; on a
        // real cluster the durable re-root is the snapshot store itself.
        val newSeen = withRobots.select($"canonical_url", $"host_hash")
          .withColumn("shard", pmod($"host_hash", lit(nsh.toLong)).cast("int"))
          .localCheckpoint(false)

        // ---- metrics with per-partition lineage from the fetch stage
        val deferredCount = pendingCount - fetchedThisWave
        val metricsRows = {
          val base = fetchStats.sortBy(_._1).map { case (pid, n, _) =>
            WaveMetrics(wave, pid, n, n, 0L, 0L, 0L, 0L)
          }.toSeq
          val tail = WaveMetrics(wave, -1, 0L, 0L, discovered,
            candTotal - discovered /* deduped within wave or vs seen */,
            denied, deferredCount)
          base :+ tail
        }

        // ---- commit the wave: pending COW, everything else appended. The
        // durable write (and the incremental bloom delta — executor-side
        // shard aggregation: bit arrays to the driver, never URL strings)
        // runs ASYNCHRONOUSLY, overlapped with the next wave's selection
        // and fetch stages; it is awaited before the next bloom probe.
        val newPending = deferred.toDF().unionByName(admitted.toDF())
          .localCheckpoint(false) // plan truncation, materialized at commit
        nextSeq += discovered
        fetchedTotal += fetchedThisWave
        val commitBuilder = store.beginCommit()
          .replace("pending", newPending)
          .append("seen", newSeen.repartition(col("shard")).sortWithinPartitions("shard"))
          .append("trace", wTrace.toDF())
          .append("docs", wDocs.toDF())
          .append("metrics", metricsRows.toDF())
          .summary(
            "wave" -> wave.toString,
            "next_discovery_seq" -> nextSeq.toString,
            "fetched_total" -> fetchedTotal.toString,
            "wave_fetched" -> fetchedThisWave.toString,
            "wave_discovered" -> discovered.toString,
            "wave_denied" -> denied.toString)
        val doDelta = useFilter && discovered > 0
        val filterNow = bloomB
        inFlight = {
          import scala.concurrent.ExecutionContext.Implicits.global
          scala.concurrent.Future {
            val deltaFut =
              if (doDelta) scala.concurrent.Future {
                val shardRows = newSeen
                  .withColumn("__shard", pmod($"host_hash", lit(nsh.toLong)).cast("int"))
                  .groupBy($"__shard").agg(buildShardAgg().as("bits"))
                  .collect()
                Some(mergeShards(filterNow.value, shardRows))
              } else scala.concurrent.Future.successful(Option.empty[ShardedSeenFilter])
            commitBuilder.commit()
            scala.concurrent.Await.result(deltaFut,
              scala.concurrent.duration.Duration.Inf)
          }
        }
        carriedPendingCount = Some(deferredCount + (discovered - denied))
        seenSlices :+= newSeen
        pendingDF = newPending
        prevWaveCaches = List(ranked.toDF(), selected, parsed, tagged, withRobots)
        if (eng.verbose) {
          val ms = (System.nanoTime() - waveT0) / 1e6
          val commitMs = (System.nanoTime() - tCommit0) / 1e6
          println(f"[engine] wave=$wave fetched=$fetchedThisWave discovered=$discovered " +
            f"denied=$denied deferred=$deferredCount ms=$ms%.0f " +
            f"(fetch=$tFetchMs%.0f dedup=$tDedupMs%.0f commit-launch=$commitMs%.0f)")
        }
        wave += 1
        wavesRun += 1
      }
    }
    // long-crawl hygiene: drop the in-memory seen slices (state re-roots
    // from the store on resume)
    seenSlices.foreach(_.unpersist())
    RunHandle(store, wavesRun, fetchedTotal)
  }

  /** Expire URLs — the deletion-safe-dedup flow the cuckoo variant exists
    * for: FORGET the URLs (remove from the seen-set, and from pending to
    * keep the pending ⊆ seen invariant). The next time any fetched page
    * links to them they are admitted and fetched again. Committed as one
    * atomic snapshot; a subsequent [[resume]] rebuilds the (bloom or
    * cuckoo) filter from the post-delete seen-set. At 10^10 scale the seen
    * rewrite becomes merge-on-read delete files (the manifest layout
    * already carries per-version dir lists), and an in-flight long crawl
    * deletes from the broadcast ShardedCuckoo directly — the operation a
    * bloom filter cannot support.
    */
  def expire(spark: SparkSession, storeRoot: String, urls: Seq[String]): Long = {
    import spark.implicits._
    val store = new SnapshotStore(storeRoot, spark)
    val m = store.currentManifest.getOrElse(
      throw new IllegalStateException(s"no snapshot at $storeRoot"))
    val targets = urls.map(CanonicalUrl.canonicalize).distinct
    val nBefore = store.read("seen").count()
    val newSeen = store.read("seen").filter(!$"canonical_url".isin(targets: _*))
    // maintain the pending ⊆ seen invariant: a forgotten URL must not keep
    // a pending entry, or its rediscovery would double-admit it
    val newPending = store.read("pending").filter(!$"canonical_url".isin(targets: _*))
    store.beginCommit()
      .replace("seen", newSeen.repartition(col("shard")).sortWithinPartitions("shard"))
      .replace("pending", newPending)
      .summary(m.summary.toSeq: _*)
      .summary("expired" -> targets.size.toString)
      .commit()
    nBefore - store.read("seen").count()
  }

  /** Load final results from a store for comparison with the oracle. */
  def result(spark: SparkSession, storeRoot: String): CrawlResult = {
    import spark.implicits._
    val store = new SnapshotStore(storeRoot, spark)
    val trace = store.read("trace").as[TraceRow]
      .collect().sortBy(t => (t.wave, t.seq)).toSeq
    val seen = store.read("seen").as[SeenRow].collect().map(_.canonical_url).toSet
    val docs = store.read("docs").as[Doc].collect().toSeq
    val traceOrder = trace.map(_.canonical_url).zipWithIndex.toMap
    CrawlResult(trace, seen, docs.sortBy(d => traceOrder.getOrElse(d.doc_id, Int.MaxValue)))
  }
}
