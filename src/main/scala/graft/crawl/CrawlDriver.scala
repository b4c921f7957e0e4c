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
      /** "broadcast": the merged sharded filter is one driver broadcast —
        * right at sandbox scale. "lazy": the filter NEVER exists as one
        * object; shard files are written distributed next to the snapshot
        * store and probe tasks lazily load only the shards their rows
        * touch (FilterShardStore) — the 10^10-scale path where the merged
        * filter (~12 GB, DESIGN.md) cannot be broadcast. */
      filterDistribution: String = "broadcast",
      /** lazy mode: compact base+deltas into a new base generation once
        * this many per-wave delta files accumulate. */
      compactFiltersEvery: Int = 8,
      /** "cached": seen-set anti-joins run against in-memory slices (right
        * at sandbox scale). "store": every wave scans the snapshot store's
        * shard-clustered seen files with a shard IN-filter pushed to
        * parquet — the 10^10-scale path where seen cannot be cached and
        * the scan must prune to the shards the bloom-maybe rows touch. */
      seenStorage: String = "cached",
      /** cached mode: collapse the per-wave seen-slice union back onto ONE
        * store read once it grows past this many slices — bounds anti-join
        * plan width and executor cache footprint on long crawls. */
      rerootSeenEvery: Int = 8,
      /** "cow": the pending frontier is rewritten whole per wave (fine at
        * sandbox scale; simplest layout). "mor": merge-on-read — per wave
        * only a (deleted=selected, added=admitted) delta appends, and the
        * base is rewritten only when the delta chain passes
        * compactPendingEvery. At P=10^9 pending rows a wave touches ~10^4
        * of them: COW is a full-table write per wave, MOR is delta-sized. */
      pendingStorage: String = "cow",
      /** "broadcast": robots rules/budgets live in driver-built host-keyed
        * broadcast maps — right up to ~10^6 hosts. "table": rules and
        * per-host budgets are SNAPSHOT TABLES (`robots_rules`,
        * `robots_hosts`) appended per wave with everything else; admission
        * is a host-keyed JOIN + longest-prefix aggregate and budgets join
        * into selection — no robots bytes ever reach the driver, the
        * 10^7+-host path (and rules gain lineage/time-travel/resume like
        * all crawl state). Output-invariant; EQ-asserted. */
      robotsStorage: String = "broadcast",
      /** table mode: below this many robots rows the host-dimension side of
        * the selection/admission joins gets an explicit broadcast() hint —
        * the in-flight delta is RDD-backed (no size stats), which would
        * otherwise push Spark to sort-merge-join the WAVE-sized side
        * against a tiny host table. Past the threshold (the 10^7-host
        * regime) the hint is withheld and the planner shuffles on host,
        * which is then the right shape. Strategy-only: never changes
        * output. */
      robotsBroadcastMaxRows: Long = 1L << 20,
      compactPendingEvery: Int = 8,
      /** cfg.contentDedup state distribution. "state": the (fingerprint ->
        * owner) registry chains wave-to-wave through eagerly-materialized
        * localCheckpoints — right at sandbox scale, but the registry is
        * DOCS-sized (one row per distinct content ever fetched), so at
        * 10^10 it cannot live in block-manager memory. "store": each wave
        * scans the snapshot store's shard-clustered `content_seen` table
        * with a shard IN-filter pruned to the bands this wave's
        * fingerprints touch (pushed to parquet) — the same shape as
        * `seenStorage="store"`; no registry bytes resident between waves.
        * Strategy-only: never changes output (EQ-asserted). */
      contentStorage: String = "state",
      /** cfg.revisitEveryWaves schedule distribution. "state": the
        * outstanding entries chain wave-to-wave through eagerly-
        * materialized localCheckpoints — resident size = the URLs fetched
        * in the last revisitEveryWaves waves (each URL has at most ONE
        * outstanding entry). "store": no resident entries — a due wave
        * scans the `revisit_due` table pruned by a due-wave IN-filter
        * (each append carries a single due_wave value, so parquet prunes
        * to exactly the scheduling wave's files); rows riding the
        * not-yet-awaited commit come from a one-wave in-flight delta arm
        * (needed when revisitEveryWaves == 1), so the resident footprint
        * is ONE wave's schedule regardless of the interval — the 10^10
        * path. Strategy-only: never changes output (EQ-asserted). */
      revisitStorage: String = "state",
      /** Seed lists at or below this size ingest on the driver (canonicalize
        * + first-occurrence dedup over a local collection — cheap, and the
        * wave-0 plans stay LocalRelations). Above it, run() switches to the
        * DISTRIBUTED seed path: a 10^7-URL recrawl seed list as a local
        * relation makes Catalyst evaluate every wave-0 projection on the
        * driver single-threaded (`ConvertToLocalRelation`) and SizeEstimator
        * walk 10^7 rows per cached block — measured as a multi-minute driver
        * stall at 10^7 seeds. Strategy-only: never changes output. */
      seedIngestLocalMax: Long = 1L << 20,
      /** Numbering stages ([[withGlobalSeq]]) at or below this many rows
        * use a single-partition window; above it, the two-phase
        * range-partition rank. Strategy-only (identical numbering, EQ-
        * asserted); a test seam at 0 forces the scale path per wave. */
      seqWindowMax: Long = 1L << 20,
      verbose: Boolean = false)

  case class RunHandle(store: SnapshotStore, wavesRun: Int, fetchedTotal: Long,
                       /** driver-side whole-filter broadcasts created — 0 in
                         * lazy filter distribution (asserted in tests). */
                       filterBroadcasts: Int = 0,
                       /** widest the cached seen-slice union ever got —
                         * bounded by rerootSeenEvery+1 (asserted in tests). */
                       maxSeenSlices: Int = 0,
                       /** table-robots mode: how often the host-dimension
                         * side of a selection/admission join got the
                         * explicit broadcast() hint vs had it withheld
                         * (the >robotsBroadcastMaxRows shuffled-join
                         * regime) — lets tests pin the strategy branch
                         * actually taken. */
                       robotsHintsApplied: Int = 0,
                       robotsHintsWithheld: Int = 0,
                       /** host-cap counts join: same applied/withheld
                         * accounting for the per-host counts dimension
                         * (withheld past robotsBroadcastMaxRows hosts). */
                       capHintsApplied: Int = 0,
                       capHintsWithheld: Int = 0,
                       /** content-seen state join: same applied/withheld
                         * accounting for the fingerprint dimension. */
                       contentHintsApplied: Int = 0,
                       contentHintsWithheld: Int = 0,
                       /** host-backoff state joins: same applied/withheld
                         * accounting for the health dimension. */
                       healthHintsApplied: Int = 0,
                       healthHintsWithheld: Int = 0,
                       /** sitemap probed-host state join: same applied/
                         * withheld accounting for the probed dimension. */
                       sitemapHintsApplied: Int = 0,
                       sitemapHintsWithheld: Int = 0)

  /** run()-path a-priori initial state: hints + the deferred wave-0 commit
    * (committed asynchronously on the inFlight rail, awaited before the
    * first probe / wave-1 commit exactly like any other wave's commit).
    */
  private case class FastStart(
      pending: DataFrame,
      seen0: DataFrame,
      filter: Option[ShardedSeenFilter],
      nextSeq: Long,
      pendingCount: Long,
      wave0Commit: SnapshotStore#Commit,
      /** table-robots mode: the wave-0 robots (rules, hosts) rows — the
        * store copy rides the async wave-0 commit, so wave 1 joins against
        * this in-memory delta.
        */
      robotsDelta: Option[(DataFrame, DataFrame)] = None,
      /** Driver-tracked robots-table row count backing the broadcast hint.
        * The small seed path derives it from the (driver-resident) seed
        * acquisition maps; the DISTRIBUTED seed path counts the acquired
        * rows on the executors and passes the total here — the maps stay
        * empty there by design. */
      robotsRows0: Option[Long] = None,
      /** cfg.fetchSitemaps: the seed hosts probed at wave 0 (their
        * `sitemap_hosts` rows ride the async wave-0 commit, so wave 1's
        * first-encounter anti-join reads this in-memory copy) plus the
        * probed-host count backing the broadcast hint. */
      smHosts0: Option[DataFrame] = None,
      smRows0: Long = 0L)

  /** Driver-tracked broadcast-hint-or-withhold for an RDD-backed dimension
    * (checkpointed/cached dims have no size stats, so Spark would SMJ the
    * wave-sized side against them): ONE implementation so the row-bound
    * policy and its branch counters cannot drift between the robots,
    * host-cap-counts and content-registry dimensions. `rows` is read at
    * call time — the driver updates the tracked bound as the dimension
    * grows.
    */
  private final class DimensionHint(bound: Long, rows: () => Long)
      extends (DataFrame => DataFrame) {
    var applied = 0
    var withheld = 0
    def apply(df: DataFrame): DataFrame =
      if (rows() <= bound) { applied += 1; broadcast(df) } else { withheld += 1; df }
  }

  /** Band-prune a shard-clustered table scan to the shards a wave actually
    * touches (`shard` IN-filter, pushed to the parquet reader); whole scan
    * when every band is active. Shared by the seen and content_seen
    * store-mode reads so the pruning discipline cannot drift.
    */
  private def pruneShards(base: DataFrame, active: Array[Int], nsh: Int): DataFrame =
    if (active.length < nsh)
      base.filter(col("shard").isin(active.map(Integer.valueOf): _*))
    else base

  /** Result of a wave's async filter maintenance. */
  private sealed trait FilterUpdate
  private case class NewBroadcast(f: ShardedSeenFilter) extends FilterUpdate
  private case class NewGen(gen: graft.sources.FilterGen) extends FilterUpdate

  /** One host's acquired robots state (fetchRobotsTxt mode). */
  private case class HostRobots(host: String, served: Boolean,
      rules: Seq[RobotsRule], delay: Option[Double])

  /** Counts driver-side host-dimension collects on the RESUME path —
    * broadcast mode legitimately pays them (its robots state is driver-
    * resident by design, ≤10^6 hosts); the table-mode resume paths must
    * never (the 10^7-host regime). Test seam, monotonic.
    */
  private[crawl] val resumeHostCollects = new java.util.concurrent.atomic.AtomicLong(0)

  /** Distributed robots acquisition over a HOST DataFrame (table mode:
    * in-wave new-host resolution AND every resume path): robots fetched +
    * RFC-9309-parsed on executors exactly like page fetch, config rules as
    * the fallback for hosts serving none, Crawl-delay mapped to a budget —
    * emitted as wave-stamped `robots_rules` / `robots_hosts` delta rows.
    * Neither the host dimension nor the parsed rules ever reach the driver
    * (at the 10^7-host design point the pending-host set is multi-GB).
    *
    * Returns (rules, hosts, res): the two delta tables plus the
    * localCheckpointed fetch result backing them. The checkpoint is
    * LOAD-BEARING, not just a materialization: these rows flow into
    * `robotsDelta`, which the next wave's selection plan embeds — without
    * truncation each wave's plan would nest the previous wave's whole plan
    * and the tree grows without bound (OOM at ~15 waves, measured). The
    * caller must hand `res` to the loop's checkpoint-release queue for the
    * standard two-generation release (its blocks are NOT recomputable).
    */
  private def acquireRobotsDf(spark: SparkSession, fetcher: PageFetcher,
      userAgent: String,
      configRulesB: org.apache.spark.broadcast.Broadcast[Map[String, Seq[RobotsRule]]],
      wavePeriodSeconds: Double, hostsDf: DataFrame, wave: Int)
  : (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val crb = configRulesB
    val ua = userAgent
    val wp = wavePeriodSeconds
    val res = hostsDf.select($"host").as[String]
      .mapPartitions(_.map { h =>
        fetcher.fetchRobots(h, wave) match {
          case Some(txt) =>
            val p = graft.functions.RobotsTxt.parse(h, txt, ua)
            (h, p.rules.map(r => (r.path_prefix, r.allow, r.rule_order)),
              p.crawlDelaySeconds.map(d =>
                graft.functions.RobotsTxt.budgetForDelay(d, wp)))
          case None =>
            (h, crb.value.getOrElse(h, Nil)
              .map(r => (r.path_prefix, r.allow, r.rule_order)),
              None: Option[Int])
        }
      })
      .toDF("host", "rules", "budget")
      .localCheckpoint(false) // one fetch per host; reused by both tables
    val ruleRows = res.select($"host", explode($"rules").as("r"))
      .select($"host", $"r._1".as("path_prefix"),
        $"r._2".as("allow"), $"r._3".as("rule_order"))
      .withColumn("wave", lit(wave))
    val hostRows = res.select($"host", $"budget").withColumn("wave", lit(wave))
    (ruleRows, hostRows, res)
  }

  /** Distributed sitemap probe over a (host, __smok) DataFrame
    * (cfg.fetchSitemaps): discovery runs ON EXECUTORS exactly like
    * robots acquisition — robots-declared `Sitemap:` directives first,
    * falling back to `http://<host>/sitemap.xml`; `__smok` = the host's
    * robots rules allow the "/sitemap.xml" path and gates ONLY that
    * fallback (a denied, nothing-declared host is recorded probed with
    * zero entries — ONE probe decision per host, ever, whatever it
    * yields). Cross-host entries are dropped inside the
    * shared parser, and an INDEX body expands to its children's entries
    * via per-child `fetchSitemapAt` calls INSIDE the same task
    * ([[graft.functions.Sitemap.expand]]). The (host,
    * locs) result is localCheckpointed: one fetch per host feeds the
    * candidate chain, the probed-state update AND the async commit append
    * — the caller must hand it to the checkpoint-release queue.
    */
  private def probeSitemapsDf(spark: SparkSession, fetcher: PageFetcher,
      gated: DataFrame, wave: Int, useDirectives: Boolean): DataFrame = {
    import spark.implicits._
    val f = fetcher
    val w = wave
    val dir = useDirectives
    gated.select($"host", $"__smok").as[(String, Boolean)]
      .mapPartitions(_.map { case (h, ok) =>
        (h, discoverEntries(f, h, ok, w, dir))
      })
      .toDF("host", "locs")
      .localCheckpoint(false)
  }

  /** One host's full sitemap entry list under the discovery rules
    * (oracle model point 13): robots-DECLARED `Sitemap:` directives
    * first — read from the robots body served at probe time (for a real
    * fetcher a cache read; for the synthetic web the wave-granular pure
    * body, so both engine and oracle see the same bytes), consulted only
    * when the crawl fetches robots at all — and the robots-gated
    * well-known-path probe as the fallback when nothing is declared. A
    * declared sitemap is the host's explicit submission, so it is
    * fetched without a per-path robots gate (`smok` gates only the
    * fallback probe).
    */
  private def discoverEntries(f: PageFetcher, h: String, smok: Boolean,
      wave: Int, useDirectives: Boolean): Vector[String] = {
    val declared: Seq[String] =
      if (!useDirectives) Nil
      else f.fetchRobots(h, wave)
        .map(b => graft.functions.RobotsTxt.sitemapUrls(h, b))
        .getOrElse(Vector.empty[String])
    graft.functions.Sitemap.discover(h, declared, smok,
      () => f.fetchSitemap(h), f.fetchSitemapAt).toVector
  }

  /** A sitemap probe's entries as admission-chain candidate rows. The
    * provenance keys (src_pri=Int.MaxValue, src_dt=0, src_url=host,
    * link_idx=entry index) sort every sitemap candidate AFTER every
    * page-derived candidate of the wave (page src_pri is a BFS depth,
    * always far below MaxValue) and order sitemap candidates by
    * (host ASC, entry index ASC) — exactly the oracle's admission order
    * (model point 13); entries enter at depth 1. `__smok` marks in-scope
    * rows (scope-filtered entries are counted, never admitted).
    */
  private def sitemapCandidateRows(res: DataFrame, scope: UrlScope): DataFrame = {
    val scopeOk = udf((u: String) => scope.allows(u))
    res.select(col("host"), posexplode(col("locs")).as(Seq("link_idx", "url")))
      .select(col("url").as("canonical_url"), col("host"),
        xxhash64(col("host")).as("host_hash"), lit(1).as("depth"),
        lit(Int.MaxValue).as("src_pri"), lit(0L).as("src_dt"),
        col("host").as("src_url"), col("link_idx"),
        scopeOk(col("url")).as("__smok"))
  }

  /** First-occurrence dedup across a wave's candidate rows (D1/D2): keep
    * the (src_pri, src_dt, src_url, link_idx)-minimal sighting per
    * canonical_url — admission order, same as the oracle.
    */
  private def firstSightings(candidates: DataFrame): DataFrame =
    candidates
      .groupBy(col("canonical_url"))
      .agg(min(struct(col("src_pri"), col("src_dt"), col("src_url"),
        col("link_idx"), col("host"), col("host_hash"), col("depth"))).as("f"))
      .select(col("canonical_url"), col("f.host").as("host"),
        col("f.host_hash").as("host_hash"), col("f.depth").as("depth"),
        col("f.src_pri").as("src_pri"), col("f.src_dt").as("src_dt"),
        col("f.src_url").as("src_url"), col("f.link_idx").as("link_idx"))

  /** Robots-at-admission for TABLE mode, shared by the wave loop and the
    * distributed seed-ingest path so admission semantics cannot drift:
    * LATEST-WAVE-WINS rule resolution (a host's most recent fetch event —
    * from the hosts table, incl. this wave's acquisitions — fully
    * supersedes its earlier rule rows; hosts with no fetch events =
    * fixture-mode config rules stay always-active), then a host-keyed JOIN
    * + longest-prefix-wins aggregate per URL (max over (prefix_len,
    * -rule_order); no matching rule -> allow) — identical semantics to
    * [[RobotsEval.allowed]], zero driver-resident rules. Dimension ×
    * dimension join: both sides are host-sized, shuffled (or broadcast,
    * same hint policy) by host exactly like the main admission join.
    * `numbered` must carry exactly (canonical_url, host, host_hash,
    * priority, discovery_time, depth); returns it plus `__allowed`.
    */
  private def robotsAdmissionJoin(spark: SparkSession, numbered: DataFrame,
      rulesAllWaves: DataFrame, hostsAllWaves: DataFrame,
      hint: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    val pathU = udf((u: String) => CanonicalUrl.path(u))
    val latestFetch = hostsAllWaves.groupBy($"host").agg(max($"wave").as("__lw"))
    val rulesAll = rulesAllWaves
      .join(hint(latestFetch), Seq("host"), "left")
      .filter($"__lw".isNull || $"wave" === $"__lw")
      .drop("__lw", "wave")
    numbered.join(hint(rulesAll), Seq("host"), "left")
      .withColumn("__m", $"path_prefix".isNotNull &&
        pathU($"canonical_url").startsWith($"path_prefix"))
      .groupBy($"canonical_url", $"host", $"host_hash",
        $"priority", $"discovery_time", $"depth")
      .agg(max(when($"__m", struct(
        length($"path_prefix").as("l"),
        (-$"rule_order").as("o"),
        $"allow".as("allow")))).as("__b"))
      .withColumn("__allowed", coalesce($"__b.allow", lit(true)))
      .drop("__b")
  }

  /** Fetch+parse `<host>/robots.txt` for each host ON EXECUTORS (robots
    * fetch is network-bound at scale, exactly like page fetch); only the
    * tiny (host, rules, delay) rows reach the driver — the BROADCAST-mode
    * acquisition shape (driver-resident robots state is that mode's whole
    * point, ≤10^6 hosts; table mode routes through [[acquireRobotsDf]]
    * instead and never collects).
    */
  private def fetchRobotsDistributed(spark: SparkSession, fetcher: PageFetcher,
      userAgent: String, hosts: Seq[String], wave: Int = 0): Seq[HostRobots] = {
    import spark.implicits._
    if (hosts.isEmpty) Nil
    else spark.createDataset(hosts.toIndexedSeq)
      .repartition(math.min(hosts.length,
        math.max(1, spark.sessionState.conf.numShufflePartitions)))
      .mapPartitions(_.map { h =>
        fetcher.fetchRobots(h, wave) match {
          case Some(txt) =>
            val p = graft.functions.RobotsTxt.parse(h, txt, userAgent)
            (h, true, p.rules, p.crawlDelaySeconds)
          case None => (h, false, Seq.empty[RobotsRule], None: Option[Double])
        }
      })
      .collect()
      .map(t => HostRobots(t._1, t._2, t._3, t._4)).toSeq
  }

  /** Run sitemap discovery (declared directives, then the robots-gated
    * `/sitemap.xml` fallback) for each (host, fallback-allowed) pair ON
    * EXECUTORS, entries collected back per host — the SMALL-SEED-PATH
    * companion of [[probeSitemapsDf]] (that path's admission is a driver
    * loop over the ≤ seedIngestLocalMax seed list by design, so the
    * entry lists come back to it; the wave loop and the distributed seed
    * ingest route through [[probeSitemapsDf]] and never collect them).
    */
  private def fetchSitemapsDistributed(spark: SparkSession, fetcher: PageFetcher,
      hosts: Seq[(String, Boolean)], useDirectives: Boolean): Map[String, Seq[String]] = {
    import spark.implicits._
    if (hosts.isEmpty) Map.empty
    else spark.createDataset(hosts.toIndexedSeq)
      .repartition(math.min(hosts.length,
        math.max(1, spark.sessionState.conf.numShufflePartitions)))
      .mapPartitions(_.map { case (h, ok) =>
        (h, discoverEntries(fetcher, h, ok, wave = 0, useDirectives))
      })
      .collect().toMap
  }

  /** Merge distributed robots-acquisition results into the host-keyed
    * state triple — ONE definition shared by seed acquisition, the resume
    * pre-pass and in-wave acquisition, so the served/fallback and
    * Crawl-delay→budget semantics cannot drift between them.
    */
  private def mergeHostRobots(resolved: Seq[HostRobots],
      configRules: Map[String, Seq[RobotsRule]], wavePeriodSeconds: Double,
      rules0: Map[String, Seq[RobotsRule]], budgets0: Map[String, Int],
      known0: Set[String])
  : (Map[String, Seq[RobotsRule]], Map[String, Int], Set[String]) = {
    var rules = rules0
    var budgets = budgets0
    var known = known0
    resolved.foreach { hr =>
      val eff = if (hr.served) hr.rules else configRules.getOrElse(hr.host, Nil)
      // fresh state fully SUPERSEDES on a re-fetch (robots TTL / recency):
      // a body that dropped its Crawl-delay drops the budget too — for a
      // first-time host the removal is a no-op
      budgets = hr.delay match {
        case Some(d) => budgets.updated(hr.host,
          graft.functions.RobotsTxt.budgetForDelay(d, wavePeriodSeconds))
        case None => budgets - hr.host
      }
      known += hr.host
      rules =
        if (eff.nonEmpty) rules.updated(hr.host, eff) else rules - hr.host
    }
    (rules, budgets, known)
  }

  // ---- merge-on-read pending layout ---------------------------------------
  private val PendingBase = "pending_base"
  private val PendingDelta = "pending_delta"

  // ---- robots-as-table layout (robotsStorage = "table") --------------------
  // Both tables are append-only and WAVE-STAMPED: `robots_hosts` records one
  // row per (host, fetch event) and `robots_rules` that event's parsed
  // rules. Resolution is LATEST-WAVE-WINS per host (a re-fetch fully
  // supersedes the host's earlier rules and budget — real robots.txt
  // bodies change over time), so recency is a pure read-side aggregate and
  // rules keep lineage/time-travel like all crawl state. Hosts absent from
  // `robots_hosts` (fixture-mode config rules) have no fetch events and
  // their rules are always active.
  private val RobotsRules = "robots_rules"
  private val RobotsHosts = "robots_hosts"

  // ---- content-seen dedup layout (cfg.contentDedup) -----------------------
  // `content_seen` is the append-only fingerprint registry: one row per
  // DISTINCT content fingerprint ever fetched, carrying its owning URL (the
  // first fetch) and the wave it appeared — at most one row per hash ever
  // exists, so reads need no recency resolution. `duplicates` is the
  // content-ALIAS edge list (one row per duplicate fetch). At the 10^10
  // design point content_seen is docs-sized; the in-run state joins the
  // wave's successes (wave-sized) against it under the same broadcast-hint-
  // or-shuffle policy as every other dimension, and the store layout can
  // cluster by a hash band for pruned scans exactly like the seen table.
  private val ContentSeen = "content_seen"
  private val Duplicates = "duplicates"

  // ---- host-backoff layout (cfg.hostBackoff) ------------------------------
  // `host_health` is append-only and WAVE-STAMPED like the robots tables:
  // one row per (host, wave) whose backoff state CHANGED that wave —
  // (consecutive transient failures, quarantined-through wave). Resolution
  // is LATEST-WAVE-WINS per host; hosts with no row (the overwhelmingly
  // common case — healthy hosts never append) are healthy by default, so
  // the table stays proportional to the crawl's FAILING hosts, not its
  // host dimension. Keyed by host_hash like the admission-cap counts (the
  // same documented ~3e-6 collision bias at 10^7 hosts).
  private val HostHealth = "host_health"

  // ---- sitemap-ingestion layout (cfg.fetchSitemaps) -----------------------
  // `sitemap_hosts` is append-only and wave-stamped: one row per host EVER
  // probed for `/sitemap.xml` (sitemap served or not, robots-allowed or
  // not), appended at the probing wave — membership alone carries the
  // "one probe per host, ever" rule, so reads need no recency resolution
  // and the table stays host-dimension-sized. Resume reads it back; runs
  // with the flag off append nothing.
  private val SitemapHosts = "sitemap_hosts"

  // ---- revisit-schedule layout (cfg.revisitEveryWaves) ---------------------
  // `revisit_due` is append-only: one row per scheduled re-fetch, stamped
  // with the wave it becomes due (computed at schedule time, so a config
  // interval change at resume applies only to fetches from then on). A row
  // is CONSUMED when its due wave executes — the entry re-enters the
  // frontier and the committed pending table carries it from there — so
  // resume's outstanding schedule is simply the rows with due_wave >= the
  // resumed wave; no deletes, no recency resolution. Runs with the feature
  // off append nothing, and a resume with it off ignores the table (the
  // oracle models that as dropping the schedule).
  private val RevisitDue = "revisit_due"
  // rows are clustered by `shard` = pmod(content_hash, bloomShards) on
  // write, so the store-mode per-wave check scans only the bands the
  // wave's fingerprints touch (filter pushed to parquet row groups) —
  // the same layout discipline as the URL-seen table
  private def contentSeenSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "content_hash BIGINT, canonical_url STRING, wave INT, shard INT")
  private def contentStateSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "__chash BIGINT, __owner STRING")
  private def hostHealthSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "host_hash BIGINT, consec INT, quarantined_until INT, wave INT")
  private def healthStateSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "host_hash BIGINT, __consec BIGINT, __until INT")
  private def robotsRulesSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "host STRING, path_prefix STRING, allow BOOLEAN, rule_order INT, wave INT")
  private def sitemapHostsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "host STRING, wave INT")
  private def sitemapStateSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "host STRING")
  // revisit_interval / revisit_hash are the adaptive-revisit state the
  // entry re-enters the frontier with (0/0 when cfg.revisitAdaptive is off
  // — the legacy fixed-interval rows are byte-identical plus two zero
  // columns)
  private def revisitDueSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "due_wave INT, canonical_url STRING, host STRING, host_hash BIGINT, " +
      "priority INT, discovery_time BIGINT, depth INT, generation INT, " +
      "revisit_interval INT, revisit_hash BIGINT")
  private def robotsHostsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "host STRING, budget INT, wave INT")

  private def emptyDf(spark: SparkSession,
                      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Robots table at the LAST LANDED snapshot (empty before the table is
    * first committed — e.g. wave 1 of a fast-started run, whose wave-0
    * commit is still in flight).
    */
  private def readRobots(spark: SparkSession, store: SnapshotStore,
                         table: String): DataFrame = {
    val schema = if (table == RobotsRules) robotsRulesSchema else robotsHostsSchema
    if (store.currentManifest.exists(_.tables.contains(table))) store.read(table)
    else emptyDf(spark, schema)
  }

  /** Driver-side rows -> the two robots-table deltas (seed/resume
    * bootstrap; per-wave deltas are built distributed in the loop).
    */
  private def robotsDfs(spark: SparkSession,
                        rules: Seq[RobotsRule],
                        hosts: Seq[(String, Option[Int])],
                        wave: Int)
  : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.Row
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rules.map(x => Row(x.host, x.path_prefix, x.allow, x.rule_order, wave)),
        math.max(1, math.min(4, rules.size))),
      robotsRulesSchema)
    val h = spark.createDataFrame(
      spark.sparkContext.parallelize(
        hosts.map(x => Row(x._1, x._2.map(Integer.valueOf).orNull, wave)),
        math.max(1, math.min(4, hosts.size))),
      robotsHostsSchema)
    (r, h)
  }

  private def frontierSchema =
    org.apache.spark.sql.Encoders.product[FrontierEntry].schema

  /** docs-table layout: [[Doc]] plus the fetch wave — the VERSION stamp.
    * Without revisits a doc_id appears once; with
    * [[CrawlConfig.revisitEveryWaves]] each changed re-fetch appends a new
    * wave-stamped version (the lakehouse shape: versions are rows, readers
    * pick latest-wave-wins or time-travel the table itself).
    */
  private def docsTableSchema =
    org.apache.spark.sql.Encoders.product[Doc].schema
      .add("wave", org.apache.spark.sql.types.IntegerType)

  private def pendingDeltaSchema: org.apache.spark.sql.types.StructType =
    frontierSchema
      .add("op", org.apache.spark.sql.types.StringType)
      .add("w", org.apache.spark.sql.types.IntegerType)

  private def emptyDelta(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pendingDeltaSchema)

  /** Current pending frontier regardless of layout: plain read in COW mode;
    * in MOR mode merge base + deltas. The op sequence per (canonical_url,
    * attempts, generation) KEY is total-ordered: at most ONE `add`
    * (admission is seen-gated; a transient-failure requeue re-adds under
    * attempts+1; a due revisit re-adds under generation+1 with attempts
    * reset; expiry compacts the chain before a URL can re-enter) and at
    * most one LATER `del` (selection). Survivors are therefore exactly
    * `(base ∪ delta-adds) ANTI JOIN delta-dels` on that composite key — an
    * anti-join whose build side is delta-sized (and whose runs are SORTED
    * by canonical_url on write), instead of a groupBy(max-struct) shuffle
    * of the ENTIRE base+delta set that the first MOR cut paid on every
    * resume.
    */
  def readPending(spark: SparkSession, store: SnapshotStore): DataFrame = {
    import spark.implicits._
    val m = store.currentManifest.getOrElse(
      throw new IllegalStateException(s"no snapshot at ${store.root}"))
    if (!m.tables.contains(PendingBase)) store.read("pending")
    else {
      val fcols = frontierSchema.fieldNames.map(col).toSeq
      val deltas = store.read(PendingDelta)
      val adds = deltas.filter($"op" === "add").select(fcols: _*)
      val dels = deltas.filter($"op" === "del")
        .select($"canonical_url", $"attempts", $"generation")
      store.read(PendingBase).select(fcols: _*)
        .unionByName(adds)
        .join(dels, Seq("canonical_url", "attempts", "generation"), "left_anti")
    }
  }

  /** Deterministic global 0-based rank by `order` columns: two-phase
    * range-partition + per-partition offset (SURVEY.md §2.5 Q4) — avoids a
    * single-partition global window so numbering scales with cores.
    * `order` must be a total order (unique key).
    *
    * The two-phase path pins an internal localCheckpoint (`ranged`) whose
    * blocks back the returned plan; `onCheckpoint` hands it to the caller
    * for release on the caller's checkpoint schedule (Dataset.unpersist is
    * a no-op for checkpoint RDDs — without explicit release each
    * above-2^20 numbering leaks an input-sized checkpoint for the life of
    * the session).
    */
  def withGlobalSeq(df: DataFrame, order: Seq[String], out: String,
                    sizeHint: Long = Long.MaxValue,
                    onCheckpoint: DataFrame => Unit = _ => (),
                    windowMax: Long = 1L << 20): DataFrame = {
    val cols = order.map(col)
    // small inputs: a single-partition window is cheaper than three stages
    // and yields the identical (deterministic) numbering; the two-phase
    // path is for the multi-million-row waves of a real frontier
    if (sizeHint <= windowMax) {
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
    onCheckpoint(ranged)
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
          eng: EngineConfig = EngineConfig(),
          /** diagnostics hook, called once per completed wave (after the
            * wave's bookkeeping, commit launched) with the wave number —
            * e.g. the endurance probe's memory sampler. Never affects
            * output.
            */
          onWaveEnd: Int => Unit = _ => ()): RunHandle = {
    import spark.implicits._
    val store = new SnapshotStore(storeRoot, spark)

    if (cfg.seeds.size > eng.seedIngestLocalMax) {
      // A 10^7-URL recrawl seed list as a LOCAL relation makes Catalyst
      // evaluate every wave-0 projection on the driver single-threaded
      // (ConvertToLocalRelation) and SizeEstimator walk the rows per cached
      // block — measured as a multi-minute driver stall. Route through the
      // distributed ingest instead; output identical (EQ-asserted).
      val parts = math.max(spark.sessionState.conf.numShufflePartitions,
        (cfg.seeds.size / 200000) + 1)
      val rows = spark.sparkContext.parallelize(cfg.seeds, parts)
        .zipWithIndex() // = position in the operator-given seed order
        .map { case (u, i) => org.apache.spark.sql.Row(u, i) }
      return runSeedsDistributed(spark, cfg, store,
        eng, spark.createDataFrame(rows, seedInputSchema), onWaveEnd)
    }

    // ---- robots state: HOST-KEYED rule map — the per-URL probe is one map
    // lookup plus a longest-prefix scan of that host's handful of rules,
    // never a scan of the whole rule dimension (at 10^7 hosts a flat-list
    // filter would be ~10^8 comparisons per candidate row).
    val configRules = RobotsEval.byHost(cfg.robots)
    var rulesByHost = configRules
    var knownHosts: Set[String] = Set.empty
    // fetched Crawl-delay -> per-host politeness budget (explicit
    // cfg.hostBudgets overrides win at probe time; see the budget udf)
    var budgetsByHost: Map[String, Int] = Map.empty
    // fetchRobotsTxt mode, seed hosts: fetched+parsed ON EXECUTORS like
    // every other robots acquisition (robots fetch is network-bound at
    // scale — a 10^6-host recrawl seed list must not serialize through a
    // driver fetch loop); only the tiny (host, rules, delay) rows come
    // back and merge into the host-keyed state. Pure per host, so the
    // merge is order-independent and deterministic.
    def resolveSeedHosts(hosts: Seq[String]): Unit = {
      val newHosts = hosts.distinct.filterNot(knownHosts.contains)
      val resolved = fetchRobotsDistributed(spark, cfg.fetcher, cfg.userAgent, newHosts)
      val (r, b, k) = mergeHostRobots(resolved, configRules,
        cfg.wavePeriodSeconds, rulesByHost, budgetsByHost, knownHosts)
      rulesByHost = r; budgetsByHost = b; knownHosts = k
    }

    // ---- wave 0: seed admission (robots checked at admission, like the oracle)
    // seed order defines discovery_time; canonicalize then first-occurrence
    // dedup preserving seed order (driver-side: the seed list is small by
    // definition — it is operator input, not crawl state)
    val seedsCanonical: Seq[(String, Long)] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      cfg.seeds.foreach(s => seen += CanonicalUrl.canonicalize(s))
      seen.toSeq.zipWithIndex.map { case (u, i) => (u, i.toLong) }
    }
    if (cfg.fetchRobotsTxt)
      resolveSeedHosts(seedsCanonical.map { case (u, _) => CanonicalUrl.host(u) })
    val seedRows = seedsCanonical.map { case (u, seq) =>
      val h = CanonicalUrl.host(u)
      val ok = RobotsEval.allowed(rulesByHost.getOrElse(h, Nil), CanonicalUrl.path(u))
      (u, h, XxHash64.hashString(h), 0, seq, 0, 0, 0, ok)
    }

    // ---- wave-0 SITEMAP ingestion (cfg.fetchSitemaps, oracle model
    // point 13): the seed list is wave 0's candidate set, so every seed
    // host is probed once — robots-gated on "/sitemap.xml", fetched ON
    // EXECUTORS like seed robots acquisition — and the same-host entries
    // admit AFTER every seed, ordered (host ASC, entry index ASC) at
    // depth 1 through scope → seen-dedup → host cap → robots, exactly
    // the oracle's seed-phase pass. The admission loop runs driver-side
    // like the rest of this convenience path (≤ seedIngestLocalMax seeds
    // by construction); the distributed seed path carries the
    // executor-side equivalent.
    val smHostRows: Seq[String] =
      if (!cfg.fetchSitemaps) Nil else seedRows.map(_._2).distinct
    val smRows: Seq[(String, String, Long, Int, Long, Int, Int, Int, Boolean)] =
      if (!cfg.fetchSitemaps) Nil
      else {
        val gated = smHostRows.map(h =>
          (h, RobotsEval.allowed(rulesByHost.getOrElse(h, Nil), "/sitemap.xml")))
        val entriesByHost = fetchSitemapsDistributed(spark, cfg.fetcher, gated,
          useDirectives = cfg.fetchRobotsTxt)
        val seenSet = scala.collection.mutable.HashSet.empty[String]
        val hostAdm = scala.collection.mutable.HashMap.empty[String, Long]
        seedRows.foreach { r =>
          seenSet += r._1
          hostAdm.update(r._2, hostAdm.getOrElse(r._2, 0L) + 1L)
        }
        var seq = seedRows.size.toLong
        val out = Seq.newBuilder[(String, String, Long, Int, Long, Int, Int, Int, Boolean)]
        smHostRows.sorted.foreach { h =>
          entriesByHost.getOrElse(h, Nil).foreach { c =>
            if (cfg.scope.allows(c) && 1 <= cfg.maxDepth && !seenSet.contains(c)) {
              val ch = CanonicalUrl.host(c) // == h (same-host by the parser)
              if (hostAdm.getOrElse(ch, 0L) < cfg.maxUrlsPerHost) {
                seenSet += c
                hostAdm.update(ch, hostAdm.getOrElse(ch, 0L) + 1L)
                val ok = RobotsEval.allowed(rulesByHost.getOrElse(ch, Nil),
                  CanonicalUrl.path(c))
                out += ((c, ch, XxHash64.hashString(ch), 1, seq, 1, 0, 0, ok))
                seq += 1
              }
            }
          }
        }
        out.result()
      }
    val allRows = seedRows ++ smRows
    val seedDf = allRows
      .toDF("canonical_url", "host", "host_hash", "priority", "discovery_time",
        "depth", "attempts", "generation", "allowed")

    val pending0 = seedDf.filter($"allowed").drop("allowed")
      .withColumn("revisit_interval", lit(0))
      .withColumn("revisit_hash", lit(0L))
      .as[FrontierEntry]
    // seen rows carry their filter-shard and are clustered by it on disk,
    // so a shard IN-filter prunes parquet row groups (store-mode dedup)
    val seen0 = seedDf.select($"canonical_url", $"host_hash")
      .withColumn("shard", pmod($"host_hash", lit(eng.bloomShards.toLong)).cast("int"))

    val wave0 = store.beginCommit()
    if (eng.pendingStorage == "mor")
      wave0.replace(PendingBase, pending0.toDF())
        .declare(PendingDelta, pendingDeltaSchema)
    else wave0.replace("pending", pending0.toDF())
    // table-robots mode: robots state is CRAWL STATE in the store. Wave 0
    // carries the seed hosts' acquired rules/budgets (fetch mode) or the
    // whole config rule set (fixture mode); later waves append deltas.
    val robots0: Option[(DataFrame, DataFrame)] =
      if (eng.robotsStorage != "table") None
      else {
        val (ruleRows, hostRows) =
          if (cfg.fetchRobotsTxt)
            (knownHosts.toSeq.sorted.flatMap(h => rulesByHost.getOrElse(h, Nil)),
              knownHosts.toSeq.sorted.map(h => h -> budgetsByHost.get(h)))
          else (cfg.robots, Seq.empty[(String, Option[Int])])
        val (rdf, hdf) = robotsDfs(spark, ruleRows, hostRows, wave = 0)
        wave0.append(RobotsRules, rdf).append(RobotsHosts, hdf)
        Some((rdf, hdf))
      }
    val smHosts0: Option[DataFrame] =
      if (!cfg.fetchSitemaps) None
      else {
        val df = smHostRows.map(h => (h, 0)).toDF("host", "wave")
        wave0.append(SitemapHosts, df)
        Some(df.select($"host"))
      }
    wave0
      .append("seen", seen0.repartition(col("shard")).sortWithinPartitions("shard"))
      .declare("trace", org.apache.spark.sql.Encoders.product[TraceRow].schema)
      .declare("docs", docsTableSchema)
      .declare("errors", org.apache.spark.sql.Encoders.product[ErrorRow].schema)
      .declare("redirects", org.apache.spark.sql.Encoders.product[RedirectRow].schema)
      .declare(Duplicates, org.apache.spark.sql.Encoders.product[DuplicateRow].schema)
      .declare(ContentSeen, contentSeenSchema)
      .declare(HostHealth, hostHealthSchema)
      .declare(SitemapHosts, sitemapHostsSchema)
      .declare(RevisitDue, revisitDueSchema)
      .declare("metrics", org.apache.spark.sql.Encoders.product[WaveMetrics].schema)
      .summary("wave" -> "0",
        "shard_fan" -> eng.bloomShards.toString,
        "seeds" -> seedsCanonical.size.toString,
        "admitted" -> allRows.size.toString,
        "next_discovery_seq" -> allRows.size.toString,
        "fetched_total" -> "0")

    // run()-path fast start (small-seed path): the seeds are driver-
    // resident operator input, so the initial state is known a priori: the
    // filter builds in-process, the frontier/seen pass as plan hints, and
    // the wave-0 commit itself rides the async inFlight rail, overlapping
    // with wave 1's selection + fetch instead of serializing ahead of it.
    // resume() pays the store read-back instead; seed lists past
    // seedIngestLocalMax go through runSeedsDistributed.
    val initFilter: Option[ShardedSeenFilter] =
      if (eng.seenFilter == "none" || eng.filterDistribution == "lazy") None
      else {
        val f = eng.seenFilter match {
          case "bloom" => ShardedBloom.sized(eng.bloomShards, eng.bloomItemsPerShard, eng.bloomFpp)
          case _       => ShardedCuckoo.sized(eng.bloomShards, eng.bloomItemsPerShard)
        }
        allRows.foreach { case (u, _, hh, _, _, _, _, _, _) =>
          f match {
            case b: ShardedBloom  => b.insert(u, hh)
            case c: ShardedCuckoo => c.insert(u, hh)
            case _                =>
          }
        }
        Some(f)
      }
    loop(spark, cfg, store, eng, rulesByHost, budgetsByHost, knownHosts,
      fast = Some(FastStart(
      pending = pending0.toDF(),
      seen0 = seen0,
      filter = initFilter,
      nextSeq = allRows.size.toLong,
      pendingCount = allRows.count(_._9).toLong,
      wave0Commit = wave0,
      robotsDelta = robots0,
      smHosts0 = smHosts0,
      smRows0 = smHostRows.size.toLong)), onWaveEnd = onWaveEnd)
  }

  /** Schema of the distributed seed-ingest input: the raw operator-given
    * seed list as rows; `seed_seq` = the URL's 0-based position in that
    * list. It defines first-occurrence order and hence discovery_time,
    * exactly like the driver-side path's list order.
    */
  val seedInputSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL("url STRING, seed_seq BIGINT")

  /** Run a crawl whose seed list arrives AS A TABLE of [[seedInputSchema]]
    * rows — the 10^8+-seed recrawl shape, where the list lives in storage
    * and must never materialize on the driver. `cfg.seeds` is ignored.
    * Output is identical to [[run]] with the equivalent in-order seed Seq
    * (EQ-asserted).
    */
  def runWithSeedTable(spark: SparkSession, cfg: CrawlConfig, storeRoot: String,
      seeds: DataFrame, eng: EngineConfig = EngineConfig(),
      onWaveEnd: Int => Unit = _ => ()): RunHandle =
    runSeedsDistributed(spark, cfg, new SnapshotStore(storeRoot, spark), eng,
      seeds, onWaveEnd)

  /** DISTRIBUTED wave-0 seed ingest ([[run]] past
    * [[EngineConfig.seedIngestLocalMax]], and [[runWithSeedTable]]):
    * canonicalize, first-occurrence dedup, dense discovery numbering
    * (two-phase rank — see [[withGlobalSeq]]) and robots
    * acquisition/admission all run as Spark jobs; the driver never holds a
    * URL, and in table-robots mode not a host either. Semantics identical
    * to the driver-side path (EQ-asserted): dedup keeps the canonical
    * form's FIRST seed position, discovery_time is the dense 0..n-1 rank
    * in that order, denied seeds occupy seen only.
    */
  private def runSeedsDistributed(spark: SparkSession, cfg: CrawlConfig,
      store: SnapshotStore, eng: EngineConfig, seedsRaw: DataFrame,
      onWaveEnd: Int => Unit): RunHandle = {
    import spark.implicits._
    val canonU = udf((u: String) => CanonicalUrl.canonicalize(u))
    val hostU = udf((u: String) => CanonicalUrl.host(u))
    // all seed-ingest checkpoints (incl. withGlobalSeq's internal ranged
    // stage) ride the bootstrap release schedule: bootstrapRes → ckptCur at
    // first wave end → freed once no plan can re-evaluate through them
    var seedCkpts: List[DataFrame] = Nil
    val first = seedsRaw
      .select(canonU($"url").as("canonical_url"), $"seed_seq")
      .groupBy($"canonical_url").agg(min($"seed_seq").as("__fs"))
    val numbered = withGlobalSeq(first, Seq("__fs"), "discovery_time",
        onCheckpoint = ck => seedCkpts ::= ck)
      .withColumn("host", hostU($"canonical_url"))
      .withColumn("host_hash", xxhash64($"host"))
      .withColumn("priority", lit(0))
      .withColumn("depth", lit(0))
      .select($"canonical_url", $"host", $"host_hash", $"priority",
        $"discovery_time", $"depth")
      // ONE materialization feeds robots acquisition, admission, seen0 and
      // pending0; released on the bootstrap two-generation schedule
      .localCheckpoint(false)

    val configRules = RobotsEval.byHost(cfg.robots)
    val tableRobots = eng.robotsStorage == "table"
    var rulesByHost = configRules
    var budgetsByHost = Map.empty[String, Int]
    var knownHosts: Set[String] = Set.empty
    var robots0: Option[(DataFrame, DataFrame)] = None
    var robotsRows0 = 0L
    seedCkpts ::= numbered

    val withAllowed: DataFrame =
      if (cfg.fetchRobotsTxt && tableRobots) {
        // the 10^7+-host shape end-to-end: acquisition, the rule rows and
        // the admission check all stay on the executors
        val crb = spark.sparkContext.broadcast(configRules)
        val (ruleRows, hostRows, res) = acquireRobotsDf(spark, cfg.fetcher,
          cfg.userAgent, crb, cfg.wavePeriodSeconds,
          numbered.select($"host").distinct(), wave = 0)
        seedCkpts ::= res
        // actual acquired row count (executor agg) — seeds the broadcast-
        // hint bound exactly like the in-wave acquisition; also the first
        // job, so it materializes the numbered-seed and res checkpoints
        val stats = res.agg(count(lit(1)).as("h"),
          coalesce(sum(size($"rules")), lit(0L)).as("r")).head()
        robotsRows0 = stats.getLong(0) + stats.getLong(1)
        robots0 = Some((ruleRows, hostRows))
        val hint: DataFrame => DataFrame =
          if (robotsRows0 <= eng.robotsBroadcastMaxRows) broadcast(_)
          else identity
        robotsAdmissionJoin(spark, numbered, ruleRows, hostRows, hint)
      } else {
        if (cfg.fetchRobotsTxt) {
          // broadcast robots: the host dimension is driver-resident BY
          // DESIGN (≤10^6 hosts) — only the DISTINCT hosts come back,
          // never URLs
          val hosts =
            numbered.select($"host").distinct().as[String].collect().toSeq
          val resolved =
            fetchRobotsDistributed(spark, cfg.fetcher, cfg.userAgent, hosts)
          val (r, b, k) = mergeHostRobots(resolved, configRules,
            cfg.wavePeriodSeconds, rulesByHost, budgetsByHost, knownHosts)
          rulesByHost = r; budgetsByHost = b; knownHosts = k
        }
        if (tableRobots) { // fixture mode: config rules = the wave-0 table
          robots0 = Some(robotsDfs(spark, cfg.robots, Nil, wave = 0))
          robotsRows0 = cfg.robots.size.toLong
        }
        val rb = spark.sparkContext.broadcast(rulesByHost)
        val allowedU = udf((u: String) =>
          RobotsEval.allowed(rb.value.getOrElse(CanonicalUrl.host(u), Nil),
            CanonicalUrl.path(u)))
        numbered.withColumn("__allowed", allowedU($"canonical_url"))
      }

    val nSeeds = numbered.count()

    // ---- wave-0 SITEMAP ingestion (cfg.fetchSitemaps, oracle model
    // point 13), FULLY DISTRIBUTED like everything else on this path: the
    // seed hosts are wave 0's candidate set — each is probed once
    // (robots-gated on "/sitemap.xml" through the mode's own admission
    // check), entries explode into candidate rows that dedup internally,
    // anti-join the seeds (seed sightings win), rank under the host cap,
    // number after the seeds and pass robots admission — never a loc
    // string on the driver.
    val tableFetch = cfg.fetchRobotsTxt && tableRobots
    def admitRobots(df: DataFrame): DataFrame =
      if (tableFetch) {
        val hint: DataFrame => DataFrame =
          if (robotsRows0 <= eng.robotsBroadcastMaxRows) broadcast(_)
          else identity
        robotsAdmissionJoin(spark, df, robots0.get._1, robots0.get._2, hint)
      } else {
        val rb = spark.sparkContext.broadcast(rulesByHost)
        val allowedU = udf((u: String) =>
          RobotsEval.allowed(rb.value.getOrElse(CanonicalUrl.host(u), Nil),
            CanonicalUrl.path(u)))
        df.withColumn("__allowed", allowedU($"canonical_url"))
      }
    var smHosts0: Option[DataFrame] = None
    var smRows0 = 0L
    var smTableRows: Option[DataFrame] = None
    val locAllowedDf: Option[DataFrame] =
      if (!cfg.fetchSitemaps) None
      else {
        val probe = numbered.select($"host").distinct().select(
          concat(lit("http://"), $"host", lit("/sitemap.xml"))
            .as("canonical_url"),
          $"host", xxhash64($"host").as("host_hash"),
          lit(0).as("priority"), lit(0L).as("discovery_time"),
          lit(0).as("depth"))
        val gated = admitRobots(probe)
          .select($"host", $"__allowed".as("__smok"))
        val res = probeSitemapsDf(spark, cfg.fetcher, gated, wave = 0,
          useDirectives = cfg.fetchRobotsTxt)
        seedCkpts ::= res
        val stats = res.agg(count(lit(1)),
          coalesce(sum(size($"locs")), lit(0L))).head()
        smRows0 = stats.getLong(0)
        val locTotal = stats.getLong(1)
        // the probed-host STATE outlives the bootstrap release schedule
        // (res is freed after wave 3, but the state plan is re-evaluated
        // by every later wave's anti-join until the next probe replaces
        // it) — so it gets its own eagerly-materialized checkpoint, owned
        // by the loop's state chain like every chained state
        val smdf = res.select($"host").localCheckpoint(false)
        smdf.count()
        smHosts0 = Some(smdf)
        smTableRows = Some(res.select($"host", lit(0).as("wave")))
        if (locTotal == 0 || cfg.maxDepth < 1) None
        else {
          val rows = sitemapCandidateRows(res, cfg.scope)
          val locFirst = firstSightings(rows.filter($"__smok").drop("__smok"))
            .join(numbered.select($"canonical_url"), Seq("canonical_url"),
              "left_anti")
          val capped =
            if (cfg.maxUrlsPerHost == Long.MaxValue) locFirst
            else {
              // seeds (denied included — they occupy seen) count toward
              // the cap; in-wave rank in admission order
              val counts = numbered.groupBy($"host_hash")
                .agg(count(lit(1)).as("__hc"))
              val w = Window.partitionBy($"host_hash")
                .orderBy($"src_pri", $"src_dt", $"src_url", $"link_idx")
              locFirst.withColumn("__hrk", row_number().over(w))
                .join(counts, Seq("host_hash"), "left")
                .filter($"__hrk" <=
                  lit(cfg.maxUrlsPerHost) - coalesce($"__hc", lit(0L)))
                .drop("__hrk", "__hc")
            }
          val locNumbered = withGlobalSeq(capped,
              Seq("src_pri", "src_dt", "src_url", "link_idx"), "__rank",
              onCheckpoint = ck => seedCkpts ::= ck)
            .withColumn("discovery_time", $"__rank" + lit(nSeeds))
            .withColumn("priority", $"depth")
            .drop("__rank", "src_pri", "src_dt", "src_url", "link_idx")
          val l = admitRobots(locNumbered).localCheckpoint(false)
          seedCkpts ::= l
          Some(l)
        }
      }
    val locSeenCount = locAllowedDf.map(_.count()).getOrElse(0L)
    val nAdmitted = nSeeds + locSeenCount

    // localCheckpoint: the admission join output feeds the count below, the
    // async wave-0 commit write AND wave 1's selection — materialize it once
    // (at admittedCount) instead of re-running the host-join/groupBy three
    // times over the full seed set. Released by the loop's own pendingDF
    // schedule (superseded at wave 1's end, or the exit path).
    val fcols0 = frontierSchema.fieldNames.map(col).toIndexedSeq
    val pending0 = {
      val seedsPart = withAllowed.filter($"__allowed").drop("__allowed")
        .withColumn("attempts", lit(0))
        .withColumn("generation", lit(0))
        .withColumn("revisit_interval", lit(0))
        .withColumn("revisit_hash", lit(0L))
        .select(fcols0: _*)
      locAllowedDf match {
        case Some(l) => seedsPart.unionByName(
          l.filter($"__allowed").drop("__allowed")
            .withColumn("attempts", lit(0))
            .withColumn("generation", lit(0))
            .withColumn("revisit_interval", lit(0))
            .withColumn("revisit_hash", lit(0L)).select(fcols0: _*))
        case None => seedsPart
      }
    }.localCheckpoint(false)
    // seen carries ALL canonical seeds (and every sitemap entry surviving
    // to the robots check) — denied ones occupy seen only
    val seen0 = {
      val s = numbered.select($"canonical_url", $"host_hash")
      locAllowedDf
        .map(l => s.unionByName(l.select($"canonical_url", $"host_hash")))
        .getOrElse(s)
    }.withColumn("shard",
        pmod($"host_hash", lit(eng.bloomShards.toLong)).cast("int"))
    val admittedCount = pending0.count()

    val wave0 = store.beginCommit()
    if (eng.pendingStorage == "mor")
      wave0.replace(PendingBase, pending0)
        .declare(PendingDelta, pendingDeltaSchema)
    else wave0.replace("pending", pending0)
    robots0.foreach { case (rdf, hdf) =>
      wave0.append(RobotsRules, rdf).append(RobotsHosts, hdf)
    }
    smTableRows.foreach(wave0.append(SitemapHosts, _))
    wave0
      .append("seen", seen0.repartition(col("shard")).sortWithinPartitions("shard"))
      .declare("trace", org.apache.spark.sql.Encoders.product[TraceRow].schema)
      .declare("docs", docsTableSchema)
      .declare("errors", org.apache.spark.sql.Encoders.product[ErrorRow].schema)
      .declare("redirects", org.apache.spark.sql.Encoders.product[RedirectRow].schema)
      .declare(Duplicates, org.apache.spark.sql.Encoders.product[DuplicateRow].schema)
      .declare(ContentSeen, contentSeenSchema)
      .declare(HostHealth, hostHealthSchema)
      .declare(SitemapHosts, sitemapHostsSchema)
      .declare(RevisitDue, revisitDueSchema)
      .declare("metrics", org.apache.spark.sql.Encoders.product[WaveMetrics].schema)
      .summary("wave" -> "0",
        "shard_fan" -> eng.bloomShards.toString,
        "seeds" -> nSeeds.toString,
        "admitted" -> nAdmitted.toString,
        "next_discovery_seq" -> nAdmitted.toString,
        "fetched_total" -> "0")

    loop(spark, cfg, store, eng, rulesByHost, budgetsByHost, knownHosts,
      fast = Some(FastStart(
        pending = pending0,
        seen0 = seen0,
        // None: broadcast-filter configs build it in the loop from seen0
        // via the executor-side shard aggregator — never URL-by-URL on the
        // driver like the small-seed path's in-process build
        filter = None,
        nextSeq = nAdmitted,
        pendingCount = admittedCount,
        wave0Commit = wave0,
        robotsDelta = robots0,
        robotsRows0 = if (tableRobots) Some(robotsRows0) else None,
        smHosts0 = smHosts0,
        smRows0 = smRows0)),
      bootstrapCkpts = seedCkpts,
      onWaveEnd = onWaveEnd)
  }

  /** Resume from the CURRENT snapshot of an existing store. In
    * fetchRobotsTxt mode no robots state needs persisting: rules/budgets
    * are a pure function of host, so any host met again re-resolves to the
    * identical state. The one exception is SELECTION: the first resumed
    * wave selects from already-pending hosts BEFORE any candidate
    * resolution runs, so their Crawl-delay budgets must be re-acquired
    * up front — one distinct-hosts pass over pending + a distributed
    * robots fetch (host count is the small dimension of a frontier).
    */
  def resume(spark: SparkSession, cfg: CrawlConfig, storeRoot: String,
             eng: EngineConfig = EngineConfig()): RunHandle = {
    val store = new SnapshotStore(storeRoot, spark)
    require(store.currentVersion.nonEmpty, s"nothing to resume at $storeRoot")
    // The seen/content_seen tables carry a `shard` column computed with
    // the WRITING run's bloomShards; the store-mode scans prune on it, so
    // resuming those modes with a different fan would silently make whole
    // bands invisible (mirror pages re-stored, URLs re-admitted). Fail
    // loudly instead. Non-store modes recompute pmod fresh and are fan-
    // change-safe; stores from before this stamp carry no record (same
    // modes, same caveat — documented).
    for (fan <- store.currentManifest.flatMap(_.summary.get("shard_fan")).map(_.toInt)
         if fan != eng.bloomShards)
      require(eng.seenStorage != "store" &&
        !(cfg.contentDedup && eng.contentStorage == "store"),
        s"store at $storeRoot was written with bloomShards=$fan but this engine " +
        s"has bloomShards=${eng.bloomShards}: store-mode shard pruning reads the " +
        "persisted shard column and would silently drop bands — resume with the " +
        "original fan")
    val configRules = RobotsEval.byHost(cfg.robots)
    var rules0 = configRules
    var budgets0 = Map.empty[String, Int]
    var known0 = Set.empty[String]
    var robotsTables0: Option[(DataFrame, DataFrame)] = None
    var bootstrapRes: Option[DataFrame] = None
    if (eng.robotsStorage == "table") {
      // robots state is durable crawl state: read it back — nothing to
      // refetch (unless cfg.refetchRobotsOnResume asks for RECENCY: then
      // the pending hosts re-fetch and their new rows — stamped with the
      // resumed wave — supersede the stored ones via latest-wave-wins). A
      // store written in broadcast mode lacks the tables; then bootstrap
      // as a delta. Every path below is FULLY DISTRIBUTED: the pending-
      // host dimension flows as a DataFrame into [[acquireRobotsDf]]
      // (executor fetch+parse, wave-stamped delta rows) — zero host or
      // rule bytes on the driver, matching the in-wave acquisition shape.
      val resumedWave =
        store.currentManifest.map(_.summary("wave").toInt + 1).getOrElse(1)
      import spark.implicits._
      val crb = spark.sparkContext.broadcast(configRules)
      def refetchHostsDf(hostsDf: DataFrame): (DataFrame, DataFrame) = {
        val (r, h, res) = acquireRobotsDf(spark, cfg.fetcher, cfg.userAgent,
          crb, cfg.wavePeriodSeconds, hostsDf, resumedWave)
        bootstrapRes = Some(res)
        (r, h)
      }
      def pendingHostsDf(): DataFrame =
        readPending(spark, store).select($"host").distinct()
      robotsTables0 =
        if (store.currentManifest.exists(_.tables.contains(RobotsRules))) {
          if (cfg.fetchRobotsTxt && cfg.refetchRobotsOnResume)
            Some(refetchHostsDf(pendingHostsDf()))
          else if (cfg.fetchRobotsTxt) {
            // SELECTION INVARIANT across a fixture->fetch mode switch: the
            // first resumed wave's budget join needs every pending host's
            // acquired state, but a store written in FIXTURE table mode has
            // no fetch events (robots_hosts rows) at all — those hosts'
            // Crawl-delay budgets would bind one wave late. Acquire exactly
            // the pending hosts MISSING from robots_hosts, found by
            // ANTI-JOIN (in a pure fetch-mode resume that set is EMPTY —
            // every pending URL's host was a candidate host of some wave,
            // hence has a row — and the acquisition is a no-op).
            Some(refetchHostsDf(pendingHostsDf()
              .join(readRobots(spark, store, RobotsHosts).select($"host"),
                Seq("host"), "left_anti")))
          } else
            Some((emptyDf(spark, robotsRulesSchema), emptyDf(spark, robotsHostsSchema)))
        }
        else if (!cfg.fetchRobotsTxt)
          Some(robotsDfs(spark, cfg.robots, Nil, resumedWave))
        else Some(refetchHostsDf(pendingHostsDf()))
    } else if (cfg.fetchRobotsTxt) {
      import spark.implicits._
      resumeHostCollects.incrementAndGet()
      val hosts = readPending(spark, store)
        .select($"host").distinct().as[String].collect().toSeq
      // the resumed wave is the fetch wave (a time-varying robots server
      // sees the resume re-resolution happen NOW, not at wave 0)
      val resumedWave =
        store.currentManifest.map(_.summary("wave").toInt + 1).getOrElse(1)
      val resolved = fetchRobotsDistributed(spark, cfg.fetcher, cfg.userAgent,
        hosts, resumedWave)
      val (r, b, k) = mergeHostRobots(resolved, configRules,
        cfg.wavePeriodSeconds, rules0, budgets0, known0)
      rules0 = r; budgets0 = b; known0 = k
    }
    loop(spark, cfg, store, eng, rules0, budgets0, known0, robotsTables0,
      bootstrapCkpts = bootstrapRes.toSeq,
      acqWave0 = store.currentManifest.map(_.summary("wave").toInt + 1).getOrElse(1))
  }

  // ---------------------------------------------------------------------
  private def loop(spark: SparkSession, cfg: CrawlConfig, store: SnapshotStore,
                   eng: EngineConfig,
                   rules0: Map[String, Seq[RobotsRule]],
                   budgets0: Map[String, Int],
                   known0: Set[String],
                   robotsTables0: Option[(DataFrame, DataFrame)] = None,
                   fast: Option[FastStart] = None,
                   /** pre-loop checkpoints (resume-bootstrap robots
                     * acquisition; distributed seed ingest's numbered-seed
                     * and seed-robots checkpoints) — their rows ride the
                     * first commit / back the wave-1 plans, and their
                     * release must follow the SAME two-generation timing as
                     * a wave-1 acquisition (they join wave 1's ckptCur),
                     * because wave 2's plans may still embed them (through
                     * robotsDelta, or the wave-1 caches built over the seed
                     * frontier) until wave 3's await.
                     */
                   bootstrapCkpts: Seq[DataFrame] = Nil,
                   /** the wave every host of known0 was resolved at (seed
                     * ingest: 0; broadcast-mode resume: the resumed wave)
                     * — seeds the robots-TTL staleness clock
                     * (cfg.robotsTtlWaves; broadcast mode only — table
                     * mode reads acquisition waves from robots_hosts).
                     */
                   acqWave0: Int = 0,
                   onWaveEnd: Int => Unit = _ => ()): RunHandle = {
    import spark.implicits._

    val fetcher = cfg.fetcher
    val defaultBudget = cfg.budgetPerHost
    val hostBudgetsB = spark.sparkContext.broadcast(cfg.hostBudgets)

    // ---- robots state (host-keyed rules + Crawl-delay budgets) and the
    // set of hosts already resolved (fetchRobotsTxt mode). Broadcasts are
    // swapped only on waves that resolve new hosts; superseded broadcasts
    // are reclaimed by Spark's ContextCleaner once unreferenced — never
    // destroy()ed eagerly, because the in-flight commit's lazily-
    // checkpointed plans may still evaluate against them.
    val configRules = RobotsEval.byHost(cfg.robots)
    val userAgent = cfg.userAgent
    var rulesByHost = rules0
    var budgetsByHost = budgets0
    var knownHosts = known0
    var robotsCur = spark.sparkContext.broadcast(rulesByHost)
    var budgetsCur = spark.sparkContext.broadcast(budgetsByHost)
    var knownHostsB = spark.sparkContext.broadcast(knownHosts)
    // robots-TTL clock, broadcast mode (cfg.robotsTtlWaves; oracle model
    // point 16): host -> wave its resolution was acquired at. The driver
    // map drives the wave-start stale-pending re-fetch; the broadcast
    // drives the mid-wave stale-candidate check (executors). Maintained
    // only while the TTL is on (table mode reads waves from robots_hosts
    // instead — zero driver state there).
    val ttlActive = cfg.fetchRobotsTxt && cfg.robotsTtlWaves > 0
    var acqWaveM: Map[String, Int] =
      if (ttlActive) known0.iterator.map(_ -> acqWave0).toMap else Map.empty
    var acqWaveB = spark.sparkContext.broadcast(acqWaveM)

    // ---- robots-as-TABLE state (robotsStorage = "table", the 10^7+-host
    // path): rules/budgets are snapshot tables; the store read covers
    // everything through the last AWAITED commit and `robotsDelta` covers
    // rows riding a commit still in flight (wave-0 seed rows on the fast
    // path; each wave's acquisitions thereafter). `robotsUncommitted`
    // holds bootstrap rows not yet handed to any commit (resume).
    val tableRobots = eng.robotsStorage == "table"
    val configRulesB = spark.sparkContext.broadcast(configRules)
    val wavePeriod = cfg.wavePeriodSeconds
    var robotsDelta: (DataFrame, DataFrame) =
      fast.flatMap(_.robotsDelta).orElse(robotsTables0)
        .getOrElse((emptyDf(spark, robotsRulesSchema),
          emptyDf(spark, robotsHostsSchema)))
    var robotsUncommitted: Option[(DataFrame, DataFrame)] =
      if (fast.isEmpty) robotsTables0 else None
    // true while robotsDelta's rows ride a commit still in flight; once that
    // commit is awaited the store covers them and the delta resets to empty
    // (otherwise last wave's rows stay unioned into every later plan and
    // the per-wave caches backing them can never be dropped)
    var robotsDeltaInFlight: Boolean = fast.exists(_.robotsDelta.nonEmpty)
    // driver-tracked upper bound on robots-table rows, steering the
    // broadcast hint (the tables themselves are never collected; per-wave
    // growth is aggregated from the actual acquired rule counts, and
    // resume-bootstrap deltas — refetch/mode-switch rows — are counted in.
    // NB: on a refetch-resume these counts EVALUATE the distributed robots
    // fetch pre-pass (acquireRobotsDf checkpoint) at loop setup — not free,
    // but those rows are needed at the first resumed selection anyway; only
    // the two scalar counts come back to the driver)
    val robotsBootstrapRows: Long =
      if (!tableRobots) 0L
      else robotsUncommitted.map(t => t._1.count() + t._2.count()).getOrElse(0L)
    var robotsRowsApprox: Long =
      if (!tableRobots) 0L
      else if (fast.nonEmpty)
        fast.get.robotsRows0.getOrElse(
          math.max(cfg.robots.size.toLong,
            knownHosts.size.toLong +
              knownHosts.iterator.map(h => rulesByHost.getOrElse(h, Nil).size.toLong).sum))
      else if (store.currentManifest.exists(_.tables.contains(RobotsRules)))
        store.read(RobotsRules).count() + store.read(RobotsHosts).count() +
          robotsBootstrapRows
      else robotsBootstrapRows
    val hintRobots = new DimensionHint(eng.robotsBroadcastMaxRows, () => robotsRowsApprox)

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
    val lazyFilters = useFilter && eng.filterDistribution == "lazy"
    var filterBroadcasts = 0

    // lazy mode: per-shard filter files in shared storage next to the
    // snapshot store; the merged filter never exists as one object.
    val shardStore: Option[graft.sources.FilterShardStore] =
      if (!lazyFilters) None
      else {
        val (bb, bh, cb) = eng.seenFilter match {
          case "bloom" =>
            val p = BloomShard.sized(eng.bloomItemsPerShard, eng.bloomFpp)
            (p.bits.length, p.numHashes, 0)
          case _ =>
            val p = CuckooFilter.sized(eng.bloomItemsPerShard)
            (0, 0, p.numBucketsPow2)
        }
        Some(new graft.sources.FilterShardStore(s"${store.root}/filters", nsh,
          eng.seenFilter, bb, bh, cb,
          new graft.util.SerializableHadoopConf(
            spark.sparkContext.hadoopConfiguration)))
      }
    var filterGen: graft.sources.FilterGen = null
    if (lazyFilters) {
      // fresh base generation rebuilt DISTRIBUTED from the seed hint (fast
      // start) or the committed seen table (resume): each task writes the
      // shards its partition holds — zero filter bytes on the driver
      val ss = shardStore.get
      val v = ss.nextBaseVersion()
      val src = fast.map(_.seen0).getOrElse(store.read("seen"))
      ss.writeShardFiles(src, ss.baseDir(v))
      filterGen = graft.sources.FilterGen(v, Vector.empty)
    }
    var bloomB: org.apache.spark.broadcast.Broadcast[ShardedSeenFilter] = null
    if (!lazyFilters) {
      val filter0: ShardedSeenFilter =
        if (!useFilter) AlwaysMaybe
        else fast.flatMap(_.filter).getOrElse {
          // resume: the committed seen table; distributed seed ingest (fast
          // path, filter=None): the wave-0 seen hint — its commit is still
          // in flight, and the build is the same executor-side shard agg
          val rows = fast.map(_.seen0).getOrElse(store.read("seen"))
            .withColumn("__shard", pmod($"host_hash", lit(nsh.toLong)).cast("int"))
            .groupBy($"__shard").agg(buildShardAgg().as("bits"))
            .collect()
          mergeShards(emptyFilter(), rows)
        }
      bloomB = spark.sparkContext.broadcast(filter0)
      filterBroadcasts += 1
    }

    // Initial loop state: a priori on the fast-start path (the wave-0
    // commit is still in flight), from the CURRENT manifest on resume.
    var wave = 1
    var nextSeq = 0L
    var fetchedTotal = 0L
    var carriedPendingCount: Option[Long] = None
    fast match {
      case Some(f) =>
        nextSeq = f.nextSeq
        carriedPendingCount = Some(f.pendingCount)
      case None =>
        val m = store.currentManifest.get
        wave = m.summary("wave").toInt + 1
        nextSeq = m.summary("next_discovery_seq").toLong
        fetchedTotal = m.summary("fetched_total").toLong
    }
    var wavesRun = 0

    // ---- per-host ADMISSION-CAP state (cfg.maxUrlsPerHost, oracle model
    // point 10): a host's cumulative admission count == its seen-set row
    // count, so the state needs no table of its own — it initializes as a
    // groupBy over the seed hint / committed seen table and then chains
    // wave-to-wave through localCheckpoints ((counts ∪ this wave's
    // admissions) re-aggregated), exactly host-dimension-sized. Rebuilding
    // from seen on resume also makes admissions from earlier UNCAPPED runs
    // (and expire() deletions) count correctly by construction. The
    // chained checkpoint is MATERIALIZED eagerly each wave (a count() over
    // two cached inputs) — a lazy one would recompute through the
    // predecessor checkpoint after the release queue frees it — and the
    // count doubles as the exact row bound for the counts-join broadcast
    // hint (RDD-backed counts have no size stats; see hintRobots).
    val hostCap = cfg.maxUrlsPerHost
    val capActive = hostCap != Long.MaxValue
    var hostCounts: DataFrame =
      if (!capActive) null
      else fast.map(_.seen0).getOrElse(store.read("seen"))
        .groupBy($"host_hash").agg(count(lit(1)).as("__hc"))
    // upper bound until the first materialized update (hosts ≤ admissions)
    var capHostsApprox: Long = if (capActive) math.max(1L, nextSeq) else 0L
    // same broadcast-sanity bound as the robots dimension: the counts table
    // is host-dimension-sized, so past ~2^20 hosts the cap join must be a
    // shuffled join, not a driver-resident broadcast
    val hintCounts = new DimensionHint(eng.robotsBroadcastMaxRows, () => capHostsApprox)

    // ---- CONTENT-SEEN state (cfg.contentDedup, oracle model point 11):
    // (fingerprint -> owning URL), chained wave-to-wave through eagerly
    // materialized localCheckpoints exactly like the host-cap counts. The
    // durable copy is the `content_seen` table (appended with each wave's
    // NEW fingerprints), which resume reads back; a store written with the
    // flag off has an empty table, so enabling at resume dedups only
    // against content fetched from then on (matches the oracle, which
    // records nothing while off). The eager count() doubles as the exact
    // row bound for the state-join broadcast hint (RDD-backed state has no
    // size stats); past the bound the join shuffles on content_hash — the
    // docs-sized-dimension regime.
    val cdupActive = cfg.contentDedup
    val contentStore = cdupActive && eng.contentStorage == "store"
    var contentSeenState: DataFrame =
      if (!cdupActive || contentStore) null // store mode scans per wave
      else if (fast.isEmpty &&
        store.currentManifest.exists(_.tables.contains(ContentSeen)))
        store.read(ContentSeen)
          .select($"content_hash".as("__chash"), $"canonical_url".as("__owner"))
      else emptyDf(spark, contentStateSchema)
    // floored at 1 like capHostsApprox: the hint bound is an upper-bound
    // heuristic, and a (vacuously broadcastable) empty state must not
    // dodge the forced-withheld test seam at bound 0
    var contentRowsApprox: Long =
      if (!cdupActive) 0L
      else if (fast.isEmpty &&
        store.currentManifest.exists(_.tables.contains(ContentSeen)))
        math.max(1L, store.read(ContentSeen).count())
      else 1L
    val hintContent = new DimensionHint(eng.robotsBroadcastMaxRows, () => contentRowsApprox)

    // ---- host-BACKOFF state (cfg.hostBackoff, oracle model point 12):
    // (host_hash -> consecutive transient failures, quarantined-through
    // wave), chained through eagerly materialized localCheckpoints like the
    // host-cap counts — but holding ONLY unhealthy hosts (consec > 0 or
    // quarantine still ahead), so it stays proportional to the crawl's
    // failing hosts. The durable copy is the `host_health` table (changed
    // rows appended per wave, latest-wave-wins), which resume reads back; a
    // store written with the feature off has no rows, so enabling at resume
    // starts every host healthy (matches the oracle). `healthMaxUntil` is a
    // driver-tracked upper bound on any quarantine's expiry: once the wave
    // passes it, the selection gate join is skipped entirely — a healthy
    // crawl pays nothing per wave but the trailing-failure aggregate.
    val backoffCfg = cfg.hostBackoff
    val backoffActive = backoffCfg.nonEmpty
    var healthState: DataFrame =
      if (!backoffActive) null
      else if (fast.isEmpty && store.currentManifest.exists(_.tables.contains(HostHealth)))
        // checkpointed at init (materialized by the count below): the lazy
        // plan would re-scan + re-aggregate host_health up to twice per
        // wave (selection gate + update join) until the first change
        // replaces it — the same eager discipline as every chained state
        store.read(HostHealth)
          .groupBy($"host_hash")
          .agg(max(struct($"wave", $"consec", $"quarantined_until")).as("__s"))
          .select($"host_hash", $"__s.consec".cast("long").as("__consec"),
            $"__s.quarantined_until".as("__until"))
          .filter($"__consec" > 0 || $"__until" >= wave)
          .localCheckpoint(false)
      else emptyDf(spark, healthStateSchema)
    // floored at 1 like contentRowsApprox: an empty state must not dodge
    // the forced-withheld test seam at bound 0 (the selection fast path
    // keys on healthMaxUntil, not this bound)
    var healthRowsApprox = 1L
    var healthMaxUntil = 0
    if (backoffActive && fast.isEmpty &&
        store.currentManifest.exists(_.tables.contains(HostHealth))) {
      val r = healthState
        .agg(count(lit(1)), coalesce(max($"__until"), lit(0))).head()
      healthRowsApprox = math.max(1L, r.getLong(0))
      healthMaxUntil = r.getInt(1)
    }
    val hintHealth = new DimensionHint(eng.robotsBroadcastMaxRows, () => healthRowsApprox)

    // ---- SITEMAP probed-host state (cfg.fetchSitemaps, oracle model
    // point 13): the set of hosts ever probed for /sitemap.xml — chained
    // through eagerly materialized localCheckpoints on probing waves like
    // the other host-dimension states. Durable copy = the wave-stamped
    // `sitemap_hosts` table (resume reads it back; flag-off runs record
    // nothing, so enabling at resume probes hosts on their next candidate
    // re-encounter — matches the oracle). A steady-state wave (no new
    // hosts) pays one anti-join over the wave's candidate-host dimension.
    val smActive = cfg.fetchSitemaps
    var smState: DataFrame =
      if (!smActive) null
      else fast.flatMap(_.smHosts0).getOrElse {
        if (fast.isEmpty && store.currentManifest.exists(_.tables.contains(SitemapHosts)))
          store.read(SitemapHosts).select($"host")
        else emptyDf(spark, sitemapStateSchema)
      }
    // floored at 1 like the other state hints: an empty state must not
    // dodge the forced-withheld test seam at bound 0
    var smRowsApprox: Long =
      if (!smActive) 0L
      else math.max(1L, fast.map(_.smRows0).getOrElse {
        if (store.currentManifest.exists(_.tables.contains(SitemapHosts)))
          store.read(SitemapHosts).count()
        else 0L
      })
    val hintSm = new DimensionHint(eng.robotsBroadcastMaxRows, () => smRowsApprox)

    // ---- REVISIT schedule state (cfg.revisitEveryWaves, oracle model
    // point 14): the outstanding re-fetch entries, keyed by the wave they
    // become due — chained through eagerly materialized localCheckpoints on
    // scheduling/consuming waves like the other states. Durable copy = the
    // append-only `revisit_due` table; a row is consumed when its due wave
    // executes (the committed pending table carries the entry from there),
    // so resume's outstanding schedule is exactly the rows with
    // due_wave >= the resumed wave. The driver tracks per-due-wave COUNTS
    // (due-wave-dimension-sized, never URLs): a wave with nothing due pays
    // zero revisit jobs, and a wave with nothing pending and nothing due
    // is SILENT — skipped entirely, no commit, the crawl sleeps to the
    // next due wave.
    // DOCUMENTED SEMANTICS (r5 ADVICE): a resume with revisit DISABLED
    // ignores but does not delete an existing revisit_due table; a later
    // resume that re-enables revisits therefore RESURRECTS the pre-disable
    // schedule (rows with due_wave >= that resume's wave). Disable is
    // "pause", not "cancel" — a cancel would require a table-replacing
    // commit at resume init, off the oracle's two-phase model.
    val revisitActive = cfg.revisitEveryWaves > 0
    // oracle model point 15: per-URL interval adaptation — the state rides
    // the frontier/schedule rows, so the only engine-side deltas are the
    // schedule expressions and per-due-wave (instead of single-due-wave)
    // driver counts
    val revisitAdaptive = revisitActive && cfg.revisitAdaptive.nonEmpty
    val revisitStore = revisitActive && eng.revisitStorage == "store"
    val hasRevisitTable = fast.isEmpty &&
      store.currentManifest.exists(_.tables.contains(RevisitDue))
    var revisitState: DataFrame =
      if (!revisitActive || revisitStore) null
      else if (hasRevisitTable)
        store.read(RevisitDue).filter($"due_wave" >= wave).localCheckpoint(false)
      else emptyDf(spark, revisitDueSchema)
    val scheduleCounts = scala.collection.mutable.HashMap.empty[Int, Long]
    if (revisitActive && hasRevisitTable) {
      val src =
        if (revisitStore) store.read(RevisitDue).filter($"due_wave" >= wave)
        else revisitState
      src.groupBy($"due_wave").count().collect()
        .foreach(r => scheduleCounts.update(r.getInt(0), r.getLong(1)))
    }
    var revisitOutstanding: Long = scheduleCounts.values.sum
    // store mode: the one-wave in-flight delta arm — this wave's scheduled
    // rows until their carrying commit is awaited (same flag discipline as
    // robotsDelta; the checkpoint itself is released via the standard
    // two-generation queue when superseded, never here)
    var revisitDelta: DataFrame =
      if (revisitStore) emptyDf(spark, revisitDueSchema) else null
    var revisitDeltaInFlight = false

    // Wave-to-wave state is chained through CACHED DataFrames (the snapshot
    // store is the durable/resume copy, written asynchronously off the
    // critical path): `pendingDF` is the live frontier plan; `seenSlices`
    // is the seen-set as a union of per-wave cached slices, collapsed back
    // onto ONE store read every rerootSeenEvery waves so a long crawl's
    // anti-join plan width and cache footprint stay bounded. Store mode
    // reads seen from shard-pruned parquet instead and keeps no slices.
    val cachedSeen = eng.seenStorage == "cached"
    var pendingDF: DataFrame = fast.map(_.pending).getOrElse(readPending(spark, store))
    var seenSlices: Vector[DataFrame] =
      if (cachedSeen) {
        val base = fast.map(_.seen0).getOrElse(store.read("seen"))
        Vector(base.select($"canonical_url", $"host_hash").cache())
      } else Vector.empty
    var maxSeenSlices = seenSlices.size
    // commit of wave k-1 + its filter delta, in flight while wave k
    // computes; on the fast-start path the WAVE-0 commit itself rides this
    // rail, overlapped with wave 1's selection and fetch
    var inFlight: scala.concurrent.Future[Option[FilterUpdate]] = fast match {
      case Some(f) =>
        import scala.concurrent.ExecutionContext.Implicits.global
        scala.concurrent.Future { f.wave0Commit.commit(); None }
      case None => scala.concurrent.Future.successful(None)
    }
    var prevWaveCaches: List[DataFrame] = Nil
    // Per-wave localCheckpoint releases (pending frontier, store-mode seen
    // appends, robots acquisition): Dataset.unpersist is a NO-OP for
    // checkpoint RDDs (it only consults the CacheManager), so without
    // explicit release the block manager grows by every wave's checkpoints
    // until ContextCleaner's weak-ref GC happens to run. A checkpoint's
    // blocks are NOT recomputable once dropped, so release runs on a
    // two-generation delay: entries from wave k may still back cached
    // plans built in wave k+1 (the superseded pending feeds ranked's
    // cache; robots res rows ride robotsDelta into the next selection) —
    // `ckptCur` holds this wave's checkpoints, promotion to `ckptPrev`
    // happens at wave end, and each await frees only `ckptPrev`, by which
    // point every cached plan over those blocks has itself been dropped.
    var ckptPrev: List[DataFrame] = Nil
    var ckptCur: List[DataFrame] = Nil
    var bootstrapRes: Seq[DataFrame] = bootstrapCkpts

    def awaitInFlight(): Unit = {
      scala.concurrent.Await
        .result(inFlight, scala.concurrent.duration.Duration.Inf)
        .foreach {
          case NewBroadcast(merged) =>
            val old = bloomB
            bloomB = spark.sparkContext.broadcast(merged)
            filterBroadcasts += 1
            old.destroy()
          case NewGen(g) => filterGen = g
        }
      inFlight = scala.concurrent.Future.successful(None)
      if (tableRobots && robotsDeltaInFlight) {
        // the commit carrying the delta rows has landed: the store read now
        // covers them — drop the in-memory union arm
        robotsDelta = (emptyDf(spark, robotsRulesSchema), emptyDf(spark, robotsHostsSchema))
        robotsDeltaInFlight = false
      }
      // revisit store mode: flag only — the table now covers the delta
      // rows, so due reads stop unioning the arm; the checkpoint's blocks
      // stay alive until the release queue frees it (live plans from this
      // wave's due union may still read them)
      revisitDeltaInFlight = false
      prevWaveCaches.foreach(_.unpersist())
      prevWaveCaches = Nil
      ckptPrev.foreach(org.apache.spark.sql.graftshim.SqlShim.unpersistLocalCheckpoint)
      ckptPrev = Nil
    }

    var done = false
    while (!done) {
      // the new pending count is derivable from the previous wave's
      // arithmetic (deferred + admitted) — saves one job per wave
      val basePendingCount =
        carriedPendingCount.getOrElse(pendingDF.as[FrontierEntry].count())
      // model point 14: revisit entries due this wave — driver-tracked
      // counts, so a wave with nothing due costs zero jobs here
      val dueWaves =
        if (revisitActive) scheduleCounts.keys.filter(_ <= wave).toSeq else Nil
      val dueNow = dueWaves.iterator.map(scheduleCounts).sum
      if (wave > cfg.maxWaves || fetchedTotal >= cfg.maxUrls ||
          (basePendingCount == 0 && revisitOutstanding == 0)) {
        awaitInFlight()
        done = true
      } else if (basePendingCount + dueNow == 0) {
        // SILENT wave (revisit mode): nothing pending, nothing due — the
        // crawl sleeps to the next due wave; nothing executed, nothing
        // committed, exactly like the oracle
        carriedPendingCount = Some(0L)
        wave += 1
      } else {
        // due revisits rejoin the frontier at wave start under the keys
        // they were scheduled with (attempts reset, generation+1 — stamped
        // at schedule time); in MOR mode they also ride the wave delta as
        // `add` rows so readPending reconstructs them
        val dueAdds: Option[DataFrame] =
          if (dueNow == 0) None
          else {
            val src =
              if (!revisitStore) revisitState.filter($"due_wave" <= wave)
              else {
                // store mode (the 10^10 path): scan revisit_due pruned by
                // the due-wave IN-filter (each append carries one due_wave
                // value → parquet prunes to the scheduling wave's files).
                // Rows riding the not-yet-awaited commit come from the
                // in-flight delta arm (live only when revisitEveryWaves ==
                // 1 can make a row due before its commit is awaited); a
                // row present in BOTH arms is byte-identical, so the
                // dedupe is exact
                val base =
                  if (store.currentManifest.exists(_.tables.contains(RevisitDue)))
                    store.read(RevisitDue)
                  else emptyDf(spark, revisitDueSchema)
                val all =
                  if (revisitDeltaInFlight) base.unionByName(revisitDelta)
                  else base
                val pruned = all.filter($"due_wave".isInCollection(dueWaves))
                if (revisitDeltaInFlight) pruned.dropDuplicates() else pruned
              }
            dueWaves.foreach(scheduleCounts.remove)
            revisitOutstanding -= dueNow
            val due = src
              .withColumn("attempts", lit(0)) // revisits re-enter fresh
              .select(frontierSchema.fieldNames.map(col).toSeq: _*)
            pendingDF = pendingDF.unionByName(due)
            Some(due)
          }
        val pending = pendingDF.as[FrontierEntry]
        val pendingCount = basePendingCount + dueNow
        val waveT0 = System.nanoTime()

        // ---- robots TTL pre-pass (cfg.robotsTtlWaves, oracle model point
        // 16): every PENDING host whose resolution expired re-fetches NOW
        // — before selection, so a fresh Crawl-delay budget binds this
        // wave. Stale CANDIDATE hosts are handled mid-wave by the
        // acquisition join below. All of it is gated off (zero jobs) while
        // the TTL is off or no resolution can be stale yet.
        var robotsRefetchedThisWave = 0L
        var ttlRes: Option[DataFrame] = None
        var ttlRuleRows = emptyDf(spark, robotsRulesSchema)
        var ttlHostRows = emptyDf(spark, robotsHostsSchema)
        if (ttlActive && wave >= cfg.robotsTtlWaves) {
          if (!tableRobots) {
            // broadcast mode: staleness is driver-known; one job intersects
            // the stale set with the wave's pending hosts (host dimension —
            // this mode's contract), then the standard distributed fetch +
            // merge + broadcast swap, all before the selection captures
            // budgetsCur
            val staleKnown = acqWaveM.iterator
              .filter(_._2 <= wave - cfg.robotsTtlWaves).map(_._1).toSet
            if (staleKnown.nonEmpty) {
              val skB = spark.sparkContext.broadcast(staleKnown)
              val isStale = udf((h: String) => skB.value.contains(h))
              val stalePending = pending.toDF().select($"host").distinct()
                .filter(isStale($"host")).as[String].collect().toSeq
              if (stalePending.nonEmpty) {
                val resolved = fetchRobotsDistributed(spark, fetcher,
                  userAgent, stalePending, wave)
                val (r, b, k) = mergeHostRobots(resolved, configRules,
                  wavePeriod, rulesByHost, budgetsByHost, knownHosts)
                rulesByHost = r; budgetsByHost = b; knownHosts = k
                acqWaveM = acqWaveM ++ stalePending.iterator.map(_ -> wave)
                robotsCur = spark.sparkContext.broadcast(rulesByHost)
                budgetsCur = spark.sparkContext.broadcast(budgetsByHost)
                knownHostsB = spark.sparkContext.broadcast(knownHosts)
                acqWaveB = spark.sparkContext.broadcast(acqWaveM)
                robotsRefetchedThisWave += stalePending.size
              }
            }
          } else {
            // table mode: acquisition waves live in robots_hosts — one
            // host-dimension aggregate finds the latest per host, a semi
            // join against the wave's pending hosts selects the stale
            // ones, and the standard distributed acquisition appends
            // wave-w rows that supersede via latest-wave-wins. The rows
            // ride this wave's commit exactly like in-wave acquisitions.
            val latest = readRobots(spark, store, RobotsHosts)
              .unionByName(robotsDelta._2)
              .groupBy($"host").agg(max($"wave").as("__lw"))
              .filter($"__lw" <= lit(wave - cfg.robotsTtlWaves))
            val staleHosts = pending.toDF().select($"host").distinct()
              .join(hintRobots(latest.select($"host")), Seq("host"), "left_semi")
            val (rr, hh, res) = acquireRobotsDf(spark, fetcher, userAgent,
              configRulesB, wavePeriod, staleHosts, wave)
            ttlRes = Some(res)
            val stats = res.agg(count(lit(1)).as("h"),
              coalesce(sum(size($"rules")), lit(0L)).as("r")).head()
            robotsRowsApprox += stats.getLong(0) + stats.getLong(1)
            robotsRefetchedThisWave += stats.getLong(0)
            if (stats.getLong(0) > 0) { ttlRuleRows = rr; ttlHostRows = hh }
          }
        }
        // ---- Q1/Q2: per-host budget selection (one shuffle of pending
        // only). Budget precedence: explicit config override > fetched
        // Crawl-delay budget (acquired when the host was first resolved, in
        // an earlier wave — any pending host has been through admission) >
        // default. Broadcast mode captures the budget map at wave start;
        // table mode JOINS the robots_hosts table (store through the last
        // awaited commit ∪ the in-flight delta, deduped per host).
        // ---- host-BACKOFF gate (oracle model point 12): pending rows on
        // quarantined hosts sit this wave out entirely — they skip the
        // budget window below and rejoin the frontier unchanged. Skipped
        // outright (no join, no count job) unless some quarantine can
        // still be live (healthMaxUntil is a driver-tracked upper bound).
        val fcolsF = frontierSchema.fieldNames.map(col).toSeq
        val backoffMarked: Option[DataFrame] =
          if (!backoffActive || healthMaxUntil < wave) None
          else Some(pending.toDF()
            .join(hintHealth(healthState.filter($"__until" >= wave)
              .select($"host_hash", lit(true).as("__q"))),
              Seq("host_hash"), "left").cache())
        val backoffDeferredCount =
          backoffMarked.map(_.filter($"__q").count()).getOrElse(0L)
        val backoffDeferredDf: Option[DataFrame] =
          if (backoffDeferredCount == 0) None
          else backoffMarked.map(_.filter($"__q").select(fcolsF: _*))
        val eligible = backoffMarked
          .map(_.filter($"__q".isNull).drop("__q")).getOrElse(pending.toDF())

        val hostWin = Window.partitionBy($"host_hash")
          .orderBy($"priority", $"discovery_time", $"canonical_url")
        val ranked = eligible.withColumn("__rk", row_number().over(hostWin)).cache()
        val (selectedRaw, deferred) =
          if (!tableRobots) {
            val bb = budgetsCur
            val budgetOf = udf((host: String) =>
              hostBudgetsB.value.getOrElse(host,
                bb.value.getOrElse(host, defaultBudget)))
            (ranked.filter($"__rk" <= budgetOf($"host")).drop("__rk"),
              ranked.filter($"__rk" > budgetOf($"host")).drop("__rk").as[FrontierEntry])
          } else {
            val overrideU = udf((h: String) => hostBudgetsB.value.get(h))
            // latest-wave-wins per host: the most recent fetch event's
            // budget applies (duplicate store/delta rows are identical, so
            // the max is also the dedupe)
            val hostsAll = readRobots(spark, store, RobotsHosts)
              .unionByName(robotsDelta._2)
              .unionByName(ttlHostRows) // TTL re-fetches: freshest rows win
              .groupBy($"host").agg(max(struct($"wave", $"budget")).as("__s"))
              .select($"host", $"__s.budget".as("__tb"))
            val rankedB = ranked.join(hintRobots(hostsAll), Seq("host"), "left")
              .withColumn("__budget",
                coalesce(overrideU($"host"), $"__tb", lit(defaultBudget)))
            val fcols = frontierSchema.fieldNames.map(col).toSeq
            (rankedB.filter($"__rk" <= $"__budget").select(fcols: _*),
              rankedB.filter($"__rk" > $"__budget").select(fcols: _*).as[FrontierEntry])
          }

        // ---- Q3: salted repartition before the fetch/parse map — parse is
        // the expensive, order-free stage and must never inherit the
        // selection layout. UNIFORM salting: every host's URLs spread over
        // `saltFanout` salts, so (a) host count alone cannot
        // under-partition the wave and (b) a hot domain cannot pin a
        // partition — skew handling without a per-wave histogram job. (A
        // real fetcher trading connection reuse for balance would lower
        // the fan; it never changes output — budget selection above stayed
        // strictly per-host.) 8x partitions keep parse tasks fine-grained
        // so the stage tail is one small task, not a third scheduling
        // round of the CPU-heavy parse.
        val nParts = 8 * math.max(1, spark.sessionState.conf.numShufflePartitions)
        val salted = selectedRaw.select(fcolsF: _*)
          .withColumn("__salt", pmod(xxhash64($"canonical_url"), lit(eng.saltFanout.toLong)))
          .repartition(nParts, $"host_hash", $"__salt")
          .drop("__salt")

        // ---- S3 + T1: fetch + parse (typed map over the synthetic web)
        // through the FAILURE CHANNEL: status ok|transient|permanent|
        // redirect — spans only on success, links on success (outlinks) or
        // redirect (the single Location target). Deterministic per (url,
        // attempts), so any parallelism yields the same outcomes.
        val maxAtt = cfg.maxFetchAttempts
        val scope = cfg.scope
        // the span fingerprint feeds content-seen dedup AND the adaptive
        // revisit changed/unchanged test — computed in the fetch map where
        // the spans are in hand, so neither consumer touches them again
        val needChash = cdupActive || revisitAdaptive
        val outcomes = salted
          .as[FrontierEntry]
          .mapPartitions { it =>
            it.map { e =>
              val pid = org.apache.spark.TaskContext.getPartitionId()
              fetcher.fetchAttempt(e.canonical_url, e.attempts, e.generation) match {
                case Fetched(spans, raw) =>
                  // resolve outlinks in document order, then SCOPE-filter
                  // (before the depth cap and seen-set, like the oracle):
                  // `links` carries only in-scope links; the filtered
                  // count rides as a column into the fetchStats rollup.
                  // Content fingerprint computed here, where the spans are
                  // in hand — the dedup tagging downstream never touches
                  // them.
                  val resolved = raw.map(r => CanonicalUrl.resolve(e.canonical_url, r))
                  val links = resolved.filter(scope.allows)
                  (e.canonical_url, e.host, e.host_hash, e.priority,
                    e.discovery_time, e.depth, e.attempts, e.generation,
                    e.revisit_interval, e.revisit_hash,
                    "ok", spans, links,
                    resolved.size - links.size, null.asInstanceOf[String], pid,
                    if (needChash) ContentHash.ofSpans(spans) else 0L)
                case TransientFetchError =>
                  (e.canonical_url, e.host, e.host_hash, e.priority,
                    e.discovery_time, e.depth, e.attempts, e.generation,
                    e.revisit_interval, e.revisit_hash,
                    "transient",
                    Vector.empty[Span], Vector.empty[String], 0,
                    null.asInstanceOf[String], pid, 0L)
                case PermanentFetchError =>
                  (e.canonical_url, e.host, e.host_hash, e.priority,
                    e.discovery_time, e.depth, e.attempts, e.generation,
                    e.revisit_interval, e.revisit_hash,
                    "permanent",
                    Vector.empty[Span], Vector.empty[String], 0,
                    null.asInstanceOf[String], pid, 0L)
                case Redirected(raw) =>
                  // the Location target rides as this page's single link
                  // (scope/dedup/robots/depth+1 downstream, exactly like
                  // an outlink); no spans, no trace. The resolved target
                  // also rides separately for the redirects alias table —
                  // recorded even when scope-filtered out of `links`.
                  val c = CanonicalUrl.resolve(e.canonical_url, raw)
                  val (links, nf) =
                    if (scope.allows(c)) (Vector(c), 0) else (Vector.empty[String], 1)
                  (e.canonical_url, e.host, e.host_hash, e.priority,
                    e.discovery_time, e.depth, e.attempts, e.generation,
                    e.revisit_interval, e.revisit_hash,
                    "redirect",
                    Vector.empty[Span], links, nf, c, pid, 0L)
              }
            }
          }
          .toDF("canonical_url", "host", "host_hash", "priority",
            "discovery_time", "depth", "attempts", "generation",
            "revisit_interval", "revisit_hash",
            "status", "spans", "links",
            "__nfilt", "__rtarget", "__pid", "__chash")
          .cache()
        val fetched = outcomes.filter($"status" === "ok")

        // ---- Q4: wave trace numbering (two-phase rank, no global window)
        // AFTER the fetch, over the LIGHT columns of successful fetches
        // only: failed attempts are never traced, and per-wave seq stays
        // dense 1..n over successes in frontier order — identical to the
        // oracle's success counter. Spans/links never ride this shuffle.
        // above-2^20 numbering stages checkpoint internally; collect them
        // for the two-generation release (they back the trace append and
        // the discovery chain until this wave's commit is awaited)
        var waveSeqCkpts: List[DataFrame] = Nil
        val wTrace = withGlobalSeq(
          fetched.select($"canonical_url", $"host", $"priority", $"discovery_time"),
          Seq("priority", "discovery_time", "canonical_url"), "__seq0",
          sizeHint = pendingCount, onCheckpoint = ck => waveSeqCkpts ::= ck,
          windowMax = eng.seqWindowMax)
          .select(lit(wave).as("wave"), ($"__seq0" + 1L).as("seq"), $"host", $"canonical_url")
          .as[TraceRow]

        val maxDepthL = cfg.maxDepth.toLong
        val tFetch0 = System.nanoTime()
        // one job over the cached fetch output: per-partition fetch lineage
        // counts, the candidate-link total, and the failure/requeue totals
        // (map-side agg, tiny result)
        val fetchStats = outcomes.groupBy($"__pid")
          .agg(count(lit(1)).as("sel"),
            sum(when($"status" === "ok", 1L).otherwise(0L)).as("ok"),
            sum(when($"status".isin("ok", "redirect"), size($"links"))
              .otherwise(0)).cast("long").as("cands"),
            sum(when($"status" === "transient" && $"attempts" + 1 < maxAtt, 1L)
              .otherwise(0L)).as("requeued"),
            sum(when($"status" === "permanent" ||
                ($"status" === "transient" && $"attempts" + 1 >= maxAtt), 1L)
              .otherwise(0L)).as("errored"),
            sum(when($"status" === "redirect", 1L).otherwise(0L))
              .as("redirected"),
            // all links of a source land at the SAME depth (src.depth+1),
            // so the depth-capped candidate count is a per-source-row sum
            sum(when($"status".isin("ok", "redirect") &&
                $"depth".cast("long") + 1L > maxDepthL, size($"links"))
              .otherwise(0)).cast("long").as("capped"),
            sum($"__nfilt").cast("long").as("filtered"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
        val selectedTotal = fetchStats.map(_._2).sum
        val fetchedThisWave = fetchStats.map(_._3).sum
        val candTotal = fetchStats.map(_._4).sum
        val requeuedTotal = fetchStats.map(_._5).sum
        val erroredTotal = fetchStats.map(_._6).sum
        val redirectedTotal = fetchStats.map(_._7).sum
        val cappedTotal = fetchStats.map(_._8).sum
        val filteredTotal = fetchStats.map(_._9).sum

        // transient failures with attempts left re-enter the frontier with
        // the SAME ordering keys and attempts+1 (they compete under the
        // host budget again in later waves); exhausted/permanent failures
        // become error rows — in seen, never fetched again
        val retryable = $"status" === "transient" && $"attempts" + 1 < maxAtt
        val requeued = outcomes.filter(retryable)
          .withColumn("attempts", ($"attempts" + 1).cast("int"))
          .select(fcolsF: _*)
        // the URL-alias edge list: every followed redirect, target in
        // resolved absolute form (recorded regardless of the target's
        // admission outcome — see [[RedirectRow]])
        val redirectRows = outcomes.filter($"status" === "redirect")
          .select(lit(wave).as("wave"), $"canonical_url", $"host",
            $"__rtarget".as("target_url"))
        val errorRows = outcomes
          .filter(!$"status".isin("ok", "redirect") && !retryable)
          .select(lit(wave).as("wave"), $"canonical_url", $"host",
            when($"status" === "permanent", lit("permanent"))
              .otherwise(lit("transient_exhausted")).as("kind"),
            ($"attempts" + 1).cast("int").as("attempts"))

        // the previous wave's commit + bloom delta must land before the
        // bloom probe below (a stale bloom could answer "definitely new"
        // for a URL admitted last wave — a false negative) AND before the
        // content-seen check (store mode reads the content_seen table,
        // which must cover last wave's fingerprints); the selection and
        // fetch stages above overlapped with that write.
        awaitInFlight()

        // ---- content-seen dedup tagging (cfg.contentDedup, oracle model
        // point 11): fingerprint-match each SUCCESS against the
        // content-seen registry (cross-wave owner wins) and within the
        // wave (first in frontier order wins — the same total order the
        // trace uses, so the in-wave owner is the earlier-traced page).
        // LIGHT columns only: spans never ride the content_hash window
        // shuffle; the registry join follows the standard driver-tracked
        // broadcast-hint-or-shuffle policy. Duplicates keep their trace
        // row (the fetch happened and consumed its politeness slot) but
        // contribute no doc and no candidates below.
        val contentTagged: Option[DataFrame] =
          if (!cdupActive) None
          else {
            // cross-wave registry: chained in-memory state, or (store
            // mode, the 10^10 path) a scan of the shard-clustered
            // content_seen table pruned to the bands this wave's
            // fingerprints touch — the awaitInFlight above means the
            // table covers every prior wave, so no in-flight delta arm
            val stateDf =
              if (!contentStore) contentSeenState
              else {
                val active = fetched
                  .select(pmod($"__chash", lit(nsh.toLong)).cast("int").as("s"))
                  .distinct().as[Int].collect()
                val base =
                  if (store.currentManifest.exists(_.tables.contains(ContentSeen)))
                    store.read(ContentSeen)
                  else emptyDf(spark, contentSeenSchema)
                pruneShards(base, active, nsh)
                  .select($"content_hash".as("__chash"),
                    $"canonical_url".as("__owner"))
              }
            val cwin = Window.partitionBy($"__chash")
              .orderBy($"priority", $"discovery_time", $"canonical_url")
            Some(fetched.select($"canonical_url", $"host", $"priority",
                $"discovery_time", $"depth", $"links", $"__nfilt", $"__chash")
              .withColumn("__crk", row_number().over(cwin))
              .withColumn("__cfirst", first($"canonical_url").over(cwin))
              .join(hintContent(stateDf), Seq("__chash"), "left")
              .withColumn("__dup_of",
                coalesce($"__owner", when($"__crk" > 1, $"__cfirst")))
              .cache())
          }

        // content-dup totals + the dup rows' already-counted link
        // contributions (one tiny agg over the cached tagging): a
        // duplicate's links are never explored, so they come OUT of the
        // candidate / depth-capped / scope-filtered arithmetic — the
        // oracle never evaluates them at all
        val (contentDupTotal, dupCands, dupCapped, dupNfilt) = contentTagged match {
          case None => (0L, 0L, 0L, 0L)
          case Some(t) =>
            val r = t.filter($"__dup_of".isNotNull)
              .agg(count(lit(1)),
                coalesce(sum(size($"links")).cast("long"), lit(0L)),
                coalesce(sum(when($"depth".cast("long") + 1L > maxDepthL,
                  size($"links")).otherwise(0)).cast("long"), lit(0L)),
                coalesce(sum($"__nfilt").cast("long"), lit(0L))).head()
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
        val candTotalEff = candTotal - dupCands
        val cappedTotalEff = cappedTotal - dupCapped
        val filteredTotalEff = filteredTotal - dupNfilt

        // docs: originals only. The dup-URL list is exact-counted above and
        // usually tiny relative to the wave, so the anti-join broadcasts
        // under the standard bound and the spans never shuffle; a
        // mirror-dominated wave degrades to the (then correctly-shaped)
        // shuffled anti-join. coalesce: the parse stage runs at 8x-cores
        // granularity for tail smoothing, but the docs FILES should be one
        // per core, not 8.
        val wDocsBase = fetched.select($"canonical_url".as("doc_id"), $"spans")
        val wDocs = (contentTagged match {
          case Some(t) if contentDupTotal > 0 =>
            val dupUrls = t.filter($"__dup_of".isNotNull)
              .select($"canonical_url".as("doc_id"))
            wDocsBase.join(
              if (contentDupTotal <= eng.robotsBroadcastMaxRows) broadcast(dupUrls)
              else dupUrls,
              Seq("doc_id"), "left_anti")
          case _ => wDocsBase
        }).coalesce(math.max(1, spark.sessionState.conf.numShufflePartitions))
          .as[Doc]

        // ---- outlink candidates with (source-page frontier keys,
        // link_idx) provenance — exactly the oracle's admission order
        // (successful pages in frontier order, links in document order),
        // without joining the trace numbering back in. Redirect rows bear
        // their Location target as link 0 — the target enters discovery at
        // the source's frontier position, same as the oracle. Depth cap:
        // a source at maxDepth contributes NO candidates (all its links
        // would land at depth+1 > maxDepth) — a coarse per-source filter
        // BEFORE the explode and dedup chain, so capped URLs never enter
        // the seen-set and a later shallower path can still admit them.
        // (Coalesced off the fine-grained parse blocks: the dedup chain is
        // cheap per row — 8x-cores task granularity would be pure overhead.)
        val candSrc: DataFrame = contentTagged match {
          case None =>
            outcomes.filter($"status".isin("ok", "redirect") &&
              $"depth".cast("long") + 1L <= maxDepthL)
          case Some(t) =>
            // content duplicates contribute no candidates (their links are
            // never explored); redirect rows are content-free and keep
            // their single Location link
            val c = Seq($"canonical_url", $"priority", $"discovery_time",
              $"depth", $"links")
            t.filter($"__dup_of".isNull).select(c: _*)
              .unionByName(outcomes.filter($"status" === "redirect").select(c: _*))
              .filter($"depth".cast("long") + 1L <= maxDepthL)
        }
        val candidates = candSrc
          .coalesce(math.max(1, spark.sessionState.conf.numShufflePartitions))
          .select($"priority".as("src_pri"), $"discovery_time".as("src_dt"),
            $"canonical_url".as("src_url"), $"depth",
            posexplode_outer($"links").as(Seq("link_idx", "url")))
          .filter($"url".isNotNull)
          .withColumn("host", udf((u: String) => CanonicalUrl.host(u)).apply($"url"))
          .withColumn("host_hash", xxhash64($"host"))
          .select($"url".as("canonical_url"), $"host", $"host_hash",
            ($"depth" + 1).as("depth"), $"src_pri", $"src_dt", $"src_url", $"link_idx")

        // ---- D1/D2: first-occurrence dedup across the wave (covers in-page):
        // keep the (source frontier keys, link_idx)-minimal sighting per
        // canonical_url — admission order, same as the oracle
        val firstSeen = firstSightings(candidates)

        // ---- D3: bloom/cuckoo pre-filter. broadcast mode: executor-local
        // probe of the broadcast filter (no shuffle of seen). lazy mode:
        // rows are repartitioned BY SHARD so each task touches ~1 shard,
        // then the probe lazily loads exactly those shard files through the
        // per-executor generation-keyed cache — membership tests never move
        // the seen-set OR the whole filter (north_star at 10^10 scale).
        // (Shared with the sitemap candidates below, whose rows join the
        // chain after robots acquisition.)
        def probeSeen(df: DataFrame): DataFrame =
          if (!useFilter) df.withColumn("__maybe", lit(true))
          else if (lazyFilters) {
            val ss = shardStore.get
            val gen = filterGen
            val probeU = udf((url: String, hh: Long) =>
              graft.sources.FilterShardStore.probe(ss, gen, url, hh))
            df
              .repartition(math.max(1, spark.sessionState.conf.numShufflePartitions),
                pmod($"host_hash", lit(nsh.toLong)))
              .withColumn("__maybe", probeU($"canonical_url", $"host_hash"))
          } else {
            val bloomLocal = bloomB
            val mightBeSeen =
              udf((url: String, hh: Long) => bloomLocal.value.mightContain(url, hh))
            df.withColumn("__maybe", mightBeSeen($"canonical_url", $"host_hash"))
          }
        val tagged = probeSeen(firstSeen).cache()
        // ---- S7 (fetchRobotsTxt mode): robots ACQUISITION inside the wave.
        // Hosts first encountered this wave get `<host>/robots.txt` fetched
        // through the PageFetcher ON EXECUTORS (robots fetch is network-
        // bound at scale, exactly like page fetch) and parsed there; only
        // the tiny (host, rules) rows reach the driver, which merges them
        // into the host-keyed broadcast BEFORE this wave's admission check.
        // Candidate hosts (pre-dedup) are a superset of admitted hosts —
        // resolving the superset is output-invariant (rules are a pure
        // function of host) and avoids an extra pass over the dedup chain.
        if (cfg.fetchRobotsTxt && !tableRobots) {
          val kb = knownHostsB
          val ab = acqWaveB
          val ttlW = if (ttlActive) cfg.robotsTtlWaves else 0
          val curW = wave
          // needs a fetch: never resolved, or (TTL on) resolution expired
          // — the stale-candidate half of model point 16
          val needsFetch = udf((h: String) =>
            !kb.value.contains(h) ||
              (ttlW > 0 && ab.value.getOrElse(h, curW) <= curW - ttlW))
          val newHosts = tagged.select($"host").distinct()
            .filter(needsFetch($"host")).as[String].collect()
          if (newHosts.nonEmpty) {
            robotsRefetchedThisWave += newHosts.count(knownHosts.contains)
            val resolved = fetchRobotsDistributed(spark, fetcher, userAgent,
              newHosts.toSeq, wave)
            val (r, b, k) = mergeHostRobots(resolved, configRules,
              cfg.wavePeriodSeconds, rulesByHost, budgetsByHost, knownHosts)
            rulesByHost = r; budgetsByHost = b; knownHosts = k
            robotsCur = spark.sparkContext.broadcast(rulesByHost)
            budgetsCur = spark.sparkContext.broadcast(budgetsByHost)
            knownHostsB = spark.sparkContext.broadcast(knownHosts)
            if (ttlActive) {
              acqWaveM = acqWaveM ++ newHosts.iterator.map(_ -> wave)
              acqWaveB = spark.sparkContext.broadcast(acqWaveM)
            }
          }
        }

        // table mode: FULLY DISTRIBUTED acquisition — new hosts found by
        // anti-join against the hosts table, robots fetched+parsed on
        // executors, rule/budget rows flow straight into this wave's
        // commit; no robots bytes ever reach the driver.
        val rulesKnown =
          if (!tableRobots) null
          else readRobots(spark, store, RobotsRules).unionByName(robotsDelta._1)
            .unionByName(ttlRuleRows)
        val hostsKnown =
          if (!tableRobots) null
          else readRobots(spark, store, RobotsHosts).unionByName(robotsDelta._2)
            .unionByName(ttlHostRows)
        var waveRobotsRes: Option[DataFrame] = None
        val (newRuleRows, newHostRows): (DataFrame, DataFrame) =
          if (!tableRobots || !cfg.fetchRobotsTxt)
            (emptyDf(spark, robotsRulesSchema), emptyDf(spark, robotsHostsSchema))
          else {
            // acquisition target: hosts never resolved — plus, with the
            // TTL on, known hosts whose LATEST resolution expired (the
            // stale-candidate half of model point 16; stale PENDING hosts
            // were already refreshed at wave start, so their latest row is
            // this wave's — fresh). Without the TTL this stays the plain
            // anti-join (no aggregate).
            val candHosts = tagged.select($"host").distinct()
            val acqTarget =
              if (!ttlActive)
                candHosts.join(hintRobots(hostsKnown.select($"host")),
                  Seq("host"), "left_anti")
              else
                candHosts.join(
                  hintRobots(hostsKnown.groupBy($"host")
                    .agg(max($"wave").as("__lw"))),
                  Seq("host"), "left")
                  .filter($"__lw".isNull ||
                    $"__lw" <= lit(wave - cfg.robotsTtlWaves))
            val staleCandCount =
              if (!ttlActive) 0L
              else acqTarget.filter($"__lw".isNotNull).count()
            robotsRefetchedThisWave += staleCandCount
            val (ruleRows, hostRows, res) = acquireRobotsDf(spark, fetcher,
              userAgent, configRulesB, wavePeriod,
              acqTarget.select($"host"),
              wave)
            // res is localCheckpointed inside acquireRobotsDf (plan
            // truncation for the wave-over-wave robotsDelta chain); its
            // blocks are freed two awaits later via the ckpt queue.
            waveRobotsRes = Some(res)
            // the ACTUAL acquired row count (hosts + their rules), not a
            // per-host heuristic: real robots.txt files carry dozens-to-
            // hundreds of rules, and the broadcast hint must switch off at
            // the row bound it claims to protect
            val stats = res.agg(count(lit(1)).as("h"),
              coalesce(sum(size($"rules")), lit(0L)).as("r")).head()
            robotsRowsApprox += stats.getLong(0) + stats.getLong(1)
            (ruleRows, hostRows)
          }

        // ---- SITEMAP ingestion (cfg.fetchSitemaps, oracle model point
        // 13): hosts making their first-EVER candidate appearance this
        // wave (anti-join vs the probed-host state) get ONE probe of
        // `http://<host>/sitemap.xml` — gated on the host's robots rules
        // allowing the "/sitemap.xml" path under the same resolution as
        // URL admission (broadcast probe or latest-wave-wins table join),
        // fetched + parsed ON EXECUTORS. The same-host entries enter THIS
        // wave's admission chain AFTER every page-derived candidate:
        // page sightings win the in-wave dedup (anti-join against the
        // page candidates), internal duplicates collapse to the least
        // (host, entry index) sighting, and the rows ride the same bloom
        // probe / seen anti-join / host cap / numbering / robots guards
        // as any discovered link, at depth 1.
        var smRes: Option[DataFrame] = None
        val (smProbed, smTotal): (Long, Long) =
          if (!smActive) (0L, 0L)
          else {
            val newSm = tagged.select($"host").distinct()
              .join(hintSm(smState), Seq("host"), "left_anti")
            val gated: DataFrame =
              if (!tableRobots) {
                val rb = robotsCur
                val gateU = udf((h: String) =>
                  RobotsEval.allowed(rb.value.getOrElse(h, Nil), "/sitemap.xml"))
                newSm.withColumn("__smok", gateU($"host"))
              } else {
                // probe the literal "/sitemap.xml" path through the shared
                // admission join (synthetic keys; only __allowed matters)
                val probe = newSm.select(
                  concat(lit("http://"), $"host", lit("/sitemap.xml"))
                    .as("canonical_url"),
                  $"host", xxhash64($"host").as("host_hash"),
                  lit(0).as("priority"), lit(0L).as("discovery_time"),
                  lit(0).as("depth"))
                robotsAdmissionJoin(spark, probe,
                  rulesKnown.unionByName(newRuleRows),
                  hostsKnown.unionByName(newHostRows), hintRobots)
                  .select($"host", $"__allowed".as("__smok"))
              }
            val res = probeSitemapsDf(spark, fetcher, gated, wave,
              useDirectives = cfg.fetchRobotsTxt)
            smRes = Some(res)
            val r = res.agg(count(lit(1)),
              coalesce(sum(size($"locs")), lit(0L))).head()
            (r.getLong(0), r.getLong(1))
          }
        val (locTagged, smInScopeTotal, smCappedTotal): (Option[DataFrame], Long, Long) =
          smRes match {
            case Some(res) if smTotal > 0 =>
              val rows = sitemapCandidateRows(res, scope)
              val smInScope = rows.filter($"__smok").count()
              if (maxDepthL < 1L) (None, smInScope, smInScope) // all capped
              else {
                val locFirst = firstSightings(rows.filter($"__smok").drop("__smok"))
                  .join(tagged.select($"canonical_url"), Seq("canonical_url"), "left_anti")
                (Some(probeSeen(locFirst).cache()), smInScope, 0L)
              }
            case _ => (None, 0L, 0L)
          }
        val smFilteredTotal = smTotal - smInScopeTotal
        // fold the sitemap candidates into the wave arithmetic exactly
        // like page links: evaluated entries extend the candidate total,
        // scope-filtered and depth-capped ones their counters; the
        // remainder classifies as deduped/host-capped/discovered
        // downstream, same as the oracle
        val candTotalAll = candTotalEff + smInScopeTotal
        val cappedTotalAll = cappedTotalEff + smCappedTotal
        val filteredTotalAll = filteredTotalEff + smFilteredTotal

        val taggedAll = locTagged.map(tagged.unionByName(_)).getOrElse(tagged)
        val definitelyNew = taggedAll.filter(!$"__maybe").drop("__maybe")
        val maybeSeen = taggedAll.filter($"__maybe").drop("__maybe")

        // ---- D4: exact anti-join of ONLY the bloom-maybe rows vs seen.
        // cached mode: in-memory slices. store mode (the 10^10-scale path):
        // scan the shard-clustered seen parquet, pruned by the shards the
        // maybe-rows actually touch (pushed to the parquet reader).
        val seenTbl =
          if (eng.seenStorage == "store") {
            val activeShards = maybeSeen
              .select(pmod($"host_hash", lit(nsh.toLong)).cast("int").as("s"))
              .distinct().as[Int].collect()
            pruneShards(store.read("seen"), activeShards, nsh)
              .select($"canonical_url")
          } else seenSlices.map(_.select($"canonical_url")).reduce(_ unionByName _)
        val confirmedNew = maybeSeen.join(seenTbl, Seq("canonical_url"), "left_anti")
        val newUrlsAll = definitelyNew.unionByName(confirmedNew)

        // ---- per-host ADMISSION CAP (guard order: scope → depth cap →
        // seen-dedup → HOST CAP → robots, oracle model point 10): rank the
        // wave's NEW urls per host in admission order — the same (source
        // frontier keys, link_idx) keys the discovery numbering uses — and
        // admit only while prior-admissions + in-wave-rank fit under the
        // cap. Capped rows are dropped HERE: they never enter seen and
        // never take a discovery_time (the numbering below runs post-cap),
        // so a later wave can cap-count a re-discovery again, exactly like
        // the oracle. The per-host window shuffles on host_hash — fine-
        // grained at scale (same shape as the selection budget window); the
        // counts join broadcasts only under the driver-tracked host bound.
        // Keyed by host_hash (the seen-set carries no host strings): a
        // 64-bit collision would conflate two hosts' counts — at the 10^7-
        // host design point P(any collision) ~ 3e-6, an accepted bias for
        // an anti-trap heuristic guard.
        val (newUrls, capTagged): (DataFrame, Option[DataFrame]) =
          if (!capActive) (newUrlsAll, None)
          else {
            val capWin = Window.partitionBy($"host_hash")
              .orderBy($"src_pri", $"src_dt", $"src_url", $"link_idx")
            val t = newUrlsAll
              .withColumn("__hrk", row_number().over(capWin))
              .join(hintCounts(hostCounts), Seq("host_hash"), "left")
              .withColumn("__room", lit(hostCap) - coalesce($"__hc", lit(0L)))
              .cache()
            (t.filter($"__hrk" <= $"__room").drop("__hrk", "__hc", "__room"),
              Some(t))
          }

        // ---- discovery numbering: global rank in admission order —
        // (source-page frontier keys, link_idx)
        val numbered = withGlobalSeq(newUrls,
          Seq("src_pri", "src_dt", "src_url", "link_idx"), "__rank",
          sizeHint = candTotalAll, onCheckpoint = ck => waveSeqCkpts ::= ck,
          windowMax = eng.seqWindowMax)
          .withColumn("discovery_time", $"__rank" + lit(nextSeq))
          .withColumn("priority", $"depth")
          .drop("__rank", "src_pri", "src_dt", "src_url", "link_idx")

        // ---- robots at admission (like the oracle): denied occupy seen
        // only. Broadcast mode: host-keyed map lookup + longest-prefix over
        // that host's few rules — O(rules-of-host) per URL, not O(|rules|).
        // Table mode: host-keyed JOIN against the rules table, then a
        // longest-prefix-wins aggregate per URL (max over
        // (prefix_len, -rule_order, allow); no matching rule -> allow) —
        // identical semantics, zero driver-resident rules.
        val tFetchMs = (System.nanoTime() - tFetch0) / 1e6
        val tDedup0 = System.nanoTime()
        val withRobots =
          if (!tableRobots) {
            val rb = robotsCur
            val allowedUdf = udf((u: String) =>
              RobotsEval.allowed(rb.value.getOrElse(CanonicalUrl.host(u), Nil),
                CanonicalUrl.path(u)))
            numbered.withColumn("__allowed", allowedUdf($"canonical_url")).cache()
          } else {
            // LATEST-WAVE-WINS resolution + longest-prefix admission join,
            // shared with the distributed seed path — see
            // [[robotsAdmissionJoin]].
            robotsAdmissionJoin(spark, numbered,
              rulesKnown.unionByName(newRuleRows),
              hostsKnown.unionByName(newHostRows), hintRobots)
              .cache()
          }
        val admitted = withRobots.filter($"__allowed")
          .select($"canonical_url", $"host", $"host_hash", $"priority",
            $"discovery_time", $"depth", lit(0).as("attempts"),
            lit(0).as("generation"), lit(0).as("revisit_interval"),
            lit(0L).as("revisit_hash"))
          .as[FrontierEntry]
        // one job: discovered + denied together
        val robotsCounts = withRobots.groupBy($"__allowed").count().collect()
          .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
        val discovered = robotsCounts.values.sum
        val denied = robotsCounts.getOrElse(false, 0L)
        // host-cap drop count (one tiny job over the cached cap ranking;
        // only when the cap is configured)
        val hostCappedTotal =
          capTagged.map(_.filter($"__hrk" > $"__room").count()).getOrElse(0L)

        // ---- host-BACKOFF update (oracle model point 12): per selected
        // host, the END-OF-WAVE consecutive transient-failure count is the
        // trailing run of transients in frontier order — a row counts iff
        // it and everything after it on its host failed transiently
        // (cumulative max of the reset flag over the DESC-ordered window,
        // LIGHT columns only). Hosts with any non-transient outcome reset
        // (the server answered); otherwise the prior count accumulates.
        // Crossing the threshold quarantines through wave+backoffWaves and
        // resets. Only rows whose state CHANGED survive: they ride the
        // commit (durable, latest-wave-wins) and replace their hosts in
        // the resident state below.
        val healthUpd: Option[DataFrame] =
          if (!backoffActive || selectedTotal == 0) None
          else {
            val b = backoffCfg.get
            val wDesc = Window.partitionBy($"host_hash")
              .orderBy($"priority".desc, $"discovery_time".desc,
                $"canonical_url".desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            val trailing = outcomes
              .select($"host_hash", $"priority", $"discovery_time",
                $"canonical_url",
                when($"status" === "transient", 0).otherwise(1).as("__nt"))
              .withColumn("__anyNT", max($"__nt").over(wDesc))
              .groupBy($"host_hash")
              .agg(sum(when($"__anyNT" === 0, 1L).otherwise(0L)).as("__trail"),
                max($"__nt").as("__reset"))
            Some(trailing.join(hintHealth(healthState), Seq("host_hash"), "left")
              .withColumn("__c1", when($"__reset" === 1, $"__trail")
                .otherwise(coalesce($"__consec", lit(0L)) + $"__trail"))
              .withColumn("__qr", $"__c1" >= b.failureThreshold)
              .select($"host_hash",
                when($"__qr", 0L).otherwise($"__c1").as("__consec2"),
                when($"__qr", lit(wave + b.backoffWaves))
                  .otherwise(coalesce($"__until", lit(0))).as("__until2"),
                coalesce($"__consec", lit(0L)).as("__pc"),
                coalesce($"__until", lit(0)).as("__pu"))
              .filter($"__consec2" =!= $"__pc" || $"__until2" =!= $"__pu")
              .cache())
          }
        // one tiny job (failing-host-sized): the changed-row count gates
        // the commit append; the max expiry feeds the selection fast path
        val (healthChangedCount, healthChangedMaxUntil) = healthUpd match {
          case None => (0L, 0)
          case Some(u) =>
            val r = u.agg(count(lit(1)), coalesce(max($"__until2"), lit(0))).head()
            (r.getLong(0), r.getInt(1))
        }

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
        // (fetched counts SUCCESSES; failed attempts are in the errors
        // table or requeued, and budget_deferred = selection shortfall)
        val deferredCount = pendingCount - backoffDeferredCount - selectedTotal
        val metricsRows = {
          val base = fetchStats.sortBy(_._1).map { case (pid, _, ok, _, _, _, _, _, _) =>
            WaveMetrics(wave, pid, ok, ok, 0L, 0L, 0L, 0L)
          }.toSeq
          val tail = WaveMetrics(wave, -1, 0L, 0L, discovered,
            // deduped = in-wave or vs-seen collapses (later in-wave
            // sightings of a host-capped URL count here, like the oracle)
            candTotalAll - cappedTotalAll - hostCappedTotal - discovered,
            denied, deferredCount)
          base :+ tail
        }

        // ---- commit the wave: pending COW, everything else appended. The
        // durable write (and the incremental bloom delta — executor-side
        // shard aggregation: bit arrays to the driver, never URL strings)
        // runs ASYNCHRONOUSLY, overlapped with the next wave's selection
        // and fetch stages; it is awaited before the next bloom probe.
        // backoff-deferred rows rejoin the frontier unchanged (they were
        // never selected, so MOR deltas carry no del for them either)
        val newPending = backoffDeferredDf
          .foldLeft(deferred.toDF().unionByName(admitted.toDF())
            .unionByName(requeued))(_ unionByName _)
          .localCheckpoint(false) // plan truncation, materialized at commit
        nextSeq += discovered
        fetchedTotal += fetchedThisWave
        // model point 14: every success (dup or not) schedules its
        // re-fetch — same keys, attempts reset, generation+1, due wave
        // stamped NOW (so an interval change at resume applies only to
        // fetches from then on). LIGHT columns off the cached outcomes.
        // Model point 15 (adaptive): the next interval is a row-local
        // expression over the carried (interval, fingerprint) and this
        // fetch's fingerprint — halve on change, double on unchanged,
        // clamped; generation-0 and pre-adaptive entries start from the
        // initial interval. Fixed mode keeps the single-due-wave literal
        // and records no state (zero columns), byte-identical to the
        // pre-adaptive rows.
        val newScheduled: Option[DataFrame] =
          if (!revisitActive || fetchedThisWave == 0) None
          else {
            val (dueCol, ivCol, hashCol) = cfg.revisitAdaptive match {
              case None =>
                (lit(wave + cfg.revisitEveryWaves),
                  lit(0), lit(0L))
              case Some(a) =>
                val ini = cfg.revisitEveryWaves
                val base = when($"revisit_interval" > 0, $"revisit_interval")
                  .otherwise(lit(ini))
                val ni = when($"generation" === 0, lit(ini))
                  .otherwise(when($"__chash" =!= $"revisit_hash",
                    greatest(lit(a.minWaves), floor(base / 2).cast("int")))
                    .otherwise(least(lit(a.maxWaves),
                      (base * 2).cast("int"))))
                (lit(wave) + ni, ni, $"__chash")
            }
            val s = fetched.select(
              dueCol.cast("int").as("due_wave"),
              $"canonical_url", $"host", $"host_hash", $"priority",
              $"discovery_time", $"depth",
              ($"generation" + 1).cast("int").as("generation"),
              ivCol.cast("int").as("revisit_interval"),
              hashCol.cast("bigint").as("revisit_hash"))
            // adaptive appends carry a RANGE of due waves (fixed mode: one
            // value) — cluster rows by due_wave within the written files
            // so the store-mode due scan's IN-filter still prunes on
            // parquet row-group stats
            val sSorted =
              if (revisitAdaptive) s.sortWithinPartitions($"due_wave") else s
            // store mode: these rows double as the next wave's in-flight
            // delta arm — checkpoint eagerly so the arm outlives the
            // outcomes cache (released at the next await)
            if (revisitStore) {
              val c = sSorted.localCheckpoint(false); c.count(); Some(c)
            } else Some(sSorted)
          }
        var supersededRevisitDelta: List[DataFrame] = Nil
        if (revisitStore && newScheduled.nonEmpty) {
          supersededRevisitDelta = List(revisitDelta)
          revisitDelta = newScheduled.get
          revisitDeltaInFlight = true
        }
        val commitBuilder = store.beginCommit()
        if (eng.pendingStorage == "mor") {
          // merge-on-read: append only this wave's (del=selected, add=
          // admitted) delta — delta-sized IO instead of a full frontier
          // rewrite; compact base+deltas once the chain passes the threshold
          val deltaDirs = store.currentManifest.get
            .tables.get(PendingDelta).map(_.dataDirs.size).getOrElse(0)
          if (deltaDirs + 1 >= eng.compactPendingEvery) {
            commitBuilder.replace(PendingBase, newPending)
              .replace(PendingDelta, emptyDelta(spark))
          } else {
            // a requeue is del(url, a, g) + add(url, a+1, g); a due revisit
            // re-entering this wave is a fresh add(url, 0, g+1): the delta
            // op sequence stays one-add-then-at-most-one-del PER (url,
            // attempts, generation) KEY, which is what the readPending
            // anti-join merges on
            val delRows = selectedRaw.select(fcolsF: _*)
              .withColumn("op", lit("del")).withColumn("w", lit(wave))
            val addRows = dueAdds
              .foldLeft(admitted.toDF().unionByName(requeued))(_ unionByName _)
              .withColumn("op", lit("add")).withColumn("w", lit(wave))
            // deltas land SORTED by canonical_url so the resume merge-join
            // in readPending reads clustered runs (and parquet gets tight
            // min/max stats on the join key)
            commitBuilder.append(PendingDelta,
              delRows.unionByName(addRows).sort($"canonical_url"))
          }
        } else commitBuilder.replace("pending", newPending)
        if (tableRobots) {
          // robots rows are crawl state: this wave's acquisitions (plus any
          // resume-bootstrap rows not yet durable) ride the wave commit;
          // until it lands, reads union them in as the in-flight delta
          // TTL re-fetch rows (wave-start pre-pass) ride this wave's
          // commit and the in-flight delta exactly like the in-wave
          // acquisitions
          val (rAcq, hAcq) =
            (ttlRuleRows.unionByName(newRuleRows),
              ttlHostRows.unionByName(newHostRows))
          val (rApp, hApp) = robotsUncommitted match {
            case Some((ur, uh)) =>
              (ur.unionByName(rAcq), uh.unionByName(hAcq))
            case None => (rAcq, hAcq)
          }
          robotsUncommitted = None
          commitBuilder.append(RobotsRules, rApp).append(RobotsHosts, hApp)
          robotsDelta = (rApp, hApp)
          robotsDeltaInFlight = true
        }
        if (erroredTotal > 0) commitBuilder.append("errors", errorRows)
        if (redirectedTotal > 0) commitBuilder.append("redirects", redirectRows)
        // outstanding revisit schedule rides the wave commit (consumed rows
        // need no delete — resume filters on due_wave >= the resumed wave)
        newScheduled.foreach(commitBuilder.append(RevisitDue, _))
        // probed hosts ride the wave commit (one row per host, ever —
        // appends across waves are disjoint by the anti-join above)
        if (smProbed > 0)
          commitBuilder.append(SitemapHosts,
            smRes.get.select($"host", lit(wave).as("wave")))
        // backoff state rides the wave commit: changed rows only,
        // wave-stamped, latest-wave-wins on read-back
        if (healthChangedCount > 0)
          commitBuilder.append(HostHealth, healthUpd.get.select($"host_hash",
            $"__consec2".cast("int").as("consec"),
            $"__until2".as("quarantined_until"), lit(wave).as("wave")))
        // content-dedup state rides the wave commit: the dup alias rows and
        // this wave's NEW fingerprints (every success is either a dup or a
        // new owner, so the owner count is pure arithmetic — no extra job)
        contentTagged.foreach { t =>
          if (contentDupTotal > 0)
            commitBuilder.append(Duplicates, t.filter($"__dup_of".isNotNull)
              .select(lit(wave).as("wave"), $"canonical_url", $"host",
                $"__dup_of".as("dup_of"), $"__chash".as("content_hash")))
          if (fetchedThisWave - contentDupTotal > 0)
            commitBuilder.append(ContentSeen, t.filter($"__dup_of".isNull)
              .select($"__chash".as("content_hash"), $"canonical_url",
                lit(wave).as("wave"),
                pmod($"__chash", lit(nsh.toLong)).cast("int").as("shard"))
              // clustered by hash band so the store-mode check prunes
              .repartition(col("shard")).sortWithinPartitions("shard"))
        }
        commitBuilder
          .append("seen", newSeen.repartition(col("shard")).sortWithinPartitions("shard"))
          .append("trace", wTrace.toDF())
          // wave = the doc VERSION stamp (revisits append new versions)
          .append("docs", wDocs.toDF().withColumn("wave", lit(wave)))
          .append("metrics", metricsRows.toDF())
          .summary(
            "wave" -> wave.toString,
            "shard_fan" -> eng.bloomShards.toString,
            "next_discovery_seq" -> nextSeq.toString,
            "fetched_total" -> fetchedTotal.toString,
            "wave_fetched" -> fetchedThisWave.toString,
            "wave_discovered" -> discovered.toString,
            "wave_denied" -> denied.toString,
            "wave_requeued" -> requeuedTotal.toString,
            "wave_errored" -> erroredTotal.toString,
            "wave_redirected" -> redirectedTotal.toString,
            "wave_depth_capped" -> cappedTotalAll.toString,
            "wave_scope_filtered" -> filteredTotalAll.toString,
            "wave_host_capped" -> hostCappedTotal.toString,
            "wave_content_dup" -> contentDupTotal.toString,
            "wave_backoff_deferred" -> backoffDeferredCount.toString,
            "wave_sitemap_urls" -> smTotal.toString,
            "wave_revisits" -> dueNow.toString,
            "wave_robots_refetched" -> robotsRefetchedThisWave.toString)
        val doDelta = useFilter && discovered > 0
        val filterNow = bloomB
        val genNow = filterGen
        val waveNow = wave
        inFlight = {
          import scala.concurrent.ExecutionContext.Implicits.global
          scala.concurrent.Future {
            val deltaFut: scala.concurrent.Future[Option[FilterUpdate]] =
              if (!doDelta) scala.concurrent.Future.successful(None)
              else if (lazyFilters) scala.concurrent.Future {
                // distributed delta write (+ distributed compaction once the
                // delta chain passes the threshold); the driver only tracks
                // the generation descriptor, never the bytes
                val ss = shardStore.get
                ss.writeShardFiles(newSeen, ss.deltaDir(waveNow))
                val g2 = genNow.copy(deltaWaves = genNow.deltaWaves :+ waveNow)
                val g3 =
                  if (g2.deltaWaves.size >= eng.compactFiltersEvery) ss.compact(spark, g2)
                  else g2
                Some(NewGen(g3)): Option[FilterUpdate]
              } else scala.concurrent.Future {
                val shardRows = newSeen
                  .withColumn("__shard", pmod($"host_hash", lit(nsh.toLong)).cast("int"))
                  .groupBy($"__shard").agg(buildShardAgg().as("bits"))
                  .collect()
                Some(NewBroadcast(mergeShards(filterNow.value, shardRows))): Option[FilterUpdate]
              }
            commitBuilder.commit()
            scala.concurrent.Await.result(deltaFut,
              scala.concurrent.duration.Duration.Inf)
          }
        }
        carriedPendingCount = Some(deferredCount + backoffDeferredCount +
          (discovered - denied) + requeuedTotal)
        val supersededPending = pendingDF
        pendingDF = newPending
        // fold this wave's admissions (newSeen: admitted + robots-denied —
        // both occupy seen, both count) into the per-host counts and
        // re-checkpoint. Materialized NOW via count(): a lazy checkpoint
        // would recompute through the superseded counts checkpoint after
        // the release queue frees it (and through this wave's caches). The
        // count is also the exact row bound for the next broadcast hint.
        // The superseded checkpoint rides the two-generation queue (its
        // last consumer, this wave's capTagged cache, dies one await
        // earlier); wave 1's superseded "checkpoint" is the init groupBy
        // plan, for which the release is a no-op.
        val supersededCounts = if (capActive) List(hostCounts) else Nil
        if (capActive) {
          hostCounts = hostCounts
            .unionByName(newSeen.groupBy($"host_hash").agg(count(lit(1)).as("__hc")))
            .groupBy($"host_hash").agg(sum($"__hc").as("__hc"))
            .localCheckpoint(false)
          capHostsApprox = hostCounts.count()
        }
        // fold this wave's new fingerprints into the content-seen state and
        // re-checkpoint, same eager-materialization discipline (and exact
        // broadcast-hint bound) as the host-cap counts above
        // every success is either a dup or a new owner, so the wave's new
        // fingerprint count is pure arithmetic; a zero-owner wave (all
        // failures/redirects/duplicates) keeps the existing checkpoint —
        // re-copying the O(registry) state for an empty union would cost
        // an input-sized checkpoint on the wave critical path for nothing
        val newOwnerCount = if (cdupActive) fetchedThisWave - contentDupTotal else 0L
        val supersededContent =
          if (cdupActive && !contentStore && newOwnerCount > 0)
            List(contentSeenState)
          else Nil
        // PARTITION BOUND on every union-chained state: a union
        // concatenates its parents' partitions, so without the coalesce
        // each wave's re-checkpoint would carry ~fetch-stage-width MORE
        // (near-empty) partitions than the last — wave w would pay O(w)
        // tasks just to copy state (measured: the endurance probe's rdd
        // block count grew ~190/wave while bytes stayed flat). coalesce
        // is shuffle-free and output-invariant here (every consumer
        // re-orders by explicit keys); the seen append has always done
        // this (see the parse-fan coalesce above).
        def boundParts(df: DataFrame): DataFrame =
          df.coalesce(math.max(1, spark.sessionState.conf.numShufflePartitions))
        if (cdupActive && !contentStore && newOwnerCount > 0) {
          contentSeenState = boundParts(contentSeenState
            .unionByName(contentTagged.get.filter($"__dup_of".isNull)
              .select($"__chash", $"canonical_url".as("__owner"))))
            .localCheckpoint(false)
          contentRowsApprox = math.max(1L, contentSeenState.count())
        } else if (cdupActive && contentStore) {
          // store mode keeps no resident state: just track the growth
          contentRowsApprox += math.max(0L, newOwnerCount)
        }
        // replace changed hosts in the resident backoff state and drop
        // rows back at the healthy default (consec 0, quarantine expired) —
        // the state holds only unhealthy hosts. Same eager-materialization
        // discipline as the counts/content states above; the count doubles
        // as the hint bound.
        val supersededHealth =
          if (backoffActive && healthChangedCount > 0) List(healthState) else Nil
        if (backoffActive && healthChangedCount > 0) {
          val changedKeys = healthUpd.get.select($"host_hash")
          healthState = healthState
            .join(if (healthChangedCount <= eng.robotsBroadcastMaxRows)
              broadcast(changedKeys) else changedKeys,
              Seq("host_hash"), "left_anti")
            .unionByName(healthUpd.get.select($"host_hash",
              $"__consec2".as("__consec"), $"__until2".as("__until")))
            .filter($"__consec" > 0 || $"__until" > wave)
            .localCheckpoint(false)
          healthRowsApprox = math.max(1L, healthState.count())
          healthMaxUntil = math.max(healthMaxUntil, healthChangedMaxUntil)
        }
        // fold this wave's probed hosts into the sitemap state and
        // re-checkpoint — same eager-materialization discipline (and exact
        // broadcast-hint bound) as the other host-dimension states; the
        // release of the initial parquet-read "checkpoint" is a no-op
        val supersededSm =
          if (smActive && smProbed > 0) List(smState) else Nil
        if (smActive && smProbed > 0) {
          smState = boundParts(smState.unionByName(smRes.get.select($"host")))
            .localCheckpoint(false)
          smRowsApprox = math.max(1L, smState.count())
        }
        // fold this wave's new schedule rows into the revisit state and
        // DROP the rows consumed this wave (they re-entered the frontier
        // above — leaving them would re-pull them every later wave); same
        // eager-materialization discipline as the other chained states.
        // Driver counts update in lockstep — they are the stop condition
        // and the per-wave due gate.
        val revisitChanged = revisitActive && !revisitStore &&
          (dueNow > 0 || newScheduled.nonEmpty)
        val supersededRevisit =
          (if (revisitChanged) List(revisitState) else Nil) ++
            supersededRevisitDelta
        if (revisitChanged) {
          val kept = revisitState.filter($"due_wave" > wave)
          revisitState = boundParts(
            newScheduled.map(kept.unionByName).getOrElse(kept))
            .localCheckpoint(false)
          revisitState.count()
        }
        if (revisitActive && newScheduled.nonEmpty) {
          if (revisitAdaptive) {
            // adaptive due waves vary per row — one tiny job over the
            // cached/checkpointed schedule rows for exact per-due-wave
            // counts (result is at most log2(max/min)+1 distinct waves)
            newScheduled.get.groupBy($"due_wave").count().collect()
              .foreach { r =>
                val dw = r.getInt(0)
                scheduleCounts.update(dw,
                  scheduleCounts.getOrElse(dw, 0L) + r.getLong(1))
              }
          } else {
            val dw = wave + cfg.revisitEveryWaves
            scheduleCounts.update(dw,
              scheduleCounts.getOrElse(dw, 0L) + fetchedThisWave)
          }
          revisitOutstanding += fetchedThisWave
        }
        prevWaveCaches = List(ranked.toDF(), outcomes, tagged, withRobots) ++
          capTagged ++ contentTagged ++ backoffMarked ++ healthUpd ++ locTagged
        ckptPrev = ckptPrev ++ ckptCur
        ckptCur = List(supersededPending) ++ waveRobotsRes ++ ttlRes ++
          bootstrapRes ++
          waveSeqCkpts ++ supersededCounts ++ supersededContent ++
          supersededHealth ++ smRes ++ supersededSm ++ supersededRevisit ++
          (if (cachedSeen) Nil else List(newSeen)) // cached mode: slices own it
        bootstrapRes = Nil
        if (cachedSeen) {
          seenSlices :+= newSeen
          maxSeenSlices = math.max(maxSeenSlices, seenSlices.size)
          if (seenSlices.size > eng.rerootSeenEvery) {
            // re-root: the in-flight commit carries this wave's seen append,
            // so after the await the store's seen table == the slice union.
            // Slices mix cache()d store reads and localCheckpointed per-wave
            // appends — release both forms (see the ckpt queue note).
            //
            // MATERIALIZE-BEFORE-RELEASE: on a MOR delta-only wave the
            // commit never evaluates newPending (only the delta rows), so
            // it is still a LAZY localCheckpoint whose recompute path runs
            // through this wave's caches, the seen slices released below,
            // and the previous wave's robots-res checkpoint in ckptPrev —
            // all freed by this very block. Force it into real checkpoint
            // blocks first (cheap: every input is still cached), so the
            // next wave reads blocks instead of recomputing into freed,
            // non-recomputable ones. COW commits materialize it anyway;
            // the count is then a near-free checkpoint-block scan.
            newPending.count()
            awaitInFlight()
            seenSlices.foreach { s =>
              s.unpersist()
              org.apache.spark.sql.graftshim.SqlShim.unpersistLocalCheckpoint(s)
            }
            seenSlices =
              Vector(store.read("seen").select($"canonical_url", $"host_hash").cache())
          }
        }
        if (eng.verbose) {
          val ms = (System.nanoTime() - waveT0) / 1e6
          val commitMs = (System.nanoTime() - tCommit0) / 1e6
          println(f"[engine] wave=$wave fetched=$fetchedThisWave discovered=$discovered " +
            f"denied=$denied deferred=$deferredCount ms=$ms%.0f " +
            f"(fetch=$tFetchMs%.0f dedup=$tDedupMs%.0f commit-launch=$commitMs%.0f)")
        }
        onWaveEnd(wave)
        wave += 1
        wavesRun += 1
      }
    }
    // long-crawl hygiene: drop the in-memory seen slices (state re-roots
    // from the store on resume), release every remaining per-wave
    // checkpoint (the exit-path awaitInFlight ran, so no consumer
    // survives), and reclaim superseded filter generations
    (ckptPrev ++ ckptCur ++ bootstrapRes ++ Option(hostCounts) ++
      Option(contentSeenState) ++ Option(healthState) ++ Option(smState) ++
      Option(revisitState) ++ Option(revisitDelta) :+
      pendingDF)
      .foreach(org.apache.spark.sql.graftshim.SqlShim.unpersistLocalCheckpoint)
    seenSlices.foreach { s =>
      s.unpersist()
      org.apache.spark.sql.graftshim.SqlShim.unpersistLocalCheckpoint(s)
    }
    if (lazyFilters)
      shardStore.get.cleanupBelow(filterGen.baseVersion, filterGen.deltaWaves.toSet)
    RunHandle(store, wavesRun, fetchedTotal, filterBroadcasts, maxSeenSlices,
      hintRobots.applied, hintRobots.withheld, hintCounts.applied,
      hintCounts.withheld, hintContent.applied, hintContent.withheld,
      hintHealth.applied, hintHealth.withheld,
      hintSm.applied, hintSm.withheld)
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
    *
    * The CONTENT-SEEN registry is deliberately NOT expired: it tracks
    * content, not URLs — a re-fetch of an expired URL whose content is
    * unchanged records a duplicate (dup_of = its own earlier fetch, whose
    * doc row the docs table still holds) rather than storing the content
    * twice.
    */
  /** Above this many targets the expiry filters switch from IN-list
    * literals (cheap, no shuffle, but each row compares against every
    * literal and the plan itself carries the list) to an anti-join against
    * a target Dataset (broadcast or shuffled by AQE as size dictates).
    */
  private[crawl] val ExpireJoinThreshold = 1000

  def expire(spark: SparkSession, storeRoot: String, urls: Seq[String]): Long = {
    import spark.implicits._
    val store = new SnapshotStore(storeRoot, spark)
    val m = store.currentManifest.getOrElse(
      throw new IllegalStateException(s"no snapshot at $storeRoot"))
    val targets = urls.map(CanonicalUrl.canonicalize).distinct
    val nBefore = store.read("seen").count()
    // large expiry batches (recrawl campaigns) must not inline 10^5 string
    // literals into the plan: anti-join instead
    val dropTargets: DataFrame => DataFrame =
      if (targets.size <= ExpireJoinThreshold)
        df => df.filter(!$"canonical_url".isin(targets: _*))
      else {
        val t = targets.toDF("canonical_url")
        df => df.join(t, Seq("canonical_url"), "left_anti")
      }
    val newSeen = dropTargets(store.read("seen"))
    // maintain the pending ⊆ seen invariant: a forgotten URL must not keep
    // a pending entry, or its rediscovery would double-admit it
    val newPending = dropTargets(readPending(spark, store))
    val c = store.beginCommit()
      .replace("seen", newSeen.repartition(col("shard")).sortWithinPartitions("shard"))
    // expiry rewrites the frontier either way → it is a compaction point
    if (m.tables.contains(PendingBase))
      c.replace(PendingBase, newPending).replace(PendingDelta, emptyDelta(spark))
    else c.replace("pending", newPending)
    // a forgotten URL must not keep a scheduled re-fetch either (the due
    // entry would re-enter pending while the URL is out of seen, breaking
    // the pending ⊆ seen invariant exactly like a kept pending row)
    if (m.tables.contains(RevisitDue))
      c.replace(RevisitDue, dropTargets(store.read(RevisitDue)))
    c.summary(m.summary.toSeq: _*)
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
    // doc versions carry their fetch wave; (doc_id, wave) is unique (one
    // fetch of a URL per wave), so the trace position of that fetch is the
    // version's oracle append order
    val docsV: Seq[(Doc, Int)] = store.read("docs")
      .select($"doc_id", $"spans", $"wave")
      .as[(String, Seq[Span], Int)].collect().toSeq
      .map { case (id, sp, w) => (Doc(id, sp), w) }
    val errors =
      if (store.currentManifest.exists(_.tables.contains("errors")))
        store.read("errors").as[ErrorRow].collect()
          .sortBy(e => (e.wave, e.canonical_url)).toSeq
      else Nil
    val redirects =
      if (store.currentManifest.exists(_.tables.contains("redirects")))
        store.read("redirects").as[RedirectRow].collect()
          .sortBy(r => (r.wave, r.canonical_url)).toSeq
      else Nil
    val duplicates =
      if (store.currentManifest.exists(_.tables.contains(Duplicates)))
        store.read(Duplicates).as[DuplicateRow].collect()
          .sortBy(d => (d.wave, d.canonical_url)).toSeq
      else Nil
    val traceOrder = trace.map(t => (t.canonical_url, t.wave)).zipWithIndex.toMap
    CrawlResult(trace, seen,
      docsV.sortBy { case (d, w) =>
        traceOrder.getOrElse((d.doc_id, w), Int.MaxValue)
      }.map(_._1), errors,
      redirects, duplicates)
  }
}
