package graft.crawl

import graft.functions.CanonicalUrl
import graft.util.XxHash64

import scala.collection.mutable

/** Per-wave totals the engine's per-partition metrics must roll up to. */
case class WaveTotals(
    wave: Int,
    fetched: Long,
    discovered: Long,
    deduped: Long,
    robots_denied: Long,
    budget_deferred: Long,
    redirected: Long = 0L,
    depth_capped: Long = 0L,
    scope_filtered: Long = 0L,
    host_capped: Long = 0L,
    content_dup: Long = 0L,
    backoff_deferred: Long = 0L,
    sitemap_urls: Long = 0L,
    revisits: Long = 0L,
    robots_refetched: Long = 0L)

/** Sequential, Spark-free oracle crawler — the BINDING semantics
  * (SURVEY.md §1.4; the reference mount is empty, so this deterministic
  * model derived from BASELINE.json north_star/input_hint is the spec the
  * distributed engine is tested against, bit-for-bit).
  *
  * Model:
  *  1. canonicalization: [[graft.functions.CanonicalUrl]] (RFC 3986).
  *  2. seen-set: a URL is new iff its canonical form was never admitted.
  *  3. frontier total order: (priority=depth ASC, discovery_time ASC,
  *     canonical_url ASC); discovery_time is a global admission counter
  *     (seeds take 0..n-1 in seed-list order).
  *  4. wave: for every host with pending URLs, the first min(B, pending)
  *     URLs in frontier order; trace order = selected set in frontier order.
  *  5. robots: checked at admission; denied URLs occupy the seen-set, are
  *     never enqueued, never fetched, never traced. In fetchRobotsTxt mode
  *     a host's rules come from fetching+parsing `<host>/robots.txt` on the
  *     host's FIRST admission-time encounter (config rules are the fallback
  *     for hosts serving none) — robots acquisition is part of the crawl.
  *  6. fetch+parse: [[PageFetcher.fetchAttempt]] with the entry's prior
  *     attempt count; on success, outlinks resolved against the base URL,
  *     admitted in (page trace order, link index) order — first occurrence
  *     wins (covers in-page and intra-wave dedup).
  *  7. FAILURE SEMANTICS: trace rows (seq 1..n within the wave, in
  *     frontier order) and docs exist only for SUCCESSFUL fetches; a
  *     transient failure requeues the entry with attempts+1 (same ordering
  *     keys — it competes again under the host budget in later waves)
  *     until maxFetchAttempts total attempts, then becomes a
  *     `transient_exhausted` error; a permanent failure errors
  *     immediately. Errored URLs stay in seen, are never fetched again,
  *     and land in `errors`. `fetched` counts successes only (incl. the
  *     maxUrls stop rule).
  *  8. REDIRECT SEMANTICS: a redirected fetch consumed its politeness
  *     slot but produced no document — the source stays in seen, is never
  *     traced/parsed/retried and is not an error; the Location target is
  *     admitted as the page's single discovered link (resolve →
  *     canonicalize → seen-dedup → robots, depth+1), so chains follow
  *     across waves and loops terminate at the seen-set.
  *  9. SCOPE + DEPTH guards at discovery, in that order: each resolved
  *     link must pass [[UrlScope]] (out-of-scope links never enter the
  *     crawl at all), then the [[CrawlConfig.maxDepth]] cap (capped links
  *     are dropped BEFORE the seen check — counted capped even if seen —
  *     and never occupy seen, so a later shallower path can admit them).
  *     Seeds bypass scope and are depth 0.
  * 10. HOST CAP ([[CrawlConfig.maxUrlsPerHost]], the anti-trap admission
  *     guard): a host's cumulative admission count = its seen-set entries
  *     (robots-denied included; seeds included). Checked AFTER the
  *     seen-dedup and BEFORE robots: a NEW URL on a full host is dropped
  *     without entering seen or taking a discovery_time — within a wave
  *     the first (cap − prior) new URLs of the host in admission order
  *     win. The first in-wave sighting of a capped URL counts
  *     host_capped; later sightings the same wave count deduped (they
  *     collapse in the engine's intra-wave dedup); a re-discovery in a
  *     LATER wave counts host_capped again. Seeds bypass the check but
  *     their admissions count toward it; counts persist across
  *     [[runPhased]] phases (the engine rebuilds them from seen on
  *     resume, capped or not).
  * 11. CONTENT-SEEN dedup ([[CrawlConfig.contentDedup]], the Mercator
  *     anti-mirror guard): each SUCCESSFUL fetch fingerprints its span
  *     sequence ([[ContentHash.ofSpans]]); a fingerprint's owner is the
  *     first URL fetched with it. A later fetch matching a known
  *     fingerprint is a DUPLICATE: it is traced (the fetch happened and
  *     consumed its politeness slot, and it counts toward maxUrls), but
  *     contributes no document, no outlinks (none of its links are
  *     scope-checked, depth-checked, deduped or admitted), and lands in
  *     the `duplicates` table with its owner. State persists across
  *     [[runPhased]] phases; with the flag OFF nothing is recorded, so a
  *     phase-2 enable dedups only against phase-2 content.
  * 12. HOST BACKOFF ([[CrawlConfig.hostBackoff]], the server-overload
  *     guard): per host, a CONSECUTIVE transient-failure count in frontier
  *     order, accumulated across waves; any non-transient outcome
  *     (success, redirect, permanent — the server answered) resets it. At
  *     END of wave, every host selected this wave whose count reached
  *     `failureThreshold` is quarantined through wave + `backoffWaves`
  *     (its pending URLs are not selected those waves — counted
  *     `backoff_deferred` — and re-enter unchanged afterwards) and its
  *     count resets to zero. State persists across [[runPhased]] phases;
  *     with the feature off nothing is recorded, so a phase-2 enable
  *     starts every host healthy (and a phase-2 disable ignores phase-1
  *     quarantines).
  * 13. SITEMAP ingestion ([[CrawlConfig.fetchSitemaps]]): every host, on
  *     its FIRST-EVER appearance among a wave's candidate URLs
  *     (post-scope, post-depth-cap, dedup outcome irrelevant; seeds
  *     included — the seed list is "wave 0"'s candidate set), is probed
  *     ONCE for `http://<host>/sitemap.xml` at END of the wave's page
  *     admissions — gated on the host's robots rules allowing the
  *     "/sitemap.xml" path. Hosts are probed in sorted order. DISCOVERY
  *     ([[graft.functions.Sitemap.discover]]): when the crawl fetches
  *     robots ([[CrawlConfig.fetchRobotsTxt]]), the robots body served
  *     at probe time is consulted for same-host `Sitemap:` declarations
  *     ([[graft.functions.RobotsTxt.sitemapUrls]] — declaration order,
  *     deduped, cross-host dropped); when any exist, they are the
  *     host's sitemap list — each fetched once WITHOUT a per-path
  *     robots gate (the declaration is the host's submission) and
  *     expanded at its own URL — and the well-known-path probe does not
  *     happen. Otherwise the robots-gated `/sitemap.xml` fallback
  *     applies; each
  *     sitemap's same-host entries ([[graft.functions.Sitemap.expand]] —
  *     an INDEX body at the probe path expands to the concatenation of
  *     its same-host children's entries in index document order, each
  *     child fetched once via [[PageFetcher.fetchSitemapAt]] under the
  *     host's single probe decision; nested/self-referencing index
  *     children and unserved children contribute nothing)
  *     are admitted in document order at depth 1 through the standard
  *     guards (scope → depth cap → seen-dedup → host cap → robots), so
  *     the wave's admission order is: every page-derived candidate, then
  *     (host ASC, entry index ASC). A probe happens once per host ever
  *     (sitemap or none, allowed or robots-denied), persists across
  *     [[runPhased]] phases; with the flag off nothing is recorded, so a
  *     phase-2 enable probes hosts on their next candidate re-encounter.
  * 14. REVISIT scheduling ([[CrawlConfig.revisitEveryWaves]], the Nutch
  *     re-fetch-interval recrawl loop): every SUCCESSFUL fetch (content
  *     duplicates included) at wave w schedules the URL's re-fetch at wave
  *     w + revisitEveryWaves — same ordering keys, attempts reset,
  *     generation+1 (the fetcher sees the generation: volatile pages serve
  *     changed content/links per generation, everything else is
  *     byte-identical). Due entries rejoin the frontier at the start of
  *     their due wave and compete under the host budget like any pending
  *     URL; the re-fetch is traced, counts toward maxUrls, and follows the
  *     standard outcome semantics — with [[CrawlConfig.contentDedup]] on,
  *     an unchanged page is a content duplicate of its own earlier fetch
  *     (self-aliasing `duplicates` row, no doc, no links); a changed page
  *     appends a new doc version and its links enter discovery; failures
  *     and redirects are terminal (no further revisits). Waves with
  *     nothing pending and nothing due are SILENT (not executed, not
  *     recorded — the crawl sleeps until the next due wave). The schedule
  *     persists across [[runPhased]] phases; a phase-2 interval change
  *     applies to fetches from then on (already-scheduled due waves keep
  *     their computed value), and a phase-2 DISABLE drops the outstanding
  *     schedule (the engine's resume-with-the-flag-off ignores it).
  * 15. ADAPTIVE revisit intervals ([[CrawlConfig.revisitAdaptive]], the
  *     Nutch AdaptiveFetchSchedule shape; only with revisitEveryWaves > 0,
  *     the initial interval): each scheduled entry carries the interval it
  *     was scheduled with and the span fingerprint of the fetch that
  *     scheduled it ([[FrontierEntry.revisit_interval]] /
  *     [[FrontierEntry.revisit_hash]] — state rides the frontier row,
  *     like Nutch's CrawlDb datum). A successful fetch schedules its next
  *     visit at: the initial interval (generation 0); max(minWaves,
  *     interval/2) when the fingerprint CHANGED; min(maxWaves,
  *     interval*2) when UNCHANGED — where `interval` falls back to the
  *     initial interval for entries scheduled while adaptive was off
  *     (whose carried interval is 0, and whose missing fingerprint makes
  *     the first adaptive re-fetch read as changed). With adaptive OFF,
  *     scheduling records no state (interval/fingerprint stay 0), so a
  *     phase-2 enable adapts forward only; a phase-2 disable keeps the
  *     schedule and fixes all future intervals at the initial value.
  * 16. robots TTL ([[CrawlConfig.robotsTtlWaves]], the RFC 9309 §2.4
  *     cache-validity rule): a robots resolution acquired at wave w0
  *     expires at wave w0 + ttl. Robots resolves at a host's FIRST
  *     CANDIDATE APPEARANCE (post-scope, post-depth-cap, dedup outcome
  *     irrelevant — the candidate-host superset the engine acquires for;
  *     seed hosts resolve at wave 0), and an expired host re-fetches at
  *     the next wave that needs it: at WAVE START when it has pending
  *     URLs (fresh Crawl-delay budgets bind at that wave's selection), or
  *     at its next candidate appearance (fresh rules bind at admission).
  *     Bodies may vary with the fetch wave
  *     ([[PageFetcher.fetchRobots(host:String,wave:Int)*]]); fresh state
  *     fully supersedes — a body that dropped its Crawl-delay drops the
  *     budget, one serving nothing falls back to config rules. URLs
  *     admitted under older rules still fetch (robots is admission-time,
  *     the refetchRobotsOnResume semantics). `robots_refetched` in
  *     [[WaveTotals]]. TTL 0 = never expire (one fetch per host, legacy).
  * 17. stop when frontier AND revisit schedule are empty, wave > maxWaves,
  *     or fetched >= maxUrls (checked at wave start).
  */
class RefCrawler(cfg: CrawlConfig) {

  /** Active config — [[runPhased]] swaps it at the phase boundary (models
    * the engine's resume-with-a-changed-world: new fetcher serving changed
    * robots bodies).
    */
  private var cur: CrawlConfig = cfg

  private var configRulesByHost: Map[String, Seq[RobotsRule]] =
    RobotsEval.byHost(cfg.robots)

  /** fetchRobotsTxt mode: per-host robots state — rules fetched+parsed
    * (config rules as fallback for hosts serving none), the
    * Crawl-delay-derived politeness budget, and the WAVE the resolution
    * was acquired at (model point 16: with [[CrawlConfig.robotsTtlWaves]]
    * the resolution expires ttl waves later and the host re-fetches on
    * next need). A host resolves at its FIRST CANDIDATE APPEARANCE
    * (post-scope, post-depth-cap, dedup outcome irrelevant — the same
    * population the engine's acquisition anti-join sees); seed hosts are
    * wave 0. One fetch per host while fresh (per phase, for hosts
    * [[runPhased]] invalidates at the boundary).
    */
  private val resolved = scala.collection.mutable
    .HashMap.empty[String, (Seq[RobotsRule], Option[Int], Int)]

  /** Wave the crawl is currently executing (0 during seed admission) —
    * the stamp on robots resolutions and the wave a time-varying robots
    * server derives its body from.
    */
  private var curWave: Int = 0

  /** Robots re-fetches this wave (model point 16) — rolled into
    * [[WaveTotals.robots_refetched]].
    */
  private var robotsRefetchedInWave: Long = 0L

  private def resolve(host: String): (Seq[RobotsRule], Option[Int], Int) =
    resolved.getOrElseUpdate(host,
      cur.fetcher.fetchRobots(host, curWave) match {
        case Some(txt) =>
          val p = graft.functions.RobotsTxt.parse(host, txt, cur.userAgent)
          (p.rules, p.crawlDelaySeconds.map(d =>
            graft.functions.RobotsTxt.budgetForDelay(d, cur.wavePeriodSeconds)),
            curWave)
        case None => (configRulesByHost.getOrElse(host, Nil), None, curWave)
      })

  /** Model point 16: re-resolve `host` now if its resolution has expired
    * (no-op while fresh, or with the TTL off, or for never-resolved hosts
    * — those resolve on first need and are trivially fresh).
    */
  private def refreshIfStale(host: String): Unit =
    if (cur.fetchRobotsTxt && cur.robotsTtlWaves > 0)
      resolved.get(host) match {
        case Some((_, _, w0)) if curWave - w0 >= cur.robotsTtlWaves =>
          resolved.remove(host)
          resolve(host)
          robotsRefetchedInWave += 1
        case _ => ()
      }

  private def rulesFor(host: String): Seq[RobotsRule] =
    if (!cur.fetchRobotsTxt) configRulesByHost.getOrElse(host, Nil)
    else resolve(host)._1

  /** Politeness budget: explicit config override > fetched Crawl-delay
    * (fetchRobotsTxt mode) > default.
    */
  def effectiveBudget(host: String): Int =
    cur.hostBudgets.getOrElse(host,
      (if (cur.fetchRobotsTxt) resolve(host)._2 else None)
        .getOrElse(cur.budgetPerHost))

  /** Longest matching path_prefix wins; ties by min rule_order; no rule
    * matching -> allow. (Shared evaluation: [[RobotsEval]].)
    */
  def robotsAllowed(canonicalUrl: String): Boolean = {
    val host = CanonicalUrl.host(canonicalUrl)
    val path = CanonicalUrl.path(canonicalUrl)
    RobotsEval.allowed(rulesFor(host), path)
  }

  def run(): (CrawlResult, Seq[WaveTotals]) = runPhased(Int.MaxValue, cfg)

  /** Two-phase run modelling the engine's resume-with-recency
    * ([[CrawlConfig.refetchRobotsOnResume]]): waves 1..switchAfterWave run
    * under the constructor config, then `cfg2` takes over (typically the
    * same crawl with a fetcher whose robots bodies CHANGED). At the
    * boundary, if cfg2 asks for refetch-on-resume, every host still
    * pending drops its cached robots state and re-resolves through cfg2's
    * fetcher on next use — fresh rules/Crawl-delay supersede; hosts not
    * pending keep their phase-1 state until (if ever) re-encountered...
    * which in table mode is never, because the hosts table suppresses
    * re-fetch (and this oracle's cache models exactly that).
    *
    * `clearAllResolvedOnSwitch` instead models BROADCAST-mode resume
    * (robots state is NOT persisted there): the resume forgets every
    * host's robots state, so pending hosts re-resolve in the resume
    * pre-pass and every other host re-resolves on its next encounter —
    * all through cfg2's fetcher. Recency is inherent to that mode.
    */
  def runPhased(switchAfterWave: Int, cfg2: CrawlConfig,
                clearAllResolvedOnSwitch: Boolean = false): (CrawlResult, Seq[WaveTotals]) = {
    val seen = mutable.HashSet.empty[String]
    // pending, keyed by host -> ordered buffer; order restored per wave by sort
    val pending = mutable.ArrayBuffer.empty[FrontierEntry]
    val trace = mutable.ArrayBuffer.empty[TraceRow]
    val docs = mutable.ArrayBuffer.empty[Doc]
    val errors = mutable.ArrayBuffer.empty[ErrorRow]
    val redirects = mutable.ArrayBuffer.empty[RedirectRow]
    val duplicates = mutable.ArrayBuffer.empty[DuplicateRow]
    // content fingerprint -> owning URL (model point 11); persists across
    // runPhased phases like the seen-set
    val contentSeen = mutable.HashMap.empty[Long, String]
    // host backoff state (model point 12): consecutive transient failures
    // and the wave through which the host is quarantined; mutated only
    // while cur.hostBackoff is set (feature-off phases record nothing)
    val consecFails = mutable.HashMap.empty[String, Int]
    val quarantinedUntil = mutable.HashMap.empty[String, Int]
    // sitemap state (model point 13): hosts ever probed (persists across
    // phases; mutated only while cur.fetchSitemaps — feature-off phases
    // record nothing) and the current wave's candidate-host set
    val sitemapDone = mutable.HashSet.empty[String]
    val waveCandidateHosts = mutable.HashSet.empty[String]
    val totals = mutable.ArrayBuffer.empty[WaveTotals]
    var nextSeq = 0L
    var fetchedTotal = 0L

    // admit: returns (discoveredDelta, dedupedDelta, deniedDelta).
    // Depth cap FIRST (before the seen check, matching the engine's
    // pre-dedup candidate filter): a capped candidate counts as capped
    // even if already seen, and never enters the seen-set — a later
    // shallower discovery can still admit it. Host cap AFTER the seen
    // check (model point 10): a new URL on a full host is dropped without
    // a seen entry or a seq; the wave-local set makes later in-wave
    // sightings of it read as dups, matching the engine's dedup-then-cap
    // chain.
    var cappedInWave = 0L
    var hostCappedInWave = 0L
    val hostAdmitted = mutable.HashMap.empty[String, Long]
    val hostCappedUrlsInWave = mutable.HashSet.empty[String]
    def admit(canonical: String, depth: Int, seed: Boolean = false): (Long, Long, Long) = {
      if (depth > cur.maxDepth) { cappedInWave += 1; (0L, 0L, 0L) }
      else {
        // model point 13: every candidate surviving scope + the depth cap
        // marks its host encountered this wave, dedup outcome irrelevant
        if (cur.fetchSitemaps)
          waveCandidateHosts += CanonicalUrl.host(canonical)
        // robots resolves at FIRST CANDIDATE APPEARANCE (the engine
        // acquires for the candidate-host superset — pre-dedup — so the
        // oracle pins the same fetch wave; output-invariant for
        // wave-invariant bodies, load-bearing for time-varying ones), and
        // an expired resolution refreshes here (model point 16)
        if (cur.fetchRobotsTxt) {
          val h = CanonicalUrl.host(canonical)
          refreshIfStale(h)
          resolve(h)
        }
        admitPostCap(canonical, depth, seed)
      }
    }
    def admitPostCap(canonical: String, depth: Int, seed: Boolean): (Long, Long, Long) = {
      if (seen.contains(canonical)) (0L, 1L, 0L)
      else {
        val host = CanonicalUrl.host(canonical)
        if (!seed && hostAdmitted.getOrElse(host, 0L) >= cur.maxUrlsPerHost) {
          if (hostCappedUrlsInWave.add(canonical)) { hostCappedInWave += 1; (0L, 0L, 0L) }
          else (0L, 1L, 0L)
        } else {
          seen += canonical
          hostAdmitted.update(host, hostAdmitted.getOrElse(host, 0L) + 1L)
          val seq = nextSeq
          nextSeq += 1
          if (robotsAllowed(canonical)) {
            pending += FrontierEntry(canonical, host, XxHash64.hashString(host),
              priority = depth, discovery_time = seq, depth = depth)
            (1L, 0L, 0L)
          } else (1L, 0L, 1L)
        }
      }
    }

    // model point 13: probe the wave's first-ever candidate hosts (sorted)
    // and admit their sitemap entries — AFTER every page-derived admission
    // of the wave. Returns (entries evaluated, scope-filtered, discovered,
    // deduped, denied); depth-capped entries count into cappedInWave via
    // admit(). A probe is recorded once per host ever, whatever it yields.
    def sitemapPass(probeWave: Int): (Long, Long, Long, Long, Long) = {
      var urls = 0L; var filt = 0L; var disc = 0L; var dd = 0L; var den = 0L
      if (cur.fetchSitemaps) {
        val hosts = waveCandidateHosts.toSeq.filterNot(sitemapDone).sorted
        hosts.foreach { h =>
          sitemapDone += h
          // discovery: robots-DECLARED `Sitemap:` directives first (read
          // from the robots body served at probe time — wave-granular,
          // identical bytes to the engine's executor-side read; only when
          // the crawl fetches robots at all), else the robots-gated
          // well-known-path probe. A declared sitemap is the host's own
          // submission: fetched without a per-path gate.
          val declared: Seq[String] =
            if (!cur.fetchRobotsTxt) Nil
            else cur.fetcher.fetchRobots(h, probeWave)
              .map(b => graft.functions.RobotsTxt.sitemapUrls(h, b))
              .getOrElse(Vector.empty[String])
          graft.functions.Sitemap.discover(h, declared,
              RobotsEval.allowed(rulesFor(h), "/sitemap.xml"),
              () => cur.fetcher.fetchSitemap(h),
              cur.fetcher.fetchSitemapAt).foreach { c =>
            urls += 1
            if (!cur.scope.allows(c)) filt += 1
            else {
              val (d, x, n) = admit(c, 1)
              disc += d; dd += x; den += n
            }
          }
        }
        waveCandidateHosts.clear()
      }
      (urls, filt, disc, dd, den)
    }

    cur.seeds.foreach(s => admit(CanonicalUrl.canonicalize(s), depth = 0, seed = true))
    sitemapPass(0) // seed hosts are wave 0's candidate set; counters discarded

    // revisit schedule (model point 14): (due wave, re-entry) — mutated only
    // while cur.revisitEveryWaves > 0; persists across phases, dropped on a
    // phase-2 disable
    val scheduled = mutable.ArrayBuffer.empty[(Int, FrontierEntry)]
    var wave = 1
    def maybeSwitch(): Unit =
      if (wave == switchAfterWave + 1 && (cur ne cfg2)) {
        cur = cfg2
        configRulesByHost = RobotsEval.byHost(cur.robots)
        if (clearAllResolvedOnSwitch) resolved.clear()
        else if (cur.fetchRobotsTxt && cur.refetchRobotsOnResume)
          pending.iterator.map(_.host).toSet[String].foreach(h => resolved.remove(h))
        if (cur.revisitEveryWaves == 0) scheduled.clear()
      }
    while ((pending.nonEmpty || scheduled.nonEmpty) && wave <= cur.maxWaves &&
           fetchedTotal < cur.maxUrls) {
      // model point 14: due revisits rejoin the frontier at wave start
      var revisitsIn = 0L
      var si = 0
      while (si < scheduled.length) {
        if (scheduled(si)._1 <= wave) {
          pending += scheduled(si)._2; scheduled.remove(si); revisitsIn += 1
        } else si += 1
      }
      if (pending.isEmpty) {
        // SILENT wave: nothing pending, nothing due yet — the crawl sleeps
        // to the next due wave; nothing executed, nothing recorded
        wave += 1
        maybeSwitch()
      } else {
      curWave = wave
      robotsRefetchedInWave = 0L
      // robots TTL pre-pass (model point 16): every PENDING host whose
      // resolution expired re-fetches at wave start — the fresh
      // Crawl-delay budget binds at THIS wave's selection and the fresh
      // rules at this wave's admissions (URLs already admitted still
      // fetch: robots is checked at admission)
      if (cur.fetchRobotsTxt && cur.robotsTtlWaves > 0)
        pending.iterator.map(_.host).toSet[String].foreach(refreshIfStale)
      // backoff gate (model point 12): quarantined hosts sit this wave out
      // entirely; their pending URLs are backoff-deferred, not
      // budget-deferred
      val eligible =
        if (cur.hostBackoff.isEmpty) pending.toIndexedSeq
        else pending.iterator
          .filter(e => quarantinedUntil.getOrElse(e.host, 0) < wave)
          .toIndexedSeq
      val backoffDeferred = (pending.size - eligible.size).toLong
      // wave selection: per host, first B in frontier order
      val byHost = eligible.groupBy(_.host)
      val selected = byHost.iterator.flatMap { case (host, entries) =>
        entries.sortBy(e => (e.priority, e.discovery_time, e.canonical_url))
          .take(effectiveBudget(host))
      }.toIndexedSeq
        .sortBy(e => (e.priority, e.discovery_time, e.canonical_url))
      val deferred = eligible.size - selected.size

      val selectedSet = selected.map(_.canonical_url).toSet
      pending.filterInPlace(e => !selectedSet.contains(e.canonical_url))

      var discovered = 0L
      var deduped = 0L
      var denied = 0L
      var fetchedThisWave = 0L
      var redirectedThisWave = 0L
      var filteredThisWave = 0L
      var contentDupThisWave = 0L
      cappedInWave = 0L
      hostCappedInWave = 0L
      hostCappedUrlsInWave.clear()
      // backoff bookkeeping: transient increments the host's consecutive
      // count, ANY other outcome resets it (the server answered)
      def noteOutcome(host: String, transient: Boolean): Unit =
        if (cur.hostBackoff.nonEmpty) {
          if (transient) consecFails.update(host, consecFails.getOrElse(host, 0) + 1)
          else consecFails.remove(host)
        }
      selected.foreach { e =>
        val outcome = cur.fetcher.fetchAttempt(e.canonical_url, e.attempts, e.generation)
        noteOutcome(e.host, outcome == TransientFetchError)
        outcome match {
          case Fetched(spans, rawLinks) =>
            fetchedThisWave += 1
            trace += TraceRow(wave, fetchedThisWave, e.host, e.canonical_url)
            // one fingerprint per fetch, shared by adaptive revisit and
            // content-seen dedup (0 when neither needs it)
            val ch =
              if (cur.contentDedup ||
                  (cur.revisitEveryWaves > 0 && cur.revisitAdaptive.nonEmpty))
                ContentHash.ofSpans(spans)
              else 0L
            // model point 14: every success (dup or not) schedules its
            // re-fetch — same keys, attempts reset, generation+1. Model
            // point 15: adaptive mode carries (next interval, this fetch's
            // fingerprint) on the entry; fixed mode carries (0, 0).
            if (cur.revisitEveryWaves > 0) {
              val (nextIv, nextHash) = cur.revisitAdaptive match {
                case None => (0, 0L)
                case Some(a) =>
                  val iv =
                    if (e.generation == 0) cur.revisitEveryWaves
                    else {
                      val base =
                        if (e.revisit_interval > 0) e.revisit_interval
                        else cur.revisitEveryWaves
                      if (ch != e.revisit_hash) math.max(a.minWaves, base / 2)
                      else math.min(a.maxWaves, base * 2)
                    }
                  (iv, ch)
              }
              val due = wave +
                (if (cur.revisitAdaptive.isEmpty) cur.revisitEveryWaves else nextIv)
              scheduled += ((due,
                e.copy(attempts = 0, generation = e.generation + 1,
                  revisit_interval = nextIv, revisit_hash = nextHash)))
            }
            // content-seen test (model point 11): a duplicate is traced —
            // the fetch happened — but stores no doc and follows no links
            val dup = cur.contentDedup && {
              contentSeen.get(ch) match {
                case Some(owner) =>
                  duplicates += DuplicateRow(wave, e.canonical_url, e.host, owner, ch)
                  contentDupThisWave += 1
                  true
                case None =>
                  contentSeen.update(ch, e.canonical_url)
                  false
              }
            }
            if (!dup) {
              docs += Doc(e.canonical_url, spans)
              rawLinks.foreach { raw =>
                val c = CanonicalUrl.resolve(e.canonical_url, raw)
                // scope filter FIRST (before the depth cap and seen check):
                // an out-of-scope link never enters the crawl at all
                if (!cur.scope.allows(c)) filteredThisWave += 1
                else {
                  val (d, dd, dn) = admit(c, e.depth + 1)
                  discovered += d; deduped += dd; denied += dn
                }
              }
            }
          case TransientFetchError =>
            if (e.attempts + 1 < cur.maxFetchAttempts)
              pending += e.copy(attempts = e.attempts + 1)
            else errors += ErrorRow(wave, e.canonical_url, e.host,
              "transient_exhausted", e.attempts + 1)
          case PermanentFetchError =>
            errors += ErrorRow(wave, e.canonical_url, e.host,
              "permanent", e.attempts + 1)
          case Redirected(raw) =>
            // consumed its politeness slot; never traced/parsed, not an
            // error, terminal for the source — the target is admitted as
            // this page's single discovered link (scope + dedup + robots +
            // depth+1, exactly like an outlink)
            val c = CanonicalUrl.resolve(e.canonical_url, raw)
            redirects += RedirectRow(wave, e.canonical_url, e.host, c)
            if (!cur.scope.allows(c)) filteredThisWave += 1
            else {
              val (d, dd, dn) = admit(c, e.depth + 1)
              discovered += d; deduped += dd; denied += dn
            }
            redirectedThisWave += 1
        }
      }
      // sitemap admissions (model point 13): after every page-derived
      // admission of the wave, ordered (host ASC, entry index ASC)
      val (smUrls, smFilt, smDisc, smDd, smDen) = sitemapPass(wave)
      filteredThisWave += smFilt
      discovered += smDisc; deduped += smDd; denied += smDen
      fetchedTotal += fetchedThisWave
      // backoff quarantine decision at END of wave (model point 12): only
      // hosts selected this wave can have changed their count; crossing
      // the threshold quarantines and resets
      cur.hostBackoff.foreach { b =>
        selected.iterator.map(_.host).toSet[String].foreach { h =>
          if (consecFails.getOrElse(h, 0) >= b.failureThreshold) {
            quarantinedUntil.update(h, wave + b.backoffWaves)
            consecFails.remove(h)
          }
        }
      }
      totals += WaveTotals(wave, fetchedThisWave, discovered, deduped, denied,
        deferred.toLong, redirectedThisWave, cappedInWave, filteredThisWave,
        hostCappedInWave, contentDupThisWave, backoffDeferred, smUrls,
        revisitsIn, robotsRefetchedInWave)
      wave += 1
      maybeSwitch()
      }
    }

    (CrawlResult(trace.toSeq, seen.toSet, docs.toSeq,
      errors.sortBy(e => (e.wave, e.canonical_url)).toSeq,
      redirects.sortBy(r => (r.wave, r.canonical_url)).toSeq,
      duplicates.sortBy(d => (d.wave, d.canonical_url)).toSeq), totals.toSeq)
  }
}
