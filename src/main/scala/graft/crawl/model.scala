package graft.crawl

/** Core data model — SURVEY.md §1.3, shapes pinned by BASELINE.json
  * input_hint (Doc/Span) and north_star (frontier key, trace, metrics).
  */

/** One content span of a parsed page. kind ∈ {text, media}; exactly one of
  * text/media_ref is non-null. offset = 0-based position in the page
  * (equal to array index — the per-row equality invariant compares
  * (kind, text, media_ref, order)).
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** A parsed document: doc_id = canonical URL. */
case class Doc(doc_id: String, spans: Seq[Span])

/** Frontier row. Priority = discovery depth (BFS level); discovery_time is
  * a monotonic logical sequence number (clock-free determinism) — the
  * frontier total order is (priority ASC, discovery_time ASC,
  * canonical_url ASC), per-host selection keyed by host_hash. `attempts`
  * counts PRIOR fetch attempts (transient-failure requeues re-enter with
  * attempts+1 and the same ordering keys); `generation` counts PRIOR
  * SUCCESSFUL fetches of the URL ([[CrawlConfig.revisitEveryWaves]]: a
  * scheduled revisit re-enters with generation+1, attempts reset to 0, and
  * the same ordering keys — a re-fetch competes under the host budget
  * exactly like the first fetch did). Neither participates in ordering or
  * selection; together with canonical_url they form the unique frontier
  * lifecycle key (the merge-on-read delta key).
  *
  * `revisit_interval` / `revisit_hash` are the ADAPTIVE-revisit state
  * ([[CrawlConfig.revisitAdaptive]]) and ride the frontier row exactly
  * like Nutch's CrawlDb datum carries fetchInterval + signature: a
  * scheduled re-fetch re-enters carrying the interval it was scheduled
  * with and the span-sequence fingerprint of its previous fetch, so at
  * fetch time the changed/unchanged decision and the next interval are
  * row-local — no state-table join, no matter how many waves the entry
  * sits budget-deferred. Both are 0 for never-revisited entries and for
  * everything scheduled while adaptive mode is off; neither participates
  * in ordering, selection, or the lifecycle key ((canonical_url,
  * generation) determines them functionally).
  */
case class FrontierEntry(
    canonical_url: String,
    host: String,
    host_hash: Long,
    priority: Int,
    discovery_time: Long,
    depth: Int,
    attempts: Int = 0,
    generation: Int = 0,
    revisit_interval: Int = 0,
    revisit_hash: Long = 0L)

/** Crawl-ordering trace: seq is 1-based within a wave. */
case class TraceRow(wave: Int, seq: Long, host: String, canonical_url: String)

/** URL-seen set row. */
case class SeenRow(canonical_url: String, host_hash: Long)

/** robots.txt-style rule: longest matching path_prefix for a host wins;
  * no matching rule -> allow.
  */
case class RobotsRule(host: String, path_prefix: String, allow: Boolean, rule_order: Int)

/** Longest-prefix robots evaluation shared by the oracle and the engine —
  * ONE definition so the semantics cannot drift. Input is the rules of ONE
  * host (callers probe a host-keyed map first — never a scan of the full
  * rule set per URL, which at 10^7 hosts would be a per-row full dimension
  * scan). Ties at equal prefix length go to the lowest rule_order; no
  * matching rule -> allow.
  */
object RobotsEval {
  def allowed(rulesOfHost: Seq[RobotsRule], path: String): Boolean = {
    var best: RobotsRule = null
    rulesOfHost.foreach { r =>
      if (path.startsWith(r.path_prefix) &&
          (best == null ||
           r.path_prefix.length > best.path_prefix.length ||
           (r.path_prefix.length == best.path_prefix.length &&
            r.rule_order < best.rule_order)))
        best = r
    }
    best == null || best.allow
  }

  /** Host-keyed index of a flat rule list (built once, probed per URL). */
  def byHost(rules: Seq[RobotsRule]): Map[String, Seq[RobotsRule]] =
    rules.groupBy(_.host)
}

/** Order-sensitive fingerprint of a parsed page's span sequence — the
  * CONTENT-SEEN key (the Mercator content-seen test's document hash). One
  * shared definition so the sequential oracle and every executor compute
  * the identical 64-bit value; two pages are "the same content" iff their
  * (kind, text, media_ref, offset) span sequences are equal, which is
  * exactly the per-row equality invariant the crawl contract pins.
  */
object ContentHash {
  def ofSpans(spans: Seq[Span]): Long = {
    // length-prefixed serialization: every field is rendered as
    // "<len>,<bytes>" (null as "-1,"), records closed by ';' after the
    // offset — unambiguous for ANY field content (parsed text may contain
    // any character, including would-be separators), so the serialization
    // is injective on the compared fields and hash equality means
    // span-sequence equality up to 64-bit collision odds
    val sb = new java.lang.StringBuilder(128)
    def f(s: String): Unit =
      if (s == null) sb.append("-1,")
      else sb.append(s.length).append(',').append(s)
    spans.foreach { s =>
      f(s.kind); f(s.text); f(s.media_ref)
      sb.append(s.offset).append(';')
    }
    graft.util.XxHash64.hashString(sb.toString)
  }
}

/** Per-wave, per-partition lineage + fetch/parse metrics (north_rule:
  * snapshots carry per-partition lineage and fetch/parse metrics).
  */
case class WaveMetrics(
    wave: Int,
    partition_id: Int,
    fetched: Long,
    parsed: Long,
    discovered: Long,
    deduped: Long,
    robots_denied: Long,
    budget_deferred: Long)

/** Outcome of one fetch attempt — the failure channel a real HTTP fetcher
  * needs (timeouts, 5xx, connection resets). Transient failures requeue
  * the URL for a later wave up to [[CrawlConfig.maxFetchAttempts]] total
  * attempts; permanent failures (4xx, malformed content) drop it
  * immediately. Either way a failed URL stays in the seen-set (it was
  * admitted) and is recorded in the `errors` table — never traced, never
  * parsed, its outlinks never discovered.
  */
sealed trait FetchOutcome extends Serializable
case class Fetched(spans: IndexedSeq[Span], rawLinks: IndexedSeq[String])
  extends FetchOutcome
case object TransientFetchError extends FetchOutcome
case object PermanentFetchError extends FetchOutcome
/** HTTP 3xx: the fetch consumed its politeness slot but yielded no
  * document — only a Location target (raw, resolved against the source
  * like any outlink). The source stays in seen, is never traced/parsed
  * and never retried; the target re-enters the frontier as ONE discovered
  * link of the source (canonicalize → seen-dedup → robots admission, at
  * depth+1), so chains follow across waves and loops terminate at the
  * seen-set — the frontier-re-entry treatment (Nutch-style), not
  * in-fetch hop following.
  */
case class Redirected(rawTarget: String) extends FetchOutcome

/** The fetch+parse contract: canonical URL -> ordered span array + raw
  * outlink strings in document order. The deterministic [[SyntheticFetcher]]
  * is the only implementation runnable in this sandbox (no network); a real
  * HTTP fetcher (connection pool per host, HTML parse, link extraction)
  * drops in behind the same trait without touching the engine — instances
  * are broadcast-serialized into the parse stage.
  */
trait PageFetcher extends Serializable {
  def fetchParse(canonicalUrl: String): (IndexedSeq[Span], IndexedSeq[String])

  /** One fetch attempt with a failure channel. `attempt` is the number of
    * PRIOR attempts for this URL (0 on first try) — deterministic fetchers
    * derive transient-failure outcomes from (url, attempt) so a retry can
    * succeed; a real fetcher ignores it. Default: infallible
    * [[fetchParse]], so fetchers without failure semantics (and every
    * pre-existing implementation) are unchanged.
    */
  def fetchAttempt(canonicalUrl: String, attempt: Int): FetchOutcome = {
    val (spans, links) = fetchParse(canonicalUrl)
    Fetched(spans, links)
  }

  /** One fetch attempt with the URL's re-fetch `generation` (the number of
    * PRIOR successful fetches — 0 on the first crawl of the URL, ≥1 on a
    * scheduled revisit, [[CrawlConfig.revisitEveryWaves]]). Deterministic
    * fetchers derive per-generation content/outcomes from it (a volatile
    * synthetic page changes per generation); a real fetcher ignores it —
    * the live web changes on its own. Default: delegate to the
    * generation-less channel, so every pre-existing implementation serves
    * identical content at every generation (the "unchanged page" case).
    */
  def fetchAttempt(canonicalUrl: String, attempt: Int, generation: Int): FetchOutcome =
    fetchAttempt(canonicalUrl, attempt)

  /** GET `http://<host>/robots.txt` AT a given crawl wave — the overload
    * the engine actually calls. `wave` is the wave the fetch happens in
    * (seed acquisition is wave 0): a time-varying robots server derives
    * its body from (host, wave), which keeps re-fetch semantics
    * ([[CrawlConfig.robotsTtlWaves]]) deterministic at any parallelism
    * and across resume in every storage mode — no fetch-counter state to
    * persist. The default ignores the wave, so every per-host fetcher
    * serves the same body at every wave (legacy behavior, byte-stable).
    */
  def fetchRobots(host: String, wave: Int): Option[String] = fetchRobots(host)

  /** GET `http://<host>/robots.txt` — the raw body, or None when the host
    * serves none (or it is unreachable, which RFC 9309 §2.3.1 treats as
    * allow-all). Pure per host in the sandbox implementation; a real
    * fetcher caches per host + TTL behind the same signature.
    */
  def fetchRobots(host: String): Option[String] = None

  /** GET `http://<host>/sitemap.xml` (the well-known probe path real
    * crawlers fall back to) — the raw XML body, or None when the host
    * serves none. Pure per host in the sandbox implementation; a real
    * fetcher would also follow robots.txt `Sitemap:` directives and
    * sitemap index files behind this signature.
    */
  def fetchSitemap(host: String): Option[String] = None

  /** GET an individual sitemap URL — a CHILD listed by an index file
    * served at the well-known path ([[graft.functions.Sitemap.expand]]).
    * None when the host does not serve it. Only ever called with
    * same-host URLs taken from an index body; legacy fetchers (urlset at
    * the probe path, or no sitemap at all) never receive a call.
    */
  def fetchSitemapAt(url: String): Option[String] = None
}

/** Deterministic sandbox fetcher over [[SyntheticWeb]] — incl. the
  * hash-derived failure injection when the web config enables it.
  */
case class SyntheticFetcher(web: SyntheticWeb.WebConfig) extends PageFetcher {
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    SyntheticWeb.fetchParse(url, web)
  override def fetchAttempt(url: String, attempt: Int): FetchOutcome =
    SyntheticWeb.fetchOutcome(url, attempt, web)
  override def fetchAttempt(url: String, attempt: Int, generation: Int): FetchOutcome =
    SyntheticWeb.fetchOutcome(url, attempt, web, generation)
  override def fetchRobots(host: String): Option[String] =
    SyntheticWeb.robotsTxt(host, web)
  override def fetchRobots(host: String, wave: Int): Option[String] =
    SyntheticWeb.robotsTxt(host, web, wave)
  override def fetchSitemap(host: String): Option[String] =
    SyntheticWeb.sitemapTxt(host, web)
  override def fetchSitemapAt(url: String): Option[String] =
    SyntheticWeb.sitemapAt(url, web)
}

/** One permanently failed fetch (transient retries exhausted, or a
  * permanent error): kind ∈ {transient_exhausted, permanent}; attempts =
  * total attempts made. Appended to the `errors` table at the failing
  * wave; part of the oracle-equality contract.
  */
case class ErrorRow(wave: Int, canonical_url: String, host: String,
                    kind: String, attempts: Int)

/** URL scope filter (Nutch urlfilter / Heritrix scope): a DISCOVERED link
  * must survive every rule to enter the crawl — checked on the resolved
  * absolute URL at discovery, BEFORE the depth cap and the seen-set, so an
  * out-of-scope URL never occupies seen. Seeds are operator-trusted and
  * bypass scope. Order: deny-suffix (case-insensitive, e.g. ".jpg"),
  * deny-pattern (java regex, unanchored find), then allow-patterns (if any
  * are set, the URL must match at least one). A pure, deterministic
  * function — identical in the sequential oracle and in executor tasks.
  * The two path-trap guards (Heritrix TooManyPathSegments /
  * PathologicalPath DecideRules): `maxPathSegments` denies URLs whose path
  * has more non-empty segments than the bound (the infinite-calendar /
  * deep-tree trap), `maxSegmentRepeat` denies URLs where any path segment
  * repeats CONSECUTIVELY more than the bound (the /a/a/a/... self-link
  * trap). Two more URL-shape guards every production filter chain carries
  * (the Nutch urlfilter length bound / query-string-explosion shapes):
  * `maxUrlLength` denies URLs longer than the bound (runaway generated
  * URLs), `maxQueryParams` denies URLs with more '&'-separated query
  * parameters than the bound (the faceted-search / session-id
  * combinatorial trap — each facet toggle mints a new URL of the same
  * page). 0 = guard off. Query strings are not path segments.
  */
case class UrlScope(
    denySuffixes: Seq[String] = Nil,
    denyPatterns: Seq[String] = Nil,
    allowPatterns: Seq[String] = Nil,
    maxPathSegments: Int = 0,
    maxSegmentRepeat: Int = 0,
    maxUrlLength: Int = 0,
    maxQueryParams: Int = 0) {
  @transient private lazy val denyRe =
    denyPatterns.map(java.util.regex.Pattern.compile)
  @transient private lazy val allowRe =
    allowPatterns.map(java.util.regex.Pattern.compile)
  @transient private lazy val denySfx = denySuffixes.map(_.toLowerCase)
  def isUnbounded: Boolean =
    denySuffixes.isEmpty && denyPatterns.isEmpty && allowPatterns.isEmpty &&
      maxPathSegments <= 0 && maxSegmentRepeat <= 0 &&
      maxUrlLength <= 0 && maxQueryParams <= 0
  /** '&'-separated non-empty tokens after the first '?' (a bare "?\" is 0;
    * "?a&&b" is 2 — empty tokens are separators, not parameters).
    */
  private def queryParamCount(url: String): Int = {
    val qi = url.indexOf('?')
    if (qi < 0) 0
    else {
      var n = 0
      var tokenLen = 0
      var i = qi + 1
      while (i < url.length) {
        if (url.charAt(i) == '&') { if (tokenLen > 0) n += 1; tokenLen = 0 }
        else tokenLen += 1
        i += 1
      }
      if (tokenLen > 0) n += 1
      n
    }
  }
  private def pathOk(url: String): Boolean = {
    if (maxPathSegments <= 0 && maxSegmentRepeat <= 0) true
    else {
      val segs = graft.functions.CanonicalUrl.path(url)
        .split('/').filter(_.nonEmpty)
      (maxPathSegments <= 0 || segs.length <= maxPathSegments) && {
        maxSegmentRepeat <= 0 || {
          var ok = true
          var run = 1
          var i = 1
          while (ok && i < segs.length) {
            if (segs(i) == segs(i - 1)) {
              run += 1
              if (run > maxSegmentRepeat) ok = false
            } else run = 1
            i += 1
          }
          ok
        }
      }
    }
  }
  def allows(url: String): Boolean = {
    if (isUnbounded) true
    else {
      val lower = url.toLowerCase
      (maxUrlLength <= 0 || url.length <= maxUrlLength) &&
        (maxQueryParams <= 0 || queryParamCount(url) <= maxQueryParams) &&
        !denySfx.exists(lower.endsWith) &&
        !denyRe.exists(_.matcher(url).find()) &&
        (allowRe.isEmpty || allowRe.exists(_.matcher(url).find())) &&
        pathOk(url)
    }
  }
}

/** Per-host transient-failure BACKOFF (the Heritrix/Nutch server-overload
  * guard, oracle model point 12): a host showing `failureThreshold`
  * CONSECUTIVE transient fetch failures (in frontier order, accumulated
  * across waves; any success/redirect/permanent response resets the count —
  * the server answered) is quarantined for the next `backoffWaves` waves:
  * its pending URLs sit those waves out entirely (counted
  * `backoff_deferred`, not budget-deferred) and re-enter selection
  * unchanged afterwards. The check runs at END of wave (a wave is a batch —
  * its selection was already committed), so the trigger is the host's
  * end-of-wave consecutive count; entering quarantine resets the count to
  * zero (a fresh start after the pause). Quarantine state persists in the
  * `host_health` table and rebuilds on resume; runs with the feature off
  * record nothing, so enabling it at resume starts every host healthy.
  */
case class HostBackoff(failureThreshold: Int, backoffWaves: Int) {
  require(failureThreshold >= 1, "failureThreshold must be >= 1")
  require(backoffWaves >= 1, "backoffWaves must be >= 1")
}

/** ADAPTIVE revisit intervals (the Nutch AdaptiveFetchSchedule shape,
  * oracle model point 15; requires [[CrawlConfig.revisitEveryWaves]] > 0,
  * which is the per-URL INITIAL interval). Each successful fetch compares
  * the page's span-sequence fingerprint ([[ContentHash.ofSpans]]) against
  * the fingerprint recorded at the URL's previous fetch and adapts that
  * URL's next interval deterministically:
  *
  *   - first fetch (generation 0): next interval = the initial interval;
  *   - CHANGED re-fetch:   next = max(minWaves, interval / 2)  (halve);
  *   - UNCHANGED re-fetch: next = min(maxWaves, interval * 2)  (double).
  *
  * Frequently-changing pages converge to re-fetch every `minWaves`;
  * static pages back off exponentially to every `maxWaves` — the classic
  * multiplicative-increase/decrease schedule with fixed rates (integer
  * halve/double keeps both engines bit-deterministic where Nutch's float
  * rates would not be). The per-URL state (interval + fingerprint) rides
  * the frontier/schedule row itself ([[FrontierEntry.revisit_interval]]),
  * never a separate registry. Entries scheduled BEFORE adaptive mode was
  * enabled (a resume flip) carry no state: they adapt from the initial
  * interval, and with no recorded fingerprint their first adaptive
  * re-fetch reads as changed.
  */
case class AdaptiveRevisit(minWaves: Int = 1, maxWaves: Int = 64) {
  require(minWaves >= 1, "minWaves must be >= 1")
  require(maxWaves >= minWaves, "maxWaves must be >= minWaves")
  // the engine doubles an interval (interval * 2) BEFORE the least() clamp;
  // with Spark 4 ANSI mode an interval past 2^30 would throw
  // ARITHMETIC_OVERFLOW where the oracle's Int math wraps silently — bound
  // maxWaves so the doubled value always fits (r5 ADVICE item)
  require(maxWaves <= Int.MaxValue / 2,
    s"maxWaves must be <= ${Int.MaxValue / 2} (doubled intervals must not overflow Int)")
}

/** Crawl configuration shared by the oracle and the Spark engine.
  * hostBudgets: per-host politeness overrides (e.g. mapped from robots
  * Crawl-delay via [[graft.functions.RobotsTxt]]); hosts not listed use
  * budgetPerHost.
  */
case class CrawlConfig(
    seeds: Seq[String],
    budgetPerHost: Int,
    maxWaves: Int = Int.MaxValue,
    maxUrls: Long = Long.MaxValue,
    web: SyntheticWeb.WebConfig = SyntheticWeb.WebConfig(),
    robots: Seq[RobotsRule] = Nil,
    hostBudgets: Map[String, Int] = Map.empty,
    /** true: robots rules are ACQUIRED by the crawl itself — on first
      * encounter of a host, `<host>/robots.txt` is fetched through the
      * [[PageFetcher]] and parsed ([[graft.functions.RobotsTxt]]); the
      * static `robots` list is the fallback for hosts serving none.
      * false: the static list is the whole rule set (fixture mode).
      */
    fetchRobotsTxt: Boolean = false,
    /** product token used for RFC 9309 group selection when parsing
      * fetched robots.txt.
      */
    userAgent: String = "graft",
    /** fetchRobotsTxt mode: a fetched `Crawl-delay: d` maps to a per-host
      * politeness budget of floor(wavePeriodSeconds / d) (min 1) — the
      * scheduler's target wave period. Explicit hostBudgets overrides win
      * over fetched delays; hosts with neither use budgetPerHost.
      */
    wavePeriodSeconds: Double = 60.0,
    /** test/deployment hook: replace the fetch implementation (e.g. a real
      * HTTP fetcher, or a fixture serving custom robots bodies).
      */
    fetcherOverride: Option[PageFetcher] = None,
    /** Total fetch attempts allowed per URL: a transient failure requeues
      * the URL for a later wave until this many attempts are spent, then
      * it is recorded as a `transient_exhausted` error. 1 = never retry.
      * Permanent failures ignore it (error on first attempt).
      */
    maxFetchAttempts: Int = 3,
    /** ROBOTS RECENCY on [[CrawlDriver.resume]] (fetchRobotsTxt mode):
      * re-fetch `<host>/robots.txt` for every host still pending and let
      * the fresh rules/Crawl-delay SUPERSEDE the earlier ones — real
      * robots bodies change over time. In `robotsStorage="table"` mode the
      * re-fetched rows append at the resumed wave and resolution is
      * latest-wave-wins; hosts not pending keep their stored rules until
      * (if ever) re-fetched. Broadcast mode re-resolves pending hosts on
      * resume regardless (its robots state is not persisted), so the flag
      * only changes table-mode behavior. Oracle model:
      * [[RefCrawler.runPhased]].
      */
    refetchRobotsOnResume: Boolean = false,
    /** Robots CACHE TTL in waves (fetchRobotsTxt mode; the RFC 9309 §2.4
      * cache-validity rule — real crawlers re-fetch robots.txt about
      * daily): a host's robots resolution acquired at wave w0 expires at
      * wave w0 + ttl. An EXPIRED host re-fetches `<host>/robots.txt` (via
      * [[PageFetcher.fetchRobots(host:String,wave:Int)*]], so bodies may
      * change over time) the next wave that needs it: at WAVE START when
      * the host has pending URLs — the fresh Crawl-delay budget binds at
      * that wave's selection — or at its next appearance among a wave's
      * candidate hosts (admission uses the fresh rules). Fresh rules
      * fully supersede (latest-wave-wins; a body that dropped its
      * Crawl-delay also drops the budget). URLs admitted under older
      * rules still fetch — robots is checked at admission, exactly the
      * refetchRobotsOnResume semantics. 0 (default) = resolutions never
      * expire (one fetch per host, legacy behavior).
      */
    robotsTtlWaves: Int = 0,
    /** Maximum discovery depth (BFS level): a candidate whose depth would
      * exceed this is DROPPED at discovery — it does NOT enter the
      * seen-set, so a later discovery through a shallower path can still
      * admit it. Seeds are depth 0. Bounds crawl frontier growth and
      * redirect chains (a hop costs depth+1 like any link) — the standard
      * crawler depth guard against link farms and redirect bombs.
      */
    maxDepth: Int = Int.MaxValue,
    /** Scope filter applied to every DISCOVERED link (resolved absolute
      * form) before the depth cap and the seen-set; filtered URLs never
      * enter the crawl and can never be re-admitted. Seeds bypass scope.
      */
    scope: UrlScope = UrlScope(),
    /** Per-host ADMISSION cap (the Heritrix max-documents-per-host
      * anti-trap guard): once a host has had this many URLs admitted —
      * i.e. its seen-set entries, which include robots-denied URLs —
      * further discovered URLs on it are dropped at discovery, AFTER the
      * seen-dedup check and BEFORE robots (guard order: scope → depth cap
      * → seen-dedup → host cap → robots). Capped URLs never enter seen
      * and never get a discovery_time; within a wave the first
      * (cap − prior) NEW URLs of the host in admission order win. Seeds
      * bypass the check but their admissions count toward it. Cap state
      * is derivable from the seen-set (|seen per host|), so resume
      * rebuilds it — including admissions from earlier UNCAPPED runs.
      */
    maxUrlsPerHost: Long = Long.MaxValue,
    /** CONTENT-SEEN dedup (the Mercator content-seen test, the anti-mirror
      * guard): a successful fetch whose span-sequence fingerprint
      * ([[ContentHash.ofSpans]]) was already seen at another URL is a
      * DUPLICATE — it consumed its politeness slot and is traced (it was
      * fetched), but contributes NO document and NO outlinks (a mirror
      * site adds zero frontier growth), and is recorded in the
      * `duplicates` alias table with the owning URL. The owner of a
      * fingerprint is the first URL fetched with it (within a wave: first
      * in frontier order). Content-seen state persists in the
      * `content_seen` table and rebuilds on resume; runs started with the
      * flag OFF record no fingerprints, so enabling it at resume dedups
      * only against content fetched from that point on.
      */
    contentDedup: Boolean = false,
    /** Per-host transient-failure backoff — see [[HostBackoff]]. None
      * (default) = never quarantine.
      */
    hostBackoff: Option[HostBackoff] = None,
    /** SITEMAP ingestion (the Nutch/Heritrix sitemap-processor shape):
      * every host, on its FIRST-EVER appearance among a wave's candidate
      * URLs (post-scope, post-depth-cap — seeds included), is probed ONCE
      * for `http://<host>/sitemap.xml` — gated on the host's robots rules
      * allowing the "/sitemap.xml" path at that moment. The sitemap's
      * same-host `<loc>` entries ([[graft.functions.Sitemap.entries]];
      * cross-host entries dropped per the sitemaps.org cross-submission
      * rule) enter that wave's admission chain AFTER every page-derived
      * candidate, ordered by (host, entry index), at depth 1, through the
      * standard guards (scope → depth cap → seen-dedup → host cap →
      * robots). Probed hosts persist in the wave-stamped `sitemap_hosts`
      * table (one probe per host, ever; resume reads it back); runs with
      * the flag OFF record nothing, so enabling at resume probes hosts on
      * their next candidate re-encounter.
      */
    fetchSitemaps: Boolean = false,
    /** REVISIT scheduling (the Nutch re-fetch-interval / recrawl loop,
      * oracle model point 14): >0 = every SUCCESSFUL fetch (content
      * duplicates included — the fetch is what gets rescheduled) re-enters
      * the frontier `revisitEveryWaves` waves later with the same ordering
      * keys, attempts reset and generation+1, competing under the host
      * budget like any pending URL. The re-fetch is traced, counts toward
      * maxUrls, and goes through the standard outcome semantics: a changed
      * page appends a new wave-stamped doc VERSION and its outlinks enter
      * the discovery chain; with [[contentDedup]] on, an UNCHANGED page is
      * detected as a content duplicate of its own earlier fetch (the
      * not-modified signal — a self-aliasing `duplicates` row, no doc, no
      * links); failures/redirects behave exactly like first fetches and
      * are terminal (no further revisits). Waves where nothing is pending
      * and nothing is due are SILENT — not executed, not recorded; the
      * crawl sleeps until the next due wave, and ends only when the
      * frontier AND the schedule are empty (or maxWaves/maxUrls hit).
      * Outstanding revisits persist in the `revisit_due` table (resume
      * reads back the not-yet-due rows); runs with the feature off record
      * nothing, and a resume with it off ignores the schedule — the oracle
      * models that as dropping it. 0 (default) = crawl every URL once.
      */
    revisitEveryWaves: Int = 0,
    /** ADAPTIVE revisit intervals ([[AdaptiveRevisit]], oracle model point
      * 15): Some(_) makes each URL's re-fetch interval adapt to whether
      * its content changed — halve on change (floored at minWaves), double
      * on unchanged (capped at maxWaves), starting from
      * [[revisitEveryWaves]] (which must lie within [minWaves, maxWaves]).
      * None (default): every re-fetch reschedules at the fixed interval.
      * Enabling at resume adapts forward only (outstanding entries adapt
      * from the initial interval and read their first adaptive re-fetch as
      * changed); disabling at resume keeps the schedule but fixes all
      * future intervals.
      */
    revisitAdaptive: Option[AdaptiveRevisit] = None) {
  require(maxDepth >= 0, "maxDepth must be >= 0 (seeds are depth 0)")
  require(maxUrlsPerHost >= 0, "maxUrlsPerHost must be >= 0")
  require(robotsTtlWaves >= 0, "robotsTtlWaves must be >= 0 (0 = never expire)")
  require(robotsTtlWaves == 0 || fetchRobotsTxt,
    "robotsTtlWaves requires fetchRobotsTxt (fixture rules never expire)")
  require(revisitEveryWaves >= 0, "revisitEveryWaves must be >= 0 (0 = off)")
  revisitAdaptive.foreach { a =>
    require(revisitEveryWaves > 0,
      "revisitAdaptive requires revisitEveryWaves > 0 (the initial interval)")
    require(a.minWaves <= revisitEveryWaves && revisitEveryWaves <= a.maxWaves,
      s"revisitEveryWaves=$revisitEveryWaves must lie within " +
        s"[minWaves=${a.minWaves}, maxWaves=${a.maxWaves}]")
  }
  /** The fetch implementation; engine and oracle share it. */
  def fetcher: PageFetcher = fetcherOverride.getOrElse(SyntheticFetcher(web))
  /** Static budget (fixture mode); fetch mode layers fetched Crawl-delay
    * budgets between the override and the default — see
    * [[RefCrawler.effectiveBudget]] and the engine's budget broadcast.
    */
  def budgetFor(host: String): Int = hostBudgets.getOrElse(host, budgetPerHost)
}

/** Final crawl state compared between oracle and engine (BASELINE.json
  * north_rule: crawl ordering + URL-seen set; input_hint: span equality).
  * `errors`: permanently failed fetches, normalized to
  * (wave, canonical_url) order on both sides.
  */
/** One followed redirect: `canonical_url` consumed a politeness slot at
  * `wave` and 3xx'd to `target_url` (resolved absolute form). Recorded
  * even when the target is scope-filtered / depth-capped / already seen —
  * the observation happened regardless of the target's admission. This is
  * the materialized URL-ALIAS edge list: downstream dedup can collapse
  * alias chains (e.g. cluster doc_ids whose URLs redirect to one target)
  * without re-crawling.
  */
case class RedirectRow(wave: Int, canonical_url: String, host: String,
                       target_url: String)

/** One content-duplicate fetch ([[CrawlConfig.contentDedup]]):
  * `canonical_url` was fetched at `wave` and its span fingerprint
  * `content_hash` matched content first fetched at `dup_of`. The
  * materialized content-ALIAS edge list (complementing the redirects
  * URL-alias list): downstream dedup can collapse mirror clusters without
  * re-hashing the docs table.
  */
case class DuplicateRow(wave: Int, canonical_url: String, host: String,
                        dup_of: String, content_hash: Long)

case class CrawlResult(trace: Seq[TraceRow], seen: Set[String], docs: Seq[Doc],
                       errors: Seq[ErrorRow] = Nil,
                       redirects: Seq[RedirectRow] = Nil,
                       duplicates: Seq[DuplicateRow] = Nil)
