package graft.crawl

import graft.util.XxHash64
import graft.functions.CanonicalUrl

/** Deterministic synthetic web (FIXTURES.md §A2): `page(url)` is a pure
  * function of `xxhash64(url, seed=42)`, so fetch+parse is identical bytes
  * on every run, at every parallelism level, in both the sequential oracle
  * and the distributed engine. No network exists in this sandbox; the real
  * fetcher would implement the same (url -> spans + outlinks) contract.
  *
  * Properties (all derived from hash mixes of the canonical URL):
  *  - 2..8 spans per page, alternating text/media; text = 3..10 words from a
  *    64-word pool; media_ref = "media/<hex>.jpg".
  *  - 0..5 outlinks per page, ~70% same-host; cross-host links are biased
  *    toward one designated hot host (10x-ish in-degree) to exercise skew
  *    handling; ~10% duplicate links exercise in-page first-occurrence dedup.
  *  - raw link forms include relative paths, uppercase host, explicit :80,
  *    dot-segments, percent-encoding and network-path references, all of
  *    which canonicalize/resolve back into the closed page space
  *    http://host{i}.test/p/{k}.
  */
object SyntheticWeb {

  /** hosts: number of distinct hosts host{0..H-1}.test; pagesPerHost: size
    * of the /p/{k} page space per host; hotHost: index of the skewed host;
    * parseWorkIters: deterministic extra CPU per page simulating the
    * fetch+parse cost a real crawler pays (HTML parse / decompress — the
    * synthetic span generator alone is unrealistically cheap). Zero for
    * correctness tests; nonzero only in throughput benchmarks. Never
    * changes any output.
    */
  case class WebConfig(hosts: Int = 8, pagesPerHost: Int = 50, hotHost: Int = 0,
                       parseWorkIters: Long = 0L,
                       /** percent of URLs that fail PERMANENTLY (every
                         * attempt) — hash-derived from the URL alone.
                         */
                       permanentFailPct: Int = 0,
                       /** percent chance a given (url, attempt) pair fails
                         * TRANSIENTLY — hash-derived from both, so retries
                         * re-roll and can succeed.
                         */
                       transientFailPct: Int = 0,
                       /** percent of URLs that REDIRECT (every attempt —
                         * a property of the URL, like permanent failure);
                         * the target is hash-derived, in raw forms that
                         * need resolution/canonicalization, and may itself
                         * redirect (chains arise organically).
                         */
                       redirectPct: Int = 0,
                       /** percent of hosts that SERVE a sitemap at
                         * `/sitemap.xml` — hash-derived from the host
                         * alone (a property of the site). 0 (default): no
                         * host serves one, so enabling the crawl-side
                         * [[CrawlConfig.fetchSitemaps]] probe on a legacy
                         * web config changes nothing.
                         */
                       sitemapHostPct: Int = 0,
                       /** among sitemap-SERVING hosts, the percent whose
                         * `/sitemap.xml` is an INDEX file
                         * (`<sitemapindex>` listing `/sitemap-<j>.xml`
                         * children) instead of a plain urlset —
                         * hash-derived from the host. 0 (default): every
                         * served sitemap is a urlset, byte-identical to
                         * the pre-index generator.
                         */
                       sitemapIndexPct: Int = 0,
                       /** percent of hosts whose robots body carries
                         * `Sitemap:` DECLARATION lines (sitemaps.org
                         * discovery) — hash-derived from the host,
                         * independent of `sitemapHostPct` (a host may
                         * declare without serving the well-known path,
                         * and vice versa); a rule-less selected host
                         * serves a robots body of only these lines.
                         * 0 (default): bodies byte-identical to the
                         * pre-directive generator.
                         */
                       sitemapDirectivePct: Int = 0,
                       /** >0: page CONTENT (the span sequence) derives not
                         * from the URL but from a hash-collapsed content
                         * key with this many distinct values — URLs
                         * sharing a key serve bit-identical spans while
                         * keeping their own (url-derived) outlinks, the
                         * mirror-site shape content-seen dedup exists for.
                         * 0 (default): content is url-unique, exactly the
                         * pre-existing byte stream.
                         */
                       dupContentGroups: Int = 0,
                       /** percent of URLs that are VOLATILE — their span
                         * sequence AND outlink set change on every re-fetch
                         * generation ([[CrawlConfig.revisitEveryWaves]]),
                         * hash-derived from the URL alone. Non-volatile
                         * URLs serve identical bytes at every generation
                         * (the unchanged-page case content-seen dedup
                         * detects). 0 (default): nothing changes, so
                         * generation never affects any output.
                         */
                       volatileUrlPct: Int = 0,
                       /** percent of hosts whose robots.txt BODY varies
                         * with the wave it is fetched at — exercised only
                         * when the crawl re-fetches robots
                         * ([[CrawlConfig.robotsTtlWaves]] /
                         * refetchRobotsOnResume): rules re-derive per
                         * (host, wave), Crawl-delay appears/disappears,
                         * and the host occasionally serves none (config
                         * fallback). Non-selected hosts serve the fixed
                         * per-host body at every wave. 0 (default): all
                         * bodies are wave-invariant — byte-identical to
                         * the pre-TTL stream.
                         */
                       volatileRobotsPct: Int = 0)

  /** Deterministic fetch outcome with hash-derived failure injection: a
    * pure function of (url, attempt, cfg), identical in the sequential
    * oracle and on every executor at any parallelism. Permanent failures
    * are a property of the URL (all attempts fail); transient failures
    * re-roll per attempt.
    */
  def fetchOutcome(url: String, attempt: Int, cfg: WebConfig,
                   generation: Int = 0): FetchOutcome =
    if (cfg.permanentFailPct > 0 &&
        fm(h(url + "|pfail"), 100) < cfg.permanentFailPct) PermanentFetchError
    else if (cfg.transientFailPct > 0 &&
        // transient failures re-roll per fetch EVENT: per attempt, and on
        // revisits per generation too (gen 0 keys exactly as before, so
        // legacy configs are byte-identical). Permanent/redirect stay
        // properties of the URL — a URL showing either is terminal on its
        // first crawl and can never reach generation > 0 anyway.
        fm(h(url + "|tfail|" + attempt +
          (if (generation > 0) "|g" + generation else "")), 100)
          < cfg.transientFailPct) TransientFetchError
    else if (cfg.redirectPct > 0 &&
        fm(h(url + "|redir"), 100) < cfg.redirectPct) Redirected(redirectTarget(url, cfg))
    else { val (s, l) = fetchParse(url, cfg, generation); Fetched(s, l) }

  /** Hash-derived redirect Location for a redirecting URL: ~half same-host
    * path moves, half cross-host, in raw forms (absolute-path reference,
    * uppercase host + explicit :80) that exercise resolution and
    * canonicalization exactly like outlinks. The target may itself
    * redirect — chains and (rarely) loops arise organically and must
    * terminate at the seen-set.
    */
  private def redirectTarget(url: String, cfg: WebConfig): String = {
    val hj = h(url + "|redirtgt")
    val hostIdx = hostIndexOf(CanonicalUrl.host(url), cfg)
    val tgtHost = if (fm(hj, 10) < 5) hostIdx else fm(hj >>> 16, cfg.hosts)
    val k2 = fm(hj >>> 24, cfg.pagesPerHost)
    if (fm(hj >>> 40, 2) == 0 && tgtHost == hostIdx) s"/p/$k2"
    else s"http://HOST$tgtHost.TEST:80/p/$k2"
  }

  /** Fixed-work CPU spin (data-dependent mix chain the JIT cannot elide;
    * ~1 ns/iter). Returns a value the caller must consume.
    */
  def spinWork(seed: Long, iters: Long): Long = {
    var x = seed | 1L
    var i = 0L
    while (i < iters) {
      x = java.lang.Long.rotateLeft(x * 0x9E3779B185EBCA87L, 31) ^ (x >>> 17)
      i += 1
    }
    x
  }

  private val wordPool: IndexedSeq[String] = Vector(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "amber", "birch", "cedar", "dune", "ember",
    "fjord", "grove", "harbor", "isle", "jade", "kelp", "lagoon", "mesa",
    "nectar", "onyx", "pearl", "quartz", "reef", "slate", "tundra", "umber",
    "vale", "willow", "xenon", "yarrow", "zephyr", "anchor", "beacon",
    "cinder", "drift", "eddy", "flint", "glen", "heath", "inlet", "juniper",
    "knoll", "ledge")

  @inline private def h(s: String): Long = XxHash64.hashString(s)
  @inline private def fm(a: Long, m: Int): Int = java.lang.Math.floorMod(a, m.toLong).toInt

  def canonicalPage(hostIdx: Int, k: Int): String = s"http://host$hostIdx.test/p/$k"

  /** Host index encoded in a host{i}.test name; hash-derived fallback for
    * off-space hosts (cannot occur with the link forms below).
    */
  private def hostIndexOf(host: String, cfg: WebConfig): Int =
    if (host.startsWith("host") && host.endsWith(".test")) {
      val mid = host.substring(4, host.length - 5)
      if (mid.nonEmpty && mid.forall(_.isDigit)) mid.toInt % cfg.hosts
      else fm(h(host), cfg.hosts)
    } else fm(h(host), cfg.hosts)

  /** Deterministic fetch + parse of a canonical URL: ordered span array
    * (text/media interleaved, offset = array index) plus the page's raw
    * outlink strings in document order (duplicates included).
    */
  def fetchParse(url: String, cfg: WebConfig,
                 generation: Int = 0): (IndexedSeq[Span], IndexedSeq[String]) = {
    if (cfg.parseWorkIters > 0 && spinWork(h(url), cfg.parseWorkIters) == 42L)
      throw new IllegalStateException("unreachable") // consume the spin value
    // VOLATILE pages (revisit scheduling): a per-generation suffix mixes
    // into BOTH the content seed and the link derivation, so a re-fetch of
    // a volatile page serves changed spans (a new content fingerprint)
    // and a changed outlink set (genuinely new discoveries from revisits).
    // generation 0 — and every page of a volatileUrlPct=0 web — keys
    // exactly as before: legacy outputs are byte-identical.
    val gsfx =
      if (generation > 0 && cfg.volatileUrlPct > 0 &&
          fm(h(url + "|vol"), 100) < cfg.volatileUrlPct) "|g" + generation
      else ""
    // content seed: the URL itself, unless dupContentGroups collapses the
    // content space (mirror injection) — links below always derive from
    // the URL, so mirrors link differently, which is exactly what makes
    // "duplicates contribute no outlinks" observable
    val cs =
      (if (cfg.dupContentGroups > 0) "ckey|" + fm(h(url + "|ckey"), cfg.dupContentGroups)
       else url) + gsfx
    val nSpans = 2 + fm(h(cs + "|page"), 7) // 2..8
    val spans = (0 until nSpans).map { i =>
      val hi = h(cs + "|span|" + i)
      if (i % 2 == 0) {
        val nWords = 3 + fm(hi, 8) // 3..10
        val words = (0 until nWords).map { j =>
          wordPool(fm(h(cs + "|w|" + i + "|" + j), wordPool.length))
        }
        Span("text", words.mkString(" "), null, i)
      } else {
        Span("media", null, "media/" + java.lang.Long.toHexString(hi) + ".jpg", i)
      }
    }

    val hostIdx = hostIndexOf(CanonicalUrl.host(url), cfg)
    val lk = url + gsfx // volatile pages re-roll their outlinks per generation
    val nLinks = fm(h(lk + "|links"), 6) // 0..5
    val links = new scala.collection.mutable.ArrayBuffer[String](nLinks)
    var j = 0
    while (j < nLinks) {
      val hj = h(lk + "|link|" + j)
      if (j > 0 && fm(hj >>> 33, 10) == 0) {
        links += links(j - 1) // ~10% duplicate: exercises in-page dedup
      } else {
        val sameHost = fm(hj, 10) < 7
        val tgtHost =
          if (sameHost) hostIdx
          else if (fm(hj >>> 8, 100) < 40) cfg.hotHost // hot-host skew
          else fm(hj >>> 16, cfg.hosts)
        val k2 = fm(hj >>> 24, cfg.pagesPerHost)
        val raw = fm(hj >>> 40, 8) match {
          case 0 if sameHost => s"$k2"                                     // relative
          case 1 if sameHost => s"../p/$k2"                                // dot-segment relative
          case 2             => s"HTTP://HOST$tgtHost.TEST/p/$k2"          // case-normalization
          case 3             => s"http://host$tgtHost.test:80/p/$k2"       // default port
          case 4             => s"http://host$tgtHost.test/a/../p/$k2"     // dot segments
          case 5             => s"http://host$tgtHost.test/%70/$k2"        // %70 = 'p'
          case 6             => s"//host$tgtHost.test/p/$k2"               // network-path
          case _             => canonicalPage(tgtHost, k2)
        }
        links += raw
      }
      j += 1
    }
    (spans, links.toIndexedSeq)
  }

  /** Ordered seed list (FIXTURES.md §A3): canonical-form-varying URLs; list
    * order defines discovery_time 0..n-1.
    */
  def seedUrls(n: Int, cfg: WebConfig): Seq[String] =
    (0 until n).map(seedUrl(_, cfg))

  /** The i-th seed URL — a pure function of the index, so huge seed lists
    * can be GENERATED distributed (`spark.range(n)` + this per row) and fed
    * through [[CrawlDriver.runWithSeedTable]] without ever existing as a
    * driver collection.
    */
  def seedUrl(i: Long, cfg: WebConfig): String = {
    val hostIdx = i % cfg.hosts
    val k = i % cfg.pagesPerHost
    (i % 5).toInt match {
      case 0 => s"http://host$hostIdx.test/p/$k"
      case 1 => s"HTTP://host$hostIdx.TEST:80/p/$k#frag"
      case 2 => s"http://host$hostIdx.test/a/b/../../p/$k"
      case 3 => s"http://host$hostIdx.test/%70/$k"
      case _ => s"http://host$hostIdx.test/./p/$k"
    }
  }

  /** The robots.txt BODY served at `http://<host>/robots.txt` — None when
    * the host serves none. Pure function of (host, cfg) like every other
    * page, so robots acquisition is deterministic at any parallelism and in
    * the sequential oracle. Its parse reproduces exactly the per-host rules
    * of [[robotsFixture]] (asserted in RobotsTxtSpec), so a fetch-mode crawl
    * must equal a fixture-mode crawl bit-for-bit.
    */
  def robotsTxt(host: String, cfg: WebConfig, wave: Int = 0): Option[String] = {
    val base = robotsTxtBase(host, cfg, wave)
    val dirs = sitemapDirectiveLines(host, cfg)
    if (dirs.isEmpty) base
    else Some(base.getOrElse("") + dirs.mkString("\n") + "\n")
  }

  private def robotsTxtBase(host: String, cfg: WebConfig, wave: Int): Option[String] = {
    if (!(host.startsWith("host") && host.endsWith(".test"))) return None
    val mid = host.substring(4, host.length - 5)
    if (mid.isEmpty || !mid.forall(_.isDigit)) return None
    val i = mid.toInt
    if (i >= cfg.hosts) return None
    // volatile-robots hosts serve a (host, wave)-derived body: the rule
    // set re-rolls per fetch wave, Crawl-delay comes and goes, and
    // occasionally the host serves none at all (config-fallback path).
    // Deterministic at any parallelism — the body depends only on the
    // fetch wave, which engine and oracle pin identically.
    if (cfg.volatileRobotsPct > 0 &&
        fm(h(host + "|rvol"), 100) < cfg.volatileRobotsPct) {
      val k = h(host + "|rw" + wave)
      if (fm(k, 11) == 0) return None
      val lines = Seq.newBuilder[String]
      if (fm(k, 7) == 0) lines += "Disallow: /"
      else {
        lines += s"Disallow: /p/${fm(k, 10)}"
        if (fm(k, 3) == 0) lines += s"Allow: /p/${fm(k, 10)}${fm(k, 10)}"
      }
      if (fm(k, 5) == 0) lines += s"Crawl-delay: ${1 + fm(k, 3)}"
      return Some("User-agent: *\n" + lines.result().mkString("\n") + "\n")
    }
    if (i == cfg.hosts - 1 && cfg.hosts > 2) Some("User-agent: *\nDisallow: /\n")
    else {
      val lines = Seq.newBuilder[String]
      if (i % 4 == 1) lines += "Disallow: /p/1"
      if (i % 8 == 1) lines += "Allow: /p/12"
      val body = lines.result()
      if (body.isEmpty) None
      else Some("User-agent: *\n" + body.mkString("\n") + "\n")
    }
  }

  /** The sitemap XML served at `http://<host>/sitemap.xml` — None for
    * hosts outside the synthetic space or not selected by
    * `sitemapHostPct`. Pure function of (host, cfg), like robots bodies.
    * Entries: 3..12 `<loc>` values over the host's own page space in raw
    * forms that exercise resolution/canonicalization (uppercase host,
    * explicit :80, dot-segments, XML-entity escapes), ~1-in-8 duplicates
    * (exercise first-occurrence dedup), and ~1-in-6 CROSS-HOST entries
    * that the sitemaps.org cross-submission rule must drop.
    */
  def sitemapTxt(host: String, cfg: WebConfig): Option[String] = {
    sitemapHostId(host, cfg).map { i =>
      if (cfg.sitemapIndexPct > 0 &&
          fm(h(host + "|smidx"), 100) < cfg.sitemapIndexPct)
        sitemapIndexBody(host, i, cfg)
      else sitemapUrlsetBody(host, i, "", cfg)
    }
  }

  /** Host id when the host both exists in the synthetic space AND is
    * selected to serve a sitemap — the shared eligibility gate for the
    * probe path and child sitemap URLs.
    */
  private def sitemapHostId(host: String, cfg: WebConfig): Option[Int] = {
    if (cfg.sitemapHostPct <= 0) return None
    if (!(host.startsWith("host") && host.endsWith(".test"))) return None
    val mid = host.substring(4, host.length - 5)
    if (mid.isEmpty || !mid.forall(_.isDigit)) return None
    val i = mid.toInt
    if (i >= cfg.hosts) return None
    if (fm(h(host + "|sm"), 100) >= cfg.sitemapHostPct) return None
    Some(i)
  }

  /** One urlset body; `salt` = "" for the probe-path body (keys — and
    * therefore bytes — identical to the pre-index generator) or "|c<j>"
    * for index child j, so every child carries its own entry list.
    */
  private def sitemapUrlsetBody(host: String, i: Int, salt: String,
                                cfg: WebConfig): String = {
    val n = 3 + fm(h(host + salt + "|smn"), 10) // 3..12 entries
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
    var j = 0
    var prev: String = null
    while (j < n) {
      val hj = h(host + salt + "|smloc|" + j)
      val loc =
        if (j > 0 && fm(hj >>> 48, 8) == 0) prev // ~1/8 duplicate entry
        else {
          val cross = fm(hj >>> 4, 6) == 0 // ~1/6 cross-host (dropped)
          val tgtHost = if (cross) fm(hj >>> 12, cfg.hosts) else i
          val k = fm(hj >>> 24, cfg.pagesPerHost)
          fm(hj >>> 40, 5) match {
            case 0 => s"http://HOST$tgtHost.TEST/p/$k"          // case-normalization
            case 1 => s"http://host$tgtHost.test:80/p/$k"       // default port
            case 2 => s"http://host$tgtHost.test/a/../p/$k"     // dot segments
            case 3 => s"http://host$tgtHost.test/p/$k?a=1&amp;b=2" // entity escape
            case _ => canonicalPage(tgtHost, k)
          }
        }
      prev = loc
      sb ++= "  <url><loc>"; sb ++= loc; sb ++= "</loc></url>\n"
      j += 1
    }
    sb ++= "</urlset>\n"
    sb.toString
  }

  /** `Sitemap:` directive lines appended to the host's robots body
    * (`sitemapDirectivePct`): always a first declared sitemap at
    * `/smd-0.xml` (one raw-uppercase variant in 5 to exercise
    * canonicalization), plus hash-selected hard cases — a second
    * declared sitemap `/smd-1.xml` (an INDEX body for half such hosts),
    * a CROSS-HOST declaration (dropped), the well-known `/sitemap.xml`
    * as a declared URL, and a repeat of the first line (fetched once).
    * A rule-less selected host serves a body with only these lines.
    */
  private def sitemapDirectiveLines(host: String, cfg: WebConfig): Seq[String] = {
    if (cfg.sitemapDirectivePct <= 0) return Nil
    if (!(host.startsWith("host") && host.endsWith(".test"))) return Nil
    val mid = host.substring(4, host.length - 5)
    if (mid.isEmpty || !mid.forall(_.isDigit)) return Nil
    val i = mid.toInt
    if (i >= cfg.hosts) return Nil
    if (fm(h(host + "|smdir"), 100) >= cfg.sitemapDirectivePct) return Nil
    val hd = h(host + "|smdirx")
    val first =
      if (fm(hd, 5) == 0) s"Sitemap: http://HOST$i.TEST/smd-0.xml"
      else s"Sitemap: http://host$i.test/smd-0.xml"
    val l = Seq.newBuilder[String]
    l += first
    if (fm(hd >>> 8, 3) == 0) l += s"Sitemap: http://host$i.test/smd-1.xml"
    if (cfg.hosts > 1 && fm(hd >>> 16, 3) == 0)
      l += s"Sitemap: http://host${(i + 1) % cfg.hosts}.test/smd-0.xml"
    if (fm(hd >>> 24, 3) == 0) l += s"Sitemap: http://host$i.test/sitemap.xml"
    if (fm(hd >>> 32, 4) == 0) l += first
    l.result()
  }

  /** Served index children per index-serving host: 2..4. */
  private[crawl] def sitemapChildCount(host: String): Int =
    2 + fm(h(host + "|smidxn"), 3)

  /** An index body at the probe path: `<sitemap><loc>` children at
    * `/sitemap-<j>.xml` (one in raw uppercase form to exercise
    * resolution, ~1/4 repeated — fetched once), plus hash-selected hard
    * cases: a self-reference to `/sitemap.xml` (the nested-index guard),
    * a CROSS-HOST child (dropped before any fetch), and an UNSERVED
    * child path (fetch yields None).
    */
  private def sitemapIndexBody(host: String, i: Int, cfg: WebConfig): String = {
    val n = sitemapChildCount(host)
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
    def add(loc: String): Unit = {
      sb ++= "  <sitemap><loc>"; sb ++= loc; sb ++= "</loc></sitemap>\n"
    }
    var j = 0
    while (j < n) {
      val hj = h(host + "|smidxloc|" + j)
      val loc =
        if (fm(hj >>> 40, 6) == 0) s"http://HOST$i.TEST/sitemap-$j.xml"
        else s"http://host$i.test/sitemap-$j.xml"
      add(loc)
      if (fm(hj >>> 50, 4) == 0) add(loc) // ~1/4 duplicate child
      j += 1
    }
    val hx = h(host + "|smidxx")
    if (fm(hx, 3) == 0) add(s"http://host$i.test/sitemap.xml")
    if (cfg.hosts > 1 && fm(hx >>> 8, 3) == 0)
      add(s"http://host${(i + 1) % cfg.hosts}.test/sitemap-0.xml")
    if (fm(hx >>> 16, 3) == 0) add(s"http://host$i.test/sitemap-$n.xml")
    sb ++= "</sitemapindex>\n"
    sb.toString
  }

  // sitemapAt URL shapes, compiled once per JVM — this runs per
  // child-sitemap fetch inside executor tasks during sitemap probes
  // (per-invocation compilation measured as the r5 ADVICE item)
  private val SitemapChildRe = "http://(host[0-9]+\\.test)/sitemap-([0-9]+)\\.xml".r
  private val SitemapProbeRe = "http://(host[0-9]+\\.test)/sitemap\\.xml".r
  private val SitemapDirRe = "http://(host[0-9]+\\.test)/smd-([0-9]+)\\.xml".r
  private val SitemapDirChildRe = "http://(host[0-9]+\\.test)/smd-c([0-9]+)\\.xml".r

  /** The body served at an individual sitemap URL (an index file's
    * child): `/sitemap-<j>.xml` for j below the host's child count when
    * the host serves an index; `/sitemap.xml` serves whatever the probe
    * path serves (so a self-referencing index child returns the index
    * body — the nested-index guard's live case); anything else → None.
    * Pure function of (url, cfg).
    */
  def sitemapAt(url: String, cfg: WebConfig): Option[String] = {
    def dirHostId(host: String): Option[Int] = {
      if (cfg.sitemapDirectivePct <= 0) return None
      val mid = host.substring(4, host.length - 5)
      if (mid.isEmpty || !mid.forall(_.isDigit)) return None
      val i = mid.toInt
      if (i >= cfg.hosts) return None
      if (fm(h(host + "|smdir"), 100) >= cfg.sitemapDirectivePct) return None
      Some(i)
    }
    url match {
      case SitemapChildRe(host, js) =>
        sitemapHostId(host, cfg).flatMap { i =>
          val j = js.toInt
          val isIdx = cfg.sitemapIndexPct > 0 &&
            fm(h(host + "|smidx"), 100) < cfg.sitemapIndexPct
          if (isIdx && j < sitemapChildCount(host))
            Some(sitemapUrlsetBody(host, i, "|c" + j, cfg))
          else None
        }
      case SitemapDirRe(host, ks) =>
        dirHostId(host).flatMap { i =>
          val hd = h(host + "|smdirx")
          ks.toInt match {
            case 0 => Some(sitemapUrlsetBody(host, i, "|d0", cfg))
            case 1 if fm(hd >>> 8, 3) == 0 =>
              // the second declared sitemap — an INDEX for half such
              // hosts (exercises expandAt on a declared index)
              if (fm(hd >>> 40, 2) == 0) Some(
                "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
                  "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
                  s"  <sitemap><loc>http://$host/smd-c0.xml</loc></sitemap>\n" +
                  s"  <sitemap><loc>http://$host/smd-c1.xml</loc></sitemap>\n" +
                  "</sitemapindex>\n")
              else Some(sitemapUrlsetBody(host, i, "|d1", cfg))
            case _ => None
          }
        }
      case SitemapDirChildRe(host, js) =>
        dirHostId(host).flatMap { i =>
          val j = js.toInt
          if (j < 2) Some(sitemapUrlsetBody(host, i, "|dc" + j, cfg)) else None
        }
      case SitemapProbeRe(host) => sitemapTxt(host, cfg)
      case _             => None
    }
  }

  /** Robots fixture (FIXTURES.md §A5) over live page paths so the rules
    * actually fire: prefix-deny "/p/1" on 1-in-4 hosts (matches /p/1,
    * /p/10..19, ...), a longer allow-override "/p/12" on 1-in-8, and a
    * deny-all host — exercises longest-prefix-wins.
    */
  def robotsFixture(cfg: WebConfig): Seq[RobotsRule] = {
    val rules = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
    var order = 0
    (0 until cfg.hosts).foreach { i =>
      val host = s"host$i.test"
      if (i == cfg.hosts - 1 && cfg.hosts > 2) {
        rules += RobotsRule(host, "/", allow = false, order); order += 1
      } else {
        if (i % 4 == 1) { rules += RobotsRule(host, "/p/1", allow = false, order); order += 1 }
        if (i % 8 == 1) { rules += RobotsRule(host, "/p/12", allow = true, order); order += 1 }
      }
    }
    rules.toSeq
  }
}
