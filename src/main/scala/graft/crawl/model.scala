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
  * canonical_url ASC), per-host selection keyed by host_hash.
  */
case class FrontierEntry(
    canonical_url: String,
    host: String,
    host_hash: Long,
    priority: Int,
    discovery_time: Long,
    depth: Int)

/** Crawl-ordering trace: seq is 1-based within a wave. */
case class TraceRow(wave: Int, seq: Long, host: String, canonical_url: String)

/** URL-seen set row. */
case class SeenRow(canonical_url: String, host_hash: Long)

/** robots.txt-style rule: longest matching path_prefix for a host wins;
  * no matching rule -> allow.
  */
case class RobotsRule(host: String, path_prefix: String, allow: Boolean, rule_order: Int)

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

/** The fetch+parse contract: canonical URL -> ordered span array + raw
  * outlink strings in document order. The deterministic [[SyntheticFetcher]]
  * is the only implementation runnable in this sandbox (no network); a real
  * HTTP fetcher (connection pool per host, HTML parse, link extraction)
  * drops in behind the same trait without touching the engine — instances
  * are broadcast-serialized into the parse stage.
  */
trait PageFetcher extends Serializable {
  def fetchParse(canonicalUrl: String): (IndexedSeq[Span], IndexedSeq[String])
}

/** Deterministic sandbox fetcher over [[SyntheticWeb]]. */
case class SyntheticFetcher(web: SyntheticWeb.WebConfig) extends PageFetcher {
  override def fetchParse(url: String): (IndexedSeq[Span], IndexedSeq[String]) =
    SyntheticWeb.fetchParse(url, web)
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
    hostBudgets: Map[String, Int] = Map.empty) {
  /** The fetch implementation; engine and oracle share it. */
  def fetcher: PageFetcher = SyntheticFetcher(web)
  def budgetFor(host: String): Int = hostBudgets.getOrElse(host, budgetPerHost)
}

/** Final crawl state compared between oracle and engine (BASELINE.json
  * north_rule: crawl ordering + URL-seen set; input_hint: span equality).
  */
case class CrawlResult(trace: Seq[TraceRow], seen: Set[String], docs: Seq[Doc])
