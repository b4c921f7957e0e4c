package graft.functions

/** Minimal sitemaps.org XML parsing — ONE definition shared by the
  * sequential oracle and every executor task, so the entry list derived
  * from a sitemap body cannot drift between them (the same discipline as
  * [[RobotsTxt]] / [[graft.crawl.RobotsEval]]).
  *
  * Scope: `<loc>` extraction from urlset documents, INDEX files
  * (`<sitemapindex>` — each same-host child sitemap fetched through the
  * caller-supplied `fetchAt` and its urlset entries concatenated in index
  * document order, see [[expand]]), plus the XML character-entity
  * unescapes the protocol requires of writers (sitemaps.org: loc values
  * must be entity-escaped). Gzip payloads and the optional per-URL
  * metadata (lastmod/changefreq/priority) remain out of scope — a real
  * deployment layers them behind
  * [[graft.crawl.PageFetcher.fetchSitemap]] without touching the engine.
  */
object Sitemap {

  private val LocRe = "(?s)<loc>\\s*(.*?)\\s*</loc>".r

  /** The five predefined XML entities plus numeric character references —
    * everything a conforming sitemap writer may have escaped.
    */
  private[functions] def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val ent = if (semi < 0) "" else s.substring(i + 1, semi)
        val rep = ent match {
          case "amp"  => "&"
          case "lt"   => "<"
          case "gt"   => ">"
          case "quot" => "\""
          case "apos" => "'"
          case e if e.startsWith("#x") || e.startsWith("#X") =>
            try String.valueOf(Integer.parseInt(e.substring(2), 16).toChar)
            catch { case _: NumberFormatException => null }
          case e if e.startsWith("#") =>
            try String.valueOf(Integer.parseInt(e.substring(1)).toChar)
            catch { case _: NumberFormatException => null }
          case _ => null
        }
        if (rep == null) { sb.append(c); i += 1 }
        else { sb.append(rep); i = semi + 1 }
      }
    }
    sb.toString
  }

  /** Raw (unescaped) `<loc>` values in document order. */
  def locs(body: String): IndexedSeq[String] =
    LocRe.findAllMatchIn(body).map(m => unescape(m.group(1))).toIndexedSeq

  /** The sitemap's usable entries for `host`: each loc resolved against
    * `http://<host>/sitemap.xml` (relative forms are writer errors but
    * resolve harmlessly), canonicalized, and kept ONLY if it stays on the
    * same host — the sitemaps.org cross-submission rule (a sitemap may
    * only describe URLs of the host serving it; cross-host entries are
    * dropped silently, exactly as real crawlers do absent a
    * cross-submission handshake). Document order preserved; duplicates
    * kept (the crawl's first-occurrence dedup owns that).
    */
  def entries(host: String, body: String): IndexedSeq[String] =
    entriesAt(host, s"http://$host/sitemap.xml", body)

  /** [[entries]] with an explicit base URL for relative-loc resolution —
    * a CHILD sitemap's entries resolve against the child's own URL
    * (RFC 3986 §5.1.3), not the well-known probe path.
    */
  def entriesAt(host: String, baseUrl: String, body: String): IndexedSeq[String] =
    locs(body)
      .map(raw => CanonicalUrl.resolve(baseUrl, raw))
      .filter(c => CanonicalUrl.host(c) == host)

  /** An INDEX file (sitemaps.org `<sitemapindex>`) vs a plain urlset —
    * tag presence, tolerant of attributes/namespace prefixes the way the
    * loc scan is.
    */
  def isIndex(body: String): Boolean = body.contains("<sitemapindex")

  /** The host's full sitemap entry list from the body served at the
    * well-known probe path: a plain urlset yields its [[entries]]
    * directly (zero `fetchAt` calls — legacy fetchers never see the new
    * signature); an index file yields the concatenation, in index
    * document order, of each child sitemap's entries. Child rules (all
    * deterministic, shared engine/oracle):
    *   - child locs resolve against the probe path and must stay
    *     same-host (the cross-submission rule, as for entries);
    *   - a repeated child loc is fetched ONCE (first occurrence keeps
    *     the position);
    *   - a child that is itself an index is IGNORED — sitemaps.org
    *     forbids nested index files, and this is also the loop guard
    *     (an index listing itself terminates here);
    *   - a child the host does not serve (`fetchAt` → None) contributes
    *     nothing.
    * The robots gate stays the single per-host probe decision on
    * "/sitemap.xml" — child fetches are part of that one probe, exactly
    * like a real crawler's sitemap processor run.
    */
  def expand(host: String, body: String,
             fetchAt: String => Option[String]): IndexedSeq[String] =
    expandAt(host, s"http://$host/sitemap.xml", body, fetchAt)

  /** [[expand]] for a sitemap served at an arbitrary same-host URL (a
    * robots.txt `Sitemap:` directive target): child locs and entries
    * resolve against THAT url.
    */
  def expandAt(host: String, url: String, body: String,
               fetchAt: String => Option[String]): IndexedSeq[String] = {
    if (!isIndex(body)) return entriesAt(host, url, body)
    val seen = scala.collection.mutable.HashSet.empty[String]
    locs(body)
      .map(raw => CanonicalUrl.resolve(url, raw))
      .filter(c => CanonicalUrl.host(c) == host)
      .filter(seen.add)
      .flatMap { child =>
        fetchAt(child) match {
          case Some(b) if !isIndex(b) => entriesAt(host, child, b)
          case _                      => Vector.empty[String]
        }
      }
  }

  /** The host's full sitemap entry list under robots-declared discovery
    * (sitemaps.org "Sitemap:" submission): when `declared` is non-empty,
    * each declared sitemap is fetched once (first occurrence wins the
    * dedup) and expanded at its own URL — the declaration is the host's
    * explicit submission, so no well-known-path probe happens and no
    * per-path robots gate applies. When nothing is declared, falls back
    * to the well-known `/sitemap.xml` probe (`wellKnownOk` = the robots
    * gate on that path; `fetchWellKnown` is only invoked when it holds).
    */
  def discover(host: String, declared: Seq[String], wellKnownOk: Boolean,
               fetchWellKnown: () => Option[String],
               fetchAt: String => Option[String]): IndexedSeq[String] = {
    if (declared.nonEmpty) {
      val seen = scala.collection.mutable.HashSet.empty[String]
      declared.iterator.filter(seen.add).flatMap { u =>
        fetchAt(u) match {
          case Some(b) => expandAt(host, u, b, fetchAt)
          case None    => Vector.empty[String]
        }
      }.toIndexedSeq
    } else if (!wellKnownOk) Vector.empty[String]
    else fetchWellKnown() match {
      case Some(b) => expand(host, b, fetchAt)
      case None    => Vector.empty[String]
    }
  }
}
