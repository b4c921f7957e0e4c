package graft.functions

/** Minimal sitemaps.org XML parsing — ONE definition shared by the
  * sequential oracle and every executor task, so the entry list derived
  * from a sitemap body cannot drift between them (the same discipline as
  * [[RobotsTxt]] / [[graft.crawl.RobotsEval]]).
  *
  * Scope: `<loc>` extraction from a urlset document plus the XML
  * character-entity unescapes the protocol requires of writers
  * (sitemaps.org: loc values must be entity-escaped). Index files,
  * gzip payloads and the optional per-URL metadata (lastmod/changefreq/
  * priority) are out of scope — a real deployment layers them behind
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
  def entries(host: String, body: String): IndexedSeq[String] = {
    val base = s"http://$host/sitemap.xml"
    locs(body)
      .map(raw => CanonicalUrl.resolve(base, raw))
      .filter(c => CanonicalUrl.host(c) == host)
  }
}
