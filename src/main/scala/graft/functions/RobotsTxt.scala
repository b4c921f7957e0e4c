package graft.functions

import graft.crawl.RobotsRule

/** robots.txt parser (public REP format, RFC 9309 subset): groups of
  * `User-agent:` lines followed by `Allow:` / `Disallow:` path-prefix
  * rules, `#` comments, case-insensitive field names. Produces the
  * engine's [[RobotsRule]] rows (longest-prefix-wins evaluation happens at
  * admission).
  *
  * Semantics implemented:
  *  - RFC 9309 §2.2.1 group selection: the MOST SPECIFIC matching named
  *    user-agent wins (longest agent token that equals, or is a prefix of,
  *    our product token — never raw substring containment, and empty agent
  *    tokens are dropped); groups whose matched agent ties at that
  *    specificity are COMBINED; the `*` group is used only when NO named
  *    group matches;
  *  - empty `Disallow:` means allow-all (no rule emitted);
  *  - `Allow:` rules emitted with allow=true (longest prefix wins at
  *    evaluation, per RFC 9309 §2.2.2);
  *  - `Crawl-delay:` captured (non-standard but ubiquitous) for politeness
  *    budget mapping; taken from the selected group(s), last one wins.
  */
object RobotsTxt {

  case class Parsed(rules: Seq[RobotsRule], crawlDelaySeconds: Option[Double])

  private case class RawRule(field: String, value: String)
  private case class Group(agents: List[String], body: List[RawRule])

  def parse(host: String, content: String, userAgent: String = "graft"): Parsed = {
    val ua = userAgent.toLowerCase
    // RFC 9309 §2.2.1 matches against our PRODUCT TOKEN (the name before any
    // "/version" or whitespace), not the full UA string: an agent line
    // matches iff it is the token or a prefix of it. Raw substring
    // containment is looser than the spec — a one-character agent (or an
    // empty one) would match almost any crawler name and override `*`.
    val uaToken = ua.takeWhile(c => c != '/' && !c.isWhitespace)
    def agentMatches(agent: String): Boolean =
      agent.nonEmpty && uaToken.startsWith(agent)

    def lineField(line: String): Option[(String, String)] = {
      val noComment = {
        val i = line.indexOf('#')
        if (i >= 0) line.substring(0, i) else line
      }
      val j = noComment.indexOf(':')
      if (j < 0) None
      else Some((noComment.substring(0, j).trim.toLowerCase,
        noComment.substring(j + 1).trim))
    }

    // phase 1: split into groups (adjacent user-agent lines share a group;
    // a user-agent line after rules starts a new group)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = List.empty[String]
    var body = List.empty[RawRule]
    var sawRule = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.reverse, body.reverse)
      agents = Nil; body = Nil; sawRule = false
    }
    content.linesIterator.foreach { raw =>
      lineField(raw) match {
        case Some(("user-agent", agent)) =>
          if (sawRule) flush()
          agents ::= agent.toLowerCase
        case Some((f @ ("disallow" | "allow" | "crawl-delay"), v)) =>
          sawRule = true
          body ::= RawRule(f, v)
        case _ => // blank/unknown/comment lines
      }
    }
    flush()

    // phase 2: RFC 9309 §2.2.1 group selection — specificity of a group =
    // length of its longest named agent token matching ours (0 for `*`,
    // no match = ineligible). The best specificity wins; ties combine;
    // `*` applies only when no named group matched.
    val withSpec = groups.toSeq.map { g =>
      val named = g.agents.filter(_ != "*").filter(agentMatches)
      val spec =
        if (named.nonEmpty) Some(named.map(_.length).max)
        else if (g.agents.contains("*")) Some(0)
        else None
      (g, spec)
    }
    val eligible = withSpec.collect { case (g, Some(s)) => (g, s) }
    val selected =
      if (eligible.isEmpty) Seq.empty[Group]
      else {
        val best = eligible.map(_._2).max
        eligible.filter(_._2 == best).map(_._1)
      }

    var order = 0
    val rules = Seq.newBuilder[RobotsRule]
    var crawlDelay: Option[Double] = None
    selected.foreach(_.body.foreach {
      case RawRule("disallow", path) if path.nonEmpty =>
        rules += RobotsRule(host, path, allow = false, order); order += 1
      case RawRule("allow", path) if path.nonEmpty =>
        rules += RobotsRule(host, path, allow = true, order); order += 1
      case RawRule("crawl-delay", v) =>
        crawlDelay = v.toDoubleOption.orElse(crawlDelay)
      case _ => // empty disallow/allow = no rule
    })
    Parsed(rules.result(), crawlDelay)
  }

  /** The robots body's `Sitemap:` directives (sitemaps.org discovery —
    * group-INDEPENDENT per the spec, so every such line counts wherever
    * it appears), in declaration order: values resolved against
    * `http://<host>/robots.txt` (the spec requires absolute URLs;
    * relative writer errors resolve harmlessly), canonicalized, kept
    * only if SAME-HOST (cross-host submission needs a handshake we —
    * like the cross-submission rule for entries — don't model), and
    * deduplicated keeping the first occurrence. Field name matched
    * case-insensitively; `#` starts a comment as on every robots line.
    */
  def sitemapUrls(host: String, content: String): IndexedSeq[String] = {
    val base = s"http://$host/robots.txt"
    val seen = scala.collection.mutable.HashSet.empty[String]
    content.linesIterator.flatMap { raw =>
      val noComment = {
        val i = raw.indexOf('#')
        if (i >= 0) raw.substring(0, i) else raw
      }
      val j = noComment.indexOf(':')
      if (j < 0) None
      else if (noComment.substring(0, j).trim.toLowerCase != "sitemap") None
      else {
        val v = noComment.substring(j + 1).trim
        if (v.isEmpty) None
        else {
          val c = graft.functions.CanonicalUrl.resolve(base, v)
          if (graft.functions.CanonicalUrl.host(c) == host && seen.add(c)) Some(c)
          else None
        }
      }
    }.toIndexedSeq
  }

  /** Map a Crawl-delay (seconds between requests) to a per-wave politeness
    * budget, given the wave period the scheduler targets: a host asking for
    * delay d gets at most floor(period / d) fetches per wave, at least 1.
    */
  def budgetForDelay(delaySeconds: Double, wavePeriodSeconds: Double = 60.0): Int =
    math.max(1, math.floor(wavePeriodSeconds / math.max(delaySeconds, 1e-9)).toInt)

  /** All non-empty robots.txt TEXTS of the synthetic web, keyed by host —
    * the per-host bodies live in [[graft.crawl.SyntheticWeb.robotsTxt]]
    * (they ARE the web's robots pages, fetched by the crawl in
    * fetchRobotsTxt mode); their parse reproduces
    * [[graft.crawl.SyntheticWeb.robotsFixture]].
    */
  def syntheticRobotsTxt(cfg: graft.crawl.SyntheticWeb.WebConfig): Map[String, String] =
    (0 until cfg.hosts).flatMap { i =>
      val host = s"host$i.test"
      graft.crawl.SyntheticWeb.robotsTxt(host, cfg).map(host -> _)
    }.toMap
}
