package graft.functions

import graft.crawl.RobotsRule

/** robots.txt parser (public REP format, RFC 9309 subset): groups of
  * `User-agent:` lines followed by `Allow:` / `Disallow:` path-prefix
  * rules, `#` comments, case-insensitive field names, first matching
  * user-agent group wins. Produces the engine's [[RobotsRule]] rows
  * (longest-prefix-wins evaluation happens at admission).
  *
  * Semantics implemented:
  *  - a group applies if any of its user-agents is `*` or equals ours;
  *  - empty `Disallow:` means allow-all (no rule emitted);
  *  - `Allow:` rules emitted with allow=true (longest prefix wins at
  *    evaluation, per RFC 9309 §2.2.2);
  *  - `Crawl-delay:` captured (non-standard but ubiquitous) for politeness
  *    budget mapping.
  */
object RobotsTxt {

  case class Parsed(rules: Seq[RobotsRule], crawlDelaySeconds: Option[Double])

  def parse(host: String, content: String, userAgent: String = "graft"): Parsed = {
    val ua = userAgent.toLowerCase
    var order = 0
    val rules = Seq.newBuilder[RobotsRule]
    var crawlDelay: Option[Double] = None

    var groupAgents = List.empty[String]
    var groupApplies = false
    var sawRuleInGroup = false

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

    content.linesIterator.foreach { raw =>
      lineField(raw) match {
        case Some(("user-agent", agent)) =>
          // a user-agent line after rules starts a NEW group
          if (sawRuleInGroup) { groupAgents = Nil; sawRuleInGroup = false }
          groupAgents ::= agent.toLowerCase
          groupApplies = groupAgents.exists(a => a == "*" || ua.contains(a))
        case Some(("disallow", path)) =>
          sawRuleInGroup = true
          if (groupApplies && path.nonEmpty) {
            rules += RobotsRule(host, path, allow = false, order); order += 1
          }
        case Some(("allow", path)) =>
          sawRuleInGroup = true
          if (groupApplies && path.nonEmpty) {
            rules += RobotsRule(host, path, allow = true, order); order += 1
          }
        case Some(("crawl-delay", v)) =>
          sawRuleInGroup = true
          if (groupApplies) crawlDelay = v.toDoubleOption.orElse(crawlDelay)
        case _ => // blank/unknown/comment lines
      }
    }
    Parsed(rules.result(), crawlDelay)
  }

  /** Map a Crawl-delay (seconds between requests) to a per-wave politeness
    * budget, given the wave period the scheduler targets: a host asking for
    * delay d gets at most floor(period / d) fetches per wave, at least 1.
    */
  def budgetForDelay(delaySeconds: Double, wavePeriodSeconds: Double = 60.0): Int =
    math.max(1, math.floor(wavePeriodSeconds / math.max(delaySeconds, 1e-9)).toInt)

  /** Synthesized robots.txt TEXTS whose parse reproduces
    * [[graft.crawl.SyntheticWeb.robotsFixture]] — ties the text parser
    * into the deterministic fixture path.
    */
  def syntheticRobotsTxt(cfg: graft.crawl.SyntheticWeb.WebConfig): Map[String, String] = {
    (0 until cfg.hosts).flatMap { i =>
      val host = s"host$i.test"
      if (i == cfg.hosts - 1 && cfg.hosts > 2)
        Some(host -> "User-agent: *\nDisallow: /\n")
      else {
        val lines = Seq.newBuilder[String]
        if (i % 4 == 1) lines += "Disallow: /p/1"
        if (i % 8 == 1) lines += "Allow: /p/12"
        val body = lines.result()
        if (body.isEmpty) None
        else Some(host -> ("User-agent: *\n" + body.mkString("\n") + "\n"))
      }
    }.toMap
  }
}
