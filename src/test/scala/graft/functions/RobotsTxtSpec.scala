package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.crawl.{RobotsRule, SyntheticWeb}

class RobotsTxtSpec extends AnyFunSuite {

  test("basic groups, comments, case-insensitivity, allow-override") {
    val txt =
      """# global policy
        |User-Agent: *
        |Disallow: /private/    # keep out
        |Allow: /private/pub/
        |Crawl-delay: 2.5
        |
        |User-agent: evilbot
        |Disallow: /
        |""".stripMargin
    val p = RobotsTxt.parse("h.test", txt, userAgent = "graft")
    assert(p.rules === Seq(
      RobotsRule("h.test", "/private/", allow = false, 0),
      RobotsRule("h.test", "/private/pub/", allow = true, 1)))
    assert(p.crawlDelaySeconds === Some(2.5))
  }

  test("specific user-agent group applies; evilbot-only rules are skipped") {
    val txt =
      """User-agent: graft
        |Disallow: /graft-only/
        |
        |User-agent: other
        |Disallow: /other-only/
        |""".stripMargin
    val p = RobotsTxt.parse("h.test", txt)
    assert(p.rules.map(_.path_prefix) === Seq("/graft-only/"))
  }

  test("multiple user-agents share one group; empty disallow = allow-all") {
    val txt =
      """User-agent: a
        |User-agent: *
        |Disallow:
        |Disallow: /x
        |""".stripMargin
    val p = RobotsTxt.parse("h.test", txt)
    assert(p.rules === Seq(RobotsRule("h.test", "/x", allow = false, 0)))
  }

  test("RFC 9309 §2.2.1: a named group OVERRIDES the * group (not merged)") {
    val txt =
      """User-agent: graft
        |Disallow: /graft-only/
        |
        |User-agent: *
        |Disallow: /everyone/
        |Crawl-delay: 9
        |""".stripMargin
    val p = RobotsTxt.parse("h.test", txt)
    assert(p.rules.map(_.path_prefix) === Seq("/graft-only/"),
      "only the named group's rules apply when a named group matches")
    assert(p.crawlDelaySeconds === None,
      "crawl-delay of the unselected * group must not leak")
  }

  test("RFC 9309 §2.2.1: named group selected even when it appears AFTER *") {
    val txt =
      """User-agent: *
        |Disallow: /everyone/
        |
        |User-agent: graft
        |Disallow: /graft-only/
        |""".stripMargin
    val p = RobotsTxt.parse("h.test", txt)
    assert(p.rules.map(_.path_prefix) === Seq("/graft-only/"))
  }

  test("RFC 9309 §2.2.1: most-specific named match wins; equal ties combine") {
    val txt =
      """User-agent: gra
        |Disallow: /short/
        |
        |User-agent: graft
        |Disallow: /long-a/
        |
        |User-agent: graft
        |Disallow: /long-b/
        |""".stripMargin
    val p = RobotsTxt.parse("h.test", txt)
    assert(p.rules.map(_.path_prefix) === Seq("/long-a/", "/long-b/"),
      "longest agent-token match wins; same-specificity groups combine")
  }

  test("* group is used when no named group matches") {
    val txt =
      """User-agent: otherbot
        |Disallow: /other/
        |
        |User-agent: *
        |Disallow: /fallback/
        |""".stripMargin
    val p = RobotsTxt.parse("h.test", txt)
    assert(p.rules.map(_.path_prefix) === Seq("/fallback/"))
  }

  test("agent matching is token-boundary, not substring: mid-string and " +
    "suffix matches do not select a named group") {
    val txt =
      """User-agent: raft
        |Disallow: /suffix-match/
        |
        |User-agent: a
        |Disallow: /one-char-substring/
        |
        |User-agent: *
        |Disallow: /fallback/
        |""".stripMargin
    // "raft" is a substring (not a prefix) of "graft"; "a" likewise —
    // neither may override the * group under RFC 9309 product-token matching
    val p = RobotsTxt.parse("h.test", txt, userAgent = "graft")
    assert(p.rules.map(_.path_prefix) === Seq("/fallback/"))
  }

  test("agent matches the product token of a versioned UA; prefix counts") {
    val txt =
      """User-agent: graft
        |Disallow: /named/
        |
        |User-agent: *
        |Disallow: /fallback/
        |""".stripMargin
    assert(RobotsTxt.parse("h.test", txt, userAgent = "graftbot/2.1")
      .rules.map(_.path_prefix) === Seq("/named/"),
      "agent token must match as a prefix of the UA product token")
    assert(RobotsTxt.parse("h.test", txt, userAgent = "graft/1.0 (+contact)")
      .rules.map(_.path_prefix) === Seq("/named/"),
      "version suffix after '/' must not defeat the match")
  }

  test("empty User-agent value is dropped — it must not tie with *") {
    val txt =
      """User-agent:
        |Disallow: /empty-agent/
        |
        |User-agent: *
        |Disallow: /fallback/
        |""".stripMargin
    val p = RobotsTxt.parse("h.test", txt, userAgent = "graft")
    assert(p.rules.map(_.path_prefix) === Seq("/fallback/"))
  }

  test("parsed synthetic robots.txt reproduces the fixture rule set") {
    val cfg = SyntheticWeb.WebConfig(hosts = 16, pagesPerHost = 10)
    val expected = SyntheticWeb.robotsFixture(cfg)
      .map(r => (r.host, r.path_prefix, r.allow)).toSet
    val parsed = RobotsTxt.syntheticRobotsTxt(cfg).flatMap { case (host, txt) =>
      RobotsTxt.parse(host, txt).rules
    }.map(r => (r.host, r.path_prefix, r.allow)).toSet
    assert(parsed === expected)
  }
}
