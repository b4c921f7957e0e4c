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
