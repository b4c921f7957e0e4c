package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.crawl.SyntheticWeb

class CanonicalUrlSpec extends AnyFunSuite {
  import CanonicalUrl._

  test("lowercase scheme and host, keep path case") {
    assert(canonicalize("HTTP://Host0.TEST/P/1") === "http://host0.test/P/1")
  }

  test("strip default ports only") {
    assert(canonicalize("http://h.test:80/x") === "http://h.test/x")
    assert(canonicalize("https://h.test:443/x") === "https://h.test/x")
    assert(canonicalize("http://h.test:8080/x") === "http://h.test:8080/x")
    assert(canonicalize("https://h.test:80/x") === "https://h.test:80/x")
  }

  test("empty path becomes /") {
    assert(canonicalize("http://h.test") === "http://h.test/")
    assert(canonicalize("http://h.test?q=1") === "http://h.test/?q=1")
  }

  test("fragment dropped, query verbatim") {
    assert(canonicalize("http://h.test/p?b=2&a=1#frag") === "http://h.test/p?b=2&a=1")
  }

  test("dot segments removed (RFC 3986 §5.2.4)") {
    assert(canonicalize("http://h.test/a/b/../../p/3") === "http://h.test/p/3")
    assert(canonicalize("http://h.test/./p/3") === "http://h.test/p/3")
    assert(canonicalize("http://h.test/a/../p/3") === "http://h.test/p/3")
    assert(canonicalize("http://h.test/p/..") === "http://h.test/")
    assert(canonicalize("http://h.test/../../x") === "http://h.test/x")
  }

  test("percent-escapes: decode unreserved, uppercase the rest") {
    assert(canonicalize("http://h.test/%70/%2f/%7e") === "http://h.test/p/%2F/~")
    assert(canonicalize("http://h.test/%41%5a%61") === "http://h.test/AZa")
  }

  test("RFC 3986 §5.4 resolution examples (canonical form)") {
    val base = "http://a/b/c/d;p?q"
    assert(resolve(base, "g") === "http://a/b/c/g")
    assert(resolve(base, "./g") === "http://a/b/c/g")
    assert(resolve(base, "g/") === "http://a/b/c/g/")
    assert(resolve(base, "/g") === "http://a/g")
    assert(resolve(base, "//g") === "http://g/")
    assert(resolve(base, "?y") === "http://a/b/c/d;p?y")
    assert(resolve(base, "g?y") === "http://a/b/c/g?y")
    assert(resolve(base, "#s") === "http://a/b/c/d;p?q")
    assert(resolve(base, "../g") === "http://a/b/g")
    assert(resolve(base, "../../g") === "http://a/g")
    assert(resolve(base, "../../../g") === "http://a/g")
    assert(resolve(base, "g/../h") === "http://a/b/c/h")
  }

  test("host and path extraction") {
    assert(host("http://host3.test:8080/p/1?q=2") === "host3.test")
    assert(path("http://host3.test/p/1?q=2") === "/p/1")
    assert(path("http://host3.test") === "/")
  }

  test("property: canonicalize is idempotent on synthetic-web raw forms") {
    val cfg = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val urls = SyntheticWeb.seedUrls(200, cfg) ++
      (for {
        h <- 0 until 8; k <- 0 until 30
        base = SyntheticWeb.canonicalPage(h, k)
        raw <- SyntheticWeb.fetchParse(base, cfg)._2
      } yield resolve(base, raw))
    urls.foreach { u =>
      val c = canonicalize(u)
      assert(canonicalize(c) === c, s"not idempotent: $u -> $c")
    }
  }

  test("property: all resolved synthetic-web links land in the closed page space") {
    val cfg = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val pageRe = "^http://host[0-7]\\.test/p/[0-9]+$".r
    for {
      h <- 0 until 8; k <- 0 until 30
      base = SyntheticWeb.canonicalPage(h, k)
      raw <- SyntheticWeb.fetchParse(base, cfg)._2
    } {
      val c = resolve(base, raw)
      assert(pageRe.matches(c), s"off-space link: base=$base raw=$raw -> $c")
    }
  }
}
