package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.CanonicalUrl
import graft.operators.{BloomShard, CuckooFilter}
import graft.util.XxHash64

/** Generative property suites (SURVEY.md §5.2) — run by sbt's native
  * ScalaCheck integration, no Spark session needed.
  */
object CanonicalUrlProps extends Properties("CanonicalUrl") {

  private val genHost: Gen[String] = for {
    n <- Gen.chooseNum(1, 3)
    parts <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString))
  } yield parts.mkString(".") + ".test"

  private val genSegment: Gen[String] =
    Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(6).mkString),
      Gen.const("."), Gen.const(".."),
      Gen.const("%7e"), Gen.const("%2F"), Gen.const("a%20b"))

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "Https")
    host <- genHost
    hostCased <- Gen.oneOf(host, host.toUpperCase)
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    nSeg <- Gen.chooseNum(0, 5)
    segs <- Gen.listOfN(nSeg, genSegment)
    query <- Gen.oneOf("", "?a=1&b=2", "?b=2&a=1", "?")
    frag <- Gen.oneOf("", "#f", "#")
  } yield s"$scheme://$hostCased$port/${segs.mkString("/")}$query$frag"

  property("idempotent") = forAll(genUrl) { u =>
    val c = CanonicalUrl.canonicalize(u)
    CanonicalUrl.canonicalize(c) == c
  }

  property("lowercase scheme+host, no default ports, no fragments") =
    forAll(genUrl) { u =>
      val c = CanonicalUrl.canonicalize(u)
      val schemeEnd = c.indexOf("://")
      val scheme = c.substring(0, schemeEnd)
      val host = CanonicalUrl.host(c)
      scheme == scheme.toLowerCase && host == host.toLowerCase &&
        !c.contains("#") &&
        !(scheme == "http" && c.contains(s"$host:80/")) &&
        !(scheme == "https" && c.contains(s"$host:443/"))
    }

  property("no dot segments survive") = forAll(genUrl) { u =>
    val path = CanonicalUrl.path(CanonicalUrl.canonicalize(u))
    !path.split('/').contains(".") && !path.split('/').contains("..")
  }

  property("resolve(base, abs-path) keeps base origin") =
    forAll(genUrl, Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(6).mkString)) {
      (base, seg) =>
        val r = CanonicalUrl.resolve(base, s"/$seg")
        CanonicalUrl.host(r) == CanonicalUrl.host(CanonicalUrl.canonicalize(base))
    }
}

object FilterProps extends Properties("SeenFilters") {

  private val genUrls: Gen[List[String]] =
    Gen.listOf(for {
      h <- Gen.chooseNum(0, 63)
      p <- Gen.chooseNum(0, 100000)
    } yield s"http://host$h.test/p/$p").map(_.distinct)

  property("bloom: no false negatives") = forAll(genUrls) { urls =>
    val b = BloomShard.sized(math.max(urls.size, 1), 0.01)
    urls.foreach(b.insert)
    urls.forall(b.mightContain)
  }

  property("bloom: merge(a,b) == insert-all") = forAll(genUrls, genUrls) { (ua, ub) =>
    val a = BloomShard.sized(1000, 0.01)
    val b = BloomShard.sized(1000, 0.01)
    val all = BloomShard.sized(1000, 0.01)
    ua.foreach(a.insert); ub.foreach(b.insert)
    (ua ++ ub).foreach(all.insert)
    a.merge(b).bits.toSeq == all.bits.toSeq
  }

  property("cuckoo: contains after insert; survivors intact after deletes") =
    forAll(genUrls) { urls =>
      val f = CuckooFilter.sized(math.max(urls.size * 2, 8))
      urls.foreach(f.insert)
      val (del, keep) = urls.splitAt(urls.size / 2)
      val allIn = urls.forall(f.mightContain)
      del.foreach(f.delete)
      allIn && keep.forall(f.mightContain)
    }

  property("cuckoo: fingerprint merge preserves membership") =
    forAll(genUrls, genUrls) { (ua, ub) =>
      val cap = math.max((ua.size + ub.size) * 2, 8)
      val a = CuckooFilter.sized(cap)
      val b = CuckooFilter.sized(cap)
      ua.foreach(a.insert); ub.foreach(b.insert)
      a.mergeFrom(b)
      (ua ++ ub).forall(a.mightContain)
    }

  property("xxhash64: pure impl matches itself across encodings of same string") =
    forAll(Gen.asciiPrintableStr) { s =>
      XxHash64.hashString(s) == XxHash64.hash(s.getBytes("UTF-8"), 42L)
    }
}

object RobotsEvalProps extends Properties("RobotsEval") {
  import graft.crawl.{RobotsEval, RobotsRule}

  private val genHost: Gen[String] =
    Gen.chooseNum(0, 19).map(i => s"host$i.test")
  private val genPrefix: Gen[String] = for {
    n <- Gen.chooseNum(1, 3)
    segs <- Gen.listOfN(n, Gen.oneOf("p", "a", "b", "1", "12", "2", "x"))
  } yield "/" + segs.mkString("/")
  private val genRules: Gen[List[RobotsRule]] =
    Gen.listOf(Gen.zip(genHost, genPrefix, Gen.oneOf(true, false)))
      .map(_.zipWithIndex.map { case ((h, p, a), i) => RobotsRule(h, p, a, i) })
  private val genPath: Gen[String] = genPrefix

  /** The host-keyed probe must equal the naive full-scan evaluation —
    * the structure change (VERDICT r2 item 1) is output-invariant for ANY
    * rule set, including same-host equal-length-prefix ties (rule_order).
    */
  property("host-keyed probe == naive full-list scan") =
    forAll(genRules, genHost, genPath) { (rules, host, path) =>
      val byHost = RobotsEval.byHost(rules)
      val naive = {
        val matching = rules.filter(r => r.host == host && path.startsWith(r.path_prefix))
        if (matching.isEmpty) true
        else matching.minBy(r => (-r.path_prefix.length, r.rule_order)).allow
      }
      RobotsEval.allowed(byHost.getOrElse(host, Nil), path) == naive
    }

  property("no matching rule -> allow") =
    forAll(genRules, genHost) { (rules, host) =>
      RobotsEval.allowed(rules.filter(_.host == host), "/nomatch-xyz/deep") ||
        rules.exists(r => r.host == host && "/nomatch-xyz/deep".startsWith(r.path_prefix))
    }
}

object ContentHashProps extends Properties("ContentHash") {
  import graft.crawl.{ContentHash, Span}

  // adversarial field content: includes nulls, empties, and the characters
  // a separator-based serialization would be ambiguous over (',', ';',
  // control chars, digits that could fuse with a length prefix)
  private val genField: Gen[String] = Gen.oneOf(
    Gen.const(null: String), Gen.const(""),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', ';', '\u0001',
      '\u0002', '\u0003', '1', '-'))).map(_.mkString))
  private val genSpan: Gen[Span] = for {
    kind <- Gen.oneOf("text", "media", "", "1,", ";")
    text <- genField
    media <- genField
    off <- Gen.chooseNum(-1, 20)
  } yield Span(kind, text, media, off)
  private val genSpans: Gen[List[Span]] = Gen.listOf(genSpan).map(_.take(6))

  property("deterministic") = forAll(genSpans) { s =>
    ContentHash.ofSpans(s) == ContentHash.ofSpans(s.map(identity))
  }

  /** The length-prefixed serialization is injective, so distinct span
    * sequences — including ones differing only by a would-be separator
    * character inside a field, a null-vs-empty field, or a record-boundary
    * shift — must hash apart (a true 64-bit collision is ~2^-64 per pair;
    * none can occur over these few hundred structured cases).
    */
  property("distinct span sequences hash apart") =
    forAll(genSpans, genSpans) { (a, b) =>
      (a == b) == (ContentHash.ofSpans(a) == ContentHash.ofSpans(b))
    }
}

/** Sitemap parsing / expansion properties (round 5 s13): generated loc
  * lists round-trip through the XML writer's entity escaping, index
  * expansion is the in-order concatenation of distinct same-host
  * children's entries with each child fetched exactly once, and robots
  * `Sitemap:` extraction keeps same-host declarations in order deduped —
  * each checked against an independently-written reference model.
  */
object SitemapProps extends Properties("Sitemap") {
  import graft.functions.{RobotsTxt, Sitemap}

  private val host = "a.test"
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val genLoc: Gen[String] = for {
    h <- Gen.oneOf("a.test", "A.TEST", "b.test")
    port <- Gen.oneOf("", ":80")
    seg <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(6).mkString)
    q <- Gen.oneOf("", "?x=1&y=2")
  } yield s"http://$h$port/$seg$q"

  private def sameHostCanonical(locs: List[String]): List[String] =
    locs.map(CanonicalUrl.canonicalize)
      .filter(c => CanonicalUrl.host(c) == host)

  property("urlset round-trip: entries == same-host canonicalized locs in order") =
    forAll(Gen.listOf(genLoc).map(_.take(12))) { locs =>
      val xml = "<urlset>" +
        locs.map(l => s"<url><loc>${esc(l)}</loc></url>").mkString + "</urlset>"
      Sitemap.entries(host, xml) == sameHostCanonical(locs)
    }

  property("index expand: in-order concat of distinct same-host children, " +
    "each fetched once") =
    forAll(Gen.listOf(Gen.chooseNum(0, 4)).map(_.take(8)),
        Gen.listOfN(5, Gen.listOf(genLoc).map(_.take(6)))) { (refs, bodies) =>
      val idx = "<sitemapindex>" + refs.map(k =>
        s"<sitemap><loc>http://a.test/s$k.xml</loc></sitemap>").mkString +
        "</sitemapindex>"
      val calls = scala.collection.mutable.ArrayBuffer.empty[String]
      val ChildRe = "http://a\\.test/s([0-9])\\.xml".r
      val fetchAt: String => Option[String] = { u =>
        calls += u
        ChildRe.findFirstMatchIn(u).map { m =>
          "<urlset>" + bodies(m.group(1).toInt)
            .map(l => s"<url><loc>${esc(l)}</loc></url>").mkString + "</urlset>"
        }
      }
      val out = Sitemap.expand(host, idx, fetchAt)
      val expected = refs.distinct.flatMap(k => sameHostCanonical(bodies(k)))
      out == expected && calls.size == refs.distinct.size
    }

  property("robots sitemapUrls: same-host declarations in order, deduped; " +
    "rule lines ignored") =
    forAll(Gen.listOf(genLoc).map(_.take(10))) { locs =>
      val body = "User-agent: *\nDisallow: /x\n" +
        locs.map(l => s"Sitemap: $l").mkString("\n") + "\n"
      RobotsTxt.sitemapUrls(host, body) == sameHostCanonical(locs).distinct
    }
}
