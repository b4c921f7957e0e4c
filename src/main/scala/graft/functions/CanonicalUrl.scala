package graft.functions

/** RFC 3986 URL canonicalization and relative-reference resolution.
  *
  * Binding semantics per SURVEY.md §1.4.1 (derived from BASELINE.json
  * north_star "RFC 3986 canonicalization"; the reference mount was empty, so
  * this spec is authoritative):
  *
  *   - lowercase scheme and host
  *   - strip default port (:80 for http, :443 for https)
  *   - remove dot-segments from the path (RFC 3986 §5.2.4)
  *   - percent-decode unreserved characters (A-Za-z0-9 - . _ ~); uppercase
  *     the hex digits of remaining percent-escapes (path component only)
  *   - empty path -> "/"
  *   - drop the fragment
  *   - query kept verbatim (order-preserving)
  *
  * Pure Scala, no Spark — shared by the sequential oracle and the engine's
  * typed map functions. Idempotent by construction (property-tested).
  */
object CanonicalUrl {

  @inline private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  @inline private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Normalize percent-escapes in a path: decode unreserved, uppercase the
    * hex of everything else. Malformed escapes are left verbatim.
    */
  private[functions] def normalizeEscapes(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        val decoded = v.toChar
        if (v < 128 && isUnreserved(decoded)) sb.append(decoded)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Remove dot-segments, RFC 3986 §5.2.4. Input is the raw path. */
  private[functions] def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        val j = out.lastIndexOf("/")
        out.setLength(if (j >= 0) j else 0)
      } else if (in == "/..") {
        in = "/"
        val j = out.lastIndexOf("/")
        out.setLength(if (j >= 0) j else 0)
      } else if (in == "." || in == "..") in = ""
      else {
        // move first segment (up to but not including the next '/') to out
        val start = if (in.startsWith("/")) 1 else 0
        val j = in.indexOf('/', start)
        if (j < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, j)); in = in.substring(j) }
      }
    }
    out.toString
  }

  private final case class Parts(scheme: String, host: String, port: Int,
                                 path: String, query: String /* null = none */)

  /** Parse an absolute http(s)-style URL. Fragment is dropped here.
    * Returns null for inputs without "://" (treated as opaque; caller decides).
    */
  private def parse(url: String): Parts = {
    val noFrag = {
      val i = url.indexOf('#')
      if (i < 0) url else url.substring(0, i)
    }
    val si = noFrag.indexOf("://")
    if (si < 0) return null
    val scheme = noFrag.substring(0, si).toLowerCase
    val rest = noFrag.substring(si + 3)
    // authority ends at first '/' or '?'
    var ae = rest.length
    var k = 0
    var done = false
    while (k < rest.length && !done) {
      val c = rest.charAt(k)
      if (c == '/' || c == '?') { ae = k; done = true }
      k += 1
    }
    val authority = rest.substring(0, ae)
    val after = rest.substring(ae)
    val (path, query) = {
      val qi = after.indexOf('?')
      if (qi < 0) (after, null)
      else (after.substring(0, qi), after.substring(qi + 1))
    }
    // authority = [userinfo@]host[:port]; synthetic web has no userinfo but
    // handle it by splitting at the last '@'
    val at = authority.lastIndexOf('@')
    val hostPort = if (at < 0) authority else authority.substring(at + 1)
    val ci = hostPort.lastIndexOf(':')
    val (host, port) =
      if (ci < 0) (hostPort, -1)
      else {
        val ps = hostPort.substring(ci + 1)
        if (ps.nonEmpty && ps.forall(_.isDigit)) (hostPort.substring(0, ci), ps.toInt)
        else (hostPort, -1)
      }
    Parts(scheme, host.toLowerCase, port, path, query)
  }

  /** Canonical form per the spec above. Non-hierarchical inputs (no "://")
    * are returned trimmed but otherwise verbatim.
    */
  def canonicalize(url: String): String = {
    val p = parse(url.trim)
    if (p == null) return url.trim
    val defaultPort = p.scheme match {
      case "http"  => 80
      case "https" => 443
      case _       => -1
    }
    val portStr = if (p.port < 0 || p.port == defaultPort) "" else ":" + p.port
    val rawPath = if (p.path.isEmpty) "/" else p.path
    val path0 = removeDotSegments(normalizeEscapes(rawPath))
    val path = if (path0.isEmpty) "/" else path0
    val q = if (p.query == null) "" else "?" + p.query
    p.scheme + "://" + p.host + portStr + path + q
  }

  /** Host of a canonical URL ("" if unparseable). */
  def host(url: String): String = {
    val p = parse(url)
    if (p == null) "" else p.host
  }

  /** Path of a canonical URL ("/" if empty; "" if unparseable). Query and
    * fragment excluded — this is what robots path_prefix rules match.
    */
  def path(url: String): String = {
    val p = parse(url)
    if (p == null) "" else if (p.path.isEmpty) "/" else p.path
  }

  /** Resolve a (possibly relative) reference against an absolute base URL,
    * RFC 3986 §5.2, then canonicalize. Covers the reference shapes the
    * synthetic web emits: absolute, network-path ("//h/p"), absolute-path
    * ("/p"), relative ("p", "../p", "./p"), query-only ("?q"), fragment-only.
    */
  def resolve(base: String, ref: String): String = {
    val r = ref.trim
    if (r.isEmpty) return canonicalize(base)
    if (r.contains("://")) return canonicalize(r)
    val b = parse(base)
    if (b == null) return canonicalize(r)
    val origin = b.scheme + "://" + b.host + (if (b.port >= 0) ":" + b.port else "")
    if (r.startsWith("//")) return canonicalize(b.scheme + ":" + r)
    if (r.startsWith("#")) return canonicalize(base)
    if (r.startsWith("?")) {
      val basePath = if (b.path.isEmpty) "/" else b.path
      return canonicalize(origin + basePath + r)
    }
    if (r.startsWith("/")) return canonicalize(origin + r)
    // relative path: merge with base path directory (RFC 3986 §5.2.3)
    val basePath = if (b.path.isEmpty) "/" else b.path
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    canonicalize(origin + dir + r)
  }
}
