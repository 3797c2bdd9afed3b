package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization + registered-domain extraction (x22) — the
  * crawl stage that runs BEFORE text extraction: normalize each page's
  * URL so the same resource never counts twice, then key
  * blocklist/allowlist decisions on the REGISTERED domain (the unit a
  * crawl curates by). Per-row, shuffle-free, codegen'd — the blocklist
  * itself is a broadcast join, never a corpus shuffle.
  *
  * The semantics are DEFINED as this rule chain (RFC 3986's
  * case/port/fragment equivalences plus the tracking-parameter strip
  * every crawl pipeline applies), which the x22 oracle replays with
  * DuckDB string/regex functions and UrlSpec pins against an
  * independent java.net.URI-based reimplementation:
  *
  *  1. the fragment (first `#` to end) is dropped — it never reaches
  *     the server;
  *  2. scheme and authority are lowercased (path/query case is
  *     PRESERVED — paths are case-sensitive on most origins);
  *  3. the scheme's default port is dropped (`:80` for http, `:443`
  *     for https; any other explicit port survives);
  *  4. one leading `www.` host label is dropped;
  *  5. an empty path becomes `/`;
  *  6. query parameters split on `&`; empty params and tracking params
  *     — name (text before the first `=`) starting with `utm_` or
  *     equal to `fbclid`/`gclid`/`ref` — are dropped, survivor order
  *     kept, and a query with no survivors loses its `?`.
  *
  * DECLARED ENVELOPE (outside it the expressions REFUSE loudly rather
  * than emit a guess; [[Urls.inEnvelope]] is the cheap pre-filter a
  * crawl runs first — `filter(graft_url_ok(url))` — so malformed crawl
  * records are dropped by policy, not by job failure): absolute
  * http/https URLs, non-empty authority of printable ASCII (IDN hosts
  * must be punycoded upstream), no userinfo (`@`). Percent-encoding
  * normalization and path dot-segment removal are declared out: both
  * need origin knowledge to be safe and neither is needed for
  * same-string dedup of a crawl's own records.
  *
  * Registered domain = last two host labels, or last THREE when the
  * final label is a 2-letter country code and the second-to-last is a
  * conventional second-level prefix (`co com net org gov ac edu` —
  * the `sample.co.uk` shape). This is the standard public-suffix-list
  * rule restricted to its overwhelmingly-common cases; a full PSL
  * snapshot drops into [[Urls.CcSld]] without touching the plan.
  */
object Urls {

  /** Second-level labels that combine with a 2-letter ccTLD to form a
    * public suffix (the mini-PSL rule; see scaladoc above).
    */
  val CcSld: Set[String] = Set("co", "com", "net", "org", "gov", "ac", "edu")

  /** Parsed parts of an in-envelope URL (fragment already dropped,
    * scheme + authority lowercased), or null when out of envelope.
    */
  private final class Parts(val scheme: String, val auth: String, val rest: String)

  private def toLowerAscii(s: String): String = {
    var i = 0
    var same = true
    while (same && i < s.length) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') same = false else i += 1
    }
    if (same) s
    else {
      val b = new java.lang.StringBuilder(s)
      var j = i
      while (j < s.length) {
        val c = b.charAt(j)
        if (c >= 'A' && c <= 'Z') b.setCharAt(j, (c + 32).toChar)
        j += 1
      }
      b.toString
    }
  }

  private def parse(full: String): Parts = {
    val hash = full.indexOf('#')
    val s = if (hash >= 0) full.substring(0, hash) else full
    val se = s.indexOf("://")
    if (se <= 0) return null
    val scheme = toLowerAscii(s.substring(0, se))
    if (scheme != "http" && scheme != "https") return null
    val start = se + 3
    val n = s.length
    var authEnd = start
    while (authEnd < n && s.charAt(authEnd) != '/' && s.charAt(authEnd) != '?')
      authEnd += 1
    if (authEnd == start) return null // empty authority
    var k = start
    while (k < authEnd) {
      val c = s.charAt(k)
      if (c <= ' ' || c >= 0x7f || c == '@') return null
      k += 1
    }
    new Parts(scheme, toLowerAscii(s.substring(start, authEnd)), s.substring(authEnd))
  }

  private def fail(u: String): Nothing =
    throw new IllegalArgumentException(
      "graft url: outside the declared envelope (absolute http/https, " +
        "printable-ASCII authority, no userinfo) - pre-filter with " +
        s"graft_url_ok: ${u.take(200)}")

  /** Cheap envelope probe (the crawl pre-filter); called from codegen.
    * True iff [[canonicalize]] succeeds — the two can never disagree
    * (a bare parse check would accept `http://www.:443`, whose
    * authority strips to nothing). No exception rides the rejection
    * path: at crawl scale this filter's whole job is rejecting
    * garbage, and a fill-in-stack-trace per malformed row would make
    * the cheap check expensive exactly where it runs hottest.
    */
  def inEnvelope(u: UTF8String): Boolean = canonicalizeOrNull(u.toString) != null

  private def isTracking(q: String, start: Int, end: Int): Boolean = {
    var eq = start
    while (eq < end && q.charAt(eq) != '=') eq += 1
    val len = eq - start
    (len >= 4 && q.startsWith("utm_", start)) ||
      (len == 6 && q.startsWith("fbclid", start)) ||
      (len == 5 && q.startsWith("gclid", start)) ||
      (len == 3 && q.startsWith("ref", start))
  }

  /** Rules 1-6; refuses outside the envelope. Called from codegen. */
  def canonicalize(u: UTF8String): UTF8String = {
    val full = u.toString
    val c = canonicalizeOrNull(full)
    if (c == null) fail(full)
    UTF8String.fromString(c)
  }

  /** Rules 1-6, null outside the envelope (the no-exception core both
    * [[canonicalize]] and [[inEnvelope]] share).
    */
  private def canonicalizeOrNull(full: String): String = {
    val p = parse(full)
    if (p == null) return null
    var auth = p.auth
    val defPort = if (p.scheme == "http") ":80" else ":443"
    if (auth.endsWith(defPort)) auth = auth.substring(0, auth.length - defPort.length)
    if (auth.startsWith("www.")) auth = auth.substring(4)
    if (auth.isEmpty || auth.charAt(0) == ':') return null // was only www./port
    val rest = p.rest
    val qi = rest.indexOf('?')
    val path = if (qi < 0) { if (rest.isEmpty) "/" else rest }
               else if (qi == 0) "/" else rest.substring(0, qi)
    val sb = new java.lang.StringBuilder(full.length)
    sb.append(p.scheme).append("://").append(auth).append(path)
    if (qi >= 0) {
      val q = rest.substring(qi + 1)
      val qb = new java.lang.StringBuilder(q.length)
      var start = 0
      while (start <= q.length) {
        var end = q.indexOf('&', start)
        if (end < 0) end = q.length
        if (end > start && !isTracking(q, start, end)) {
          if (qb.length > 0) qb.append('&')
          qb.append(q, start, end)
        }
        start = end + 1
      }
      if (qb.length > 0) sb.append('?').append(qb)
    }
    sb.toString
  }

  /** Registered domain of an in-envelope URL (canonical or raw — the
    * rule only reads the host's tail labels, so a leading `www.` is
    * irrelevant). Refuses on empty host labels (`a..b`, `.a`, `a.`);
    * a dotless host (e.g. an intranet name) is its own registered
    * domain. Called from codegen.
    */
  def registeredDomain(u: UTF8String): UTF8String = {
    val full = u.toString
    val p = parse(full)
    if (p == null) fail(full)
    val ci = p.auth.indexOf(':')
    val host = if (ci >= 0) p.auth.substring(0, ci) else p.auth
    if (host.isEmpty) fail(full)
    val labels = host.split("\\.", -1)
    if (labels.exists(_.isEmpty)) fail(full)
    val n = labels.length
    if (n < 2) return UTF8String.fromString(host)
    val cc = n >= 3 && labels(n - 1).length == 2 && CcSld.contains(labels(n - 2))
    val take = if (cc) 3 else 2
    UTF8String.fromString(labels.slice(n - take, n).mkString("."))
  }
}

/** `graft_url_ok(url)` — true iff the URL is inside the declared
  * canonicalization envelope (the crawl pre-filter), codegen'd.
  */
case class UrlInEnvelope(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_url_ok"
  override def nullSafeEval(input: Any): Any =
    Urls.inEnvelope(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val m = classOf[Urls.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $m.inEnvelope($s);"
    })
  override protected def withNewChildInternal(newChild: Expression): UrlInEnvelope =
    copy(child = newChild)
}

/** `graft_canon_url(url)` — canonical form of an http/https URL (one
  * codegen'd pass; refuses outside the declared envelope).
  */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_canon_url"
  override def nullSafeEval(input: Any): Any =
    Urls.canonicalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val m = classOf[Urls.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $m.canonicalize($s);"
    })
  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

/** `graft_reg_domain(url)` — registered domain (mini-PSL rule) of an
  * http/https URL, codegen'd.
  */
case class UrlRegisteredDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_reg_domain"
  override def nullSafeEval(input: Any): Any =
    Urls.registeredDomain(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val m = classOf[Urls.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $m.registeredDomain($s);"
    })
  override protected def withNewChildInternal(newChild: Expression): UrlRegisteredDomain =
    copy(child = newChild)
}
