package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization + registered domain (x22): hand cases for every
  * declared rule, refusal at the envelope boundary, an INDEPENDENT
  * reimplementation (java.net.URI accessors + the declared rules,
  * instead of the production single-pass parser) compared on seeded
  * in-envelope inputs, codegen/interpreted parity, and the x22 gate's
  * broadcast-blocklist plan shape.
  */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(s: String): String =
    Urls.canonicalize(UTF8String.fromString(s)).toString
  private def dom(s: String): String =
    Urls.registeredDomain(UTF8String.fromString(s)).toString
  private def ok(s: String): Boolean =
    Urls.inEnvelope(UTF8String.fromString(s))

  // --------------------------------------------- independent chain

  /** The declared rule chain rebuilt from java.net.URI's parser. */
  private def uriCanon(s: String): String = {
    val h = s.indexOf('#')
    val uri = new java.net.URI(if (h >= 0) s.substring(0, h) else s)
    val scheme = uri.getScheme.toLowerCase(java.util.Locale.ROOT)
    var host = uri.getHost.toLowerCase(java.util.Locale.ROOT)
    val defPort = if (scheme == "http") 80 else 443
    val port = if (uri.getPort == -1 || uri.getPort == defPort) ""
               else ":" + uri.getPort
    if (host.startsWith("www.")) host = host.substring(4)
    val path = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
    val kept = Option(uri.getRawQuery).map(_.split("&", -1).filter { p =>
      val name = p.split("=", 2)(0)
      p.nonEmpty &&
        !(name.startsWith("utm_") || Set("fbclid", "gclid", "ref")(name))
    }).getOrElse(Array.empty[String])
    scheme + "://" + host + port + path +
      (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
  }

  private def uriDomain(s: String): String = {
    val h = s.indexOf('#')
    val uri = new java.net.URI(if (h >= 0) s.substring(0, h) else s)
    val labels = uri.getHost.toLowerCase(java.util.Locale.ROOT).split("\\.")
    val n = labels.length
    if (n < 2) labels(0)
    else {
      val cc = n >= 3 && labels(n - 1).length == 2 && Urls.CcSld(labels(n - 2))
      labels.drop(n - (if (cc) 3 else 2)).mkString(".")
    }
  }

  // ------------------------------------------------------ hand cases

  test("fragment dropped; scheme/host lowercased; path+query case kept") {
    assert(canon("http://a.com/x#frag") == "http://a.com/x")
    assert(canon("HTTP://A.COM/Path?Q=V#S") == "http://a.com/Path?Q=V")
    assert(canon("HtTpS://MiXeD.Org/") == "https://mixed.org/")
  }

  test("default port dropped only for the matching scheme") {
    assert(canon("https://a.com:443/") == "https://a.com/")
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("http://a.com:443/") == "http://a.com:443/") // not http's default
    assert(canon("https://a.com:8080/") == "https://a.com:8080/")
  }

  test("one leading www. label dropped; lookalikes kept") {
    assert(canon("http://www.a.com/") == "http://a.com/")
    assert(canon("http://WWW.a.com:80/") == "http://a.com/")
    assert(canon("http://wwwx.com/") == "http://wwwx.com/")
    assert(canon("http://www.www.a.com/") == "http://www.a.com/") // ONE label
  }

  test("empty path becomes /") {
    assert(canon("http://a.com") == "http://a.com/")
    assert(canon("http://a.com?page=1") == "http://a.com/?page=1")
  }

  test("tracking params dropped by name; survivors keep order; empty query loses ?") {
    assert(canon("http://a.com/?utm_source=x&page=1&fbclid=2&gclid=3&ref=h&lang=en")
      == "http://a.com/?page=1&lang=en")
    assert(canon("http://a.com/p?utm_a=1&ref=x") == "http://a.com/p")
    assert(canon("http://a.com/?utm_=1&a=2") == "http://a.com/?a=2") // utm_ itself matches
    assert(canon("http://a.com/?refx=1&utm=2") == "http://a.com/?refx=1&utm=2") // names differ
    assert(canon("http://a.com/?REF=k") == "http://a.com/?REF=k") // names case-sensitive
    assert(canon("http://a.com/?a&&b") == "http://a.com/?a&b") // empty params dropped
    assert(canon("http://a.com/?ref") == "http://a.com/") // name-only param
  }

  test("outside the envelope: refuses loudly, urlOk says so first") {
    val bad = Seq("ftp://a.com/", "not a url", "http://", "://x",
      "http://user@a.com/", "http://höst.de/", "relative/path")
    bad.foreach { u =>
      assert(!ok(u), u)
      intercept[IllegalArgumentException](canon(u))
      intercept[IllegalArgumentException](dom(u))
    }
    Seq("http://a.com", "HTTPS://WWW.A.co.uk:443/x?y#z").foreach(u => assert(ok(u), u))
  }

  test("registered domain: base rule, ccSLD rule, dotless, port, depth") {
    assert(dom("http://a.b.example.com/") == "example.com")
    assert(dom("https://x.sample.co.uk:8443/") == "sample.co.uk")
    assert(dom("http://x.ac.jp/") == "x.ac.jp")
    assert(dom("http://foo.uk/") == "foo.uk") // two labels: cc rule needs three
    assert(dom("http://a.co.com/") == "co.com") // 'com' is no 2-letter cc
    assert(dom("http://localhost/") == "localhost")
    assert(dom("http://deep.sub.example.org:8080/x") == "example.org")
    assert(dom("http://www.example.org/") == "example.org") // tail labels only
    intercept[IllegalArgumentException](dom("http://a..b/")) // empty label
  }

  // ------------------------------- independent-parser equivalence

  test("canonicalize + domain equal the java.net.URI chain on 600 seeded inputs") {
    val rnd = new scala.util.Random(20260815L)
    val schemes = Array("http", "https", "HTTP", "HtTpS")
    val labels = Array("alpha", "Beta9", "x", "CDN", "site-7", "d0t")
    val tld2 = Array("uk", "jp", "de")
    val tldN = Array("com", "org", "io", "dev")
    val params = Array("utm_source=1", "utm_campaign=Z", "utm_=t", "fbclid=9",
      "gclid=", "ref=h", "REF=keep", "refx=2", "utm=3", "page=2", "q=a+b",
      "lang=EN", "x", "ref")
    (0 until 600).foreach { i =>
      val scheme = schemes(rnd.nextInt(schemes.length))
      val www = if (rnd.nextBoolean()) "www." else ""
      val depth = 1 + rnd.nextInt(3)
      val ccSld = rnd.nextBoolean()
      val slds = Array("co", "ac", "net")
      val ports = Array("", ":80", ":443", ":8080")
      val paths = Array("", "/", "/A/b.html", "/p/Q/r")
      val host = (0 until depth).map(_ => labels(rnd.nextInt(labels.length)))
        .mkString(".") +
        (if (ccSld) "." + slds(rnd.nextInt(3)) + "." + tld2(rnd.nextInt(tld2.length))
         else "." + tldN(rnd.nextInt(tldN.length)))
      val port = ports(rnd.nextInt(4))
      val path = paths(rnd.nextInt(4))
      val query =
        if (rnd.nextInt(4) == 0) ""
        else "?" + (0 until 1 + rnd.nextInt(4))
          .map(_ => params(rnd.nextInt(params.length))).mkString("&")
      val frag = if (rnd.nextBoolean()) "#Frag-9" else ""
      val url = s"$scheme://$www$host$port$path$query$frag"
      assert(canon(url) == uriCanon(url), s"case $i: $url")
      assert(dom(url) == uriDomain(url), s"case $i: $url")
      assert(ok(url), s"case $i: $url")
    }
  }

  test("codegen/interpreted parity (DataFrame select vs direct eval)") {
    val rows = Seq(
      "HTTPS://WWW.News2.example.COM:443/Articles/2/x?utm_source=f&page=3#s",
      "http://blog1.Sample.co.uk:80/index.html?fbclid=a&lang=en",
      "http://a.b.demo.org:8080/?ref=h&q=1",
      "http://localhost/just/a/path")
    val got = rows.toDF("url")
      .select(F.urlOk($"url").as("ok"), F.canonUrl($"url").as("c"),
        F.regDomain($"url").as("d"))
      .collect().map(r => (r.getBoolean(0), r.getString(1), r.getString(2))).toSeq
    val want = rows.map(u => (ok(u), canon(u), dom(u)))
    assert(got == want)
  }

  test("x22 gate: blocklist joins broadcast, the corpus never shuffles for it") {
    val df = graft.operators.TextAnalysis.x22UrlFilter(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every planted co.uk doc (doc_id % 3 == 1) is dropped, others kept
    rows.foreach { r =>
      val expect = if (r.getLong(0) % 3 == 1) "drop" else "keep"
      assert(r.getString(3) == expect, r.toString)
    }
  }
}
