package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction (x20): hand cases for every declared rule, an
  * INDEPENDENT regex-chain reimplementation (the declared semantics,
  * built from java.util.regex instead of the production single-pass
  * scanner) compared on seeded hostile inputs inside the declared
  * envelope, boilerplate-line filter cases, and codegen/interpreted
  * parity.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(s: String): String =
    HtmlText.extract(UTF8String.fromString(s)).toString
  private def keep(s: String, n: Int): String =
    HtmlText.keepLines(UTF8String.fromString(s), n).toString

  // ------------------------------------------------ reference chain

  /** The declared rule chain, implemented independently with regexes. */
  private def chainExtract(html: String): String = {
    var x = html.replaceAll("(?s)<!--.*?-->|<!--.*$", "")
    for (t <- Seq("script", "style", "head", "nav", "footer"))
      x = x.replaceAll(s"(?is)<$t(?=[\\s/>])[^>]*>.*?</$t[^>]*>|<$t(?=[\\s/>])[^>]*>.*$$", "")
    x = x.replaceAll("(?s)<[^>]*>", "\n")
    // one left-to-right entity pass, decoded output never rescanned
    val p = java.util.regex.Pattern.compile(
      "&lt;|&gt;|&quot;|&apos;|&nbsp;|&amp;|&#[0-9]+;|&#[xX][0-9a-fA-F]+;")
    val m = p.matcher(x)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val g = m.group()
      val rep = g match {
        case "&lt;" => "<"
        case "&gt;" => ">"
        case "&quot;" => "\""
        case "&apos;" => "'"
        case "&nbsp;" => " "
        case "&amp;" => "&"
        case num =>
          val hex = num.charAt(2) == 'x' || num.charAt(2) == 'X'
          val digits = num.substring(if (hex) 3 else 2, num.length - 1)
          val cp = try BigInt(digits, if (hex) 16 else 10) catch { case _: Exception => BigInt(-1) }
          if (cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
            new String(Character.toChars(cp.toInt))
          else num // invalid stays literal
      }
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString.split("\n", -1).toSeq
      .map(_.replaceAll("[ \\t\\f\\r]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  // ------------------------------------------------------ hand cases

  test("basic document: containers gone, tags to lines, entities decoded") {
    val html = "<html><head><title>t</title><style>p{}</style></head><body>" +
      "<nav><a href=\"#\">home</a></nav><h1>Title &amp; more</h1>" +
      "<p>one   two\tthree</p><script>var x = 1 < 2;</script>" +
      "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f</p>" +
      "<footer>fin</footer></body></html>"
    assert(extract(html) == "Title & more\none two three\na <b> \"c\" 'd' e f")
  }

  test("comments: terminated removed, unterminated removed to end") {
    assert(extract("a <!-- x --> b") == "a b")
    assert(extract("a <!-- never closed b c") == "a")
    assert(extract("a <!-- one --> b <!-- two --> c") == "a b c")
  }

  test("containers: case-insensitive, attrs, first close wins, unterminated to end") {
    assert(extract("x<SCRIPT type=\"a\">b</ScRiPt>y") == "xy")
    assert(extract("x<script>a</script>mid<script>b</script>y") == "xmidy")
    assert(extract("x<style>p{color:red}") == "x")
    // <scriptx> is NOT a container open (name boundary), just a tag
    assert(extract("a<scriptx>b</scriptx>c") == "a\nb\nc")
    // self-closing spelling still opens the container (declared)
    assert(extract("a<script/>b</script>c") == "ac")
  }

  test("tags and stray angle brackets") {
    assert(extract("a<br>b<img src=\"x\"/>c") == "a\nb\nc")
    assert(extract("1 < 2 and 3 &lt; 4") == "1 < 2 and 3 < 4") // no '>' ahead: '<' literal
    assert(extract("tail dangles <unclosed") == "tail dangles <unclosed")
    assert(extract("amp in tail <unclosed &amp; here") == "amp in tail <unclosed & here")
  }

  test("entities: numeric, hex, invalid, out-of-range") {
    assert(extract("&#65;&#x42;") == "AB")
    assert(extract("&#128512;") == new String(Character.toChars(128512)))
    assert(extract("&zzz; &#; &#x; &#xGG; & alone") == "&zzz; &#; &#x; &#xGG; & alone")
    assert(extract("&#1114112;") == "&#1114112;") // 0x110000: out of range
    assert(extract("&#55296;") == "&#55296;") // lone surrogate refused
    assert(extract("&amp;lt; stays half-decoded") == "&lt; stays half-decoded")
  }

  test("line normalization: collapse, trim, drop empties") {
    assert(extract("<p></p><p>  </p><p>a</p>") == "a")
    assert(extract("  leading <b></b>  and   inner  ") == "leading\nand inner")
  }

  test("keepLines: word-count filter on normalized lines") {
    assert(keep("one two three\nfour five six seven eight", 5)
      == "four five six seven eight")
    assert(keep("a b c", 3) == "a b c")
    assert(keep("a b c", 4) == "")
    assert(keep("", 5) == "")
    assert(keep("one\ntwo three four five\nsix", 4) == "two three four five")
  }

  // ---------------------------------- hostile envelope equivalence

  test("scanner equals the independent regex chain on 500 seeded hostile inputs") {
    val rnd = new scala.util.Random(20260814L)
    val words = Array("data", "Spark", "merge", "1", "q&a", "x=y", "fin")
    val entities = Array("&amp;", "&lt;", "&gt;", "&quot;", "&apos;", "&nbsp;",
      "&#65;", "&#x41;", "&#128512;", "&zz;", "&#;", "&", "&#xZZ;", "&#999999999;")
    val plainTags = Array("<b>", "</b>", "<br/>", "<img src=\"a\" alt='b'>",
      "<DIV class=x>", "</div >", "<scripty>", "<heady>")
    val containers = Array("script", "style", "head", "nav", "footer")
    def innerText(): String = (0 until rnd.nextInt(4)).map { _ =>
      rnd.nextInt(3) match {
        case 0 => words(rnd.nextInt(words.length))
        case 1 => entities(rnd.nextInt(entities.length))
        case _ => plainTags(rnd.nextInt(plainTags.length))
      }
    }.mkString(" ")
    def token(): String = rnd.nextInt(10) match {
      case 0 | 1 | 2 | 3 => words(rnd.nextInt(words.length)) + (if (rnd.nextBoolean()) " " else "\t ")
      case 4 | 5 => entities(rnd.nextInt(entities.length))
      case 6 => plainTags(rnd.nextInt(plainTags.length))
      case 7 => s"<!-- ${innerText().replace("<!--", "").replace("-->", "")} -->"
      case 8 =>
        val t = containers(rnd.nextInt(containers.length))
        val attrs = if (rnd.nextBoolean()) " a=\"1\"" else ""
        // envelope: no comments or container tags cross-nested inside
        s"<$t$attrs>${innerText().replace("<!--", "").replace("</", "")}</$t>"
      case _ => "  "
    }
    (0 until 500).foreach { i =>
      val html = (0 until rnd.nextInt(25)).map(_ => token()).mkString
      assert(extract(html) == chainExtract(html), s"case $i: ${html.take(300)}")
    }
  }

  test("codegen/interpreted parity (DataFrame select vs direct eval)") {
    val rows = Seq(
      "<p>a &amp; b</p><script>x</script>",
      "plain text only",
      "<nav>gone</nav><h1>kept &#33;</h1>",
      "<!-- c --><footer>f</footer>trail &nbsp;x")
    val got = rows.toDF("html")
      .select(F.htmlText($"html").as("b"))
      .select($"b", F.keepLines($"b", 2).as("k"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val want = rows.map { h =>
      val b = extract(h); (b, keep(b, 2))
    }
    assert(got == want)
  }
}
