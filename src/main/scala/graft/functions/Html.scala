package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction (x20) — the step that runs BEFORE every
  * quality/dedup filter on a web crawl: strip markup, decode entities,
  * normalize lines, then drop boilerplate lines. One hand-written pass
  * per document (no per-row regex cascade over 100 TB), codegen'd,
  * shuffle-free.
  *
  * The semantics are DEFINED as this sequential rule chain, which the
  * x20 oracle replays with DuckDB regex/string functions and
  * HtmlSpec pins against an independent regex-chain reimplementation on
  * hostile inputs:
  *
  *  1. comments `<!-- … -->` removed (first terminator wins;
  *     unterminated → removed to end of input);
  *  2. container elements `script/style/head/nav/footer` removed WITH
  *     their content (case-insensitive tag names; ANY `<name …>` open —
  *     including a self-closing spelling — starts the container; the
  *     first `</name…>` close wins, same as the non-greedy per-tag
  *     regex; unterminated → removed to end). Declared envelope: the
  *     rules run in one left-to-right pass, so markup that CROSS-NESTS
  *     these constructs (a comment containing a container close tag, a
  *     container containing a comment open, interleaved container
  *     pairs) extracts deterministically but need not match the
  *     per-rule regex chain — real-world well-formed markup never
  *     cross-nests them;
  *  3. every remaining `<…>` tag → newline (first `>` ends the tag:
  *     attribute values must not contain '>'; a '<' with no '>' ahead
  *     stays literal text — exactly like the regex — and the tail still
  *     decodes entities);
  *  4. entities decoded in one scan: `&lt; &gt; &quot; &apos; &#39;`,
  *     `&nbsp;` → plain space, decimal `&#NNN;` / hex `&#xHH;` code
  *     points, `&amp;` → '&' (decoded output is NEVER rescanned, which
  *     matches the chain's decode-amp-last order); an invalid `&…`
  *     stays literal;
  *  5. per line: runs of space/tab/FF/CR collapse to one space, ends
  *     trimmed, empty lines dropped, lines joined with '\n'.
  */
object HtmlText {

  private val Removable = Array("script", "style", "head", "nav", "footer")

  private def regionMatches(s: String, at: Int, what: String): Boolean =
    s.regionMatches(true, at, what, 0, what.length)

  /** Steps 1–4: markup removal + entity decode into `out`. */
  private def stripMarkup(s: String, out: java.lang.StringBuilder): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (regionMatches(s, i, "<!--")) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          // removable container? (open tag must be <name then \s / or >)
          var name: String = null
          var k = 0
          while (name == null && k < Removable.length) {
            val t = Removable(k)
            if (regionMatches(s, i + 1, t) && i + 1 + t.length < n &&
                "> \t\n\f\r/".indexOf(s.charAt(i + 1 + t.length)) >= 0)
              name = t
            k += 1
          }
          val gt = s.indexOf('>', i + 1)
          if (gt < 0) {
            // no '>' anywhere ahead: not a tag — the '<' stays literal
            // and the tail still gets entity decoding
            out.append('<')
            i += 1
          } else if (name != null) {
            // find the first matching close tag </name …>
            var close = -1
            var j = gt + 1
            while (close < 0 && j < n) {
              j = s.indexOf("</", j)
              if (j < 0) j = n
              else if (regionMatches(s, j + 2, name)) {
                val after = s.indexOf('>', j + 2)
                close = if (after < 0) n else after + 1
              } else j += 2
            }
            i = if (close < 0) n else close
          } else {
            // plain tag → line break
            out.append('\n')
            i = gt + 1
          }
        }
      } else if (c == '&') {
        i = decodeEntity(s, i, out)
      } else {
        out.append(c)
        i += 1
      }
    }
  }

  /** Decode one entity at `i` (s(i) == '&'); returns the next index.
    * Unknown/invalid sequences emit '&' literally and advance by one.
    */
  private def decodeEntity(s: String, i: Int, out: java.lang.StringBuilder): Int = {
    def named(e: String, r: Char): Int =
      if (regionMatches(s, i, e)) { out.append(r); i + e.length } else -1
    var next = named("&lt;", '<')
    if (next < 0) next = named("&gt;", '>')
    if (next < 0) next = named("&quot;", '"')
    if (next < 0) next = named("&apos;", '\'')
    if (next < 0) next = named("&nbsp;", ' ')
    if (next < 0) next = named("&amp;", '&')
    if (next < 0 && i + 2 < s.length && s.charAt(i + 1) == '#') {
      val hex = s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X'
      val start = if (hex) i + 3 else i + 2
      var j = start
      var cp = 0L
      while (j < s.length && cp <= 0x10FFFF && {
        val d = Character.digit(s.charAt(j), if (hex) 16 else 10)
        if (d >= 0) { cp = cp * (if (hex) 16 else 10) + d; true } else false
      }) j += 1
      if (j > start && j < s.length && s.charAt(j) == ';' &&
          cp <= 0x10FFFF && Character.isValidCodePoint(cp.toInt) &&
          !(cp >= 0xD800 && cp <= 0xDFFF)) { // lone surrogates aren't UTF-8
        out.appendCodePoint(cp.toInt)
        next = j + 1
      }
    }
    if (next < 0) { out.append('&'); i + 1 } else next
  }

  /** Step 5 over the stripped text: normalize + join non-empty lines. */
  private def normalizeLines(t: CharSequence): String = {
    val out = new java.lang.StringBuilder(t.length)
    val line = new java.lang.StringBuilder(128)
    var i = 0
    val n = t.length
    while (i <= n) {
      val c = if (i == n) '\n' else t.charAt(i)
      if (c == '\n') {
        // trim trailing space (leading ones never enter, see below)
        var e = line.length
        while (e > 0 && line.charAt(e - 1) == ' ') e -= 1
        if (e > 0) {
          if (out.length > 0) out.append('\n')
          out.append(line, 0, e)
        }
        line.setLength(0)
      } else if (c == ' ' || c == '\t' || c == '\f' || c == '\r') {
        if (line.length > 0 && line.charAt(line.length - 1) != ' ') line.append(' ')
      } else line.append(c)
      i += 1
    }
    out.toString
  }

  /** Full extraction; called from codegen. */
  def extract(html: UTF8String): UTF8String = {
    val s = html.toString
    val sb = new java.lang.StringBuilder(s.length)
    stripMarkup(s, sb)
    UTF8String.fromString(normalizeLines(sb))
  }

  /** Boilerplate-line filter: keep lines with at least `minWords`
    * space-separated words (lines come normalized from [[extract]]:
    * single spaces, trimmed, non-empty); called from codegen.
    */
  def keepLines(text: UTF8String, minWords: Int): UTF8String = {
    val s = text.toString
    if (s.isEmpty) return text
    val out = new java.lang.StringBuilder(s.length)
    var start = 0
    val n = s.length
    while (start <= n) {
      var end = s.indexOf('\n', start)
      if (end < 0) end = n
      var words = if (end > start) 1 else 0
      var i = start
      while (i < end) { if (s.charAt(i) == ' ') words += 1; i += 1 }
      if (words >= minWords) {
        if (out.length > 0) out.append('\n')
        out.append(s, start, end)
      }
      start = end + 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** `graft_html_text(html)` — markup-stripped, entity-decoded,
  * line-normalized text of an HTML document (one codegen'd pass).
  */
case class HtmlTextExtract(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_html_text"
  override def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ht = classOf[HtmlText.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $ht.extract($s);"
    })
  override protected def withNewChildInternal(newChild: Expression): HtmlTextExtract =
    copy(child = newChild)
}

/** `graft_keep_lines(text, minWords)` — drop boilerplate lines shorter
  * than `minWords` words (C4's line filter shape), codegen'd.
  */
case class KeepLinesMinWords(child: Expression, minWords: Int)
    extends UnaryExpression {
  require(minWords >= 1, "minWords must be >= 1")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_keep_lines"
  override def nullSafeEval(input: Any): Any =
    HtmlText.keepLines(input.asInstanceOf[UTF8String], minWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ht = classOf[HtmlText.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $ht.keepLines($s, $minWords);"
    })
  override protected def withNewChildInternal(newChild: Expression): KeepLinesMinWords =
    copy(child = newChild)
}
