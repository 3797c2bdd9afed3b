package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic vocabulary-driven subword tokenizer (x17): greedy
  * longest-match over the shipped vocabulary
  * (`resources/graft/subword_vocab.txt` — common English words,
  * productive affixes, frequent fragments, and a single-character
  * fallback alphabet so every string tokenizes). This is the real-BPE
  * counting shape: token budgets (p02/p03) computed from it reflect what
  * a subword tokenizer would charge, where the regex "BPE-ish" count
  * (x01) only approximates word/punct pieces.
  *
  * Matching is case-insensitive; ASCII whitespace separates and is free
  * (exactly RE2 `\s` = `[ \t\n\f\r]` — the same separator class the
  * Spark-side `split(text, "[ \t\n\f\r]+")` and the DuckDB oracle's
  * RE2 `\s+` word split use, so the three never disagree on what a
  * word is; a Unicode space or a VT is an unknown CHAR, one token);
  * any other character with no vocab entry counts as one token per CODE
  * POINT (not UTF-16 unit — an emoji is one token in every engine).
  * Greedy longest-match is deterministic by construction — same text,
  * same count, on every engine and at every parallelism.
  */
object SubwordVocab {

  /** Vocabulary entries, lowercased, comments/blanks dropped. */
  lazy val entries: IndexedSeq[String] = {
    val in = getClass.getResourceAsStream("/graft/subword_vocab.txt")
    require(in != null, "shipped vocabulary resource missing")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map(_.toLowerCase(java.util.Locale.ROOT)).toIndexedSeq.distinct
    } finally in.close()
  }

  // entries indexed by first char (ASCII only), longest first — greedy
  // longest-match scans a handful of same-initial candidates per position
  private lazy val byFirst: Array[Array[String]] = {
    val buckets = Array.fill(128)(List.empty[String])
    entries.foreach { e =>
      val c = e.charAt(0).toInt
      if (c < 128) buckets(c) = e :: buckets(c)
    }
    buckets.map(_.sortBy(-_.length).toArray)
  }

  /** ASCII whitespace = RE2 `\s`: space, tab, LF, FF, CR — NOT vertical
    * tab (\x0B). Java's regex `\s` includes VT but DuckDB's RE2 `\s`
    * does not; the oracle splits words with RE2, so VT must be an
    * unknown CHAR here (one token) or the two engines disagree on any
    * document containing one (ADVICE r10).
    */
  @inline private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Greedy longest-match token count; called from codegen. */
  def count(s: UTF8String): Long = {
    // Locale.ROOT: locale-sensitive case folding (tr dotless-i) would
    // make counts machine-dependent
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    var pos = 0
    var n = 0L
    val len = str.length
    while (pos < len) {
      val c = str.charAt(pos)
      if (isAsciiWs(c)) pos += 1
      else {
        // unknown chars advance one CODE POINT (surrogate pairs are one
        // token, matching engines that index by code point)
        var advance = Character.charCount(str.codePointAt(pos))
        if (c < 128) {
          val cands = byFirst(c.toInt)
          var i = 0
          var found = false
          while (i < cands.length && !found) {
            val e = cands(i)
            if (e.length <= len - pos && str.startsWith(e, pos)) {
              advance = e.length
              found = true
            }
            i += 1
          }
        }
        n += 1
        pos += advance
      }
    }
    n
  }
}

/** Token count of a string under the shipped subword vocabulary —
  * greedy longest-match, codegen'd (stays inside whole-stage codegen;
  * the matcher is a static JVM call, no UDF boxing).
  */
case class SubwordTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_subword_tokens"
  override def nullSafeEval(input: Any): Any =
    SubwordVocab.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val sv = classOf[SubwordVocab.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $sv.count($s);"
    })
  override protected def withNewChildInternal(newChild: Expression): SubwordTokenCount =
    copy(child = newChild)
}
