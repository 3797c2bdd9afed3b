package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the subword tokenizer (x17) against an INDEPENDENT reference
  * implementation of greedy longest-match over the same vocabulary —
  * the oracle role DuckDB can't play (no per-row iteration in SQL).
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: naive greedy longest-match, written differently on
    * purpose (tries every prefix length from longest down, set lookup).
    * Same separator class as the engine: RE2 `\s` = `[ \t\n\f\r]` — NOT
    * VT, which the DuckDB oracle's RE2 split also treats as a word
    * char; unmatched chars advance one code point.
    */
  private def refCount(text: String): Long = {
    val vocab = SubwordVocab.entries.toSet
    val maxLen = SubwordVocab.entries.map(_.length).max
    val s = text.toLowerCase(java.util.Locale.ROOT)
    var pos = 0
    var n = 0L
    while (pos < s.length) {
      val c = s.charAt(pos)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r') pos += 1
      else {
        val best = (math.min(maxLen, s.length - pos) to 1 by -1)
          .find(l => vocab.contains(s.substring(pos, pos + l)))
          .getOrElse(Character.charCount(s.codePointAt(pos)))
        n += 1
        pos += best
      }
    }
    n
  }

  test("hand cases: affixes split, whitespace free, unknown chars count 1") {
    def c(s: String): Long =
      Seq(s).toDF("t").select(F.subwordTokens(col("t"))).head().getLong(0)
    assert(c("") == 0)
    assert(c("   \t\n ") == 0)
    assert(c("the") == 1)
    assert(c("the the  the") == 3)
    // vocabulary word beats character fallback
    assert(c("government") == 1)
    // case-insensitive
    assert(c("The THE the") == 3)
    // unknown non-ASCII counts one per CODE POINT (emoji = 1, not 2)
    assert(c("é") == 1)
    assert(c("日本") == 2)
    assert(c("😀") == 1)
    // a Unicode space is NOT a separator (oracle/words() parity: the
    // separator class is exactly RE2 \s) — it charges one token
    assert(c("a b") == c("a") + c("b") + 1)
    // vertical tab is Java-regex-\s but NOT RE2-\s: the oracle's split keeps
    // it inside the word, so here it must charge one token, not
    // separate for free (ADVICE r10)
    assert(c("a\u000Bb") == c("a") + c("b") + 1)
    // greedy longest-match agrees with the reference on mixed text
    val samples = Seq("unhappiness", "pre-training data pipelines",
      "Café 42!", "internationalization", "a1b2c3")
    samples.foreach(s => assert(c(s) == refCount(s), s"mismatch on '$s'"))
  }

  test("corpus agreement with the reference implementation + codegen parity") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val got = docs.select(col("doc_id"), col("text"),
        F.subwordTokens(col("text")).as("n"))
      .collect()
    got.foreach { r =>
      val expected = refCount(r.getString(1))
      assert(r.getLong(2) == expected,
        s"doc ${r.get(0)}: codegen ${r.getLong(2)} != reference $expected")
    }
    // interpreted path (eval) agrees with the codegen'd column
    val interp = SubwordVocab.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(got.head.getString(1)))
    assert(interp == got.head.getLong(2))
    // sanity: a real tokenizer compresses — fewer tokens than characters
    assert(got.forall(r => r.getLong(2) <= r.getString(1).length))
  }

  test("x17 gate shape: per-doc counts, deterministic") {
    val a = graft.operators.TextAnalysis.x17SubwordTokens(spark, sf).collect()
    val b = graft.operators.TextAnalysis.x17SubwordTokens(spark, sf).collect()
    assert(a.nonEmpty && a.sameElements(b))
    assert(a.forall(_.getLong(1) > 0))
  }
}
