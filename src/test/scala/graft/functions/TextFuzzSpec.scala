package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property-based fuzz for the r14 text expressions — the hand pins in
  * BpeSpec/HtmlSpec are strong on anticipated shapes; random inputs
  * close the unanticipated corner with structural invariants that must
  * hold on ANY input (bounds, additivity, idempotence, output
  * well-formedness).
  */
class TextFuzzSpec extends AnyFunSuite {

  private def check(label: String, p: Prop, min: Int = 120): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$label: $res")
  }

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  // alphabet with merge-friendly letters, punctuation, digits, CJK
  private val wordChar: Gen[Char] =
    Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar,
      2 -> Gen.numChar, 2 -> Gen.oneOf('.', ',', '-', '\'', '&'),
      1 -> Gen.oneOf('世', '界', 'é'))
  private val word: Gen[String] =
    Gen.chooseNum(1, 24).flatMap(n => Gen.stringOfN(n, wordChar))
  private val ws: Gen[String] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.stringOfN(n, Gen.oneOf(' ', '\t', '\n')))
  private val text: Gen[String] = for {
    wss <- Gen.listOfN(6, ws)
    words <- Gen.chooseNum(0, 5).flatMap(n => Gen.listOfN(n, word))
  } yield words.zip(wss).map { case (w, s) => w + s }.mkString

  // ------------------------------------------------------------- BPE

  test("bpe: token count of a word is within [1, utf8Bytes]") {
    check("bpe word bounds", Prop.forAll(word) { w =>
      val lw = w.toLowerCase(java.util.Locale.ROOT)
      val nb = lw.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      val n = BpeVocab.encodeCount(lw)
      n >= 1 && n <= nb
    })
  }

  test("bpe: whole-text count is additive over whitespace joins") {
    check("bpe additivity", Prop.forAll(text, text) { (a, b) =>
      BpeVocab.count(u(a + " " + b)) == BpeVocab.count(u(a)) + BpeVocab.count(u(b))
    })
  }

  test("bpe: case folding doesn't change the count") {
    // ASCII-only inputs: Unicode upper/lower round trips (ß→SS) are out
    val asciiWord = Gen.chooseNum(1, 20)
      .flatMap(n => Gen.stringOfN(n, Gen.alphaChar))
    check("bpe case-fold", Prop.forAll(asciiWord) { w =>
      BpeVocab.count(u(w)) == BpeVocab.count(u(w.toUpperCase))
    })
  }

  test("bpe: beyond the length cap the charge is exactly one per byte") {
    // alphaLower is 1 byte per char, so bytes == length; the astral/cap
    // property below covers multi-byte shapes
    val long = Gen.chooseNum(BpeVocab.MaxWordLen + 1, BpeVocab.MaxWordLen * 3)
      .flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
    check("bpe cap", Prop.forAll(long) { w =>
      BpeVocab.encodeCount(w) == w.length
    }, min = 40)
  }

  // ------------------------------------------------------------ HTML

  private def extract(s: String): String = HtmlText.extract(u(s)).toString
  private def keep(s: String, n: Int): String = HtmlText.keepLines(u(s), n).toString

  private val htmlish: Gen[String] = {
    val piece = Gen.frequency(
      6 -> word,
      2 -> Gen.oneOf("<b>", "</b>", "<br/>", "<img src=\"x\">", "<p >"),
      2 -> Gen.oneOf("&amp;", "&lt;", "&#65;", "&zz;", "&", "<", ">"),
      1 -> Gen.oneOf("<!-- c -->", "<script>x=1;</script>", "<nav>n</nav>"),
      2 -> ws)
    Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString)
  }

  test("bpe ids: concatenated token strings rebuild the folded text on any input") {
    // the id stream's defining invariant: ids decode (byte value below
    // 256, FIRST-rank merge product at 256 + rank) back to exactly the
    // UTF-8 bytes of the lowercased whitespace-stripped input — nothing
    // lost, invented or reordered, on hostile shapes the corpus never
    // exercises. Tokens live in the latin-1 byte-string form.
    val inv: Map[Long, String] =
      BpeVocab.productId.toSeq.groupBy(_._2).map { case (r, ps) =>
        (256L + r) -> ps.head._1 }
    check("bpe id bijection", Prop.forAll(text) { t =>
      val ids = BpeVocab.tokenIds(u(t)).toLongArray()
      val rebuilt = ids.map { i =>
        if (i < 256L) i.toChar.toString else inv(i)
      }.mkString
      val want = BpeVocab.byteString(t.toLowerCase(java.util.Locale.ROOT)
        .split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty).mkString)
      rebuilt == want && ids.length == BpeVocab.count(u(t)) &&
        !ids.contains(BpeVocab.EosId)
    })
  }

  test("bpe ids: astral code points and capped words keep the bijection") {
    val astral: Gen[String] = Gen.chooseNum(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("😀", "𐀀", "a", "é", "𝕊"))
        .map(_.mkString))
    val long: Gen[String] = Gen.chooseNum(250, 300).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaLowerChar))
    val inv: Map[Long, String] =
      BpeVocab.productId.toSeq.groupBy(_._2).map { case (r, ps) =>
        (256L + r) -> ps.head._1 }
    check("bpe id astral/cap", Prop.forAll(Gen.oneOf(astral, long)) { w =>
      val ids = BpeVocab.tokenIds(u(w)).toLongArray()
      val lw = w.toLowerCase(java.util.Locale.ROOT)
      val bs = BpeVocab.byteString(lw)
      // over the cap: exactly one id per UTF-8 byte, each a byte id
      val capOk = bs.length <= BpeVocab.MaxWordLen ||
        (ids.length == bs.length && ids.forall(_ < 256L))
      val rebuilt = ids.map { i =>
        if (i < 256L) i.toChar.toString else inv(i)
      }.mkString
      capOk && rebuilt == bs
    }, min = 60)
  }

  test("html: output is line-normalized (no blank lines, no edge/double spaces, no tabs)") {
    check("html well-formed", Prop.forAll(htmlish) { h =>
      val out = extract(h)
      val lines = if (out.isEmpty) Nil else out.split("\n", -1).toSeq
      lines.forall { l =>
        l.nonEmpty && !l.contains("  ") && !l.startsWith(" ") && !l.endsWith(" ") &&
          !l.exists(c => c == '\t' || c == '\r' || c == '\f')
      }
    })
  }

  test("html: plain text (no markup chars) just line-normalizes") {
    val plain = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" ")).map(_.replaceAll("[<>&]", "x"))
    check("html plain", Prop.forAll(plain) { t =>
      val norm = t.split("\n", -1).toSeq
        .map(_.replaceAll("[ \\t\\f\\r]+", " ").trim).filter(_.nonEmpty).mkString("\n")
      extract(t) == norm
    })
  }

  test("keepLines: idempotent, kept lines are a sublist each meeting the bound") {
    check("keepLines", Prop.forAll(htmlish, Gen.chooseNum(1, 6)) { (h, n) =>
      val body = extract(h)
      val kept = keep(body, n)
      val keptLines = if (kept.isEmpty) Nil else kept.split("\n", -1).toSeq
      val bodyLines = if (body.isEmpty) Nil else body.split("\n", -1).toSeq
      keep(kept, n) == kept &&
        keptLines.forall(l => l.split(" ").length >= n) &&
        // sublist: every kept line occurs in body with multiplicity
        keptLines.diff(bodyLines).isEmpty
    })
  }

  // ------------------------------------------------- model inference

  test("scores: classifier and LM sums stay inside their per-token bounds") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val wordsGen = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, word))
    check("score bounds", Prop.forAll(wordsGen) { ws =>
      val arr = new GenericArrayData(ws.map(u).toArray[Any])
      val cls = LinearScoreKernel.compute(arr)
      val lp = BigramLogProbKernel.compute(arr)
      val n = ws.count(_.nonEmpty)
      val pairs = math.max(n - 1, 0)
      math.abs(cls) <= 500L * n &&
        lp <= -1L * pairs && lp >= -1000L * pairs
    })
  }
}
