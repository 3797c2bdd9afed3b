package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-rule BPE (x19): trainer pinned against a HAND-COMPUTED run of
  * the classic algorithm, encoder pinned against hand cases and an
  * INDEPENDENT reimplementation (functional fold over Vector vs the
  * imperative in-place array), codegen/interpreted parity, and the
  * shipped resource's provenance (retraining on the declared bounded
  * sample reproduces it bit-for-bit).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ trainer

  test("trainer reproduces the hand-computed merge sequence (Sennrich corpus)") {
    // low×5 lower×2 newest×6 widest×3 — worked by hand:
    //   e-s:9 ties s-t:9 → lexicographic → (e,s); then es-t:9; then
    //   l-o:7 ties o-w:7 → (l,o); then lo-w:7; then 6-way tie
    //   (e,w)/(n,e)/(w,est) → (e,w)
    val corpus = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val got = BpeTrainer.train(corpus, 5)
    assert(got == Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("trainer stops when no pair repeats (no freq-1 noise merges)") {
    val got = BpeTrainer.train(Seq(("abcdef", 1L)), 100)
    assert(got.isEmpty)
  }

  test("trainer is insensitive to input order (determinism)") {
    val corpus = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    assert(BpeTrainer.train(corpus.reverse, 5) == BpeTrainer.train(corpus, 5))
  }

  // ------------------------------------------------------------ encoder

  private val toyRank: Map[(String, String), Int] = Seq(
    ("t", "h"), ("th", "e"), ("e", "s"), ("a", "n"), ("an", "d"),
    ("s", "t"), ("st", "a")).zipWithIndex.toMap

  test("encoder hand cases: rank priority, leftmost ties, char fallback") {
    // 'stand': (a,n) rank 3 beats (s,t) rank 5 → s,t,an,d → (an,d) →
    // s,t,and → (s,t) → st,and = 2 tokens (NOT greedy-left (s,t) first)
    assert(BpeVocab.encodeCount("stand", toyRank) == 2)
    assert(BpeVocab.encodeCount("the", toyRank) == 1)
    assert(BpeVocab.encodeCount("thethe", toyRank) == 2)
    // 'test': (e,s) merges, t-es and es-t unranked → t,es,t
    assert(BpeVocab.encodeCount("test", toyRank) == 3)
    assert(BpeVocab.encodeCount("xyzzy", toyRank) == 5) // no rule applies
    assert(BpeVocab.encodeCount("a", toyRank) == 1)
    assert(BpeVocab.encodeCount("", toyRank) == 0)
    // UTF-8 BYTES, not code points: an astral char is FOUR base symbols
    assert(BpeVocab.encodeCount("a😀b", toyRank) == 6)
  }

  /** Independent reimplementation: immutable-Vector fold, recomputing
    * the full rank list every step (different data structure and
    * control flow from the production in-place array walk).
    */
  private def altEncode(word: String, rank: Map[(String, String), Int]): Int = {
    var syms: Vector[String] =
      word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .toVector.map(b => ((b & 0xff).toChar).toString)
    var done = syms.size <= 1
    while (!done) {
      val ranked = syms.init.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
      if (ranked.isEmpty) done = true
      else {
        val (_, i) = ranked.minBy { case (r, i) => (r, i) }
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
        if (syms.size <= 1) done = true
      }
    }
    syms.size
  }

  test("encoder agrees with the independent reimplementation on corpus words") {
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(lower($"text")), "[ \\t\\n\\f\\r]+")).as("w"))
      .filter($"w" =!= "").distinct().as[String].collect()
    assert(words.length > 10)
    words.foreach { w =>
      assert(BpeVocab.encodeCount(w) == altEncode(w, BpeVocab.rank), s"word '$w'")
    }
    // plus hostile shapes the corpus lacks
    Seq("ᚠᚢᚦ", "a-b_c", "x", "....", "mixedCASEword").foreach { w =>
      val lw = w.toLowerCase(java.util.Locale.ROOT)
      assert(BpeVocab.encodeCount(lw) == altEncode(lw, BpeVocab.rank), s"word '$w'")
    }
  }

  test("long unbroken tokens are charged per byte (O(L²) guard)") {
    val long = "th" * 200 // 400 bytes > MaxWordLen, full of merge hits
    assert(BpeVocab.encodeCount(long) == 400)
    val atCap = "x" * BpeVocab.MaxWordLen
    assert(BpeVocab.encodeCount(atCap) == BpeVocab.MaxWordLen)
    // a multi-byte word over the cap charges BYTES, not code points
    val wide = "é" * 129 // 129 code points, 258 bytes > MaxWordLen
    assert(BpeVocab.encodeCount(wide) == 258)
    // just under the cap still merges: fewer tokens than bytes
    val under = "the" * 85 // 255 bytes
    assert(BpeVocab.encodeCount(under) < 255)
    // whole-text path: the long word bypasses the memo but sums the same
    val n = BpeVocab.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"the $long the"))
    assert(n == 2 * BpeVocab.encodeCount("the") + 400)
  }

  test("whole-text count: whitespace free, words summed, case folded") {
    val n = BpeVocab.count(
      org.apache.spark.unsafe.types.UTF8String.fromString("The THE\t the\n"))
    assert(n == 3 * BpeVocab.encodeCount("the"))
  }

  test("codegen/interpreted parity on corpus docs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val viaCodegen = docs.select($"doc_id", graft.functions.F.bpeTokens($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expr = BpeTokenCount(org.apache.spark.sql.catalyst.expressions.Literal("x"))
    docs.select($"doc_id", $"text").collect().foreach { r =>
      val interp = expr.nullSafeEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
      assert(interp == viaCodegen(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
  }

  // ---------------------------------------------------- token ids (p06)

  test("token ids: syms rebuild the word, ids are arithmetic, count agrees") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    docs.foreach { case (id, text) =>
      val lower = text.toLowerCase(java.util.Locale.ROOT)
      val ws = lower.trim.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty)
      // symbols (latin-1 byte strings) concatenate back to the word's
      // UTF-8 bytes (no token lost or invented)
      ws.foreach { w =>
        val syms = BpeVocab.encodeSyms(w)
        assert(syms.mkString == BpeVocab.byteString(w), s"doc $id word '$w' syms")
        assert(syms.length == BpeVocab.encodeCount(w), s"doc $id word '$w' count")
        // id arithmetic: byte value below 256, product at 256 + rank
        syms.foreach { s =>
          val i = BpeVocab.idOf(s)
          if (s.length == 1) assert(i == s.charAt(0).toLong)
          else assert(i == 256L + BpeVocab.productId(s))
        }
      }
      // whole-text ids length == whole-text count (same scanner)
      val ids = BpeVocab.tokenIds(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      assert(ids.numElements().toLong == BpeVocab.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(text)), s"doc $id ids/count")
    }
  }

  test("token ids: ids decode back to the exact text bytes (id bijection)") {
    // id → token inverse: byte value or merge product by FIRST rank
    val inv: Map[Long, String] =
      BpeVocab.productId.toSeq.groupBy(_._2).map { case (r, ps) =>
        (256L + r) -> ps.head._1 }
    def tok(i: Long): String = if (i < 256L) i.toChar.toString else inv(i)
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
      .select($"text").as[String].collect()
    docs.foreach { t =>
      val ids = BpeVocab.tokenIds(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).toLongArray()
      val rebuilt = ids.map(tok).mkString
      val want = BpeVocab.byteString(t.toLowerCase(java.util.Locale.ROOT)
        .split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty).mkString)
      assert(rebuilt == want)
    }
  }

  test("token ids: codegen/interpreted parity and EOS disjointness") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val viaCodegen = docs
      .select($"doc_id", graft.functions.F.bpeTokenIds($"text").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    docs.select($"doc_id", $"text").collect().foreach { r =>
      val interp = BpeVocab.tokenIds(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
        .toLongArray().toVector
      assert(interp == viaCodegen(r.getLong(0)), s"doc ${r.getLong(0)}")
      // no document token ever equals the end-of-document sentinel
      assert(!interp.contains(BpeVocab.EosId))
    }
    assert(BpeVocab.EosId == 256L + BpeVocab.merges.length)
  }

  // ------------------------------------------------------- provenance

  test("shipped merges reproduce from the declared bounded sample") {
    val freqs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(500)
      .select(explode(split(trim(lower($"text")), "[ \\t\\n\\f\\r]+")).as("w"))
      .filter($"w" =!= "")
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, f) => (-f, w) }
      .take(4000).toSeq
    assert(BpeTrainer.train(freqs, 300) == BpeVocab.merges)
  }

  test("shipped merges are non-trivial byte symbols (oracle hex contract)") {
    assert(BpeVocab.merges.nonEmpty)
    // every trained symbol is a byte string: its hex form (the oracle/
    // resource representation) round-trips cleanly
    assert(BpeVocab.merges.forall { case (l, r) =>
      (l + r).forall(_ < 256) && BpeVocab.hexOf(l + r).length == 2 * (l + r).length })
    // common corpus words should compress below their byte count
    assert(BpeVocab.encodeCount("the") < 3 || BpeVocab.encodeCount("data") < 4)
  }
}
