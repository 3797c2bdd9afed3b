package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, scale-invariant, zero-norm=0") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f, 3f), Array(2f, 4f, 6f)),
      (Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
    val sims = df.select(F.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(sims(1) == 0.0)
    assert(math.abs(sims(2) - 1.0) < 1e-12)
    assert(sims(3) == 0.0)
  }

  test("cosine interpreted eval matches codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val a = Literal(new GenericArrayData(Array(0.5f, -1.5f, 2f)), ArrayType(FloatType))
    val b = Literal(new GenericArrayData(Array(1f, 2f, 0.25f)), ArrayType(FloatType))
    val interpreted = CosineSim(a, b).eval(null).asInstanceOf[Double]
    val viaDf = Seq((Array(0.5f, -1.5f, 2f), Array(1f, 2f, 0.25f))).toDF("a", "b")
      .select(F.cosine($"a", $"b")).as[Double].head()
    assert(interpreted == viaDf)
  }

  test("minhash signature: deterministic, k-length, similarity-preserving") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)),
      (2L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 11L)), // J=9/11
      (3L, Seq(100L, 200L, 300L))).toDF("id", "hs")
    val sigs = df.select($"id", F.minhashSig($"hs", 128).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L).length == 128)
    val agree12 = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y } / 128.0
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y } / 128.0
    assert(agree12 > 0.6, s"similar sets should agree often, got $agree12")
    assert(agree13 < 0.2, s"disjoint sets should rarely agree, got $agree13")
    // determinism across evaluations
    val again = df.select($"id", F.minhashSig($"hs", 128).as("sig")).as[(Long, Seq[Long])].collect().toMap
    assert(again(1L) == sigs(1L))
  }

  test("simhash64: equal inputs equal, similar inputs near, dissimilar far") {
    val ws = (1 to 100).map(i => s"w$i")
    val df = Seq(
      (1L, ws), (2L, ws),
      (3L, ws.take(90) ++ Seq("x1", "x2", "x3")),
      (4L, (1 to 100).map(i => s"z$i"))).toDF("id", "words")
      .select($"id", F.simhash64(expr("transform(words, w -> xxhash64(w))")).as("sig"))
    val m = df.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(m(1L) == m(2L))
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
    assert(ham(m(1L), m(4L)) > 15)
  }

  test("rpBits: deterministic and direction-invariant under positive scaling") {
    val v = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val df = Seq((1L, v), (2L, v.map(_ * 3.0f))).toDF("id", "v")
      .select($"id", F.rpBits($"v", 16, 42L).as("k")).as[(Long, Long)].collect().toMap
    assert(df(1L) == df(2L))
  }

  test("fingerprint: deterministic, distinct for different docs, window-stable") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (2L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (3L, "a completely different document about spark query engines")).toDF("id", "t")
      .select($"id", F.fingerprint($"t", 16).as("fp")).as[(Long, Long)].collect().toMap
    assert(df(1L) == df(2L))
    assert(df(1L) != df(3L))
  }

  test("nfc: composes decomposed input, identity on NFC text, null-safe") {
    val df = Seq(
      Option("Cafe\u0301"),          // decomposed: e + combining acute
      Option("Caf\u00e9"),           // already composed
      Option("plain ascii"),
      Option.empty[String]).toDF("t")
    val out = df.select(F.nfc($"t")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) == "Caf\u00e9", "decomposed must compose")
    assert(out(1) == "Caf\u00e9")
    assert(out(2) == "plain ascii")
    assert(out(3) == null)
    // composed and decomposed fingerprints agree after normalization --
    // the reason the pipeline normalizes BEFORE hashing
    val fp = Seq(("Cafe\u0301 x", "Caf\u00e9 x")).toDF("a", "b")
      .select(F.fingerprint(F.nfc($"a"), 4) === F.fingerprint(F.nfc($"b"), 4))
      .head().getBoolean(0)
    assert(fp, "normalized variants must fingerprint identically")
  }

  test("SQL registration exposes graft functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c," +
      " graft_simhash64(array(CAST(7 AS BIGINT))) AS s," +
      " graft_fingerprint('hello world hello world') AS f").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) == 7L)
    // the r14 text-pipeline functions ride the same registry
    val t = spark.sql(
      "SELECT graft_bpe_tokens('the data') AS b," +
      " graft_subword_tokens('the data') AS sw," +
      " graft_html_text('<p>a &amp; b</p><script>x</script>') AS h," +
      " graft_keep_lines('one two\none two three', 3) AS k," +
      " graft_linear_score(array('the')) AS ls," +
      " graft_bigram_logprob(array('the', 'data')) AS lp").head()
    assert(t.getLong(0) == BpeVocab.count(
      org.apache.spark.unsafe.types.UTF8String.fromString("the data")))
    assert(t.getLong(1) > 0L)
    assert(t.getString(2) == "a & b")
    assert(t.getString(3) == "one two three")
    assert(math.abs(t.getLong(4)) <= 500L)
    assert(t.getLong(5) >= -1000L && t.getLong(5) <= -1L)
    // the x24 DSIR target-table lookup rides the same registry
    val tg = spark.sql(
      "SELECT graft_bigram_logprob_target(array('the', 'data')) AS t," +
      " graft_bigram_logprob_lm(array('the', 'data')) AS r").head()
    assert(tg.getLong(0) >= -1000L && tg.getLong(0) <= -1L)
    assert(tg.getLong(1) >= -1000L && tg.getLong(1) <= -1L)
    // the p06 id stream rides the same registry
    val ids = spark.sql("SELECT graft_bpe_ids('the data') AS i").head()
      .getSeq[Long](0).toVector
    assert(ids == BpeVocab.tokenIds(
      org.apache.spark.unsafe.types.UTF8String.fromString("the data"))
      .toLongArray().toVector)
    // the x22 URL functions ride the same registry
    val u = spark.sql(
      "SELECT graft_url_ok('HTTP://WWW.A.com:80/p?utm_source=x&q=1#f') AS ok," +
      " graft_canon_url('HTTP://WWW.A.com:80/p?utm_source=x&q=1#f') AS c," +
      " graft_reg_domain('https://x.sample.co.uk:8443/') AS d").head()
    assert(u.getBoolean(0))
    assert(u.getString(1) == "http://a.com/p?q=1")
    assert(u.getString(2) == "sample.co.uk")
  }

  test("hilbert index is a bijection with unit-step adjacency") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val bits = 4
    val side = 1 << bits
    def idx(xy: (Int, Int)): Long =
      HilbertKernel.index(new GenericArrayData(Array(xy._1.toLong, xy._2.toLong)), bits)
    val cells = for (x <- 0 until side; y <- 0 until side) yield (x, y)
    val indexed = cells.map(c => idx(c) -> c).toMap
    // bijection over the full grid
    assert(indexed.size == side * side)
    assert(indexed.keys.min == 0L && indexed.keys.max == (side * side - 1).toLong)
    // defining Hilbert property: consecutive curve positions are ADJACENT
    // cells (manhattan distance 1) - z-order violates this at carry points
    for (i <- 0L until (side * side - 1).toLong) {
      val (x1, y1) = indexed(i); val (x2, y2) = indexed(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at $i")
    }
  }

  test("portable fingerprint: min-window two-prime hash, short-text fallback") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "tiny"), // shorter than the window: whole-text hash
      (4L, "a different document entirely about query engines")).toDF("id", "t")
      .select($"id", F.portableFingerprint($"t", 16).as("fp")).as[(Long, Long)].collect().toMap
    assert(df(1L) == df(2L) && df(1L) != df(4L))
    // driver-side replication of the definition
    def poly(cps: Seq[Int], init: Long, b: Long, p: Long): Long =
      cps.foldLeft(init)((a, c) => (a * b + c) % p)
    def fp(t: String, w: Int): Long = {
      val cps = t.codePoints().toArray.toSeq
      val eff = math.min(w, cps.length)
      (0 to cps.length - eff).map { i =>
        val win = cps.slice(i, i + eff)
        poly(win, 11L, 131L, 2147483629L) * 4294967296L + poly(win, 7L, 31L, 2147483647L)
      }.min
    }
    assert(df(1L) == fp("the quick brown fox jumps over the lazy dog", 16))
    assert(df(3L) == fp("tiny", 16))
    // r5 regression: the x04 oracle's short-text CASE branches mirror the
    // kernel — empty text is one zero-length window = 11*2^32 + 7, and a
    // sub-window text hashes as ONE whole-text window (never NULL).
    val edge = Seq((1L, ""), (2L, "ab")).toDF("id", "t")
      .select($"id", F.portableFingerprint($"t", 16).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(edge(1L) == 47244640263L)
    assert(edge(2L) == fp("ab", 16))
  }

  test("linear score: independent reimplementation, weight bounds, codegen parity") {
    // independent reference: different code path (string fold, BigInt-free
    // but same arithmetic spelled from the spec, not the kernel)
    def refH1(w: String): Long =
      w.codePoints().toArray.foldLeft(7L)((a, c) => (a * 31L + c) % 2147483647L)
    def refScore(text: String): Long =
      text.trim.split("\\s+").filter(_.nonEmpty)
        .map(w => ((refH1(w) % 65536L) * 2654435761L) % 2147483647L % 1001L - 500L)
        .sum
    val texts = Seq("the quick brown fox", "a b c", "  padded   tokens  ",
      "one", "", "repeat repeat repeat")
    val viaDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", F.linearScore(split(trim($"t"), "\\s+")).as("s"))
      .as[(Long, Long)].collect().toMap
    for ((t, i) <- texts.zipWithIndex)
      assert(viaDf(i.toLong) == refScore(t), s"mismatch on '$t'")
    // weight bounds: any single-token score is within [-500, 500]
    for (w <- Seq("alpha", "beta", "x", "éclair"))
      assert(math.abs(refScore(w)) <= 500)
    // interpreted eval matches the df (codegen) path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val arr = new GenericArrayData(
      Array("the", "quick", "brown", "fox").map(org.apache.spark.unsafe.types.UTF8String.fromString))
    val interpreted = HashedLinearScore(Literal(arr, ArrayType(StringType)))
      .eval(null).asInstanceOf[Long]
    assert(interpreted == viaDf(0L))
  }

  test("bigram log-prob: independent reimplementation, bounds, codegen parity") {
    // independent reference: sliding(2) over the filtered word list,
    // arithmetic spelled from the spec
    def refH1(w: String): Long =
      w.codePoints().toArray.foldLeft(7L)((a, c) => (a * 31L + c) % 2147483647L)
    def refLp(text: String): Long =
      text.trim.split("\\s+").filter(_.nonEmpty).toSeq
        .map(w => refH1(w) % 65536L)
        .sliding(2).filter(_.size == 2)
        .map { p => ((p(0) * 31L + p(1)) % 65536L * 2654435761L) % 2147483647L % 1000L - 1000L }
        .sum
    val texts = Seq("the quick brown fox", "a b", "one", "",
      "  padded   pair  ", "loop loop loop loop")
    val viaDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", F.bigramLogProb(split(trim($"t"), "\\s+")).as("s"))
      .as[(Long, Long)].collect().toMap
    for ((t, i) <- texts.zipWithIndex)
      assert(viaDf(i.toLong) == refLp(t), s"mismatch on '$t'")
    // bounds: every pair contributes a NEGATIVE log-prob in [-1000, -1]
    val two = refLp("alpha beta")
    assert(two >= -1000L && two <= -1L)
    assert(refLp("one") == 0L && refLp("") == 0L)
    // a repeated bigram contributes the identical value each time
    assert(refLp("x y x y x y").toDouble ==
      refLp("x y") + 2 * (refLp("y x") + refLp("x y")))
    // interpreted eval matches the df (codegen) path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val arr = new GenericArrayData(
      Array("the", "quick", "brown", "fox").map(org.apache.spark.unsafe.types.UTF8String.fromString))
    val interpreted = HashedBigramLogProb(Literal(arr, ArrayType(StringType)))
      .eval(null).asInstanceOf[Long]
    assert(interpreted == viaDf(0L))
  }
}
