package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Trained bigram LM (x23): resource shape, PROVENANCE (the shipped
  * table reproduces from the declared sample via the trainer), an
  * INDEPENDENT count/quantize/threshold reimplementation (manual char
  * scan + code-point fold, no shared tokenizer/hash code), kernel hand
  * cases, and codegen/interpreted parity.
  */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("resource shape: sparse entries in range, trained threshold plausible") {
    assert(BigramLm.entries.nonEmpty)
    assert(BigramLm.entries.forall { case (b, lp) =>
      b >= 0 && b < BigramLm.Buckets && lp > BigramLm.Floor && lp <= -1 })
    assert(BigramLm.entries.map(_._1).distinct.size == BigramLm.entries.size)
    // count-weighted mean of values in (-1000, -1] stays in that range
    assert(BigramLm.thresholdPerPair > BigramLm.Floor &&
      BigramLm.thresholdPerPair <= -1L)
    // the most frequent bigram quantizes to the top of the scale
    assert(BigramLm.entries.map(_._2).max == -1)
  }

  test("provenance: the shipped resource reproduces from the declared sample") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(graft.BigramLmTrain.SampleDocs)
      .select("text").collect().map(_.getString(0)).toSeq
    val (entries, threshold) = graft.BigramLmTrain.train(texts)
    assert(entries == BigramLm.entries, "shipped entries drifted from the sample")
    assert(threshold == BigramLm.thresholdPerPair, "shipped threshold drifted")
  }

  test("x24 target resource: shape, provenance from the en-only sample") {
    assert(BigramLm.targetEntries.nonEmpty)
    assert(BigramLm.targetEntries.forall { case (b, lp) =>
      b >= 0 && b < BigramLm.Buckets && lp > BigramLm.Floor && lp <= -1 })
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(graft.BigramLmTrain.SampleDocs)
      .filter($"lang" === "en")
      .orderBy("doc_id").select("text").collect().map(_.getString(0)).toSeq
    val (entries, _) = graft.BigramLmTrain.train(texts)
    assert(entries == BigramLm.targetEntries,
      "shipped target entries drifted from the declared en-only sample")
  }

  test("x24 DSIR selection: exact per-source quota, weights resample toward the target domain") {
    val rows = graft.operators.TextAnalysis.x24DsirSelect(spark, sf)
      .select($"doc_id", $"source", $"weight", $"selected")
      .as[(Long, String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    // quota: exactly ceil(n/4) selected per source, and they are the
    // top-(weight, doc_id) rows
    rows.groupBy(_._2).foreach { case (src, ds) =>
      val want = (ds.length + 3) / 4
      val sel = ds.filter(_._4)
      assert(sel.length == want, s"source $src quota")
      val ranked = ds.sortBy(d => (-d._3, d._1)).take(want).map(_._1).toSet
      assert(sel.map(_._1).toSet == ranked, s"source $src not the top-ranked docs")
    }
    // the point of DSIR: selection skews toward the target domain — the
    // selected set's `en` share must beat the corpus share (target table
    // trained on en docs, raw table on the full window)
    val lang = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val selEn = rows.filter(_._4).count(r => lang(r._1) == "en").toDouble /
      rows.count(_._4)
    val allEn = rows.count(r => lang(r._1) == "en").toDouble / rows.length
    assert(selEn > allEn,
      f"DSIR selection did not skew toward the target domain: sel=$selEn%.3f corpus=$allEn%.3f")
  }

  // ------------------------------------ independent reimplementation

  /** Independent word hash: 31-polynomial over code points mod 2³¹−1,
    * seed 7, reduced mod 65536 (the packed hash's low half — 2³² ≡ 0
    * mod 2¹⁶, so only the h1 chain matters for buckets).
    */
  private def iHash(w: String): Long = {
    var h = 7L
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      h = (h * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h % 65536L
  }

  private def iBucket(a: Long, b: Long): Int = ((a * 31L + b) % 65536L).toInt

  /** Independent tokenizer: manual scan over the explicit class. */
  private def iTokens(t: String): Seq[String] = {
    val ws = Set(' ', '\t', '\n', '\f', '\r')
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    (t + " ").foreach { c =>
      if (ws(c)) { if (cur.nonEmpty) { out += cur.toString; cur.clear() } }
      else cur += c
    }
    out.result()
  }

  test("independent count + quantize + threshold agree with the trainer") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(graft.BigramLmTrain.SampleDocs)
      .select("text").collect().map(_.getString(0)).toSeq
    val counts = scala.collection.mutable.Map[Int, Long]()
    texts.foreach { t =>
      iTokens(t).map(iHash).sliding(2).foreach {
        case Seq(a, b) => val k = iBucket(a, b); counts(k) = counts.getOrElse(k, 0L) + 1L
        case _ =>
      }
    }
    val kept = counts.toSeq.sortBy { case (b, c) => (-c, b) }
      .take(graft.BigramLmTrain.MaxEntries)
    val cMax = kept.head._2
    val entries = kept.map { case (b, c) =>
      (b, (-1000L + Math.round(999.0 *
        StrictMath.log1p(c.toDouble) / StrictMath.log1p(cMax.toDouble))).toInt)
    }.sortBy(_._1).toIndexedSeq
    assert(entries == BigramLm.entries)
    val keptLp = kept.map { case (b, c) =>
      (c, (-1000L + Math.round(999.0 *
        StrictMath.log1p(c.toDouble) / StrictMath.log1p(cMax.toDouble))))
    }
    val threshold = Math.floorDiv(
      keptLp.map { case (c, lp) => c * lp }.sum, keptLp.map(_._1).sum)
    assert(threshold == BigramLm.thresholdPerPair)
  }

  // -------------------------------------------------- kernel semantics

  private def score(words: Seq[String]): Long =
    BigramLm.compute(new GenericArrayData(
      words.map(w => UTF8String.fromString(w)).toArray[Any]))

  test("kernel: empty/single/adjacency, floor for unseen, table for seen") {
    assert(score(Nil) == 0L)
    assert(score(Seq("one")) == 0L)
    val lmt = BigramLm.entries.toMap
    def expected(ws: Seq[String]): Long =
      ws.map(iHash).sliding(2).collect { case Seq(a, b) =>
        lmt.getOrElse(iBucket(a, b), BigramLm.Floor.toInt).toLong }.sum
    val samples = Seq(
      Seq("the", "data", "the", "data"),
      Seq("zzqx", "vvrm"), // almost surely unseen → floor
      Seq("a", "b", "c", "d", "e"),
      Seq("été", "café")) // non-ASCII code points
    samples.foreach(ws => assert(score(ws) == expected(ws), ws.toString))
    // empty tokens are skipped without breaking adjacency
    assert(score(Seq("a", "", "b")) == score(Seq("a", "b")))
  }

  test("codegen/interpreted parity (DataFrame select vs direct eval)") {
    val rows = Seq("the data the data", "lone", "", "a b c d e")
    val got = rows.toDF("t")
      .select(F.bigramLogProbLm(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col("t"), " ")).as("s"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map(r => score(r.split(" ").toSeq))
    assert(got == want)
  }
}
