package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{BigramLm, BigramLogProbKernel, PolyWordHashKernel}

/** One-shot trainer for the shipped bigram LM table
  * (`src/main/resources/graft/bigram_lm.txt`) — run locally, output
  * committed, provenance recorded in the file header (the BpeTrain
  * pattern for the LM family). The sample is BOUNDED and DETERMINISTIC:
  * the first `SampleDocs` documents by doc_id, tokenized exactly as the
  * x21/x23 gates tokenize (edge-trim the explicit whitespace class,
  * split on it, raw case), words hashed by the portable polynomial
  * kernel, bigram buckets counted, the `MaxEntries` most frequent kept
  * (ties by bucket). At 100 TB you train on exactly this kind of
  * bounded sample and ship the table to every executor as a resource —
  * never the corpus to a trainer.
  *
  * Invocation that produced the committed resource:
  * `sbt "runMain graft.BigramLmTrain /root/testdata/sf0.001 src/main/resources/graft/bigram_lm.txt"`
  */
object BigramLmTrain {
  val SampleDocs = 500
  val MaxEntries = 2000

  /** Pure trainer over the sample texts (doc_id order): sparse
    * (bucket, lp) entries sorted by bucket, plus the mean-log-prob
    * keep threshold. See [[BigramLm]] for the quantization contract.
    */
  def train(texts: Seq[String]): (IndexedSeq[(Int, Int)], Long) = {
    val ws = "[ \\t\\n\\f\\r]"
    val counts = new java.util.HashMap[Int, java.lang.Long]()
    texts.foreach { t =>
      val trimmed = t.replaceAll(s"^$ws+|$ws+$$", "")
      if (trimmed.nonEmpty) {
        var prev = -1L
        trimmed.split(s"$ws+").foreach { w =>
          if (w.nonEmpty) {
            val h = PolyWordHashKernel.hashWord(UTF8String.fromString(w), 7L, 11L)
            if (prev >= 0L) {
              val b = BigramLogProbKernel.bucket(prev, h).toInt
              counts.merge(b, 1L, (a, x) => a + x)
            }
            prev = h
          }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    val kept = counts.asScala.toSeq.map { case (b, c) => (b, c.longValue()) }
      .sortBy { case (b, c) => (-c, b) }.take(MaxEntries)
    val cMax = kept.headOption.map(_._2).getOrElse(1L)
    // quantized log-frequency in [-999, -1], monotone in count;
    // StrictMath so any JVM reproduces the committed bits
    val quantized = kept.map { case (b, c) =>
      (b, c, (-1000L + Math.round(999.0 *
        StrictMath.log1p(c.toDouble) / StrictMath.log1p(cMax.toDouble))).toInt)
    }
    val entries = quantized.map { case (b, _, lp) => (b, lp) }
      .sortBy(_._1).toIndexedSeq
    // operating point: the EXPECTED log-prob of one pair under the
    // training distribution (count-weighted table mean) — the CCNet
    // shape, where the cutoff sits at a typical document's perplexity
    // and actually splits a corpus, unlike a uniform bucket mean that
    // the -1000 floor drags below every real document
    val wSum = quantized.map { case (_, c, lp) => lp.toLong * c }.sum
    val cSum = quantized.map(_._2).sum.max(1L)
    (entries, Math.floorDiv(wSum, cSum))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("src/main/resources/graft/bigram_lm.txt")
    // optional 3rd arg: restrict the sample to one language — the x24
    // TARGET-domain table (`bigram_lm_target.txt`) trains on the `en`
    // docs among the same first-SampleDocs window, so the raw and target
    // tables see the same corpus slice and differ only by domain
    val langFilter = args.lift(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val window = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy("doc_id").limit(SampleDocs)
    val sample = langFilter.fold(window)(l =>
      window.filter(org.apache.spark.sql.functions.col("lang") === l))
    val texts = sample.orderBy("doc_id")
      .select("text").collect().map(_.getString(0)).toSeq
    val (entries, threshold) = train(texts)
    val langNote = langFilter.fold("")(l => s", lang = $l only")
    val header =
      s"""# Bigram LM table: quantized log-frequencies per hashed bigram bucket
         |# (one `bucket lp` per line; unlisted buckets are the -1000 floor).
         |# Trained by graft.BigramLmTrain: sample = first $SampleDocs docs of
         |# $dir/documents.parquet$langNote, top $MaxEntries buckets by count.
         |threshold $threshold
         |""".stripMargin
    val body = entries.map { case (b, lp) => s"$b $lp" }.mkString("\n")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), header + body + "\n")
    println(s"wrote ${entries.size} entries (threshold $threshold) to $out")
    spark.stop()
  }
}
