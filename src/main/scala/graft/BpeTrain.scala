package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot trainer for the shipped BPE merge rules
  * (`src/main/resources/graft/bpe_merges.txt`) — run locally, output
  * committed, provenance recorded in the file header. The sample is
  * BOUNDED and DETERMINISTIC: the first `sampleDocs` documents by
  * doc_id, word frequencies over the RE2-`\s`-class whitespace split of
  * the lowercased text, capped to the `maxWords` most frequent words
  * (ties by word) — at 100 TB you train on exactly this kind of bounded
  * sample and ship the rules to every executor as a resource, never the
  * corpus to a trainer.
  *
  * Invocation that produced the committed resource:
  * `sbt "runMain graft.BpeTrain /root/testdata/sf0.001 src/main/resources/graft/bpe_merges.txt 300"`
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("src/main/resources/graft/bpe_merges.txt")
    val numMerges = args.lift(2).map(_.toInt).getOrElse(300)
    val sampleDocs = 500
    val maxWords = 4000
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val freqs = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy("doc_id").limit(sampleDocs)
      .select(explode(split(trim(lower(col("text"))), "[ \\t\\n\\f\\r]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, f) => (-f, w) }
      .take(maxWords).toSeq
    val merges = graft.functions.BpeTrainer.train(freqs, numMerges)
    val header =
      s"""# BYTE-level BPE merge rules, rank order: one `left right` per
         |# line, each symbol the lowercase-hex form of its UTF-8 bytes
         |# (GPT-2/tiktoken lineage — merges operate on bytes, byte
         |# fallback makes every input tokenizable).
         |# Trained by graft.BpeTrain: sample = first $sampleDocs docs of
         |# $dir/documents.parquet, top $maxWords words, $numMerges merges max.
         |""".stripMargin
    val body = merges.map { case (l, r) =>
      s"${graft.functions.BpeVocab.hexOf(l)} ${graft.functions.BpeVocab.hexOf(r)}"
    }.mkString("\n")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), header + body + "\n")
    println(s"wrote ${merges.size} merges to $out")
    spark.stop()
  }
}
