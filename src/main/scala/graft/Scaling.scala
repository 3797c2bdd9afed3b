package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe (SURVEY §8, VERDICT r10 "Next round #6"): times the
  * headline relational + dedup + ANN block at sf0.1 and at a ~10×
  * corpus, printing per-query ratios — the closest local[32] evidence
  * for the 100× question.
  *
  * The 10× corpus is built from the driver's own sf0.1 drop (never
  * synthesized from scratch): each FACT table unions `factor` copies
  * with row-identity keys shifted per copy (o_orderkey/l_orderkey,
  * c_custkey + the o_custkey foreign key, doc_id, vec_id, event_id +
  * the user_id foreign key), so every join stays key-consistent; pure dimension tables (region,
  * nation, supplier, part) keep one copy, exactly like a star schema
  * scaled on the fact side. Documents/embeddings texts repeat — a
  * dup-heavy corpus, which is the WORST case for the dedup block
  * (declared; d03's candidate volume grows superlinearly with duplicate
  * density, not with corpus size).
  *
  * Usage: runMain graft.Scaling [factor] [queries...]
  *
  * For a PERSISTENT scaled corpus the full Bench can run against (all
  * gates, reusable across sessions, FKs to scaled dims preserved and
  * text/vectors perturbed into near-duplicates), use [[DataGen]]; this
  * probe stays the quick self-contained A/B harness.
  */
object Scaling {
  private val DefaultQueries = Seq(
    "q01_pricing_summary", "q02_filter_pushdown", "q03_join_fact_dim",
    "q04_multiway_join", "d01_dedup_exact", "d03_minhash_lsh",
    "d05_ngram_jaccard", "s02_ann_lsh")

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val queries = if (args.length > 1) args.drop(1).toSeq else DefaultQueries
    val src = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files.createTempDirectory("graft_scaled").toString

    val keyShift = 1000000000L
    def shifted(name: String, keys: Seq[String]): Unit = {
      val base = graft.sources.Tables.load(spark, src, name)
      val scaled = (0 until factor).map { i =>
        keys.foldLeft(base)((d, k) => d.withColumn(k, col(k) + i * keyShift))
      }.reduce(_ unionAll _)
      scaled.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    def copied(name: String): Unit =
      graft.sources.Tables.load(spark, src, name)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")

    shifted("orders", Seq("o_orderkey", "o_custkey"))
    shifted("lineitem", Seq("l_orderkey"))
    shifted("customer", Seq("c_custkey"))
    // user_id shifts WITH c_custkey — an events↔customer join on the
    // scaled corpus must stay key-consistent, not resolve every copy's
    // events to copy-0 customers
    shifted("events", Seq("event_id", "user_id"))
    shifted("documents", Seq("doc_id"))
    shifted("embeddings", Seq("vec_id"))
    Seq("region", "nation", "supplier", "part").foreach(copied)

    // warmup at both scales so codegen/JIT isn't charged to the first query
    spark.read.parquet(s"$src/lineitem.parquet").count()
    spark.read.parquet(s"$out/lineitem.parquet").count()

    def time(dir: String, q: String): Double = {
      val fn = SparkEntry.queries(q)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"${"query"}%-22s ${"sf0.1"}%8s ${s"x$factor"}%8s ${"ratio"}%7s")
    val rows = queries.map { q =>
      val t1 = math.min(time(src, q), time(src, q))
      val tN = math.min(time(out, q), time(out, q))
      println(f"$q%-22s $t1%8.2f $tN%8.2f ${tN / t1}%7.2f")
      s""""$q":{"sf01":${f"$t1%.3f"},"x$factor":${f"$tN%.3f"},"ratio":${f"${tN / t1}%.2f"}}"""
    }
    println(rows.mkString(s"""{"factor":$factor,"queries":{""", ",", "}}"))
    spark.stop()
  }
}
