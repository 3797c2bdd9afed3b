package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scaler: derives an N×-larger benchmark corpus
  * from an existing scale-factor directory by unioning N key-shifted
  * copies of every fact table (dims `region`/`nation` stay fixed, like
  * TPC-H). Copy i shifts each key domain by i × |domain| — keys are
  * dense 0..|domain|−1 in the driver corpus — and shifts FOREIGN keys by
  * the same per-domain offset, so the join graph of the source corpus is
  * replicated exactly: every join/agg result grows linearly and the
  * per-key fan-in (comment counts, lineitems per order) is preserved.
  *
  * Text and vectors get a small deterministic per-copy perturbation
  * (marker-prefixed text, one nudged-then-renormalized dimension) so the
  * scaled corpus exercises the NEAR-duplicate paths the way a real
  * crawl does — ~N near-copies of every document is exactly the
  * boilerplate regime the capped-bucket dedup design claims to survive —
  * instead of degenerating into byte-exact duplicates only.
  *
  * No wall clock, no RNG: same inputs → byte-identical outputs (modulo
  * parquet encoding of identical row sets), so scaling ratios measured
  * against the output are reproducible across sessions.
  *
  * Usage: runMain graft.DataGen <srcSfDir> <outDir> <factor>
  */
object DataGen {
  /** (table, key column → domain size multiplier source table). Domain
    * sizes are read from the SOURCE corpus, never assumed.
    */
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, srcDir, outDir, factor)
    finally spark.stop()
  }

  def generate(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    // `<t>.parquet` becomes a DIRECTORY of part files, one part per
    // copy per source split — the file count scales with the ingestion
    // job count exactly as a real lake's does, so scans keep the
    // parallelism a production corpus would have (a coalesce(1)
    // single-file layout was measured to serialize every compute-heavy
    // scan over the small-bytes tables: s01 went 3.8x -> 29.7x at
    // factor 10 purely from the one-task artifact). Gates stage tables
    // through Spark, never by raw file copy, so both layouts read alike.
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[datagen] $t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }
    // key-domain sizes from the source corpus (dense 0..n-1 keys)
    def domain(t: String, k: String): Long =
      read(t).agg(max(col(k))).head().getLong(0) + 1L

    val nOrders = domain("orders", "o_orderkey")
    val nCust   = domain("customer", "c_custkey")
    val nSupp   = domain("supplier", "s_suppkey")
    val nPart   = domain("part", "p_partkey")
    val nEvent  = domain("events", "event_id")
    val nUser   = read("events").agg(max(col("user_id"))).head().getLong(0) + 1L
    val nDoc    = domain("documents", "doc_id")
    val nVec    = domain("embeddings", "vec_id")

    /** Union of `factor` copies with per-copy column rewrites. */
    def scaled(t: String)(rewrite: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => rewrite(read(t), i)).reduce(_ unionAll _)

    def shift(df: DataFrame, i: Int, cols: (String, Long)*): DataFrame =
      cols.foldLeft(df) { case (d, (c, n)) =>
        d.withColumn(c, (col(c) + lit(i * n)).cast(d.schema(c).dataType)) }

    write("region", read("region"))
    write("nation", read("nation"))
    write("customer", scaled("customer")(shift(_, _, "c_custkey" -> nCust)))
    write("supplier", scaled("supplier")(shift(_, _, "s_suppkey" -> nSupp)))
    write("part", scaled("part")(shift(_, _, "p_partkey" -> nPart)))
    write("orders", scaled("orders")(
      shift(_, _, "o_orderkey" -> nOrders, "o_custkey" -> nCust)))
    write("lineitem", scaled("lineitem")(shift(_, _,
      "l_orderkey" -> nOrders, "l_partkey" -> nPart, "l_suppkey" -> nSupp)))
    write("events", scaled("events")(
      shift(_, _, "event_id" -> nEvent, "user_id" -> nUser)))
    // documents: copy 0 verbatim; copies i>0 prefix a marker token — a
    // NEAR-duplicate (high Jaccard/minhash similarity, distinct hash), so
    // exact-dedup keeps 10/10 while near-dup families face the real
    // boilerplate regime. n_chars tracks the rewritten text.
    write("documents", scaled("documents") { (df, i) =>
      val d = shift(df, i, "doc_id" -> nDoc)
      if (i == 0) d
      else d.withColumn("text", concat(lit(s"v$i "), col("text")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    // embeddings: copies i>0 nudge one vec_id-dependent dimension then
    // renormalize (unit vectors in, unit vectors out) — near neighbors,
    // never exact duplicates.
    write("embeddings", scaled("embeddings") { (df, i) =>
      val d = shift(df, i, "vec_id" -> nVec)
      if (i == 0) d
      else {
        val dim = size(col("embedding"))
        val nudged = transform(col("embedding"), (x, j) =>
          when(j === pmod(col("vec_id"), dim.cast("long")).cast("int"),
            x + lit(i * 0.003f)).otherwise(x))
        val norm = sqrt(aggregate(nudged, lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double")))
        d.withColumn("embedding",
          transform(nudged, x => (x.cast("double") / norm).cast("float")))
      }
    })
  }
}
