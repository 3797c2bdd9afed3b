package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query (action = count) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup so the first timed query isn't charged for it
    spark.read.parquet(s"$sfDir/region.parquet").count()
    SparkEntry.queries.get("q01_pricing_summary").foreach(_(spark, sfDir).count())

    // min over INTERLEAVED reps: run a full pass over all queries, then a
    // second full pass, and keep the per-query min. Back-to-back reps share
    // any transient load burst (both samples inflate together and min-of-2
    // can't reject it — the r6 driver sample manufactured phantom 2-5×
    // deltas on one contiguous alphabetical block exactly this way);
    // interleaving puts minutes between a query's two samples so a burst
    // can't sit on both.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    val best = Array.fill(named.size)(Double.MaxValue)
    // A query that throws must surface as an explicit error, not as the
    // elapsed-until-throw time masquerading as a (suspiciously fast) success.
    val errs = Array.fill[Option[String]](named.size)(None)
    for (_ <- 1 to reps; ((_, fn), i) <- named.zipWithIndex) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        best(i) = math.min(best(i), (System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        errs(i) = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    val results = named.zipWithIndex.collect {
      case ((name, _), i) if errs(i).isEmpty => name -> best(i)
    }
    val failed = named.zipWithIndex.collect {
      case ((name, _), i) if errs(i).isDefined => name -> errs(i).get
    }
    // per-query times, slowest first, on stderr (stdout stays ONE JSON line)
    results.sortBy(-_._2).foreach { case (n, t) =>
      System.err.println(f"$t%8.3f  $n")
    }
    failed.foreach { case (n, e) => System.err.println(s"  ERROR  $n  $e") }
    // ms precision keeps the stdout line compact (68 queries overflowed the
    // driver's tail capture in r3); the same JSON also goes to a file so a
    // truncated stream can never lose the round's numbers.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = (results.map { case (k, v) => "\"" + k + "\":" + fmt(v) } ++
      failed.map { case (k, _) => "\"" + k + "\":\"err\"" })
      .sorted.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val errsJson =
      if (failed.isEmpty) ""
      else failed.map { case (k, e) =>
        "\"" + k + "\":\"" + e.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
      }.mkString(",\"errors\":{", ",", "}")
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$errsJson,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
