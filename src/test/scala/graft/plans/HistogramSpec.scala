package graft.plans

import graft.SparkSpec
import graft.tables.{GraftTable, MetaIO, StatsPayload, ColHistogram, HistBin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Equi-height histograms: ANALYZE computes them distributed, the stats
  * file persists them, `DeclaredStats` serves them to CBO — and skewed
  * selectivity estimates follow the DISTRIBUTION instead of the
  * uniformity guess. Appends drop (never silently corrupt) them.
  */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_hist").toString + "/t"

  // 90% of rows hold value 7; the rest spread over 0..999
  private def skewedDf =
    spark.range(9000).select(lit(7L).as("c"), $"id".as("pay"))
      .unionAll(spark.range(1000).select(($"id" % 1000).as("c"), $"id".as("pay")))

  private def estimatedRows(df: DataFrame): Option[BigInt] =
    df.queryExecution.optimizedPlan.stats.rowCount

  test("ANALYZE computes an equi-height histogram; skew shows as repeated-endpoint bins") {
    val t = GraftTable.createAs(spark, tmp(), skewedDf)
      .analyze(Seq("c"), histogramBins = 10)
    val h = t.columnHistogram("c").getOrElse(fail("histogram must be live"))
    assert(h.bins.size == 10)
    assert(math.abs(h.height - 1000.0) < 1e-9, s"height = rows/bins, got ${h.height}")
    // a value holding 90% of rows must occupy most equi-height bins
    val heavy = h.bins.count(b => b.lo == 7.0 && b.hi == 7.0)
    assert(heavy >= 6, s"skewed value must dominate the bins, got $heavy of ${h.bins}")
    // non-numeric columns are skipped, not failed
    val t2 = GraftTable.createAs(spark, tmp(),
      Seq((1L, "a")).toDF("n", "s")).analyze(Seq("n", "s"), histogramBins = 4)
    assert(t2.columnHistogram("n").isDefined && t2.columnHistogram("s").isEmpty)
  }

  test("CBO equality selectivity follows the histogram, not the uniformity guess") {
    val wh = Files.createTempDirectory("graft_hist_cbo").toString
    val plain = GraftTable.createAs(spark, s"$wh/plain", skewedDf)
      .analyze(Seq("c"))
    val hist = GraftTable.createAs(spark, s"$wh/hist", skewedDf)
      .analyze(Seq("c"), histogramBins = 10)
    val uniform = estimatedRows(plain.toDF().filter($"c" === 7L))
      .getOrElse(fail("no estimate"))
    val skewAware = estimatedRows(hist.toDF().filter($"c" === 7L))
      .getOrElse(fail("no estimate"))
    // uniform: ~rows/ndv = 10000/~1000 ≈ 10; histogram: ~9000
    assert(uniform < BigInt(500),
      s"uniformity guess should be tiny for an equality on ~1000 NDV, got $uniform")
    assert(skewAware > BigInt(4000),
      s"histogram estimate must see the heavy value, got $skewAware")
    assert(skewAware > uniform * 10,
      s"histogram must dominate the uniform guess: $skewAware vs $uniform")
    // estimates are planning-only: results identical (9000 heavy + 1
    // from the 0..999 spread)
    assert(hist.toDF().filter($"c" === 7L).count() == 9001)
  }

  test("appends drop histograms (no fold) but keep NDV live") {
    val t = GraftTable.createAs(spark, tmp(), skewedDf)
      .analyze(Seq("c"), histogramBins = 8)
    assert(t.columnHistogram("c").isDefined)
    val ndvBefore = t.columnNdv("c").get
    t.append(Seq((5000L, 1L)).toDF("c", "pay"))
    assert(t.columnHistogram("c").isEmpty,
      "appended rows aren't in the bins — the histogram must drop, not lie")
    assert(t.columnNdv("c").contains(ndvBefore + 1),
      "sketch NDV must keep folding through the append")
    // re-analyze restores the histogram over the new rows
    t.analyze(Seq("c"), histogramBins = 8)
    assert(t.columnHistogram("c").isDefined)
  }

  test("facade ANALYZE honors spark.sql.statistics.histogram confs") {
    import graft.sources.GraftSql
    val wh = Files.createTempDirectory("graft_hist_sql").toString
    val t = GraftTable.createAs(spark, s"$wh/ht", skewedDf)
    val g = new GraftSql(spark, wh)
    g.register("ht", t.location)
    try {
      spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
      spark.conf.set("spark.sql.statistics.histogram.numBins", "12")
      g.sql("ANALYZE TABLE ht COMPUTE STATISTICS FOR COLUMNS c")
      val h = t.columnHistogram("c").getOrElse(fail("facade must compute the histogram"))
      assert(h.bins.size == 12)
    } finally {
      spark.conf.unset("spark.sql.statistics.histogram.enabled")
      spark.conf.unset("spark.sql.statistics.histogram.numBins")
    }
  }

  test("stats file round-trips histograms") {
    val p = StatsPayload(42L, 512,
      Map("c1" -> Array(1L, 2L, 3L)),
      Map("c1" -> ColHistogram(12.5,
        Seq(HistBin(0.0, 3.5, 4L), HistBin(3.5, 9.0, 2L)))))
    val back = MetaIO.statsFileFromJson(MetaIO.statsFileToJson(p))
    assert(back.snapshotId == 42L && back.k == 512)
    assert(back.sketches("c1").toSeq == Seq(1L, 2L, 3L))
    assert(back.histograms == p.histograms)
    // histogram-free files parse with no histogram section (back-compat)
    val bare = MetaIO.statsFileFromJson(
      MetaIO.statsFileToJson(StatsPayload(1L, 8, Map("x" -> Array(9L)))))
    assert(bare.histograms.isEmpty)
  }
}
