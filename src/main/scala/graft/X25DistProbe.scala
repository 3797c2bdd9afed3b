package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** x25 DISTRIBUTED-path probe (r20 verdict item #4): the domain-rank
  * ladder's driver fast-path is bench-measured; the distributed rounds —
  * the path a real 10^8-domain crawl graph takes — had only spec
  * coverage. This probe runs BOTH paths on the same corpus
  * (localEdgeCap = default vs 0, forcing the join+groupBy rounds),
  * REQUIREs bit-identical (domain, rank, out_links, in_links) rows —
  * the integer-arithmetic ladder makes equality exact, no tolerance —
  * and records both walls. At sf100 the distributed wall is the §9
  * scale-ledger row.
  */
object X25DistProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(cap: Long): (Double, Array[String]) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.TextAnalysis
        .x25DomainRank(spark, sfDir, cap)
        .collect().map(_.mkString("|"))
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val (wallLocal, local) = run(1L << 18)
    val (wallDist, dist) = run(0L)
    require(local.sameElements(dist),
      s"x25 distributed path diverged from the local ladder: " +
        s"${local.length} vs ${dist.length} rows, first diff " +
        local.zip(dist).collectFirst { case (a, b) if a != b => s"$a != $b" }
          .getOrElse("(row sets differ)"))

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json =
      s"""{"metric":"x25_dist_probe","sf":"$sfDir","domains":${local.length},""" +
        s""""wall_local_sec":${fmt(wallLocal)},"wall_dist_sec":${fmt(wallDist)},""" +
        s""""rank_identity":true}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "x25_dist_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
