package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val exact = graft.operators.Similarity.s01AnnBruteforce(spark, sfDir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    for ((l, pb) <- Seq((8, 2), (16, 2))) {
      val t0 = System.nanoTime()
      val r = recall(graft.operators.Similarity.s02AnnLsh(spark, sfDir, tables = l, probeBits = pb))
      println(f"[scratch] s02 L=$l pb=$pb recall $r%.3f (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    for (np <- Seq(3, 4, 6)) {
      val t0 = System.nanoTime()
      val r = recall(graft.operators.Similarity.s03AnnIvf(spark, sfDir, np))
      println(f"[scratch] s03 probe=$np recall $r%.3f (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    spark.stop()
  }
}
