package graft

import org.apache.spark.sql.SparkSession

/** Time a subset of SparkEntry queries at an arbitrary sf (ad-hoc). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (name <- args; fn <- SparkEntry.queries.get(name)) {
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[benchone] $name rep$rep rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
