package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.tune(SparkSession.builder().master("local[4]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("FP=" + spark.read.parquet(s"$sfDir/region.parquet")
      .select(col("_metadata.file_path")).head().getString(0))
    spark.stop()
  }
}
