package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    (1 to 2).foreach { i =>
      time(s"d04 run $i")(println("[scratch]   d04 rows: " + graft.operators.Dedup.d04Simhash(spark, sfDir).count()))
      time(s"d06 run $i")(println("[scratch]   d06 rows: " + graft.operators.Dedup.d06EmbedNeardup(spark, sfDir).count()))
    }
    spark.stop()
  }
}
