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
    spark.read.parquet(s"$sfDir/orders.parquet").count()
    import org.apache.spark.sql.functions._
    val capped = spark.read.parquet(s"$sfDir/orders.parquet").orderBy(col("o_orderkey")).limit(20000)
    (1 to 2).foreach { i =>
      val dir = java.nio.file.Files.createTempDirectory("graft_t13prof").toString + "/t"
      val t = time(s"createAs(16 files) $i")(graft.tables.GraftTable.createAs(spark, dir, capped.repartition(16)))
      time(s"compact $i")(t.compact(64L << 20))
      time(s"read-count $i")(t.toDF().count())
      time(s"full t13 $i")(graft.operators.TableOps.t13Compaction(spark, sfDir).count())
    }
    spark.stop()
  }
}
