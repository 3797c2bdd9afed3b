package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    // warmup
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    val d = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val planted = d.unionAll(d.select((col("doc_id") + lit(2000000L)).as("doc_id"),
      expr("concat_ws(' ', filter(split(trim(text), '\\\\s+'), (w, i) -> i % 10 != 0))").as("text")))
    val sh = planted.withColumn("sh", graft.functions.F.wordShingles(
      expr("transform(split(trim(text), '\\\\s+'), w -> xxhash64(w))"), 3))
    time("shingles")(sh.select(sum(size(col("sh")))).head())
    val sig = sh.withColumn("sig", graft.functions.F.minhashSig(col("sh"), 128))
    time("shingles+minhash128")(sig.select(sum(size(col("sig")))).head())
    time("full d03 run 1")(graft.operators.Dedup.d03MinhashLsh(spark, sfDir).count())
    time("full d03 run 2")(graft.operators.Dedup.d03MinhashLsh(spark, sfDir).count())
    time("full d04 run")(graft.operators.Dedup.d04Simhash(spark, sfDir).count())
    spark.stop()
  }
}
