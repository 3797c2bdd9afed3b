package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** TEMPORARY profiling probe for the r20 optimization round (not part of
  * the driver contract): runs named gates with a job listener and prints
  * per-gate wall time, Spark job count, summed job wall, and the
  * driver-side gap (wall - job wall) — the first split the optimization
  * guide asks for (where is the time: executing jobs or driver work).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()

    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        starts.put(js.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) { jobs += 1; jobNanos += System.nanoTime() - s }
      }
    })

    // poor-man's driver profiler: sample the main thread's stack every 5 ms
    // and aggregate the deepest "interesting" frame (graft or spark sql)
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          val frame = st.find { e =>
            val c = e.getClassName
            c.startsWith("graft.") || c.startsWith("org.apache.spark.sql.catalyst") ||
              c.startsWith("org.apache.spark.sql.execution") ||
              c.startsWith("org.apache.parquet") || c.startsWith("org.apache.avro")
          }.map(e => s"${e.getClassName}.${e.getMethodName}").getOrElse(
            st.headOption.map(e => s"${e.getClassName}.${e.getMethodName}").getOrElse("?"))
          samples.merge(frame, 1, (a, b) => a + b)
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    for (name <- args; fn <- SparkEntry.queries.get(name)) {
      SparkEntry.prewarms.get(name).foreach(_(spark, sfDir))
      for (rep <- 1 to 2) {
        jobs = 0; jobNanos = 0L
        samples.clear()
        sampling = rep == 2
        val t0 = System.nanoTime()
        GraftSession.withExecConfs(spark,
          SparkEntry.executionConfs.getOrElse(name, Map.empty)) {
          import org.apache.spark.sql.functions.{col, max, struct, xxhash64}
          val out = fn(spark, sfDir)
          val hashed = out.select(xxhash64(struct(out.columns.map(col): _*)).as("h"))
            .agg(max(col("h")))
          // plans/r20 deliverable: the formatted physical plan of the gate's
          // hashed action (the exact plan the bench times), written once
          for (dir <- sys.env.get("SPARK_GRAFT_PLANDIR") if rep == 1) {
            val suffix = sys.env.getOrElse("SPARK_GRAFT_PLANSUFFIX", "before")
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$dir/${name}_$suffix.txt"),
              hashed.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          hashed.head()
          ()
        }
        // listener bus is async; give it a moment to drain
        Thread.sleep(150)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $name rep$rep wall=$wall%.3f jobs=$jobs jobSec=${jobNanos / 1e9}%.3f driverGap=${wall - jobNanos / 1e9}%.3f")
        if (rep == 2) {
          sampling = false
          import scala.jdk.CollectionConverters._
          samples.asScala.toSeq.sortBy(-_._2).take(14).foreach { case (f, n) =>
            println(f"[prof]    ${n * 5 / 1000.0}%6.2fs  $f")
          }
        }
      }
    }
    spark.stop()
  }
}
