package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** st04-at-scale probe (VERDICT r18 "Next round #6"): split per-batch
  * REPLAY cost from per-batch STATE. The sf100 st04/st02 rows in
  * bench_scaling_r18 replay the WHOLE corpus as one micro-batch, which
  * measures the single-batch limit only; the SURVEY §2.7 claim — a
  * streaming gate's per-batch work scales with the BATCH, not the corpus
  * — needs a measured multi-batch point.
  *
  * Method: stage the orders corpus ONCE as `nFiles` equal part files,
  * then run the same stream→versioned-table pipeline st04 uses
  * (file source → [[graft.streaming.Streams.writeToTable]] → one append
  * commit per micro-batch) under different `maxFilesPerTrigger` chunkings
  * of the SAME staged bytes. If per-batch work is batch-sized, total wall
  * stays ~flat as the batch count grows (each batch is 1/Nth the data)
  * and per-batch duration tracks batch bytes; if any per-batch cost were
  * CORPUS-sized, wall would grow ~linearly with batch count.
  *
  * Output: one compact JSON line on stdout (full detail to
  * SPARK_GRAFT_PROBE_OUT, default stream_probe.json) with, per chunking:
  * wall seconds, batch count, and the per-batch duration series from the
  * query's progress events.
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "16").toInt
    val chunkings = sys.env.getOrElse("SPARK_GRAFT_PROBE_CHUNKS", "16,4,1")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage ONCE: the corpus as nFiles equal parts — every chunking
    // streams the same bytes, only the trigger boundary moves
    val staged = TempDirs.create("graft_stream_probe_src").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .repartition(nFiles).write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val stagedRows = spark.read.parquet(staged).count()

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val results = chunkings.map { perTrigger =>
      val table = graft.tables.GraftTable.createEmpty(spark,
        TempDirs.create("graft_stream_probe_tbl").toString + "/t", schema)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", perTrigger.toString).parquet(staged)
      val name = s"probe_chunk_$perTrigger"
      val t0 = System.nanoTime()
      val q = graft.streaming.Streams.writeToTable(stream, table, name)
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      // per-batch durations from the progress events (triggerExecution
      // covers the batch end-to-end: read, plan, commit)
      val batchMs = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .map(p => p.durationMs.getOrDefault("triggerExecution", 0L))
      val commits = table.meta.snapshots.size
      val rows = table.toDF().count()
      require(rows == stagedRows, s"row loss at chunk=$perTrigger: $rows != $stagedRows")
      (perTrigger, wall, commits, batchMs)
    }

    val detail = results.map { case (c, wall, commits, batchMs) =>
      s"""{"max_files_per_trigger":$c,"wall_sec":${fmt(wall)},""" +
        s""""n_commits":$commits,"n_batches":${batchMs.size},""" +
        s""""batch_sec":[${batchMs.map(ms => fmt(ms / 1e3)).mkString(",")}]}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"stream_chunk_probe","sf":"$sfDir","n_files":$nFiles,""" +
        s""""rows":$stagedRows,"runs":$detail}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "stream_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
