package graft.streaming

import graft.{GraftSession, TempDirs}
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, struct, sum, unix_millis, xxhash64}

/** Streaming CRASH-RECOVERY probe (r20 verdict item #6): the st04
  * batch-id fence ([[Streams.applyAppendBatch]]) is spec-pinned at toy
  * size; this is its scale-grade proof at a real corpus. The events
  * corpus is staged as `nFiles` chunks and streamed into a versioned
  * table twice:
  *
  *  - RUN A (uninterrupted): maxFilesPerTrigger=1 end to end.
  *  - RUN B (killed + resumed): the foreachBatch THROWS on batch
  *    `killAt` AFTER the table append commits but BEFORE Spark writes
  *    the checkpoint commit marker — the worst crash window, because the
  *    restarted query REPLAYS batch `killAt` from the offset log and a
  *    fence-less sink would double-append it. The probe restarts from
  *    the same checkpoint, REQUIREs the replayed first batch id equals
  *    `killAt`, and REQUIREs the final table's order-independent content
  *    hash, row count, and commit count all equal run A's.
  *
  * Equal hash + equal commit count together pin exactly-once: the
  * replayed batch was delivered again (observed) and applied zero times
  * more (fenced), and nothing else was lost or duplicated.
  */
object StreamRecoveryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "16").toInt
    val killAt = sys.env.getOrElse("SPARK_GRAFT_PROBE_KILL_AT",
      (nFiles / 2).toString).toLong
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // schema-normalizing loader (raw driver parquet may carry TIMESTAMP_NTZ)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
    val staged = TempDirs.create("graft_recovery_src").toString
    ev.repartitionByRange(nFiles, col("event_id")).write
      .mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val srcDir = TempDirs.create("graft_recovery_in").toString
    new java.io.File(staged).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(srcDir, f"b$i%03d.parquet")); ()
      }

    def stream(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)

    // order-independent content hash: per-row xxhash64 summed as
    // decimal(38,0) — exact (no ANSI long overflow) and multiplicity-
    // sensitive, unlike a bit_xor which cancels duplicate rows
    def tableHash(t: GraftTable): (String, Long) = {
      val df = t.toDF()
      val r = df.select(
        sum(xxhash64(struct(df.columns.map(col): _*))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("h"),
        count(org.apache.spark.sql.functions.lit(1)).as("n")).head()
      (r.getDecimal(0).toBigInteger.toString, r.getLong(1))
    }

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // ---- RUN A: uninterrupted
    val tA = GraftTable.createEmpty(spark,
      TempDirs.create("graft_recovery_tblA").toString + "/t", schema)
    val ckptA = TempDirs.create("graft_recovery_ckptA").toString
    val t0a = System.nanoTime()
    val qA = stream().writeStream.queryName("recovery_probe_a")
      .outputMode("append").option("checkpointLocation", ckptA)
      .foreachBatch(Streams.applyAppendBatch(tA, "recovery_probe") _).start()
    try qA.processAllAvailable() finally qA.stop()
    val wallA = (System.nanoTime() - t0a) / 1e9
    val (hashA, rowsA) = tableHash(tA)
    val commitsA = tA.meta.snapshots.size

    // ---- RUN B: killed after the table commit of batch `killAt`,
    // before the checkpoint commit marker — then resumed
    val tB = GraftTable.createEmpty(spark,
      TempDirs.create("graft_recovery_tblB").toString + "/t", schema)
    val ckptB = TempDirs.create("graft_recovery_ckptB").toString
    @volatile var injected = false
    def crashingBatch(batch: DataFrame, batchId: Long): Unit = {
      Streams.applyAppendBatch(tB, "recovery_probe")(batch, batchId)
      if (!injected && batchId == killAt) {
        injected = true
        throw new RuntimeException(
          s"injected crash: batch $batchId committed to the table, " +
            "checkpoint commit marker not yet written")
      }
    }
    val t0b = System.nanoTime()
    val qB = stream().writeStream.queryName("recovery_probe_b")
      .outputMode("append").option("checkpointLocation", ckptB)
      .foreachBatch(crashingBatch _).start()
    val died =
      try { qB.awaitTermination(); false }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
    val wallB1 = (System.nanoTime() - t0b) / 1e9
    require(died && injected, "the injected crash did not fire")
    val commitsAtCrash = tB.meta.snapshots.size
    require(commitsAtCrash.toLong == killAt + 1,
      s"expected ${killAt + 1} commits at crash (batches 0..$killAt), got $commitsAtCrash")

    // resume from the same checkpoint: batch `killAt` must be REPLAYED
    // (its commit marker is missing) and the fence must swallow it
    val replayed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def resumedBatch(batch: DataFrame, batchId: Long): Unit = {
      replayed.add(batchId)
      Streams.applyAppendBatch(tB, "recovery_probe")(batch, batchId)
    }
    val t0r = System.nanoTime()
    val qR = stream().writeStream.queryName("recovery_probe_resume")
      .outputMode("append").option("checkpointLocation", ckptB)
      .foreachBatch(resumedBatch _).start()
    try qR.processAllAvailable() finally qR.stop()
    val wallB2 = (System.nanoTime() - t0r) / 1e9
    val firstResumed = replayed.peek()
    require(firstResumed == killAt,
      s"resume did not replay the un-checkpointed batch: first=$firstResumed, expected $killAt")

    val (hashB, rowsB) = tableHash(tB)
    val commitsB = tB.meta.snapshots.size
    require(hashB == hashA && rowsB == rowsA,
      s"resumed table diverged: hash $hashB vs $hashA, rows $rowsB vs $rowsA")
    require(commitsB == commitsA,
      s"replayed batch was double-applied: $commitsB commits vs $commitsA")

    val json =
      s"""{"metric":"stream_recovery_probe","sf":"$sfDir","n_files":$nFiles,""" +
        s""""events":$rowsA,"kill_after_batch":$killAt,""" +
        s""""uninterrupted":{"wall_sec":${fmt(wallA)},"commits":$commitsA,"hash":"$hashA"},""" +
        s""""crashed":{"wall_sec":${fmt(wallB1)},"commits_at_crash":$commitsAtCrash},""" +
        s""""resumed":{"wall_sec":${fmt(wallB2)},"first_replayed_batch":$firstResumed,""" +
        s""""commits":$commitsB,"hash":"$hashB","equal_hash":true,"fence_held":true}}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "stream_recovery_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
