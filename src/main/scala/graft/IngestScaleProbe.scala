package graft

import org.apache.spark.sql.SparkSession

/** m13-at-scale probe (VERDICT r18 "Next round #5"): measure the PACKED
  * ingest posture at the m09 shape that broke the loose path — sf100 is
  * ~5M loose binary objects, whose driver-side listing OOM'd the r17
  * shared JVM and is excluded from the ×1000 row as file-count-linear.
  * The production answer is pack-on-ingest ([[graft.operators.Multimodal
  * .ingestCoalesced]]); this probe produces the two numbers the scaling
  * ledger needs next to `ingest_probe_500k`:
  *
  *  - `setup_sec`: the ONE-TIME cost at this scale — corpus fabrication
  *    (5M file writes, a fixture artifact, not an engine cost) + the
  *    coalescing pack write (the real ingest-boundary cost, one narrow
  *    pass) — phases not split because the fixture is marker-cached and
  *    the split was already measured at 500k (ingest_probe_500k:
  *    pack_write 19.4 s for 500k objects).
  *  - `packed_decode_sec`: m09's WHOLE pipeline (sniff-dispatch decode +
  *    positional checksums + zero-fill join) run VIA the packs — the
  *    number that replaces the excluded loose row: every later read of a
  *    packed crawl is file-count-bounded, so this is the steady-state
  *    m09-at-sf100 cost.
  *
  * The decode is consumed with the same hash-all-columns `.head()` action
  * Bench uses, so nothing upstream is prunable.
  */
object IngestScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // setup: fixture fabrication (marker-cached) + coalescing pack write
    val t0 = System.nanoTime()
    val packed = graft.operators.Multimodal.m13PackedIngest(spark, sfDir)
    val setupSec = (System.nanoTime() - t0) / 1e9

    // steady state: the full m09 decode pipeline over the packed layout,
    // consumed end-to-end (hash of every output value, collected)
    import org.apache.spark.sql.functions.{col, max, struct, xxhash64}
    val t1 = System.nanoTime()
    val h = packed
      .select(xxhash64(struct(packed.columns.map(col): _*)).as("h"))
      .agg(max(col("h"))).head().getLong(0)
    val decodeSec = (System.nanoTime() - t1) / 1e9
    // zeroFilled returns one row per document — count the cheap side
    // rather than re-running the whole decode for a row count
    val nRows = spark.read
      .parquet(s"$sfDir/documents.parquet").count()

    // layout facts for the ledger
    val looseDir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_media_ingest_${Integer.toHexString(sfDir.hashCode)}")
    val nLoose = Option(looseDir.list()).map(_.count(_.endsWith(".bin"))).getOrElse(0)
    val packDataDir = new java.io.File(looseDir.getParentFile,
      looseDir.getName + "_packs/data")
    val packFiles = Option(packDataDir.listFiles())
      .map(_.filter(_.getName.endsWith(".parquet"))).getOrElse(Array.empty)
    val packBytes = packFiles.map(_.length()).sum

    val json =
      s"""{"metric":"ingest_scale_probe","sf":"$sfDir",""" +
        s""""setup_sec":${fmt(setupSec)},"packed_decode_sec":${fmt(decodeSec)},""" +
        s""""n_loose_objects":$nLoose,"n_pack_files":${packFiles.length},""" +
        s""""pack_bytes":$packBytes,"decode_rows":$nRows,"hash":$h}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "ingest_scale_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    // reclaim the one-time fixture's ~20 GB of loose objects on request —
    // the packs stay (they're the persistent layout; a later run of the
    // m13 gate rebuilds the fixture if it needs it)
    if (sys.env.contains("SPARK_GRAFT_PROBE_RM_LOOSE")) {
      // the fixture MARKER must go with the objects: a surviving marker
      // over an emptied dir reads as a valid cached fixture, and a later
      // m09/m13 run would silently decode nothing (all-zero rows) instead
      // of rebuilding
      Option(looseDir.listFiles()).foreach(_.foreach(f =>
        if (f.getName.endsWith(".bin") || f.getName == "_GRAFT_FIXTURE") {
          f.delete(); ()
        }))
      System.err.println(s"[probe] loose objects + fixture marker under $looseDir removed")
    }
    spark.stop()
  }
}
