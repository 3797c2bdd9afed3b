package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** m09-at-scale probe (VERDICT r17 "Next round #5"): measures the loose-
  * object ingest against the coalesced-pack path at a crawl-dump file
  * count. Fabricates N tiny binary objects DISTRIBUTED (one per synthetic
  * doc id — content is the id's decimal string so byte identity is
  * checkable without carrying a corpus), then times
  *   (a) loose:  binaryFile scan over N objects -> per-file checksum agg
  *   (b) pack:   ONE coalescing pass (Multimodal.ingestCoalesced) into
  *               ceil(N/k) parquet packs
  *   (c) packed: the same checksum agg over the packs
  * and prints one JSON line. The point at N=500k: (a) is what every
  * downstream pass pays forever on a loose lake; (b) is paid once; (c) is
  * what every pass costs after packing — the ratio (a)/(c) is the daily
  * win, and (b)/(a) the payback horizon.
  *
  * Usage: IngestProbe [nFiles] [recordsPerPack] (defaults 500000, 10000)
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
    val spark = GraftSession.local()
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_ingest_probe")
    val looseDir = base.resolve("loose").toString
    val packDir = base.resolve("packs").toString
    new java.io.File(looseDir).mkdirs()

    // distributed fabrication: each task writes its own id range (the
    // m09 fixture shape; locally a tmpdir stands in for shared storage)
    spark.range(n).repartition(spark.sparkContext.defaultParallelism)
      .as[Long].foreachPartition { (ids: Iterator[Long]) =>
        ids.foreach { id =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(looseDir, s"doc-$id.bin"),
            id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ()
        }
      }

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      // bit_xor: order-independent and overflow-free (sum of full-range
      // xxhash64 longs trips ANSI overflow)
      val s = df.select(xxhash64(col("doc_id"), col("content")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
      (s, (System.nanoTime() - t0) / 1e9)
    }
    def loose() = spark.read.format("binaryFile")
      .option("pathGlobFilter", "doc-*.bin").load(looseDir)
      .select(regexp_extract(col("path"), "doc-(\\d+)\\.bin$", 1)
        .cast("long").as("doc_id"), col("content"))

    val (chkLoose, tLoose) = checksum(loose())
    val t1 = System.nanoTime()
    val packs = operators.Multimodal.ingestCoalesced(spark, looseDir, packDir, k)
    val tPack = (System.nanoTime() - t1) / 1e9
    val (chkPacked, tPacked) = checksum(operators.Multimodal.readPacks(spark, packDir))
    require(chkLoose == chkPacked,
      s"pack round-trip changed payload bytes: $chkLoose vs $chkPacked")

    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"""{"metric":"ingest_probe","n_files":$n,"records_per_pack":$k,""" +
      s""""pack_files":$packs,"loose_read_sec":${f(tLoose)},""" +
      s""""pack_write_sec":${f(tPack)},"packed_read_sec":${f(tPacked)},""" +
      s""""read_speedup":${f(tLoose / tPacked)},"checksum_match":true}""")
    spark.stop()
  }
}
