package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Multi-format data files (t56): `add_files` over ORC/Avro directories,
  * per-file `file_format` in the manifest, format-grouped scans, ORC
  * footer stats that really prune, Avro exact counts, and parquet
  * migration on rewrite.
  */
class MultiFormatSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def base() = GraftTable.createAs(spark, tmp("graft_mf"),
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "price"))

  test("add_files orc: format in the manifest, stats prune, values read") {
    val t = base()
    val orcDir = tmp("graft_mf_orc")
    Seq((10L, "x", 1.5), (11L, "y", 2.5)).toDF("id", "name", "price")
      .coalesce(1).write.mode("append").orc(orcDir)
    Seq((900L, "z", 9.0)).toDF("id", "name", "price")
      .coalesce(1).write.mode("append").orc(orcDir)
    t.addFiles(orcDir, "orc")
    val re = GraftTable.load(spark, t.location)
    val orcFiles = re.currentFiles().filter(_.fileFormat == "orc")
    assert(orcFiles.size == 2)
    assert(orcFiles.map(_.recordCount).sorted == Seq(1L, 2L))
    // ORC footer stats landed and prune: id >= 900 plans one orc file
    assert(orcFiles.forall(_.stats.contains("id")))
    assert(re.plannedFiles("id >= 900").count(_.fileFormat == "orc") == 1)
    // the mixed-format read unifies
    assert(re.toDF().count() == 5)
    assert(re.toDF().filter(col("id") === 900L).select(col("name"))
      .as[String].collect().toSeq == Seq("z"))
  }

  test("add_files avro: exact block counts, values read via the native codec") {
    val t = base()
    val avroDir = tmp("graft_mf_avro")
    graft.sources.GraftAvro.write(
      Seq((100L, "p", 7.0), (101L, "q", 8.0), (102L, "r", 9.0))
        .toDF("id", "name", "price").coalesce(1), avroDir)
    t.addFiles(avroDir, "avro")
    val re = GraftTable.load(spark, t.location)
    val av = re.currentFiles().filter(_.fileFormat == "avro")
    assert(av.nonEmpty && av.map(_.recordCount).sum == 3L)
    assert(av.forall(_.stats.isEmpty), "avro containers carry no column stats")
    assert(re.toDF().count() == 5)
    assert(re.toDF().filter(col("id") >= 100L)
      .select(sum(col("price"))).head().getDouble(0) == 24.0)
  }

  test("merge into a table with multi-row orc files: no spurious cardinality " +
      "violation, real violations still throw") {
    val t = base()
    val orcDir = tmp("graft_mf_orc_merge")
    // THREE rows in ONE orc file: with null row positions these used to
    // collapse into a single (file, NULL) cardinality group, so a merge
    // matching >=2 of them threw a spurious violation
    Seq((10L, "x", 1.5), (11L, "y", 2.5), (12L, "z", 3.5))
      .toDF("id", "name", "price").coalesce(1).write.orc(orcDir)
    t.addFiles(orcDir, "orc")
    t.mergeInto(
      Seq((10L, "X", 15.0), (11L, "Y", 25.0), (99L, "N", 99.0))
        .toDF("id", "name", "price"), Seq("id"))
    val re = GraftTable.load(spark, t.location)
    assert(re.toDF().count() == 6)
    assert(re.toDF().filter(col("id") === 10L).select(col("name"))
      .as[String].head() == "X")
    assert(re.toDF().filter(col("id") === 11L).select(col("price"))
      .as[Double].head() == 25.0)
    assert(re.toDF().filter(col("id") === 99L).count() == 1)
    // a genuinely ambiguous merge (two source rows share key 12, which
    // matches one orc-resident target row) must still throw
    val ex = intercept[IllegalArgumentException] {
      re.mergeInto(
        Seq((12L, "a", 1.0), (12L, "b", 2.0)).toDF("id", "name", "price"),
        Seq("id"))
    }
    assert(ex.getMessage.contains("cardinality"))
  }

  test("file_format round-trips through manifest JSON (parquet stays implicit)") {
    val files = Seq(
      DataFile("/d/a.parquet", 0, Map.empty, 5L, 100L, Map.empty),
      DataFile("/d/b.orc", 0, Map.empty, 3L, 50L, Map.empty, fileFormat = "orc"),
      DataFile("/d/c.avro", 0, Map.empty, 2L, 40L, Map.empty, fileFormat = "avro"))
    val json = MetaIO.manifestToJson(files)
    assert(!json.split("\n").exists(l =>
      l.contains("file_format") && l.contains("parquet")),
      "parquet is the default and must not be serialized")
    assert(MetaIO.manifestFromJson(json).map(_.fileFormat) ==
      Seq("parquet", "orc", "avro"))
  }

  test("rewrite migrates foreign-format rows to parquet") {
    val t = base()
    val orcDir = tmp("graft_mf_orc2")
    Seq((10L, "x", 1.5)).toDF("id", "name", "price")
      .coalesce(1).write.orc(orcDir)
    t.addFiles(orcDir, "orc")
    t.compact()
    val re = GraftTable.load(spark, t.location)
    assert(re.currentFiles().forall(_.fileFormat == "parquet"))
    assert(re.toDF().count() == 3)
  }

  test("orc footer stats map exactly; truncated-unsafe columns drop, not corrupt") {
    val dir = tmp("graft_mf_orc3")
    Seq((5L, "alpha", 1.25, true), (9L, "omega", -3.5, false))
      .toDF("k", "s", "d", "b").coalesce(1).write.orc(dir)
    val f = new java.io.File(dir).listFiles().find(_.getName.endsWith(".orc")).get
    val (rows, stats) = ExternalFooters.orcStats(
      spark.sparkContext.hadoopConfiguration, f.getAbsolutePath,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("d", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.BooleanType))))
    assert(rows == 2L)
    assert(stats("k") == ColStats(Some(5L), Some(9L), 0L))
    assert(stats("s") == ColStats(Some("alpha"), Some("omega"), 0L))
    assert(stats("d") == ColStats(Some(-3.5), Some(1.25), 0L))
    assert(stats("b") == ColStats(Some(false), Some(true), 0L))
  }

  test("hostile bytes fail LOUD at registration, never corrupt a manifest") {
    val dir = tmp("graft_mf_bad")
    // a parquet file renamed .orc: the ORC tail parse must throw, so
    // add_files never commits an entry whose stats/counts are garbage
    Seq((1L, "x")).toDF("id", "name").coalesce(1).write.parquet(dir)
    val pq = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val asOrc = new java.io.File(dir, "fake.orc")
    java.nio.file.Files.copy(pq.toPath, asOrc.toPath)
    intercept[Exception] {
      ExternalFooters.orcStats(spark.sparkContext.hadoopConfiguration,
        asOrc.getAbsolutePath,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
    }
    // a truncated avro container: the block walk must throw, not
    // under-count
    val avroDir = tmp("graft_mf_bad_avro")
    graft.sources.GraftAvro.write(
      Seq((1L, 2.0), (3L, 4.0)).toDF("a", "b").coalesce(1), avroDir)
    val av = new java.io.File(avroDir).listFiles()
      .find(_.getName.endsWith(".avro")).get
    val bytes = java.nio.file.Files.readAllBytes(av.toPath)
    val cut = new java.io.File(avroDir, "cut.avro")
    java.nio.file.Files.write(cut.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length / 2))
    intercept[Exception] {
      ExternalFooters.avroRowCount(
        spark.sparkContext.hadoopConfiguration, cut.getAbsolutePath)
    }
  }

  test("per-file format survives the Iceberg v2 binary round trip") {
    val t = base()
    val orcDir = tmp("graft_mf_orc4")
    Seq((10L, "x", 1.5), (11L, "y", 2.5)).toDF("id", "name", "price")
      .coalesce(1).write.orc(orcDir)
    t.addFiles(orcDir, "orc")
    val exportDir = java.nio.file.Files
      .createTempDirectory("graft_mf_ice").toString
    IcebergExport.exportBinary(GraftTable.load(spark, t.location),
      exportDir, formatVersion = 2)
    val imp = IcebergImport.importMetadata(spark,
      s"$exportDir/metadata.json", tmp("graft_mf_imp"))
    // the manifest's file_format field round-trips; the imported table
    // reads each file with its own format
    assert(imp.currentFiles().map(_.fileFormat).sorted ==
      t.currentFiles().map(_.fileFormat).sorted)
    assert(imp.currentFiles().count(_.fileFormat == "orc") == 1)
    assert(imp.toDF().count() == 4)
    assert(imp.toDF().filter(col("id") >= 10L)
      .select(sum(col("price"))).head().getDouble(0) == 4.0)
  }

  test("copy-on-write delete/update work on a mixed-format table") {
    val t = base()
    val orcDir = tmp("graft_mf_orc5")
    Seq((10L, "x", 1.5), (11L, "y", 2.5)).toDF("id", "name", "price")
      .coalesce(1).write.orc(orcDir)
    val avroDir = tmp("graft_mf_avro5")
    graft.sources.GraftAvro.write(
      Seq((20L, "p", 7.0), (21L, "q", 8.0)).toDF("id", "name", "price")
        .coalesce(1), avroDir)
    t.addFiles(orcDir, "orc")
    t.addFiles(avroDir, "avro")
    // CoW delete hits one row in EACH format's files; untouched-format
    // rows and the untouched file's rows survive with values intact
    t.delete("id IN (11, 20)")
    val re = GraftTable.load(spark, t.location)
    assert(re.toDF().select(col("id")).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 10L, 21L))
    // the rewrite materialized the touched foreign files as parquet
    assert(re.currentFiles().count(_.fileFormat != "parquet") == 0 ||
      re.toDF().filter(col("id") === 10L).count() == 1)
    t.update("id = 21", Map("price" -> "99.0"))
    assert(GraftTable.load(spark, t.location).toDF()
      .filter(col("id") === 21L).select(col("price"))
      .as[Double].head() == 99.0)
  }

  test("position-anchored features refuse loudly on foreign-format files") {
    val t = base()
    val orcDir = tmp("graft_mf_orc6")
    Seq((10L, "x", 1.5)).toDF("id", "name", "price")
      .coalesce(1).write.orc(orcDir)
    t.addFiles(orcDir, "orc")
    Seq(
      () => t.deleteMergeOnReadPositions("id = 10"),
      () => t.deleteMergeOnReadDV("id = 10"),
      () => t.lineageDF()).foreach { op =>
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("parquet"), e.getMessage)
    }
    // compaction migrates to parquet and lifts the restriction
    t.compact()
    t.deleteMergeOnReadPositions("id = 10")
    assert(GraftTable.load(spark, t.location).toDF().count() == 2)
  }

  test("add_files refuses a format the engine doesn't read") {
    val t = base()
    val e = intercept[IllegalArgumentException] {
      t.addFiles("/nonexistent", "csv")
    }
    assert(e.getMessage.contains("csv") || e.getMessage.contains("format"))
  }
}
