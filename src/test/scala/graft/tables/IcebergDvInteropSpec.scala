package graft.tables

import graft.SparkSpec
import graft.formats.{Avro, Puffin}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Iceberg v3 deletion-vector interop (t49): exportBinary(formatVersion=3)
  * ships ALL position-delete state as genuine `deletion-vector-v1` Puffin
  * blobs (portable Roaring, framed with magic + CRC), manifest entries
  * point into them via referenced_data_file/content_offset/
  * content_size_in_bytes, and importMetadata registers them back as graft
  * DV bitmaps — the O(files-with-deletes) read shape survives a foreign
  * round trip in BOTH directions, where the v2 path must explode to
  * row-per-position files.
  */
class IcebergDvInteropSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_dv3").toString + "/t"
  private def outDir(): String = Files.createTempDirectory("graft_dv3_exp").toString

  test("DV blob framing: BE length + magic + portable vector + CRC") {
    val framed = IcebergDV.frame(Array(1L, 2L, 3L))
    // RoaringSpec pins the 34-byte vector for [1,2,3]; the frame adds
    // 4(len) + 4(magic) up front and 4(crc) behind
    assert(framed.length == 4 + 4 + 34 + 4)
    // length field: big-endian 4 + 34 = 38
    assert(framed.take(4).map(_ & 0xff).toSeq == Seq(0, 0, 0, 38))
    assert(framed.slice(4, 8).map(_ & 0xff).toSeq == Seq(0xD1, 0xD3, 0x39, 0x64))
    assert(IcebergDV.unframe(framed).toSeq == Seq(1L, 2L, 3L))
    // bit-flip anywhere in the vector → CRC refuses
    val corrupt = framed.clone()
    corrupt(10) = (corrupt(10) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](IcebergDV.unframe(corrupt))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("cookie"))
  }

  test("v3 export→import round-trips DV + classic-pos + equality deletes") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(300))
    src.deleteMergeOnReadDV("o_orderkey % 7 = 0")
    src.deleteMergeOnReadPositions("o_orderkey % 11 = 3")
    src.deleteMergeOnReadEquality(
      src.toDF().filter($"o_orderstatus" === "P").select($"o_orderkey").limit(5),
      Seq("o_orderkey"))
    val expected = src.toDF().orderBy("o_orderkey").collect()

    val dir = outDir()
    IcebergExport.exportBinary(src, dir, formatVersion = 3)
    val files = new java.io.File(dir).listFiles()
    // the artifact carries a real DV puffin file...
    val dvPuffins = files.filter(f => f.getName.startsWith("snap-") &&
      f.getName.endsWith("-deletes.puffin"))
    assert(dvPuffins.nonEmpty)
    dvPuffins.foreach { f =>
      val p = Puffin.read(java.nio.file.Files.readAllBytes(f.toPath))
      assert(p.blobs.nonEmpty)
      p.blobs.foreach { b =>
        assert(b.blobType == IcebergDV.BlobType)
        assert(b.properties.contains("referenced-data-file"))
        assert(b.properties("cardinality").toLong ==
          IcebergDV.unframe(b.payload).length.toLong)
      }
    }
    // ...and the delete manifest points into it with the v3 fields
    val deleteManifest = files.find(f => f.getName.contains("-deletes-m0")
      && f.getName.endsWith(".avro")).get
    val entries = Avro.readContainer(
      java.nio.file.Files.readAllBytes(deleteManifest.toPath)).records
    val dvEntries = entries.filter(_.apply("data_file")
      .asInstanceOf[Map[String, Any]]("file_format") == "PUFFIN")
    assert(dvEntries.nonEmpty)
    dvEntries.foreach { e =>
      val df = e("data_file").asInstanceOf[Map[String, Any]]
      assert(df("content") == 1)
      assert(df("referenced_data_file").asInstanceOf[String].endsWith(".parquet"))
      assert(df("content_offset").asInstanceOf[Long] >= 4L)
      assert(df("content_size_in_bytes").asInstanceOf[Long] > 12L)
    }
    // no row-per-position parquet delete files in a v3 artifact
    assert(entries.forall { e =>
      val df = e("data_file").asInstanceOf[Map[String, Any]]
      df("content") != 1 || df("file_format") == "PUFFIN"
    })
    // metadata carries v3's required next-row-id — REAL row lineage
    // since r11 third session: every data row got an id exactly once
    // (deletes consume none), so the counter equals the data row total
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new java.io.File(dir, "metadata.json"))
    assert(root.get("format-version").asInt() == 3)
    assert(root.get("next-row-id").asLong() == 300L)

    // import: rows identical, and the delete state came back as BITMAPS
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(imp.toDF().orderBy("o_orderkey").collect().sameElements(expected))
    val conf = spark.sparkContext.hadoopConfiguration
    val (_, dp, pdf, eq) = MetaIO.loadManifestListData(conf, imp.meta.location,
      imp.meta.currentSnapshot.get)
    assert(dp.isEmpty)
    assert(pdf.nonEmpty && pdf.forall(GraftTable.isDvFile),
      s"expected only DV files, got $pdf")
    assert(eq.nonEmpty)
  }

  test("v2 export of the same DV table still explodes to classic files") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(100))
    src.deleteMergeOnReadDV("o_orderkey % 5 = 0")
    val dir = outDir()
    IcebergExport.exportBinary(src, dir, formatVersion = 2)
    val files = new java.io.File(dir).listFiles()
    assert(!files.exists(_.getName.endsWith(".puffin")))
    assert(files.exists(_.getName.startsWith("deletes-dv-")))
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(imp.toDF().count() == src.toDF().count())
  }

  test("v3 via the facade: CALL export_iceberg(..., 3) → register_iceberg") {
    val g = new graft.sources.GraftSql(spark,
      Files.createTempDirectory("graft_dv3_wh").toString)
    spark.read.parquet(s"$sf/orders.parquet").limit(120)
      .createOrReplaceTempView("dv3_src")
    g.sql("CREATE TABLE dv3t AS SELECT * FROM dv3_src")
    g.table("dv3t").deleteMergeOnReadDV("o_orderkey % 3 = 0")
    val expected = g.table("dv3t").toDF().count()
    val dir = outDir()
    g.sql(s"CALL system.export_iceberg('dv3t', '$dir', 3)")
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".puffin")))
    g.sql(s"CALL system.register_iceberg('dv3t_imp', '$dir/metadata.json')")
    assert(g.sql("SELECT count(*) AS c FROM dv3t_imp").head().getLong(0) == expected)
  }

  test("duplicate DV blobs for one data file OR-merge on import (review r11)") {
    // a spec-invalid foreign manifest may carry two DV entries for the
    // same data file; a duplicate imported row would MULTIPLY that
    // file's rows through the single-DV-file MOR fast path — the import
    // must fold, one row per referenced file
    import graft.functions.Bitmaps
    val (bytes, refs) = IcebergDV.buildPuffin(Seq(
      "/data/f.parquet" -> Bitmaps.encode(Array(1L, 3L)),
      "/data/f.parquet" -> Bitmaps.encode(Array(2L, 3L)),
      "/data/g.parquet" -> Bitmaps.encode(Array(7L))), snapshotId = 1L)
    val work = Files.createTempDirectory("graft_dv_dup").toString
    val pp = s"$work/dup.puffin"
    IcebergManifests.writeBytes(spark.sparkContext.hadoopConfiguration, pp, bytes)
    val written = IcebergManifests.importDeletionVectors(spark, pp,
      refs.map(r => (pp, r.offset, r.size, r.dataFile)), work)
    assert(written.nonEmpty && written.forall(GraftTable.isDvFile))
    val rows = spark.read.parquet(written: _*)
      .collect().map(r => r.getString(0) ->
        Bitmaps.positionsArray(r.getAs[Array[Byte]](1)).toSeq).toMap
    assert(rows.size == 2)
    assert(rows("file:/data/f.parquet") == Seq(1L, 2L, 3L))
    assert(rows("file:/data/g.parquet") == Seq(7L))
  }

  test("malformed foreign DV streams refuse loudly (review r11)") {
    import graft.formats.Roaring
    // overflowing run container: start 65535, length 101
    val run = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 1 + 4 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    run.putLong(1L).putInt(0).putInt(12347).put(0x01.toByte)
    run.putShort(0).putShort(100).putShort(1)
      .putShort(0xffff.toShort).putShort(100)
    assert(intercept[IllegalArgumentException](Roaring.deserialize(run.array()))
      .getMessage.contains("overflows"))
    // bucket key with the sign bit set → positions graft cannot represent
    val hi = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hi.putLong(1L).putInt(0x80000000)
    assert(intercept[IllegalArgumentException](Roaring.deserialize(hi.array()))
      .getMessage.contains("position range"))
    // duplicate/unordered bucket keys → refuse, never silently re-sort
    // per bucket: key(4) + cookie(4) + count(4) + desc(4) + offset(4) + value(2)
    val dup = java.nio.ByteBuffer.allocate(8 + 2 * 22)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    dup.putLong(2L)
    for (_ <- 1 to 2) {
      dup.putInt(5)
      dup.putInt(12346).putInt(1).putShort(0).putShort(0).putInt(16).putShort(9)
    }
    assert(intercept[IllegalArgumentException](Roaring.deserialize(dup.array()))
      .getMessage.contains("ascending"))
  }

  test("v3 export assigns row lineage: stable, disjoint, covering ids") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(200))
    src.append(spark.read.parquet(s"$sf/orders.parquet").limit(100)
      .withColumn("o_orderkey", $"o_orderkey" + 1000000L))
    src.append(spark.read.parquet(s"$sf/orders.parquet").limit(50)
      .withColumn("o_orderkey", $"o_orderkey" + 2000000L))
    src.deleteMergeOnReadDV("o_orderkey % 9 = 0") // deletes consume no ids
    val total = 350L

    val dir = outDir()
    IcebergExport.exportBinary(src, dir, formatVersion = 3)
    val root = mapper.readTree(
      MetaIO.readString(spark.sparkContext.hadoopConfiguration, s"$dir/metadata.json"))
    // next-row-id covers every data row exactly once
    assert(root.get("next-row-id").asLong() == total)
    // snapshot first-row-id: non-decreasing in commit order; the
    // delete-only snapshot assigns nothing (counter unchanged at 350)
    val snaps = {
      val b = Seq.newBuilder[(Long, Long, String)]
      root.get("snapshots").forEach(s => b += ((s.get("snapshot-id").asLong(),
        s.get("first-row-id").asLong(), s.get("manifest-list").asText())))
      b.result().sortBy(_._1)
    }
    assert(snaps.map(_._2) == Seq(0L, 200L, 300L, 350L))

    def dataEntryIds(listPath: String): Map[String, (Long, Long)] = {
      val list = Avro.readContainer(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(listPath))).records
      list.filter(_.apply("content") == 0).flatMap { mrow =>
        val mEntries = Avro.readContainer(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(mrow("manifest_path").asInstanceOf[String]))).records
        // list-level first_row_id = min of its entries' explicit ids
        val dfs = mEntries.map(_.apply("data_file").asInstanceOf[Map[String, Any]])
        assert(mrow("first_row_id") ==
          dfs.map(_.apply("first_row_id").asInstanceOf[Long]).min)
        dfs.map(df => df("file_path").asInstanceOf[String] ->
          (df("first_row_id").asInstanceOf[Long],
            df("record_count").asInstanceOf[Long]))
      }.toMap
    }
    // final snapshot: per-file ranges [id, id+count) partition [0, total)
    val fin = dataEntryIds(snaps.last._3)
    val ranges = fin.values.toSeq.sortBy(_._1)
    assert(ranges.map(_._2).sum == total)
    assert(ranges.head._1 == 0L)
    ranges.sliding(2).foreach {
      case Seq((a, n), (b, _)) => assert(a + n == b, "ranges must tile")
      case _ =>
    }
    // stability: a file carried across snapshots keeps its id
    val first = dataEntryIds(snaps.head._3)
    first.foreach { case (p, (id, _)) => assert(fin(p)._1 == id) }
    // delete entries carry NO row ids
    val delManifest = new java.io.File(dir).listFiles()
      .find(f => f.getName.contains("-deletes-m0") && f.getName.endsWith(".avro")).get
    Avro.readContainer(java.nio.file.Files.readAllBytes(delManifest.toPath))
      .records.foreach { e =>
        assert(e("data_file").asInstanceOf[Map[String, Any]]("first_row_id") == null)
      }
  }

  test("current-snapshot predicate deletes still refuse a v3 export") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(50))
    src.deleteMergeOnRead("o_orderkey % 2 = 0") // predicate form: no file shape
    val e = intercept[IllegalStateException](
      IcebergExport.exportBinary(src, outDir(), formatVersion = 3))
    assert(e.getMessage.contains("materializeDeletes"))
  }
}
