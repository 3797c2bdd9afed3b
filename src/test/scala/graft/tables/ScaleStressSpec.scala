package graft.tables

import graft.SparkSpec
import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.Tag
import java.nio.file.Files

/** The closest local[32] gets to the 100×-scale question: a ~10× corpus
  * (union + id-shift of sf0.1) and metadata fabricated to 10⁴ files pin
  * the SCALE properties the architecture claims — linear-envelope LSH
  * dedup, O(diameter) connected components that refuse rather than
  * return partial labels, MOR reads whose plan stays O(delete structure)
  * under 100+ delete files, and manifest-list pruning that reads one
  * child of a hundred. Runtime envelopes are generous (machine noise);
  * the PLAN-SHAPE assertions are the real pins.
  */
object SlowSuite extends Tag("graft.SlowSuite")

class ScaleStressSpec extends SparkSpec {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.1"
  private def tmp(): String = Files.createTempDirectory("graft_scale").toString + "/t"

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  test("d03 LSH dedup stays in a linear envelope at 10x the corpus", SlowSuite) {
    // 10 id-shifted copies: a duplicate-heavy corpus (every doc has 9
    // exact twins) — the worst realistic shape for LSH banding, held
    // bounded by the per-bucket candidate caps
    val dir = Files.createTempDirectory("graft_scale10x").toString
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val n1 = docs.count()
    // shifts stay inside the planted-fixture id envelope [0, 2e6) that
    // d03's corpus generator now enforces in-plan (the guard refuses
    // loudly instead of risking silent planted-id collisions); id VALUES
    // don't affect LSH cost, only the 10x row count and twin structure do
    (0 until 10).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 100000L)))
      .reduce(_ unionAll _)
      .repartition(16).write.parquet(s"$dir/documents.parquet")

    val (r1, t1) = timed(Dedup.d03MinhashLsh(spark, sf01).count())
    val (r10, t10) = timed(Dedup.d03MinhashLsh(spark, dir).count())
    assert(r10 >= 10 * r1, s"10x corpus must cluster 10x the docs ($r1 -> $r10)")
    // generous linear envelope: 10x rows with 45x the duplicate pairs may
    // cost more than 10x, but an accidental all-pairs would be ~100x
    val envelope = 25.0 * math.max(t1, 0.5)
    assert(t10 <= envelope,
      f"10x corpus took $t10%.1fs vs $t1%.1fs at 1x (envelope $envelope%.1fs)")
  }

  test("d11 decontamination scales linearly at 10x; flags scale exactly", SlowSuite) {
    // 10 id-shifted copies: every copy shares its original's TEXT, so a
    // contaminated original's copies are contaminated too — the flagged
    // count must scale EXACTLY 10x (identical text → identical
    // signatures → identical band keys → deterministic candidacy), and
    // the cost stays linear because the benchmark side is a broadcast
    // and the corpus side is two scan passes with no corpus exchange
    val dir = Files.createTempDirectory("graft_scale10x_d11").toString
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    (0 until 10).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 100000L)))
      .reduce(_ unionAll _)
      .repartition(16).write.parquet(s"$dir/documents.parquet")
    val (r1, t1) = timed(
      Dedup.d11DecontaminateFuzzy(spark, sf01).filter($"contaminated").count())
    val (r10, t10) = timed(
      Dedup.d11DecontaminateFuzzy(spark, dir).filter($"contaminated").count())
    assert(r1 > 0, "fixture must plant contamination")
    assert(r10 == 10 * r1, s"flags must scale exactly ($r1 -> $r10)")
    val envelope = 20.0 * math.max(t1, 0.5)
    assert(t10 <= envelope,
      f"10x corpus took $t10%.1fs vs $t1%.1fs at 1x (envelope $envelope%.1fs)")
  }

  test("connected components: O(log n) rounds on a chain; refuses partial labels", SlowSuite) {
    // a 4096-chain is label propagation's adversarial shape (4095 rounds);
    // alternating large-star/small-star must converge inside the DEFAULT
    // 20-round budget — the pin that the round count is O(log n), not
    // O(diameter)
    val n = 4096
    val vertices = spark.range(n).select($"id")
    val edges = spark.range(n - 1).select($"id".as("src"), ($"id" + 1L).as("dst"))
    // localEdgeCap = 0 forces the distributed rounds — the pin is about
    // THEIR round budget, not the small-graph driver fast path
    val cc = Graph.connectedComponents(vertices, edges, localEdgeCap = 0)
    assert(cc.count() == n)
    assert(cc.select("cluster_id").distinct().count() == 1)
    assert(cc.agg(max($"cluster_id")).as[Long].head() == 0L)
    // partial convergence REFUSES (silent wrong labels are the scale
    // hazard: a capped iteration count on a deep graph)
    val e = intercept[IllegalStateException] {
      Graph.connectedComponents(
        spark.range(64).select($"id"),
        spark.range(63).select($"id".as("src"), ($"id" + 1L).as("dst")),
        maxIter = 1, localEdgeCap = 0)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("MOR read plan stays O(delete structure) under 100+ delete files", SlowSuite) {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val orders = spark.read.parquet(s"$sf01/orders.parquet")
    val nRows = orders.count()
    val t = GraftTable.createAs(spark, tmp(), orders)
    t.cluster(Seq("o_orderkey"), nFiles = 8)
    val dataFiles = t.currentFiles().size
    // 100 single-key eq-delete commits — the CDC micro-batch shape, one
    // delete file each; keys stride-sampled so they scatter across ALL
    // data files (each file accumulates many applicable deletes)
    val keys = orders.select($"o_orderkey").filter($"o_orderkey" % 1471 === 0)
      .orderBy($"o_orderkey").limit(100).as[Long].collect()
    assert(keys.length == 100)
    val (_, tCommit) = timed {
      keys.foreach(k =>
        t.deleteMergeOnReadEquality(Seq(k).toDF("o_orderkey"), Seq("o_orderkey")))
    }
    val delFiles = t.currentEqualityDeletes().map(_.files.size).sum
    assert(t.currentEqualityDeletes().size == 100 && delFiles >= 100,
      s"expected 100+ delete files, got $delFiles in ${t.currentEqualityDeletes().size} commits")

    val df = GraftTable.load(spark, t.location).toDF()
    // plan shape: data-file scan branches bounded by the FILE count (the
    // delete-combination grouping), never files x deletes
    val dataScans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec
        if f.relation.location.inputFiles.exists(!_.contains("/deletes/")) => f
    }
    assert(dataScans.length <= 2 * dataFiles,
      s"MOR fan-out: ${dataScans.length} data scans for $dataFiles files")
    // the r9 collapse: same-keyed deletes anti-join ONCE per read group —
    // O(groups), never O(commits)
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val antiJoins = df.queryExecution.sparkPlan.collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftAnti => j
      case j: ShuffledHashJoinExec if j.joinType == LeftAnti => j
      case j: SortMergeJoinExec if j.joinType == LeftAnti => j
    }
    assert(antiJoins.length <= dataFiles,
      s"eq-delete anti-joins must collapse per group: ${antiJoins.length}")
    // correctness + a generous runtime envelope for the whole read
    val (cnt, tRead) = timed(df.count())
    assert(cnt == nRows - keys.length)
    assert(tRead <= 60.0, f"MOR read with $delFiles delete files took $tRead%.1fs")
    assert(tCommit / 100.0 <= 5.0, f"eq-delete commit latency ${tCommit / 100.0}%.1fs")
  }

  test("default-fill plan grows by EPOCHS, not files or columns", SlowSuite) {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.types.{LongType, StringType}
    // 6 defaulted columns added at 3 distinct moments over a multi-file
    // table: epoch boundaries sort, so a file's applicable-default vector
    // is determined by where its seq falls among the SORTED boundaries —
    // at most (boundaries + 1) distinct scan branches, never 2^columns
    // and never per-file
    val orders = spark.read.parquet(s"$sf01/orders.parquet").limit(20000)
    val t = GraftTable.createAs(spark, tmp(), orders.repartition(6))
    def appendSome(shift: Long): Unit = {
      t.append(t.toDF().limit(500)
        .withColumn("o_orderkey", $"o_orderkey" + shift)); ()
    }
    t.addColumnWithDefault("d1", StringType, "a")
    t.addColumnWithDefault("d2", LongType, 1L)
    appendSome(10000000L)
    t.addColumnWithDefault("d3", StringType, "b")
    t.addColumnWithDefault("d4", LongType, 2L)
    appendSome(20000000L)
    t.addColumnWithDefault("d5", StringType, "c")
    t.addColumnWithDefault("d6", LongType, 3L)
    appendSome(30000000L)
    val df = GraftTable.load(spark, t.location).toDF()
    val files = t.currentFiles().size
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    // 3 epoch boundaries + 1 = at most 4 branches (6 defaulted columns,
    // 9+ files)
    assert(scans.length <= 4,
      s"default-fill branches must be epoch-bounded: ${scans.length} scans " +
        s"for $files files / 6 defaulted columns")
    // every epoch reads its correct fill (appended copies carry the
    // values materialized at their write time; pre-add rows fill at read)
    assert(df.count() == 21500)
    assert(df.filter($"d1" === "a" && $"d6" === 3L).count() == 21500)
    assert(df.filter($"d1".isNull || $"d3".isNull || $"d6".isNull).count() == 0)
    // pushdown survives on the unfilled side: a predicate on a REAL
    // column still reaches the parquet scans
    val plan = df.filter($"o_orderkey" === 42L).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]")
      || plan.contains("EqualTo(o_orderkey,42)"), s"pushdown lost:\n${plan.take(2000)}")
  }

  test("30 stacked DV commits: plan stays O(files), compaction folds to one", SlowSuite) {
    // continuous-ingestion steady state: many small DV commits accumulate;
    // the read plan must stay one broadcast of O(files-with-deletes) bitmap
    // rows (never O(commits) joins, never a corpus shuffle), and the
    // encoded OR-fold must consolidate the stack without exploding
    // positions through a shuffle
    val orders = spark.read.parquet(s"$sf01/orders.parquet")
    val nRows = orders.count()
    val t = GraftTable.createAs(spark, tmp(), orders)
    t.cluster(Seq("o_orderkey"), nFiles = 8)
    val (_, tCommit) = timed {
      (0 until 30).foreach(i => t.deleteMergeOnReadDV(s"o_orderkey % 97 = $i"))
    }
    assert(t.currentPositionDeletes().size == 30)
    val df = GraftTable.load(spark, t.location).toDF()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bitmap_contains") && plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), "corpus must not shuffle for DVs")
    // exactly one membership filter: stacked bitmaps OR-merge per file at
    // plan build, the scan is never re-joined per commit
    assert("graft_bitmap_contains".r.findAllIn(plan).size <= 2,
      s"stacked DVs must merge, not chain joins")
    val (cnt, tRead) = timed(df.count())
    val expect = nRows - orders.filter($"o_orderkey" % 97 < 30).count()
    assert(cnt == expect)
    assert(tRead <= 30.0, f"stacked-DV read took $tRead%.1fs")
    assert(tCommit / 30.0 <= 5.0, f"DV commit latency ${tCommit / 30.0}%.1fs")
    // consolidation: one DV file, one bitmap row per touched data file,
    // artifact bounded by the bitmap encoding (not 8 bytes/position)
    t.compactDeleteFiles()
    val after = t.currentPositionDeletes()
    assert(after.size == 1 && after.forall(GraftTable.isDvFile))
    assert(GraftTable.load(spark, t.location).toDF().count() == expect)
    val bms = spark.read.parquet(after.head)
      .select(col("file_path"), length(col("dv")).as("len")).collect()
    assert(bms.length <= 8, "one bitmap row per data file")
    val deleted = nRows - expect
    assert(bms.map(_.getInt(1).toLong).sum <= deleted * 8 + bms.length * 2,
      "encoded DVs must never exceed the raw-positions footprint")
  }

  test("manifest-list pruning reads one child of 100 at 10^4 files", SlowSuite) {
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(100))
    val m = t.meta
    val snap = m.currentSnapshot.get
    val conf = spark.sparkContext.hadoopConfiguration
    // fabricate 100 child manifests x 100 entries with disjoint key
    // ranges — metadata only, through the table's own serializers
    val phys = ColumnMapping.physicalOf(m.schema, "o_orderkey")
    val entries = (0 until 100).map { c =>
      val files = (0 until 100).map { i =>
        val lo = (c * 100 + i) * 10L
        DataFile(s"${t.location}/data/synthetic/f${c}_$i.parquet", m.currentSpecId,
          Map.empty, 10L, 1000L,
          Map(phys -> ColStats(Some(lo), Some(lo + 9L), 0L)))
      }
      val name = MetaIO.newManifestName(snap.id)
      MetaIO.writeString(conf, s"${MetaIO.metadataDir(t.location)}/$name",
        MetaIO.manifestToJson(files))
      ManifestStats.entryFor(name, files)
    }
    val listName = s"manifest-list-${snap.id}-synthetic.json"
    MetaIO.writeString(conf, s"${MetaIO.metadataDir(t.location)}/$listName",
      MetaIO.manifestListToJson(entries))
    MetaIO.commitMeta(conf, m.copy(version = m.version + 1,
      snapshots = m.snapshots.map(s =>
        if (s.id == snap.id) s.copy(manifest = listName) else s)))

    val t2 = GraftTable.load(spark, t.location)
    // one point predicate: ONE child survives the summary prune, and only
    // that child's 100 entries are even loaded before file-level pruning
    val ((surv, total), tPlan) = timed(t2.plannedManifests("o_orderkey = 55555"))
    assert(total == 100 && surv == 1, s"manifest pruning: $surv of $total")
    val (planned, tFiles) = timed(t2.plannedFiles("o_orderkey = 55555"))
    assert(planned.size == 1 && planned.head.path.contains("f55_5"),
      s"expected exactly the covering file, got ${planned.map(_.path)}")
    assert(tPlan + tFiles <= 10.0,
      f"driver planning over 10^4 files took ${tPlan + tFiles}%.1fs")
  }

  test("partition stats serve 10^4 partitions from one payload read", SlowSuite) {
    // 10^4 fabricated single-file partitions (the synthetic-manifest trick
    // above): computePartitionStats persists 10^4 entries; .partitions
    // must then answer from the payload — one metadata file read, zero
    // manifest loads — and an append folds in O(batch) while the payload
    // stays manifest-exact.
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(100),
      Seq(PartitionField("o_orderkey", "identity", "k")))
    val m = t.meta
    val snap = m.currentSnapshot.get
    val conf = spark.sparkContext.hadoopConfiguration
    val nParts = 10000
    val files = (0 until nParts).map { i =>
      DataFile(s"${t.location}/data/synthetic/p$i.parquet", m.currentSpecId,
        Map("k" -> i.toString), 10L, 1000L, Map.empty)
    }
    val name = MetaIO.newManifestName(snap.id)
    MetaIO.writeString(conf, s"${MetaIO.metadataDir(t.location)}/$name",
      MetaIO.manifestToJson(files))
    val listName = s"manifest-list-${snap.id}-synthetic.json"
    MetaIO.writeString(conf, s"${MetaIO.metadataDir(t.location)}/$listName",
      MetaIO.manifestListToJson(Seq(ManifestStats.entryFor(name, files))))
    MetaIO.commitMeta(conf, m.copy(version = m.version + 1,
      snapshots = m.snapshots.map(s =>
        if (s.id == snap.id) s.copy(manifest = listName) else s)))

    val t2 = GraftTable.load(spark, t.location)
    val (_, tCompute) = timed(t2.computePartitionStats())
    assert(t2.partitionStats.get.entries.size == nParts)
    val (served, tServe) = timed(t2.partitionsDf.count())
    assert(served == nParts)
    assert(tCompute <= 30.0 && tServe <= 15.0,
      f"10^4-partition stats: compute ${tCompute}%.1fs serve ${tServe}%.1fs")
    // fold across an append lands new partitions without a manifest rescan
    // and the result still mirrors the (now 10^4 + 1-partition) manifests
    t2.append(spark.read.parquet(s"$sf/orders.parquet").limit(1)
      .withColumn("o_orderkey", org.apache.spark.sql.functions.lit(10000000L)))
    val pp = t2.partitionStats
    assert(pp.nonEmpty, "append must fold + re-stamp at 10^4 partitions")
    assert(pp.get.entries.size.toLong == nParts + 1)
    assert(pp.get.entries.map(_.dataRecordCount).sum ==
      t2.currentFiles().map(_.recordCount).sum)
  }

  test("lineage read plan: one broadcast O(files) join, the corpus never shuffles", SlowSuite) {
    val orders = spark.read.parquet(s"$sf01/orders.parquet")
    val t = GraftTable.createAs(spark, tmp(), orders.repartition(8))
    t.deleteMergeOnReadDV("o_orderkey % 101 = 0")
    val df = t.lineageDF()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "file-info join must broadcast")
    assert(!plan.contains("SortMergeJoin"), "lineage must never shuffle the corpus")
    val n = orders.count() - orders.filter(col("o_orderkey") % 101 === 0).count()
    assert(df.count() == n)
    assert(df.select("_row_id").distinct().count() == n, "ids stay unique under MOR deletes")
  }

  test("range changelog over a 60-commit chain: per-commit frames stay O(changed files)", SlowSuite) {
    val t = GraftTable.createAs(spark, tmp(), Seq((0L, 0.0)).toDF("id", "v"))
    val s0 = t.meta.currentSnapshotId.get
    // a rename mid-chain + 60 single-file appends
    (1 to 30).foreach(i => t.append(Seq((i.toLong, i.toDouble)).toDF("id", "v")))
    t.renameColumn("v", "val")
    (31 to 60).foreach(i => t.append(Seq((i.toLong, i.toDouble)).toDF("id", "val")))
    val (frames, planSecs) = timed {
      t.changesBetweenBySnapshot(s0, t.meta.currentSnapshotId.get,
        underSnapshotSchema = true)
    }
    // planning the WHOLE range is metadata-only: frames build lazily,
    // nothing is scanned until a consumer acts
    assert(frames.size == 60)
    assert(planSecs < 30.0, f"range planning took $planSecs%.1fs")
    // period-correct names flip exactly at the rename
    assert(frames.take(30).forall(_._2.columns.contains("v")))
    assert(frames.drop(30).forall(_._2.columns.contains("val")))
    // each commit's frame reads ONE added file's rows, not the table
    assert(frames.last._2.collect().map(_.getLong(0)).toSeq == Seq(60L))
  }

  test("mixed-format registration: 60 ORC files register in one footer pass, prune to one", SlowSuite) {
    val t = GraftTable.createAs(spark, tmp(), Seq((-1L, "seed")).toDF("id", "name"))
    val orcDir = Files.createTempDirectory("graft_scale_orc").toString + "/o"
    // 60 single-file, disjoint-key-range ORC files
    (0 until 60).foreach { i =>
      Seq((i * 100L, s"r$i"), (i * 100L + 50L, s"s$i")).toDF("id", "name")
        .coalesce(1).write.mode("append").orc(orcDir)
    }
    val (_, regSecs) = timed(t.addFiles(orcDir, "orc"))
    assert(regSecs < 30.0, f"registration took $regSecs%.1fs")
    val re = GraftTable.load(spark, t.location)
    assert(re.currentFiles().count(_.fileFormat == "orc") == 60)
    // ORC footer stats prune: a point-range predicate plans ONE orc file
    assert(re.plannedFiles("id >= 5900 AND id < 6000")
      .count(_.fileFormat == "orc") == 1)
    assert(re.toDF().count() == 121)
  }

  test("v3 DV export spills into multiple Puffin containers past the byte budget") {
    // driver-buffer guard (r11 verdict): past-threshold bitmap volume
    // must chunk into N containers — identical read-back semantics, no
    // single driver-resident buffer of the whole payload set. A tiny
    // budget (64 B — real run-length bitmaps are ~33 B each) forces the
    // spill on a small table.
    val orders = spark.read.parquet(s"$sf/orders.parquet").limit(2000)
    val t = GraftTable.createAs(spark, tmp(),
      orders.repartition(6),
      properties = Map(TableFormat.DvPuffinMaxBytes -> "64"))
    t.deleteMergeOnReadDV("o_orderkey % 3 = 0")
    val expected = t.toDF().orderBy("o_orderkey").collect()
    val dir = Files.createTempDirectory("graft_dvspill").toString
    IcebergExport.exportBinary(t, dir, formatVersion = 3)
    val puffins = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".puffin"))
      .filter(_.getName.contains("-deletes"))
    assert(puffins.length > 1,
      s"64 B budget over 6 files' bitmaps must spill, got ${puffins.length} container(s)")
    // every container is a well-formed Puffin with DV blobs
    puffins.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      assert(graft.formats.Puffin.isPuffin(bytes), f.getName)
    }
    // read-back equivalence through the real import path
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json",
      tmp())
    assert(imp.toDF().orderBy("o_orderkey").collect().toSeq == expected.toSeq)
  }

  test("LSH blocking: a 10^6-member mega-bucket costs O(maxBucket) buffer, not O(bucket)") {
    // The shared blocking helper (d03/d04/d05/d08/d10/st11) must never
    // materialize a boilerplate bucket's full id list in one aggregation
    // buffer: a 10^6-id (band, key) bucket with maxBucket=100 has to be
    // dropped whole WITHOUT any buffer ever growing past the cap. The
    // probe records the peak id-array length across every update/merge.
    val probe = new java.util.concurrent.atomic.AtomicLong(0L)
    graft.functions.CappedCollectLongs.bufferProbe = probe
    try {
      val mega = spark.range(1000000L).select(
        col("id").as("doc_id"), lit(0).as("band"), lit(42).as("key"))
      val normal = spark.range(1000000L, 1000006L).select(
        col("id").as("doc_id"), lit(1).as("band"), (col("id") % 2).cast("int").as("key"))
      val pairs = Dedup.cappedBucketPairs(mega.unionAll(normal).repartition(16), 100)
        .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
      // mega-bucket dropped whole; the two 3-member normal buckets keep
      // their 3 pairs each
      assert(pairs.length == 6, s"expected 6 pairs from normal buckets, got ${pairs.length}")
      assert(pairs.forall { case (a, b) => a >= 1000000L && b >= 1000000L },
        "no pair may come from the mega-bucket")
      val peak = probe.get()
      assert(peak <= 100L,
        s"aggregation buffer grew to $peak ids — the cap must bound buffer memory")
      assert(peak > 0L, "probe must have observed the aggregation")
    } finally graft.functions.CappedCollectLongs.bufferProbe = null
  }
}
