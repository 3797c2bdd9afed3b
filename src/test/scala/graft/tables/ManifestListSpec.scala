package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The r6 manifest-list layer: commits write O(changed-files) metadata
  * (parent child manifests are reused by name), the planner skips whole
  * manifests from aggregated summaries before reading them, and
  * manifest lifecycle (expire, rewrite_manifests) is reference-counted
  * over the shared children.
  */
class ManifestListSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_ml").toString + "/t"
  private def conf = spark.sparkContext.hadoopConfiguration
  private def ordersDf = spark.read.parquet(s"$sf/orders.parquet")

  private def entriesOf(t: GraftTable): Seq[ManifestEntry] =
    MetaIO.loadManifestEntries(conf, t.location, t.meta.currentSnapshot.get)

  test("append commits reuse the parent's child manifests and add O(new) metadata") {
    val t = GraftTable.createAs(spark, tmp(), ordersDf.limit(500))
    val e1 = entriesOf(t)
    assert(e1.size == 1)
    t.append(ordersDf.limit(100).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    val e2 = entriesOf(t)
    // the base child manifest is reused BY NAME; exactly one new child
    assert(e2.size == 2 && e2.map(_.name).contains(e1.head.name))
    val newChild = e2.filterNot(e => e1.map(_.name).contains(e.name)).head
    // the new child holds ONLY the appended files (O(new), not O(table))
    assert(newChild.recordCount == 100)
    val childFiles = MetaIO.loadChildFiles(conf, t.location, newChild.name)
    assert(childFiles.forall(f => f.stats("o_orderkey").min.exists {
      case l: Long => l >= 1000000L
      case _ => false
    }))
    t.append(ordersDf.limit(50).withColumn("o_orderkey", col("o_orderkey") + 2000000L))
    val e3 = entriesOf(t)
    assert(e3.size == 3 && e2.map(_.name).forall(n => e3.map(_.name).contains(n)))
    assert(t.toDF().count() == 650)
  }

  test("manifest summaries prune whole manifests before any child is read") {
    val t = GraftTable.createAs(spark, tmp(), ordersDf.limit(400))
    // three more appends with DISJOINT key ranges -> four children with
    // disjoint o_orderkey summaries
    for (i <- 1 to 3)
      t.append(ordersDf.limit(400)
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * 10000000L)))
    val (surviving, total) = t.plannedManifests("o_orderkey >= 30000000")
    assert(total == 4, s"expected 4 child manifests, got $total")
    assert(surviving == 1, s"expected 1 surviving manifest, got $surviving")
    // and the filtered read is still exact
    assert(t.toDF(Some("o_orderkey >= 30000000")).count() == 400)
    assert(t.toDF().count() == 1600)
  }

  test("rewrite_manifests re-clusters children; pruning tightens, nothing else changes") {
    val t = GraftTable.createAs(spark, tmp(),
      ordersDf.limit(2000).repartition(8)) // 8 files, one child, interleaved keys
    val filesBefore = t.currentFiles().map(_.path).toSet
    val snapsBefore = t.meta.snapshots.size
    // range-cluster the data so per-file stats are disjoint, then regroup
    // into 4 children so MANIFEST summaries are disjoint too
    val n = t.toDF().count()
    t.cluster(Seq("o_orderkey"), nFiles = 8)
    t.rewriteManifests(target = 4)
    assert(entriesOf(t).size == 4)
    assert(t.meta.snapshots.size == snapsBefore + 1) // cluster's replace commit only
    val (surviving, total) = t.plannedManifests("o_orderkey < 100")
    assert(total == 4 && surviving == 1, s"got $surviving of $total")
    assert(t.toDF().count() == n)
    // consolidation direction too: many -> one
    t.rewriteManifests(target = 1)
    assert(entriesOf(t).size == 1)
    assert(t.toDF().count() == n)
    assert(t.currentFiles().map(_.path).toSet != filesBefore) // cluster rewrote data
  }

  test("expire reference-counts shared child manifests") {
    val t = GraftTable.createAs(spark, tmp(), ordersDf.limit(300))
    t.append(ordersDf.limit(100).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    t.append(ordersDf.limit(100).withColumn("o_orderkey", col("o_orderkey") + 2000000L))
    val sharedChild = entriesOf(t).map(_.name).head
    Thread.sleep(5)
    t.expireSnapshots(System.currentTimeMillis())
    assert(t.meta.snapshots.size == 1)
    // the child written by snapshot 1 is still referenced by the head's
    // list — expire must NOT have deleted it
    assert(MetaIO.exists(conf, s"${MetaIO.metadataDir(t.location)}/$sharedChild"))
    assert(t.toDF().count() == 500)
  }

  test("remove_orphan_files sweeps manifests no snapshot references") {
    val t = GraftTable.createAs(spark, tmp(), ordersDf.limit(200))
    val oldList = t.meta.currentSnapshot.get.manifest
    val oldChild = entriesOf(t).map(_.name).head
    t.rewriteManifests() // repoints the snapshot; old list+child now orphaned
    val removed = t.removeOrphanFiles(System.currentTimeMillis() + 60000L)
    val names = removed.map(_.split('/').last).toSet
    assert(names.contains(oldList) && names.contains(oldChild), s"swept: $names")
    assert(t.toDF().count() == 200)
    // referenced manifests survived
    val s = t.meta.currentSnapshot.get
    assert(MetaIO.exists(conf, s"${MetaIO.metadataDir(t.location)}/${s.manifest}"))
  }

  test("partition summaries skip child manifests where column stats can't") {
    // non-ASCII column values: parquet binary bounds don't mirror engine
    // string order, so footer stats are dropped and min/max pruning is
    // blind at BOTH metadata levels — but the truncate[1] partition
    // values stay ASCII (first letter), so the r8 partition-tuple
    // summary is the only thing that can skip whole child manifests
    val cities = Seq("zürich", "münchen", "tōkyō", "são paulo")
    val df = (1 to 400).map(i => (i.toLong, cities(i % 4), i * 1.5))
      .toDF("k", "city", "v")
    val t = GraftTable.createAs(spark, tmp(), df,
      partitionFields = Seq(PartitionField("city", "truncate[1]", "ct")))
    // rewrite_manifests clusters children by partition value
    t.rewriteManifests(target = 4)
    val entries = entriesOf(t)
    assert(entries.size == 4)
    assert(entries.forall(e => e.specId >= 0 && e.partitionTuples.nonEmpty),
      "children of a partition-clustered rewrite must carry summaries")
    // column stats genuinely absent for the non-ASCII column -> the skip
    // below can only come from the partition summary
    assert(entries.forall(!_.stats.contains("city")))
    val (surviving, total) = t.plannedManifests("city = 'tōkyō'")
    assert(total == 4 && surviving == 1,
      s"partition predicate should read 1 of $total children, read $surviving")
    // correctness: the pruned read returns exactly the partition
    assert(t.toDF(Some("city = 'tōkyō'")).count() == 100)
    // a value in no partition reads zero children
    assert(t.plannedManifests("city = 'gotham'")._1 == 0)
    // IN-lists prune to the union of matching partitions
    assert(t.plannedManifests("city IN ('zürich', 'münchen')")._1 == 2)
  }

  test("partition summaries stay sound across partition-spec evolution") {
    val df1 = (1 to 100).map(i => (i.toLong, s"p${i % 2}", i * 1.0)).toDF("k", "p", "v")
    val t = GraftTable.createAs(spark, tmp(), df1,
      partitionFields = Seq(PartitionField("p", "identity", "p")))
    t.setPartitionSpec(Seq(PartitionField("k", "bucket[4]", "kb")))
    t.append((101 to 200).map(i => (i.toLong, s"p${i % 2}", i * 1.0)).toDF("k", "p", "v"))
    // children mixing specs (or per-spec children) must never wrongly
    // prune: every 'p' row is still found
    assert(t.toDF(Some("p = 'p1'")).count() == 100)
    val (surv, total) = t.plannedManifests("p = 'p1'")
    assert(surv >= 1 && surv <= total)
  }

  test("aggregate summaries are sound: min-of-mins/max-of-maxes, exact null sums") {
    val fs = Seq(
      DataFile("a", 0, Map.empty, 10, 1, Map(
        "x" -> ColStats(Some(3L), Some(9L), 1),
        "y" -> ColStats(Some("b"), Some("d"), 0))),
      DataFile("b", 0, Map.empty, 10, 1, Map(
        "x" -> ColStats(Some(1L), Some(5L), 2))))
    val agg = ManifestStats.aggregate(fs)
    assert(agg("x") == ColStats(Some(1L), Some(9L), 3))
    assert(!agg.contains("y")) // missing from one file -> dropped (never prunes)
    val aggEmptyMin = ManifestStats.aggregate(Seq(
      fs.head.copy(stats = Map("x" -> ColStats(None, Some(9L), 10))), fs(1)))
    assert(aggEmptyMin("x") == ColStats(None, Some(9L), 12))
  }
}
