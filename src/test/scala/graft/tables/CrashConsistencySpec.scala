package graft.tables

import graft.SparkSpec
import java.nio.file.Files

/** Commit-path crash-consistency battery (r20 verdict item #3): t33 covers
  * RACING writers; this covers a writer KILLED mid-commit. The
  * [[MetaIO.commitFault]] seam throws at each protocol stage —
  * `data-files-written` (operation's data/delete files durable, nothing
  * references them) and `manifests-written` (manifest + manifest-list
  * durable, version not CAS-published) — for the four commit shapes:
  * append, copy-on-write rewrite (DELETE), merge-on-read positional
  * delete, and compaction. The invariants, per (op × stage):
  *
  *  1. a fresh reader sees the OLD snapshot, version, and exact contents
  *     — partial artifacts are invisible because nothing references them
  *     until the metadata CAS, the commit point;
  *  2. the crash leaves real debris on disk (the battery would be vacuous
  *     otherwise), and `removeOrphanFiles` under its DEFAULT recency
  *     guard spares it — fresh debris is indistinguishable from an
  *     in-flight writer's files, so the guard is load-bearing;
  *  3. with the guard relaxed past the crash time, `removeOrphanFiles`
  *     collects every orphaned parquet and manifest, and the table still
  *     reads the old contents;
  *  4. a clean RETRY of the killed operation then succeeds and produces
  *     the expected post-op contents — debris never poisons a re-run.
  *
  * The third stage, `cas-published` (killed between the version CAS and
  * the advisory hint), is the one where the commit HAPPENED: a fresh
  * reader must see the NEW version by probing past the stale hint
  * (currentVersion's forward scan; the read-side half is also pinned in
  * ConcurrencySpec).
  */
class CrashConsistencySpec extends SparkSpec {
  import spark.implicits._

  private case class CrashInjected(stage: String)
    extends RuntimeException(s"injected crash at $stage")

  private def tmp(): String =
    Files.createTempDirectory("graft_crash").toString + "/t"

  /** Every regular file under `loc`, relative paths. */
  private def census(loc: String): Set[String] = {
    val root = new java.io.File(loc)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(root).map(_.getAbsolutePath.stripPrefix(root.getAbsolutePath)).toSet
  }

  private def rows(loc: String): Seq[(Long, String)] =
    GraftTable.load(spark, loc).toDF()
      .select("k", "v").as[(Long, String)].collect().toSeq.sorted

  /** Base fixture: two appends (so compaction has >1 small file per
    * partition), contents k=0..19.
    */
  private def mkTable(loc: String): GraftTable = {
    val t = GraftTable.createAs(spark, loc,
      (0L until 10L).map(k => (k, s"v$k")).toDF("k", "v"))
    t.append((10L until 20L).map(k => (k, s"v$k")).toDF("k", "v"))
  }

  private val baseRows = (0L until 20L).map(k => (k, s"v$k")).sorted

  private def withFault[A](stage: String)(body: => A): Unit = {
    MetaIO.commitFault = s => if (s == stage) throw CrashInjected(s)
    try {
      intercept[CrashInjected](body); ()
    } finally MetaIO.commitFault = null
  }

  /** The battery core: kill `op` at `stage`, check invariants 1–4. */
  private def crashCase(opName: String, stage: String,
      op: GraftTable => GraftTable,
      expectAfterRetry: Seq[(Long, String)]): Unit = {
    val loc = tmp()
    val t = mkTable(loc)
    val v0 = t.meta.version
    val before = census(loc)

    withFault(stage)(op(GraftTable.load(spark, loc)))

    // 1. fresh reader: old version, old contents, bit-for-bit
    val t2 = GraftTable.load(spark, loc)
    assert(t2.meta.version == v0,
      s"$opName@$stage: version moved ${t2.meta.version} != $v0")
    assert(rows(loc) == baseRows, s"$opName@$stage: contents diverged")

    // 2. real debris exists…
    val debris = census(loc) -- before
    val debrisParquet = debris.filter(_.endsWith(".parquet"))
    val debrisManifests = debris.filter(p =>
      p.contains("/metadata/manifest-") && p.endsWith(".json"))
    if (stage == "data-files-written")
      assert(debrisParquet.nonEmpty,
        s"$opName@$stage: expected orphan parquet debris, census diff $debris")
    if (stage == "manifests-written")
      assert(debrisManifests.nonEmpty,
        s"$opName@$stage: expected orphan manifest debris, census diff $debris")
    // …and the DEFAULT recency guard spares it (a live writer's files
    // look exactly like this)
    val guarded = t2.removeOrphanFiles()
    assert(guarded.isEmpty,
      s"$opName@$stage: default olderThan guard must spare fresh debris, removed $guarded")

    // 3. guard relaxed → all orphaned parquet + manifests collected
    val removed = t2.removeOrphanFiles(System.currentTimeMillis() + 60000L)
    assert(removed.nonEmpty, s"$opName@$stage: sweep collected nothing")
    val left = census(loc) -- before
    assert(!left.exists(p => p.endsWith(".parquet") ||
        (p.contains("/metadata/manifest-") && p.endsWith(".json"))),
      s"$opName@$stage: debris survived the sweep: $left")
    assert(rows(loc) == baseRows, s"$opName@$stage: sweep changed contents")

    // 4. clean retry lands and yields the expected post-op table
    val t3 = op(GraftTable.load(spark, loc))
    assert(t3.meta.version > v0, s"$opName@$stage: retry did not commit")
    assert(rows(loc) == expectAfterRetry,
      s"$opName@$stage: retry produced wrong contents")
  }

  private val appendDf = () =>
    (20L until 25L).map(k => (k, s"v$k")).toDF("k", "v")
  private val afterAppend = (0L until 25L).map(k => (k, s"v$k")).sorted
  private val afterDelete = baseRows.filterNot(_._1 % 2 == 0)

  for (stage <- Seq("data-files-written", "manifests-written")) {
    test(s"append killed at $stage: old snapshot reads, orphans sweep, retry lands") {
      crashCase("append", stage, _.append(appendDf()), afterAppend)
    }
    test(s"CoW delete killed at $stage: old snapshot reads, orphans sweep, retry lands") {
      crashCase("cow-delete", stage, _.delete("k % 2 = 0"), afterDelete)
    }
    test(s"MOR positional delete killed at $stage: old snapshot reads, orphans sweep, retry lands") {
      crashCase("mor-delete", stage,
        _.deleteMergeOnReadPositions("k % 2 = 0"), afterDelete)
    }
    test(s"compaction killed at $stage: old snapshot reads, orphans sweep, retry lands") {
      crashCase("compact", stage, _.compact(), baseRows)
    }
    test(s"DV delete killed at $stage: old snapshot reads, orphans sweep, retry lands") {
      crashCase("dv-delete", stage, _.deleteMergeOnReadDV("k % 2 = 0"), afterDelete)
    }
    test(s"equality delete killed at $stage: old snapshot reads, orphans sweep, retry lands") {
      crashCase("eq-delete", stage,
        t => t.deleteMergeOnReadEquality(
          (0L until 20L by 2).toDF("k"), Seq("k")), afterDelete)
    }
    test(s"cluster rewrite killed at $stage: old snapshot reads, orphans sweep, retry lands") {
      crashCase("cluster", stage, _.cluster(Seq("k")), baseRows)
    }
    test(s"MOR upsert killed at $stage: old snapshot reads, orphans sweep, retry lands") {
      // the CDC shape: ONE commit = equality delete on the source keys +
      // the source rows as new files — both halves must vanish together
      // when the writer dies pre-CAS, and retry must apply exactly once
      val src = (0L until 5L).map(k => (k, s"u$k")) ++
        (20L until 23L).map(k => (k, s"u$k"))
      val afterUpsert = ((0L until 5L).map(k => (k, s"u$k")) ++
        (5L until 20L).map(k => (k, s"v$k")) ++
        (20L until 23L).map(k => (k, s"u$k"))).sorted
      crashCase("mor-upsert", stage,
        _.upsertMergeOnRead(src.toDF("k", "v"), Seq("k")), afterUpsert)
    }
  }

  test("writer killed between version CAS and hint: the commit HAPPENED") {
    val loc = tmp()
    val t = mkTable(loc)
    val v0 = t.meta.version
    withFault("cas-published")(GraftTable.load(spark, loc).append(appendDf()))
    // stale hint on disk, but a fresh reader probes forward to the
    // CAS-published version: the new rows are THERE — the CAS is the
    // commit point, everything after it is advisory
    assert(MetaIO.readString(spark.sparkContext.hadoopConfiguration,
      MetaIO.versionHintPath(loc)).trim.toInt == v0)
    val t2 = GraftTable.load(spark, loc)
    assert(t2.meta.version == v0 + 1)
    assert(rows(loc) == afterAppend)
    // nothing the crashed writer left is orphaned — the sweep finds
    // no debris because every artifact is referenced by the new snapshot
    assert(t2.removeOrphanFiles(System.currentTimeMillis() + 60000L).isEmpty)
    // and the next commit heals the hint
    val t3 = t2.append(Seq((99L, "v99")).toDF("k", "v"))
    assert(MetaIO.readString(spark.sparkContext.hadoopConfiguration,
      MetaIO.versionHintPath(loc)).trim.toInt == t3.meta.version)
  }

  test("seam stays null in production paths (no fault → no behavior change)") {
    assert(MetaIO.commitFault == null)
    val loc = tmp()
    val t = mkTable(loc).delete("k >= 15").compact()
    assert(rows(loc) == baseRows.filter(_._1 < 15))
    assert(t.meta.version > 1)
  }
}
