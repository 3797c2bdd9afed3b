package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Changelog-driven table replication: keep a replica GraftTable in sync
  * with a source table by replaying the source's row-level changelog — the
  * consumer side of CDC (the reference's stack pairs Iceberg CDC reads
  * with a downstream writer; here both ends are native).
  *
  * `sync` walks the source's snapshot chain from the replica's cursor and
  * applies each commit as ONE [[GraftTable.mergeBatch]]: the commit's
  * 'insert' rows upsert, its 'delete' rows become equality-delete keys,
  * and the cursor property advances in the same metadata version — a
  * crash replays from the last applied commit, never double-applies
  * (exactly-once per commit). Applying commit-by-commit preserves
  * ordering: a key updated in one commit and deleted two commits later
  * converges to deleted, which a range-collapsed diff could not guarantee
  * without a per-row ordinal.
  *
  * Cost per synced commit is O(commit's changed rows) — appends replay as
  * manifest diffs, merge-on-read upserts as their delete keys + new files;
  * the replica is never rescanned. Row-preserving maintenance commits
  * (compaction, clustering, delete materialization) produce an empty
  * changelog and advance the cursor with a metadata-only commit.
  *
  * A source rollback breaks the ancestry walk and fails loudly —
  * reconcile with a snapshot file-diff (the [[graft.streaming]] changelog
  * source's `diffSnapshots` strategy) before resuming.
  */
object TableReplicator {
  private[tables] val SrcLocProp = "graft.replica.source-location"
  private[tables] val SrcSnapProp = "graft.replica.source-snapshot"
  private[tables] val KeyColsProp = "graft.replica.key-cols"

  /** Bootstrap a replica from the source's current snapshot. */
  def create(spark: SparkSession, location: String, source: GraftTable,
      keyCols: Seq[String]): GraftTable = {
    require(keyCols.nonEmpty, "replication needs key columns")
    val snap = source.meta.currentSnapshotId
      .getOrElse(throw new IllegalStateException("source table has no snapshot"))
    GraftTable.createAs(spark, location, source.toDF(), properties = Map(
      SrcLocProp -> source.location,
      SrcSnapProp -> snap.toString,
      KeyColsProp -> keyCols.mkString(",")))
  }

  /** Apply all source commits since the replica's cursor. Returns the
    * number of commits applied (0 = already in sync).
    */
  def sync(spark: SparkSession, replicaLocation: String): Int = {
    val replica = GraftTable.load(spark, replicaLocation)
    val props = replica.meta.properties
    val source = GraftTable.load(spark, props(SrcLocProp))
    val keyCols = props(KeyColsProp).split(",").toSeq
    val last = props(SrcSnapProp).toLong
    val sm = source.meta
    val head = sm.currentSnapshotId
      .getOrElse(throw new IllegalStateException("source table has no snapshot"))
    if (head == last) return 0

    // ancestry walk: last .. head, oldest first
    var chain = List.empty[Snapshot]
    var cur = sm.snapshot(head)
    while (cur.isDefined && cur.get.id != last) {
      chain = cur.get :: chain
      cur = cur.get.parentId.flatMap(sm.snapshot)
    }
    if (cur.isEmpty) {
      // the cursor's snapshot is unreachable (expired off the source, or
      // a rollback moved the head off its ancestry): the per-commit
      // changelog is gone, so self-heal by replacing the replica with the
      // source's CURRENT state in one commit carrying the cursor —
      // idempotent, so an at-least-once redo after a crash is safe
      replica.overwrite(source.toDF(),
        extraProperties = Map(SrcSnapProp -> head.toString))
      return 1
    }

    chain.foreach { snap =>
      val parent = snap.parentId.getOrElse(
        throw new IllegalStateException(s"commit ${snap.id} has no parent"))
      val ch = source.changesBetween(parent, snap.id).cache()
      try {
        val cursor = Map(SrcSnapProp -> snap.id.toString)
        if (ch.isEmpty) {
          // row-preserving maintenance: nothing to apply, advance cursor
          replica.setProperties(cursor)
        } else {
          val inserts = ch.filter(col("_change_type") === "insert")
            .drop("_change_type")
          val deletedKeys = ch.filter(col("_change_type") === "delete")
            .select(keyCols.map(col): _*)
          replica.mergeBatch(inserts, Some(deletedKeys), keyCols,
            extraProperties = cursor)
        }
      } finally {
        ch.unpersist()
        ()
      }
    }
    chain.size
  }
}
