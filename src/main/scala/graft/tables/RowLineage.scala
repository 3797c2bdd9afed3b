package graft.tables

import org.apache.hadoop.conf.Configuration

/** Iceberg v3 row lineage (spec fields 142/520, metadata columns
  * `_row_id` / `_last_updated_sequence_number`) for graft tables.
  *
  * Ids follow the spec's INHERITANCE model: a data file owns the
  * half-open id range `[first_row_id, first_row_id + record_count)`, and
  * a row's id is `first_row_id + its position in the file` unless the
  * file carries a MATERIALIZED id column (written by lineage-preserving
  * rewrites — [[GraftTable.delete]]/update under
  * [[TableFormat.RowLineagePreserve]]), which always wins.
  *
  * [[assign]] computes per-file first ids with the SAME deterministic
  * walk the v3 binary export uses (IcebergManifests.exportManifests:
  * snapshots in commit order, child manifests in list order, file groups
  * by ascending spec id, first-seen wins and the counter advances by
  * record_count) — RowLineageSpec pins byte-level equality against the
  * exported Avro manifests, so ids served by scans and ids a real
  * Iceberg reader derives from the exported metadata are the same
  * numbers. Imported foreign files carry their EXPLICIT ids
  * ([[DataFile.firstRowId]]); native files appended afterwards continue
  * from the imported `next-row-id` watermark.
  *
  * Scale: assignment is a driver-side walk of manifest metadata —
  * O(files) like every other planning structure, zero data IO.
  */
object RowLineage {
  /** Served metadata column names (the spec's reserved names). */
  val RowIdCol = "_row_id"
  val SeqCol = "_last_updated_sequence_number"
  /** Physical names of MATERIALIZED lineage columns inside data files
    * (hidden from normal reads — scans read by explicit schema).
    */
  val MatRowId = "__gp_row_id"
  val MatSeq = "__gp_last_seq"
  /** Materialized marker for a row with NO lineage (unrecoverable
    * imported ids, predicate-delete-commit files): ids are non-negative
    * by construction, so −1 survives rewrites where a null rider would
    * be mistaken for "inherit from the NEW file's range" — which would
    * invent exactly the numbers the null stands in refusal of.
    */
  val NoLineage = -1L

  case class Assignment(fileFirstRowId: Map[String, Long],
      snapshotFirstRowId: Map[Long, Long], nextRowId: Long)

  /** Per-file first row ids for the CURRENT metadata. Files with an
    * explicit (imported) id keep it; everything else is assigned by the
    * export-order walk, starting from the imported watermark when one
    * exists. Snapshots carrying predicate deletes are skipped exactly as
    * the v3 export omits them (their file sets resolve at a later,
    * representable snapshot).
    */
  /** Assignment cache keyed by (location, version, metadata content
    * hash): a metadata version is immutable once published, so its
    * assignment never changes — a repeated lineage read (or a preserving
    * rewrite right after one) skips the manifest re-walk, which is
    * O(HISTORICAL files) on long-history tables, not O(current files).
    * The content-hash component guards the drop-and-recreate-at-the-
    * same-location case: the recreated table re-reaches the same
    * (location, version) pairs but with different metadata, and serving
    * the old table's file-id map would NULL every row. Bounded LRU-ish
    * (drop oldest past 64 — the walk is always recomputable).
    */
  private val cache =
    new java.util.LinkedHashMap[(String, Int, Int), Assignment](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int, Int), Assignment]): Boolean = size() > 64
    }

  def assign(conf: Configuration, m: TableMeta): Assignment = {
    val key = (m.location, m.version, m.hashCode)
    cache.synchronized(Option(cache.get(key))) match {
      case Some(a) => a
      case None =>
        val a = compute(conf, m)
        cache.synchronized { cache.put(key, a); () }
        a
    }
  }

  /** Persist the CURRENT assignment (per-file first ids, per-snapshot
    * first ids, watermark) as a settlement file in the metadata dir, so
    * ids survive operations that change the walk order — snapshot
    * expiration being the one graft performs. Called by
    * [[GraftTable.expireSnapshots]] BEFORE the expiring commit, with the
    * surviving file set, and referenced from table properties
    * ([[TableFormat.RowLineageSettled]]); [[compute]] seeds from it, so
    * a file keeps its pre-expiration id forever even when its first-seen
    * snapshot is gone. O(surviving files) JSON — the same scale class as
    * one manifest.
    */
  def settle(conf: Configuration, m: TableMeta, keepFiles: Set[String],
      keepSnapshots: Set[Long]): String = {
    val (a, unrecoverable) = computeRaw(conf, m)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("next-row-id", a.nextRowId)
    val files = root.putObject("files")
    a.fileFirstRowId.foreach { case (p, id) =>
      if (keepFiles.contains(p)) files.put(p, id)
    }
    // unrecoverable files (serve NULL) are settled as the -1 sentinel so
    // the determination also survives expiration
    unrecoverable.foreach { p =>
      if (keepFiles.contains(p)) files.put(p, NoLineage)
    }
    val snaps = root.putObject("snapshots")
    a.snapshotFirstRowId.foreach { case (sid, id) =>
      if (keepSnapshots.contains(sid)) snaps.put(sid.toString, id)
    }
    val name = s"lineage-settle-v${m.version}.json"
    MetaIO.writeString(conf, s"${MetaIO.metadataDir(m.location)}/$name",
      mapper.writeValueAsString(root))
    name
  }

  private case class Settlement(fileIds: Map[String, Long],
      snapIds: Map[Long, Long], next: Long)

  private def loadSettlement(conf: Configuration, m: TableMeta): Option[Settlement] =
    m.properties.get(TableFormat.RowLineageSettled).map { name =>
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(MetaIO.readString(conf, s"${MetaIO.metadataDir(m.location)}/$name"))
      val files = Map.newBuilder[String, Long]
      val fn = root.get("files")
      fn.fieldNames().forEachRemaining(p => files += p -> fn.get(p).asLong())
      val snaps = Map.newBuilder[Long, Long]
      val sn = root.get("snapshots")
      if (sn != null) sn.fieldNames().forEachRemaining(s => snaps += s.toLong -> sn.get(s).asLong())
      Settlement(files.result(), snaps.result(), root.get("next-row-id").asLong())
    }

  private def compute(conf: Configuration, m: TableMeta): Assignment =
    computeRaw(conf, m)._1

  private def computeRaw(conf: Configuration, m: TableMeta): (Assignment, Set[String]) = {
    val settled = loadSettlement(conf, m)
    var next = math.max(
      m.properties.get(TableFormat.RowLineageNextRowId).map(_.toLong).getOrElse(0L),
      settled.map(_.next).getOrElse(0L))
    // imported snapshots at or below the boundary: a file WITHOUT an
    // explicit foreign id there has no recoverable lineage — serve NULL
    // instead of inventing numbers the source engine would contradict
    val importBoundary = m.properties.get(TableFormat.RowLineageImportBoundary)
      .map(_.toLong).getOrElse(Long.MinValue)
    val fileIds = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val unrecoverable = scala.collection.mutable.Set.empty[String]
    settled.foreach(_.fileIds.foreach { case (p, id) =>
      if (id == NoLineage) unrecoverable += p else fileIds(p) = id
    })
    val settledSnaps = settled.map(_.snapIds).getOrElse(Map.empty)
    val snapIds = scala.collection.mutable.Map.empty[Long, Long] ++= settledSnaps
    m.snapshots.foreach { snap =>
      val (entries, dp, _, _) = MetaIO.loadManifestListData(conf, m.location, snap)
      if (dp.isEmpty) {
        if (!snapIds.contains(snap.id)) snapIds(snap.id) = next
        entries.foreach { e =>
          val files = MetaIO.loadChildFiles(conf, m.location, e.name)
          files.groupBy(_.specId).toSeq.sortBy(_._1).foreach { case (_, group) =>
            group.foreach { f =>
              if (!fileIds.contains(f.path) && !unrecoverable.contains(f.path)) {
                f.firstRowId match {
                  case Some(explicit) =>
                    fileIds(f.path) = explicit
                    next = math.max(next, explicit + f.recordCount)
                  case None if snap.id <= importBoundary =>
                    unrecoverable += f.path
                  case None =>
                    fileIds(f.path) = next
                    next += f.recordCount
                }
              }
            }
          }
        }
      }
    }
    (Assignment(fileIds.toMap, snapIds.toMap, next), unrecoverable.toSet)
  }
}
