package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance over a [[GraftTable]]: a
  * grouped COUNT(*) + SUM(measure…) aggregate kept up to date from the
  * base table's row-level changelog ([[GraftTable.changesBetween]])
  * instead of recomputation — the Iceberg-plus-Flink "incremental refresh"
  * pattern (the reference's engines get this from a streaming runtime; the
  * capability re-expressed here is batch-incremental).
  *
  * Refresh cost is O(changed rows + touched groups), never O(base table):
  * the changelog delta aggregates to per-group (count, sum) adjustments
  * with sign +1 for 'insert' rows and -1 for 'delete' rows; the current
  * values of ONLY the touched groups join in (delta is aggregated and
  * small, so it broadcasts both into the semi-join that restricts the view
  * scan and into the outer join that applies it); groups whose count
  * reaches zero are deleted. The apply is ONE [[GraftTable.mergeBatch]]
  * commit whose equality delete covers both replaced and vanished groups,
  * and the progress cursor (`graft.mv.base-snapshot`) rides the same
  * metadata version — refresh is exactly-once by construction: either the
  * delta and the cursor both land or neither does.
  *
  * Measures are summed as DECIMAL(28,6) of the source column: decimal
  * addition is associative, so incremental accumulation is bit-identical
  * to a full recompute regardless of commit order — a float sum would
  * drift. A group whose rows all carry NULL measures sums to 0, not NULL
  * (the count column is the NULL-discriminating signal).
  *
  * 100 TB posture: the view is an aggregate, orders of magnitude smaller
  * than the base; cluster it by the group columns ([[GraftTable.cluster]])
  * and the per-refresh view scan prunes to the files whose key ranges
  * intersect the touched groups. The changelog side reads only the files
  * each commit added/removed (manifest diff), never the base table.
  */
final class IncrementalAggView private (
    val spark: SparkSession, val table: GraftTable) {

  import IncrementalAggView._

  private def props: Map[String, String] = table.meta.properties

  def groupCols: Seq[String] = props(GroupColsProp).split(",").toSeq
  def sumCols: Seq[String] =
    props(SumColsProp).split(",").toSeq.filter(_.nonEmpty)
  def baseLocation: String = props(BaseLocProp)
  def baseSnapshot: Long = props(BaseSnapProp).toLong
  /** Optional row predicate (SQL over base columns) the view maintains
    * under. The changelog delta filters insert and delete rows
    * IDENTICALLY, so a row UPDATEd into (out of) the predicate set is a
    * bare +1 (−1) adjustment — incremental maintenance stays exact.
    */
  def filterSql: Option[String] = props.get(FilterProp).filter(_.nonEmpty)

  def toDF(): DataFrame = table.toDF()

  /** Replay base-table schema evolution since the last refresh onto the
    * view: a renamed group/measure column renames the matching view column
    * and the tracked column lists (one [[GraftTable.evolveSchema]] commit
    * carrying them + the schema cursor); a widened group column widens the
    * view's; a DROPPED group or measure column refuses loudly — the view's
    * grouping identity (or a sum whose source vanished) cannot be
    * maintained, recreate the view. Renames/drops/adds of columns the view
    * doesn't track are no-ops. Must run BEFORE the changelog read:
    * [[GraftTable.changesBetween]] emits the base's CURRENT names.
    */
  private def reconcileSchema(base: GraftTable): Unit = {
    val bm = base.meta
    val lastId = props.get(BaseSchemaProp).map(_.toInt).getOrElse(bm.currentSchemaId)
    if (lastId == bm.currentSchemaId) {
      if (props.get(BaseSchemaProp).isEmpty)
        { table.setProperties(Map(BaseSchemaProp -> lastId.toString)); () }
      return
    }
    val gcols = groupCols
    val scols = sumCols
    val filterAttrs: Set[String] = filterSql.toSeq.flatMap { f =>
      spark.sessionState.sqlParser.parseExpression(f).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name
      }
    }.toSet
    val ops = SchemaDiff.diff(bm.schemaAt(lastId), bm.schema)
    ops.foreach {
      case SchemaOp.Drop(c)
          if gcols.contains(c) || scols.contains(c) || filterAttrs.contains(c) =>
        throw new IllegalStateException(
          s"base table dropped column '$c' that the view groups, sums, or " +
            "filters by; the aggregate cannot be maintained — recreate the view")
      case _ => ()
    }
    val renames = ops.collect { case SchemaOp.Rename(f, t) => f -> t }.toMap
    // a renamed filter column rewrites the stored predicate (parse →
    // rename attributes → regenerate), so the filter keeps matching the
    // changelog's CURRENT column names
    val newFilter = filterSql.map { f =>
      if (renames.keySet.intersect(filterAttrs).isEmpty) f
      else spark.sessionState.sqlParser.parseExpression(f).transform {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts.length == 1 && renames.contains(a.name) =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
            Seq(renames(a.name)))
      }.sql
    }
    val viewOps = ops.flatMap {
      case SchemaOp.Rename(f, t) if gcols.contains(f) =>
        Some(SchemaOp.Rename(f, t))
      case SchemaOp.Rename(f, t) if scols.contains(f) =>
        Some(SchemaOp.Rename(sumCol(f), sumCol(t)))
      case SchemaOp.Widen(f, to) if gcols.contains(f) =>
        Some(SchemaOp.Widen(f, to))
      // measure widens are absorbed (sums accumulate as DECIMAL anyway);
      // everything else doesn't touch the view's columns
      case _ => None
    }
    if (viewOps.exists(!_.isInstanceOf[SchemaOp.Add])) { table.materializeDeletes(); () }
    table.evolveSchema(viewOps, extraProperties = Map(
      BaseSchemaProp -> bm.currentSchemaId.toString,
      GroupColsProp -> gcols.map(c => renames.getOrElse(c, c)).mkString(","),
      SumColsProp -> scols.map(c => renames.getOrElse(c, c)).mkString(",")) ++
      newFilter.map(FilterProp -> _))
    ()
  }

  /** Fold the base table's commits since the last refresh into the view.
    * Returns the number of changelog rows processed (0 = already current,
    * no commit made). If the cursor's snapshot has EXPIRED off the base
    * table (or a rollback moved the head off its ancestry), the changelog
    * is unreachable — refresh self-heals with a FULL recompute instead of
    * failing forever: the recompute is idempotent, so the overwrite +
    * cursor (one atomic commit) is safe even if a crash forces a redo.
    */
  def refresh(): Long = {
    val base = GraftTable.load(spark, baseLocation)
    reconcileSchema(base)
    val cur = base.meta.currentSnapshotId
      .getOrElse(throw new IllegalStateException("base table has no snapshot"))
    val last = baseSnapshot
    if (cur == last) return 0L

    val gcols = groupCols
    val scols = sumCols
    val changes0 = (try base.changesBetween(last, cur)
      catch {
        case _: IllegalArgumentException => return fullRefresh(base, cur)
      })
    val changes = filterSql.map(f => changes0.filter(expr(f))).getOrElse(changes0)
      .select((gcols ++ scols).map(col) :+ col("_change_type"): _*)
      .cache()
    try {
      val nChanges = changes.count()
      if (nChanges == 0) {
        // commits happened but none carried rows (maintenance) — advance
        // the cursor so the next refresh's changelog walk starts here
        table.setProperties(Map(BaseSnapProp -> cur.toString))
        return 0L
      }
      val sign = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
      val delta = changes.groupBy(gcols.map(col): _*).agg(
        sum(sign).as(DeltaCnt),
        scols.map(c => sum(sign.cast(SumType) *
          coalesce(col(c).cast(SumType), lit(0).cast(SumType))).as(deltaSum(c))): _*)

      // null-safe joins throughout: a NULL group key is a real group (the
      // upsert's equality delete is null-safe too — a plain `=` here would
      // drop the old NULL-group row without folding it in)
      val view = table.toDF()
      val deltaKeys = delta.select(gcols.map(col): _*)
      val touched = view.join(broadcast(deltaKeys),
        gcols.map(c => view(c) <=> deltaKeys(c)).reduce(_ && _), "left_semi")
      val merged = delta.join(touched,
        gcols.map(c => delta(c) <=> touched(c)).reduce(_ && _), "left_outer")
      val newCnt = coalesce(touched(CntCol), lit(0L)) + delta(DeltaCnt)
      val newSums = scols.map(c =>
        (coalesce(touched(sumCol(c)), lit(0).cast(SumType)).cast(SumType) +
          delta(deltaSum(c))).cast(SumType).as(sumCol(c)))
      val next = merged.select(
        (gcols.map(c => delta(c).as(c)) :+ newCnt.as(CntCol)) ++ newSums: _*)
      val upserts = next.filter(col(CntCol) > 0)
      val dead = next.filter(col(CntCol) <= 0).select(gcols.map(col): _*)
      table.mergeBatch(upserts, Some(dead), gcols,
        extraProperties = Map(BaseSnapProp -> cur.toString))
      nChanges
    } finally {
      changes.unpersist()
      ()
    }
  }

  /** Recompute the aggregate from the base's current state and replace
    * the view contents in ONE commit carrying the cursor. Returns the
    * number of base rows aggregated (the work actually done).
    */
  private def fullRefresh(base: GraftTable, cur: Long): Long = {
    val gcols = groupCols
    val scols = sumCols
    val src = filterSql.map(f => base.toDF().filter(expr(f)))
      .getOrElse(base.toDF()).cache()
    try {
      val n = src.count()
      val agg = src.groupBy(gcols.map(col): _*).agg(
        count(lit(1)).as(CntCol),
        scols.map(c =>
          sum(coalesce(col(c).cast(SumType), lit(0).cast(SumType)))
            .cast(SumType).as(s"sum_$c")): _*)
      table.overwrite(agg, extraProperties = Map(BaseSnapProp -> cur.toString))
      n
    } finally {
      src.unpersist()
      ()
    }
  }
}

object IncrementalAggView {
  private[tables] val BaseLocProp = "graft.mv.base-location"
  private[tables] val BaseSnapProp = "graft.mv.base-snapshot"
  private[tables] val BaseSchemaProp = "graft.mv.base-schema"
  private[tables] val FilterProp = "graft.mv.filter"
  private[tables] val GroupColsProp = "graft.mv.group-cols"
  private[tables] val SumColsProp = "graft.mv.sum-cols"
  private[tables] val CntCol = "cnt"
  private[tables] val DeltaCnt = "__d_cnt"
  private[tables] val SumType = DecimalType(28, 6)

  private def sumCol(c: String) = s"sum_$c"
  private def deltaSum(c: String) = s"__d_sum_$c"

  /** Full initial aggregate of `base` at its current snapshot, stored as a
    * GraftTable at `location` with the maintenance metadata.
    */
  def create(spark: SparkSession, location: String, base: GraftTable,
      groupCols: Seq[String], sumCols: Seq[String],
      filter: Option[String] = None): IncrementalAggView = {
    require(groupCols.nonEmpty, "view needs group columns")
    val snap = base.meta.currentSnapshotId
      .getOrElse(throw new IllegalStateException("base table has no snapshot"))
    val src = filter.map(f => base.toDF().filter(expr(f))).getOrElse(base.toDF())
    val agg = src.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as(CntCol),
      sumCols.map(c =>
        sum(coalesce(col(c).cast(SumType), lit(0).cast(SumType)))
          .cast(SumType).as(sumCol(c))): _*)
    val t = GraftTable.createAs(spark, location, agg, properties = Map(
      BaseLocProp -> base.location,
      BaseSnapProp -> snap.toString,
      BaseSchemaProp -> base.meta.currentSchemaId.toString,
      GroupColsProp -> groupCols.mkString(","),
      SumColsProp -> sumCols.mkString(",")) ++
      filter.map(FilterProp -> _))
    new IncrementalAggView(spark, t)
  }

  def load(spark: SparkSession, location: String): IncrementalAggView = {
    val t = GraftTable.load(spark, location)
    require(t.meta.properties.contains(BaseLocProp),
      s"$location is not an incremental view")
    new IncrementalAggView(spark, t)
  }
}
