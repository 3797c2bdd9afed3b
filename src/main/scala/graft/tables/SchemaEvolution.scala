package graft.tables

import org.apache.spark.sql.types.{DataType, StructType}

/** One schema-evolution operation against a [[GraftTable]]. Ops in a batch
  * reference PRE-evolution logical names ([[SchemaOp.Add]] the new name);
  * [[GraftTable.evolveSchema]] applies a whole batch in ONE metadata
  * commit, so renames that permute names (a↔b swap) resolve atomically —
  * the batch is the unit a CDC consumer replays when its source evolved
  * (reference limitations.md ADD COLUMN flow; Iceberg's UpdateSchema
  * transaction commits all pending changes as one new schema id).
  */
sealed trait SchemaOp
object SchemaOp {
  case class Rename(from: String, to: String) extends SchemaOp
  case class Drop(name: String) extends SchemaOp
  case class Add(name: String, dataType: DataType) extends SchemaOp
  case class Widen(name: String, to: DataType) extends SchemaOp
}

/** Diff two schema versions of the SAME table into the op batch that
  * turns one into the other — keyed by PHYSICAL column name, the stable
  * identity that survives renames (the role Iceberg field ids play): a
  * field whose physical name persists but logical name changed is a
  * rename, a physical that vanished is a drop, a new physical is an add,
  * a persisting physical with a different type is a widen. This is how a
  * CDC consumer ([[TableReplicator]], [[IncrementalAggView]]) learns what
  * evolution happened on its source between two of its polls, without the
  * source having to journal the ALTER statements.
  *
  * The ops carry only LOGICAL names, so a diff computed on the source's
  * schema history applies verbatim to a replica whose physical names
  * differ (each table allocates its own).
  */
object SchemaDiff {
  def diff(from: StructType, to: StructType): Seq[SchemaOp] = {
    val fromPhys = from.fields.map(f => ColumnMapping.physicalName(f) -> f).toMap
    val toPhys = to.fields.map(f => ColumnMapping.physicalName(f) -> f).toMap
    val widens = from.fields.toSeq.flatMap { of =>
      toPhys.get(ColumnMapping.physicalName(of))
        .filter(_.dataType != of.dataType)
        .map(nf => SchemaOp.Widen(of.name, nf.dataType))
    }
    val drops = from.fields.toSeq
      .filterNot(f => toPhys.contains(ColumnMapping.physicalName(f)))
      .map(f => SchemaOp.Drop(f.name))
    val renames = from.fields.toSeq.flatMap { of =>
      toPhys.get(ColumnMapping.physicalName(of))
        .filter(_.name != of.name)
        .map(nf => SchemaOp.Rename(of.name, nf.name))
    }
    val adds = to.fields.toSeq
      .filterNot(f => fromPhys.contains(ColumnMapping.physicalName(f)))
      .map(f => SchemaOp.Add(f.name, f.dataType))
    widens ++ drops ++ renames ++ adds
  }
}
