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
  case class Add(name: String, dataType: DataType,
      default: Option[Any] = None) extends SchemaOp
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
      // defaults travel with the add; the replica assigns its OWN
      // boundary at replay time, which is correct because replay is
      // in-order — its already-replicated files are exactly the pre-add
      // population
      .map(f => SchemaOp.Add(f.name, f.dataType,
        ColumnDefaults.of(f).map(_._1)))
    widens ++ drops ++ renames ++ adds
  }
}

/** Column DEFAULT VALUES (the Iceberg v3 `initial-default` model): a
  * column added with a default reads that value — instead of null — for
  * every row of a file written BEFORE the column existed, while files
  * written after carry real values (their nulls stay null). Iceberg
  * readers key this on "field id absent from the file"; graft keys it on
  * the equivalent commit boundary: the default rides the schema field as
  * metadata together with the data sequence number the add committed at,
  * and the scan fills it only for files whose seq predates that boundary
  * ([[ScanPlanner.scan]] groups the file set by applicable-default
  * vector — bounded by default epochs, typically 2 scans, never per-file
  * plan growth). A v3 export emits the spec's `initial-default` /
  * `write-default` keys so real readers agree; v1/v2 BINARY exports
  * refuse (those readers would silently see nulls), the graft JSON path
  * rides `graft-*` keys and round-trips exactly.
  *
  * Supported default types: int, long, float, double, string, boolean,
  * date (epoch days; Iceberg "YYYY-MM-DD" single-value JSON) and
  * timestamp-NTZ (epoch micros; ISO-8601 local datetime JSON).
  * Timestamptz/binary defaults refuse loudly — add them when a user
  * exists; a silently mis-typed default is worse than none.
  */
object ColumnDefaults {
  import org.apache.spark.sql.types._
  val ValueKey = "graft.initial-default"
  val SinceKey = "graft.default-since"

  /** (default value, boundary data-sequence) of a field, if any. */
  def of(f: StructField): Option[(Any, Long)] =
    if (!f.metadata.contains(ValueKey)) None
    else Some((read(f.metadata, f.dataType), f.metadata.getLong(SinceKey)))

  private def read(m: org.apache.spark.sql.types.Metadata, t: DataType): Any =
    t match {
      case IntegerType => m.getLong(ValueKey).toInt
      case LongType    => m.getLong(ValueKey)
      case FloatType   => m.getDouble(ValueKey).toFloat
      case DoubleType  => m.getDouble(ValueKey)
      case StringType  => m.getString(ValueKey)
      case BooleanType => m.getBoolean(ValueKey)
      case DateType    => java.time.LocalDate.ofEpochDay(m.getLong(ValueKey))
      case TimestampNTZType =>
        val us = m.getLong(ValueKey)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC)
      case other => throw new IllegalStateException(
        s"column default metadata on unsupported type $other")
    }

  /** Field with a validated default pinned into metadata. */
  def withDefault(f: StructField, v: Any, since: Long): StructField = {
    val b = new MetadataBuilder().withMetadata(f.metadata)
    (f.dataType, v) match {
      case (IntegerType, i: Int)     => b.putLong(ValueKey, i.toLong)
      case (LongType, l: Long)       => b.putLong(ValueKey, l)
      case (LongType, i: Int)        => b.putLong(ValueKey, i.toLong)
      case (FloatType, x: Float)     => b.putDouble(ValueKey, x.toDouble)
      case (DoubleType, x: Double)   => b.putDouble(ValueKey, x)
      case (StringType, s: String)   => b.putString(ValueKey, s)
      case (BooleanType, x: Boolean) => b.putBoolean(ValueKey, x)
      case (DateType, d: java.time.LocalDate) => b.putLong(ValueKey, d.toEpochDay)
      case (DateType, d: java.sql.Date) => b.putLong(ValueKey, d.toLocalDate.toEpochDay)
      case (TimestampNTZType, t: java.time.LocalDateTime) =>
        b.putLong(ValueKey, t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
          + t.getNano / 1000L)
      case (t, x) => throw new IllegalArgumentException(
        s"unsupported column default $x (${x.getClass.getSimpleName}) for " +
          s"type $t — supported: int, long, float, double, string, boolean, " +
          "date, timestamp (NTZ)")
    }
    b.putLong(SinceKey, since)
    f.copy(metadata = b.build())
  }
}
