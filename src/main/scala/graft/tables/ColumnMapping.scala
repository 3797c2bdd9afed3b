package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Logical→physical column-name mapping for schema evolution (the Delta
  * "column mapping" / Iceberg field-id model, re-expressed over plain
  * parquet): data files always carry a field's PHYSICAL name — the name it
  * had when it first entered the schema — while the table schema maps it
  * to the current LOGICAL name via field metadata (`graft.physical`).
  * RENAME is then a metadata-only commit (no file rewrite at any scale),
  * DROP removes the logical field while old files keep their bytes, and a
  * re-ADD of a retired name gets a fresh physical name so dropped data can
  * never resurrect (Iceberg gets the same from never reusing field ids).
  *
  * Reads project physical→logical in one positional `select` (swap-safe:
  * a chain of renames that permutes names resolves atomically); writes
  * project logical→physical the same way. Stats and partition specs live
  * in the physical namespace — footer stats are keyed by what's in the
  * file, and [[ScanPlanner]] translates predicates before pruning.
  */
object ColumnMapping {
  val PhysicalKey = "graft.physical"
  /** Table property: comma-joined physical names of dropped columns. */
  val RetiredProp = "graft.retired-cols"
  /** Spark's parquet field-id metadata key (SPARK-38094). Attached by
    * [[IcebergImport]] to schemas of foreign Iceberg-written tables (whose
    * files always carry parquet field ids) so renamed columns resolve by
    * id, not name; preserved through [[physicalSchema]]/[[toPhysical]] so
    * graft's own appends to such a table also stamp ids. Graft-native
    * tables never carry it — their reads stay name-based.
    */
  val ParquetFieldIdKey = "parquet.field.id"

  def hasFieldIds(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(ParquetFieldIdKey))

  /** Field with an Iceberg/parquet field id pinned into metadata. */
  def withFieldId(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(ParquetFieldIdKey, id.toLong).build())

  /** Only the field-id key survives into physical (file-facing) schemas;
    * graft's logical riders stay out of file footers and write frames.
    */
  private[tables] def fileMetadata(f: StructField): Metadata =
    if (!f.metadata.contains(ParquetFieldIdKey)) Metadata.empty
    else new MetadataBuilder()
      .putLong(ParquetFieldIdKey, f.metadata.getLong(ParquetFieldIdKey)).build()

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      StructField(physicalName(f), f.dataType, f.nullable, fileMetadata(f))))

  def hasMapping(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name)

  /** Physical name of a logical column (identity for unmapped columns,
    * including names not in the schema — pruning passes through predicate
    * columns it does not recognize).
    */
  def physicalOf(schema: StructType, logical: String): String =
    schema.fields.find(_.name == logical).map(physicalName).getOrElse(logical)

  /** Field with its physical name pinned into metadata. */
  def withPhysical(f: StructField, physical: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PhysicalKey, physical).build())

  /** Read parquet files under the physical schema, exposed logically. */
  def readFiles(spark: SparkSession, schema: StructType,
      paths: Seq[String], format: String = "parquet",
      rowMeta: Boolean = false): DataFrame = {
    // one format per call — mixed file sets are grouped by the caller
    // (ScanPlanner.scan), matching Iceberg's per-file `file_format`.
    // Avro rides graft's own container codec (Spark's `avro` module is
    // not on this classpath) — whole-file decode, no column pruning;
    // a rewrite migrates such files to parquet. `rowMeta` attaches the
    // per-branch (file path, row position) helper columns: from the file
    // source's `_metadata` where a file source exists, from the
    // container walk on the avro path.
    val df =
      if (format == "avro")
        graft.sources.GraftAvro.readPaths(spark, physicalSchema(schema),
          paths, rowMeta)
      else {
        val base = spark.read.schema(physicalSchema(schema)).format(format)
          .load(paths: _*)
        if (!rowMeta) base
        else base.withColumn(ScanPlanner.RowMetaFile, col("_metadata.file_path"))
          .withColumn(ScanPlanner.RowMetaPos,
            // only the parquet source serves `_metadata.row_index`; a null
            // position on an ORC branch is SAFE: positions are only ever
            // compared against position-delete entries, which anchor to
            // parquet file paths (creating position-anchored state on
            // foreign-format files is refused up front), so a foreign
            // row's (path, null) can never match — and the MERGE
            // cardinality check substitutes a scan-unique id for null
            // positions before grouping (GraftTable
            // .touchedFilesWithCardinalityCheck)
            if (format == "parquet") col("_metadata.row_index")
            else lit(null).cast(org.apache.spark.sql.types.LongType))
      }
    if (!hasMapping(schema)) df
    else df.select(schema.fields.toSeq.map(f =>
        col(physicalName(f)).as(f.name, f.metadata)) ++
      (if (rowMeta) Seq(col(ScanPlanner.RowMetaFile), col(ScanPlanner.RowMetaPos))
       else Nil): _*)
  }

  /** Project a logical-named frame to physical names for writing. Extra
    * columns (e.g. partition-transform derivatives added downstream) are
    * not expected here — callers rename BEFORE adding them. Schema
    * columns ABSENT from the frame are skipped, not errors: the
    * name-based (no-mapping) path lets a writer omit a column (the file
    * simply lacks it; reads resolve it to null or the declared default),
    * and id-attached tables must behave identically — ids are stamped on
    * whichever columns the writer did provide.
    */
  def toPhysical(schema: StructType, df: DataFrame): DataFrame =
    if (!hasMapping(schema) && !hasFieldIds(schema)) df
    else {
      val present = df.columns.map(_.toLowerCase).toSet
      df.select(schema.fields.toSeq
        .filter(f => present(f.name.toLowerCase)).map(f =>
          col(f.name).as(physicalName(f), fileMetadata(f))): _*)
    }

  /** All physical names a new column must not collide with: live fields
    * plus retired (dropped) ones whose bytes persist in old files.
    */
  def reservedPhysical(meta: TableMeta): Set[String] =
    meta.schema.fields.map(physicalName).toSet ++
      meta.properties.get(RetiredProp).toSeq
        .flatMap(_.split(",")).filter(_.nonEmpty)
}
