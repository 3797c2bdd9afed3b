package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.{OrcFile, TypeDescription}
import org.apache.orc.{BooleanColumnStatistics, DateColumnStatistics,
  DecimalColumnStatistics, DoubleColumnStatistics, IntegerColumnStatistics,
  StringColumnStatistics}
import org.apache.spark.sql.types._

/** Per-file stats for NON-parquet data files a table registers in place
  * (`add_files` over an ORC or Avro directory — the Iceberg manifest
  * `file_format` model, where each entry carries its own format and the
  * scan honors it). The parquet counterpart is [[FooterStats]]; this
  * object follows the same contract: an O(metadata) footer read per
  * file, values normalized into the scan planner's comparison domain
  * (longs / doubles / ASCII strings / booleans), and stats DROPPED
  * whenever the footer can't be trusted to mirror engine comparison
  * semantics — dropping only ever widens a scan.
  *
  *  - ORC footers carry per-column min/max/null statistics
  *    (org.apache.orc file tail): integrals, dates, doubles, decimals
  *    and untruncated ASCII strings map over; timestamps are skipped
  *    (ORC's writer-zone semantics don't portably match the engine's
  *    UTC comparison domain).
  *  - Avro object containers carry NO column statistics — only the
  *    per-block record counts, which sum to an exact row count; such
  *    files prune on partition values only, like Iceberg entries with
  *    empty bounds.
  */
object ExternalFooters {

  /** (rows, per-column stats) from one ORC file's footer. */
  def orcStats(conf: Configuration, path: String,
      schema: StructType): (Long, Map[String, ColStats]) = {
    val reader = OrcFile.createReader(new Path(path),
      OrcFile.readerOptions(conf))
    try {
      val rows = reader.getNumberOfRows
      val root = reader.getSchema
      if (root.getCategory != TypeDescription.Category.STRUCT)
        return (rows, Map.empty)
      val colStats = reader.getStatistics // indexed by column id, 0 = root
      val names = root.getFieldNames
      val kids = root.getChildren
      val wanted = schema.fields.map(f => f.name -> f.dataType).toMap
      val out = Map.newBuilder[String, ColStats]
      var i = 0
      while (i < names.size()) {
        val name = names.get(i)
        wanted.get(name).foreach { t =>
          val st = colStats(kids.get(i).getId)
          val nulls = rows - st.getNumberOfValues
          bounds(st, t) match {
            case Some((lo, hi)) => out += name -> ColStats(Some(lo), Some(hi), nulls)
            case None if st.getNumberOfValues == 0L =>
              // all-null column: null count alone still prunes IS NOT NULL
              out += name -> ColStats(None, None, nulls)
            case None => () // values exist but bounds unusable: drop
          }
        }
        i += 1
      }
      (rows, out.result())
    } finally reader.close()
  }

  /** ORC (min, max) in the scan planner's comparison domain. */
  private def bounds(st: org.apache.orc.ColumnStatistics,
      sparkType: DataType): Option[(Any, Any)] = (st, sparkType) match {
    case (s: IntegerColumnStatistics,
        _: ByteType | _: ShortType | _: IntegerType | _: LongType) =>
      Some((s.getMinimum, s.getMaximum))
    case (s: DateColumnStatistics, _: DateType) =>
      // ORC date stats are epoch days (proleptic Gregorian, same domain
      // the parquet INT32 path uses)
      Some((s.getMinimumDayOfEpoch, s.getMaximumDayOfEpoch))
    case (s: DoubleColumnStatistics, _: FloatType | _: DoubleType) =>
      val (lo, hi) = (s.getMinimum, s.getMaximum)
      if (lo.isNaN || hi.isNaN) None else Some((lo, hi))
    case (s: DecimalColumnStatistics, _: DecimalType) =>
      (Option(s.getMinimum), Option(s.getMaximum)) match {
        case (Some(lo), Some(hi)) => Some((lo.doubleValue(), hi.doubleValue()))
        case _ => None
      }
    case (s: StringColumnStatistics, _: StringType) =>
      // getMinimum/getMaximum are null when the writer truncated them to
      // bounds (getLowerBound/getUpperBound) — those are NOT values in
      // the data, so they are dropped like parquet's non-ASCII case
      (Option(s.getMinimum), Option(s.getMaximum)) match {
        case (Some(lo), Some(hi)) if isAscii(lo) && isAscii(hi) => Some((lo, hi))
        case _ => None
      }
    case (s: BooleanColumnStatistics, _: BooleanType) =>
      Some((s.getFalseCount == 0L, s.getTrueCount > 0L))
    case _ => None
  }

  /** Exact record count of one Avro object container, from the per-block
    * counts (every block header carries one). This streams past the
    * block bytes on the registering host — fine for a one-time
    * `add_files`; at cluster scale each write task would emit its own
    * file's entry with the count it wrote (the Iceberg model), so no
    * central walk exists to begin with.
    */
  def avroRowCount(conf: Configuration, path: String): Long = {
    val in = new org.apache.avro.mapred.FsInput(new Path(path), conf)
    val reader = new org.apache.avro.file.DataFileReader(in,
      new org.apache.avro.generic.GenericDatumReader[AnyRef]())
    try {
      var rows = 0L
      while (reader.hasNext) {
        rows += reader.getBlockCount
        reader.nextBlock()
      }
      rows
    } finally reader.close()
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 128) return false; i += 1 }
    true
  }
}
