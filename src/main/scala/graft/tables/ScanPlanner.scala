package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BinaryComparison, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.functions.{coalesce, col, lit, expr => sqlExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Manifest-driven scan planning: partition pruning + min/max file
  * skipping happen here, BEFORE Spark ever lists or opens a data file —
  * the re-expression of the workshop's "files=1 of 238 scanned" plans
  * (reference README.md "Predicate pushdown and file pruning"). At 100 TB
  * the planner reads O(manifest) JSON, not O(data).
  *
  * Pruning is conservative: only conjunctions of `col <op> literal` are
  * analyzed; anything else keeps the file. The full predicate is always
  * re-applied by Spark after the scan, so pruning can never change
  * results.
  */
object ScanPlanner {

  /** A simple comparison extracted from the filter. For op "in", `value`
    * is a Seq of candidate values; for "isnull"/"isnotnull" it is unused.
    */
  private case class Compare(column: String, op: String, value: Any)

  private def stripCast(e: Expression): Expression = e match {
    case Cast(child, _, _, _) => stripCast(child)
    case other => other
  }

  private def litValue(l: Literal): Any = l.value match {
    case u: UTF8String => u.toString
    case i: Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case l: java.lang.Long => l.longValue()
    case f: java.lang.Float => f.doubleValue()
    case d: java.lang.Double => d.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other // Boolean, Long (timestamp micros), Int (date days)
  }

  private def attrName(e: Expression): Option[String] = stripCast(e) match {
    // UnresolvedAttribute is an Attribute subtype, so this also covers
    // pre-analysis predicate strings
    case a: Attribute => Some(a.name)
    case _ => None
  }

  /** Fold a resolved constant subtree to a literal (handles
    * `TIMESTAMP '…'` and implicit casts the analyzer inserts).
    */
  private def foldToLiteral(e: Expression): Option[Literal] = e match {
    case l: Literal => Some(l)
    case f if f.resolved && f.foldable => Some(Literal.create(f.eval(null), f.dataType))
    case _ => None
  }

  /** Split a resolved filter into analyzable comparisons (conjuncts only). */
  private def extract(e: Expression): Seq[Compare] = e match {
    case And(l, r) => extract(l) ++ extract(r)
    // BETWEEN survives analysis as a RuntimeReplaceable whose replacement
    // hides the input behind a With/CommonExpressionRef — rebuild the two
    // comparisons on the real input instead
    case b: org.apache.spark.sql.catalyst.expressions.Between =>
      extract(And(GreaterThanOrEqual(b.input, b.lower), LessThanOrEqual(b.input, b.upper)))
    // other sugar: the replacement is usually a plain comparison tree
    case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
      extract(r.replacement)
    case cmp: BinaryComparison =>
      val flipped = Map(">" -> "<", "<" -> ">", ">=" -> "<=", "<=" -> ">=", "=" -> "=")
      (attrName(cmp.left), foldToLiteral(cmp.right), foldToLiteral(cmp.left), attrName(cmp.right)) match {
        case (Some(n), Some(lit), _, _) => Seq(Compare(n, symbolOf(cmp), litValue(lit)))
        case (_, _, Some(lit), Some(n)) => Seq(Compare(n, flipped(symbolOf(cmp)), litValue(lit)))
        case _ => Nil
      }
    case In(l, values) if values.forall(foldToLiteral(_).isDefined) =>
      attrName(l).map(n =>
        Compare(n, "in", values.flatMap(foldToLiteral).map(litValue))).toSeq
    case IsNull(l)    => attrName(l).map(n => Compare(n, "isnull", null)).toSeq
    case IsNotNull(l) => attrName(l).map(n => Compare(n, "isnotnull", null)).toSeq
    case _ => Nil
  }

  private def symbolOf(c: BinaryComparison): String = c match {
    case _: EqualTo => "="
    case _: GreaterThan => ">"
    case _: GreaterThanOrEqual => ">="
    case _: LessThan => "<"
    case _: LessThanOrEqual => "<="
    case _ => "?"
  }

  private def cmpValues(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long)     => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Double)   => Some(java.lang.Double.compare(x.toDouble, y))
    case (x: Double, y: Long)   => Some(java.lang.Double.compare(x, y.toDouble))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  /** Can a value in [min, max] satisfy `range <op> v`? None = unknown. */
  private def rangeMaySatisfy(min: Option[Any], max: Option[Any], op: String, v: Any): Boolean = {
    def cmp(x: Option[Any], y: Any): Option[Int] = x.flatMap(cmpValues(_, y))
    op match {
      case "="  => cmp(min, v).forall(_ <= 0) && cmp(max, v).forall(_ >= 0)
      case ">"  => cmp(max, v).forall(_ > 0)
      case ">=" => cmp(max, v).forall(_ >= 0)
      case "<"  => cmp(min, v).forall(_ < 0)
      case "<=" => cmp(min, v).forall(_ <= 0)
      case _    => true
    }
  }

  // ------------------------------------------------------ transforms

  /** Apply a partition transform to a literal comparison value (micros for
    * timestamps, days for dates — matching stats encoding). Returns None
    * when the transform can't be applied to this value.
    */
  private[tables] def transformValue(transform: String, v: Any, sourceType: DataType): Option[Any] = {
    def micros: Option[Long] = (v, sourceType) match {
      case (l: Long, _: TimestampType | _: TimestampNTZType) => Some(l)
      case _ => None
    }
    def utcDay(us: Long): Long = Math.floorDiv(us, 86400000000L)
    transform match {
      case "identity" => Some(v)
      case "years"  => micros.map(us => java.time.LocalDate.ofEpochDay(utcDay(us)).getYear.toLong)
      case "months" => micros.map { us =>
        val d = java.time.LocalDate.ofEpochDay(utcDay(us)); d.getYear * 12L + (d.getMonthValue - 1) }
      case "days"   => micros.map(utcDay)
      case "hours"  => micros.map(us => Math.floorDiv(us, 3600000000L))
      case t if t.startsWith("truncate[") =>
        val w = t.stripPrefix("truncate[").stripSuffix("]").toInt
        v match {
          case l: Long   => Some(Math.floorDiv(l, w.toLong) * w)
          case s: String => Some(s.take(w))
          case _ => None
        }
      case t if t.startsWith("bucket[") => None // handled separately (equality only)
      case _ => None
    }
  }

  /** Interval start (in the source domain) of partition value `tv` for a
    * floor-style transform — None when unknown. Used to tighten strict
    * upper bounds: `src < v` with v exactly on a partition boundary
    * excludes the whole boundary partition.
    */
  private[tables] def partitionIntervalStart(transform: String, tv: Any): Option[Any] =
    (transform, tv) match {
      case ("years", y: Long) =>
        Some(java.time.LocalDate.of(y.toInt, 1, 1).toEpochDay * 86400000000L)
      case ("months", m: Long) =>
        Some(java.time.LocalDate.of(Math.floorDiv(m, 12L).toInt,
          Math.floorMod(m, 12L).toInt + 1, 1).toEpochDay * 86400000000L)
      case ("days", d: Long)  => Some(d * 86400000000L)
      case ("hours", h: Long) => Some(h * 3600000000L)
      case (t, _) if t.startsWith("truncate[") => Some(tv)
      case _ => None
    }

  /** Monotonic transforms preserve order → safe for range ops. */
  private def isMonotonic(transform: String): Boolean =
    transform == "identity" || transform == "years" || transform == "months" ||
      transform == "days" || transform == "hours" || transform.startsWith("truncate[")

  /** Parse a stored partition-value string into the transform's domain. */
  private[tables] def parsePartitionValue(transform: String, raw: String, sourceType: DataType): Option[Any] = {
    if (raw == "__HIVE_DEFAULT_PARTITION__" || raw == "null") return None
    transform match {
      case "identity" => sourceType match {
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType => raw.toLongOption
        case _: FloatType | _: DoubleType => raw.toDoubleOption
        case _: BooleanType => Some(raw.toBoolean)
        case _ => Some(raw)
      }
      case "years" | "months" | "days" | "hours" => raw.toLongOption
      case t if t.startsWith("bucket[") => raw.toLongOption
      case t if t.startsWith("truncate[") => sourceType match {
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType => raw.toLongOption
        case _ => Some(raw)
      }
      case _ => None
    }
  }

  /** Number of buckets for a bucket transform, if any. */
  private def bucketN(transform: String): Option[Int] =
    if (transform.startsWith("bucket[")) Some(transform.stripPrefix("bucket[").stripSuffix("]").toInt)
    else None

  // ------------------------------------------------------ pruning

  /** Resolve the filter against the table schema so typed literals and
    * implicit casts are analyzable, then extract comparisons.
    */
  private def resolvedCondition(meta: TableMeta, filterSql: String, spark: SparkSession): Expression = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.schema)
    empty.filter(sqlExpr(filterSql)).queryExecution.analyzed
      .collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }
      .getOrElse(spark.sessionState.sqlParser.parseExpression(filterSql))
  }

  /** Keep only files that may contain rows matching `filterSql`. */
  def pruneFiles(meta: TableMeta, files: Seq[DataFile], filterSql: String, spark: SparkSession): Seq[DataFile] = {
    // a zero-row file can never satisfy any predicate — skip it without
    // consulting stats (empty files appear from CTAS-of-empty and from
    // writers whose partitions came up empty; record_count is exact for
    // every format the engine registers)
    val nonEmpty = files.filter(_.recordCount > 0)
    // predicates resolve against LOGICAL names; stats and partition specs
    // live in the PHYSICAL namespace (what the files actually contain)
    val compares = extract(resolvedCondition(meta, filterSql, spark))
      .map(c => c.copy(column = ColumnMapping.physicalOf(meta.schema, c.column)))
    if (compares.isEmpty) return nonEmpty
    val fieldTypes: Map[String, DataType] =
      meta.schema.fields.map(f => ColumnMapping.physicalName(f) -> f.dataType).toMap
    val specById = meta.specs.map(s => s.specId -> s).toMap

    nonEmpty.filter { f =>
      compares.forall { c =>
        statsMay(f, c, fieldTypes) && partitionMay(f, c, specById, fieldTypes)
      }
    }
  }

  /** File-stats check (reference README.md: pruning on NON-partitioned
    * tables via metadata min/max + null counts).
    */
  private def statsMay(f: DataFile, c: Compare, types: Map[String, DataType]): Boolean =
    f.stats.get(c.column) match {
      case Some(s) => c.op match {
        case "isnull"    => s.nullCount > 0
        case "isnotnull" => s.nullCount < f.recordCount
        case "in" => c.value.asInstanceOf[Seq[Any]]
          .exists(v => rangeMaySatisfy(s.min, s.max, "=", v))
        case op => rangeMaySatisfy(s.min, s.max, op, c.value)
      }
      case None => true
    }

  /** Partition-value check; spec-aware per file, so a table whose spec
    * evolved prunes old files with the old spec and new files with the
    * new (reference README.md "Partition evolution").
    */
  private def partitionMay(f: DataFile, c: Compare, specs: Map[Int, PartitionSpec],
      types: Map[String, DataType]): Boolean = {
    val spec = specs.get(f.specId)
    val fields = spec.map(_.fields.filter(_.source == c.column)).getOrElse(Nil)
    fields.forall { pf =>
      val srcType = types.getOrElse(c.column, StringType)
      f.partitionValues.get(pf.name) match {
        case None => true
        case Some(raw) =>
          parsePartitionValue(pf.transform, raw, srcType) match {
            case None => true
            case Some(pv) if c.op == "in" =>
              // keep if ANY candidate value could live in this partition
              c.value.asInstanceOf[Seq[Any]].exists { v =>
                transformValue(pf.transform, v, srcType) match {
                  case Some(tv) => rangeMaySatisfy(Some(pv), Some(pv), "=", tv)
                  case None => true
                }
              }
            case Some(_) if c.op == "isnull" || c.op == "isnotnull" => true
            case Some(pv) =>
              bucketN(pf.transform) match {
                case Some(n) =>
                  if (c.op == "=") GraftTransforms.bucketValue(c.value, n).forall(b => cmpValues(pv, b.toLong).forall(_ == 0))
                  else true
                case None =>
                  if (c.op == "=" || isMonotonic(pf.transform))
                    transformValue(pf.transform, c.value, srcType) match {
                      case Some(tv) =>
                        // a non-identity partition value is a FLOOR of the
                        // source, i.e. an interval: strict bounds relax to
                        // inclusive (the boundary partition may still hold
                        // matching rows) — EXCEPT `< v` where v sits exactly
                        // on the interval start: then the boundary partition
                        // holds only rows >= v and can be skipped
                        val effOp =
                          if (pf.transform == "identity") c.op
                          else c.op match {
                            case ">" => ">="
                            case "<" =>
                              val atBoundary = partitionIntervalStart(pf.transform, tv)
                                .exists(st => cmpValues(st, c.value).contains(0))
                              if (atBoundary) "<" else "<="
                            case o => o
                          }
                        rangeMaySatisfy(Some(pv), Some(pv), effOp, tv)
                      case None => true
                    }
                  else true
              }
          }
      }
    }
  }

  // ------------------------------------------------------ scan

  /** Build the DataFrame for a file set: read with the table schema (schema
    * evolution: columns missing in old files come back null), apply the
    * residual filter.
    */
  /** Helper row-position columns [[scan]] attaches when `rowMeta` is
    * requested: `_metadata` resolves only on a direct file source, so
    * they must be captured per scan BRANCH before any default-fill
    * union — callers must never derive them from `_metadata` themselves.
    */
  val RowMetaFile = "__gp_fp"
  val RowMetaPos = "__gp_pos"

  def scan(spark: SparkSession, meta: TableMeta, files: Seq[DataFile],
      filterSql: Option[String], rowMeta: Boolean = false): DataFrame = {
    val pruned = filterSql match {
      case Some(f) => pruneFiles(meta, files, f, spark)
      case None => files
    }
    val base =
      if (pruned.isEmpty) {
        val schema =
          if (!rowMeta) meta.schema
          else StructType(meta.schema.fields :+
            StructField(RowMetaFile, StringType) :+
            StructField(RowMetaPos, LongType))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      } else {
        // initial-defaults (ColumnDefaults): group the file set by WHICH
        // defaults apply (file predates the column's add boundary) and
        // fill only those groups — plan growth is bounded by default
        // EPOCHS (typically 2 scans), never per-file. The filter stays
        // ABOVE the fill for filled groups (a pushed-down predicate on a
        // defaulted column would test the raw nulls); unfilled groups
        // keep full pushdown. Manifest pruning is default-safe already:
        // pre-add files carry no stats for the column, so pruneFiles
        // passes them through.
        val defaults = meta.schema.fields.toSeq
          .flatMap(f => ColumnDefaults.of(f).map { case (v, since) => (f, v, since) })
        // one scan branch per (file format, applicable-defaults) group:
        // formats can't share a file-source relation, and plan growth
        // stays bounded by formats × default epochs (≤3 × typically 2).
        // Row-meta columns come from each branch's own source (file-source
        // `_metadata` vs the avro container walk) — ColumnMapping.readFiles
        // attaches them per branch, never after a union
        def readGroup(fs: Seq[DataFile], fmt: String): DataFrame =
          ColumnMapping.readFiles(spark, meta.schema, fs.map(_.path), fmt, rowMeta)
        if (defaults.isEmpty)
          pruned.groupBy(_.fileFormat).toSeq.sortBy(_._1)
            .map { case (fmt, fs) => readGroup(fs, fmt) }
            .reduce(_ unionByName _)
        else pruned.groupBy(df => (df.fileFormat, defaults.map(d => df.seq < d._3)))
          .toSeq.sortBy(_._1.toString).map { case ((fmt, flags), fs) =>
            defaults.zip(flags).foldLeft(readGroup(fs, fmt)) {
                case (d, ((fld, v, _), applies)) =>
                  if (!applies) d
                  else d.withColumn(fld.name,
                    coalesce(col(fld.name), lit(v).cast(fld.dataType)))
              }
          }.reduce(_ unionByName _)
      }
    filterSql.map(f => base.filter(sqlExpr(f))).getOrElse(base)
  }
}

/** Spark Column builders for partition transforms (write path). */
object GraftTransforms {
  import org.apache.spark.sql.functions._

  def transformColumn(f: PartitionField, schema: StructType): Column = f.transform match {
    case "identity" => col(f.source)
    case "years"    => year(col(f.source)).cast("long")
    case "months"   => (year(col(f.source)) * 12 + month(col(f.source)) - 1).cast("long")
    case "days"     => datediff(to_date(col(f.source)), to_date(lit("1970-01-01"))).cast("long")
    case "hours"    => floor(unix_micros(col(f.source).cast("timestamp")) / 3600000000L).cast("long")
    case t if t.startsWith("bucket[") =>
      val n = t.stripPrefix("bucket[").stripSuffix("]").toInt
      pmod(xxhash64(col(f.source)), lit(n.toLong))
    case t if t.startsWith("truncate[") =>
      val w = t.stripPrefix("truncate[").stripSuffix("]").toInt
      schema(f.source).dataType match {
        case StringType => substring(col(f.source), 1, w)
        case _ => (floor(col(f.source) / w) * w).cast("long")
      }
    case other => throw new IllegalArgumentException(s"unknown transform: $other")
  }

  /** Bucket value of a literal (must match xxhash64-based write path);
    * only long/string comparisons supported — None disables pruning.
    */
  def bucketValue(v: Any, n: Int): Option[Int] = None // conservative: never prune on bucket literals
}
