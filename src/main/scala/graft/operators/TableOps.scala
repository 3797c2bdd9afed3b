package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.sources.Tables
import graft.tables._
import java.nio.file.Files

/** SURVEY §2.2 as driver-contract queries: each entry stands up a fresh
  * GraftTable under a temp dir, exercises one workshop capability, and
  * returns an observable result. Outputs are restricted to values that are
  * deterministic functions of the input tables (row counts, snapshot
  * lineage, partition layouts — never wall-clock timestamps or
  * parallelism-dependent file counts), so every query is oracle-checkable
  * by plain SQL over the same parquet inputs; the full file-level semantics
  * are asserted in GraftTableSpec.
  *
  * Inputs are capped with ORDER BY o_orderkey LIMIT n (mirrored in the
  * oracle SQL) so the same rows are selected at every scale factor, and the
  * queries stay snapshot-lifecycle benchmarks rather than raw-IO benchmarks.
  */
object TableOps {

  private def tmp(): String =
    Files.createTempDirectory("graft_top").toString + "/t"

  /** Deterministic input cap: the n lowest-keyed orders. */
  private def orders(spark: SparkSession, sfDir: String, n: Int = 20000): DataFrame =
    Tables.orders(spark, sfDir).orderBy(col("o_orderkey")).limit(n)

  /** Oracle-side mirror of [[orders]]. */
  private def cappedSql(n: Int = 20000): String =
    s"(SELECT * FROM orders ORDER BY o_orderkey LIMIT $n)"

  /** Snapshot-lineage projection shared by t03/t05: wall-clock-free view
    * of the history table (made_current_at is asserted in specs instead).
    */
  private def lineage(t: GraftTable): DataFrame = {
    import t.spark.implicits._
    val m = t.meta
    val anc = m.currentAncestors
    m.snapshots.map(s => (s.id, s.parentId.getOrElse(-1L), s.operation,
        anc.contains(s.id), s.totalRecords))
      .toDF("snapshot_id", "parent_id", "operation", "is_current_ancestor", "total_records")
      .orderBy(col("snapshot_id"))
  }

  /** t01: CTAS import (reference README.md "Import: CTAS and in-place"). */
  def t01Ctas(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir))
    Seq((t.toDF().count(), t.meta.currentSnapshot.get.operation))
      .toDF("n_rows", "operation")
  }

  val t01Oracle: String =
    s"SELECT COUNT(*) AS n_rows, 'append' AS operation FROM ${cappedSql()}"

  /** t02: in-place migration — no data files rewritten. */
  def t02Migrate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.migrateInPlace(spark, tmp(), s"$sfDir/orders.parquet")
    val inPlace = t.currentFiles().nonEmpty &&
      t.currentFiles().forall(_.path.contains("orders.parquet"))
    Seq((t.toDF().count(), inPlace)).toDF("n_rows", "files_in_place")
  }

  val t02Oracle: String =
    "SELECT COUNT(*) AS n_rows, TRUE AS files_in_place FROM orders"

  /** t03: snapshot history table (lineage + cumulative record counts). */
  def t03History(spark: SparkSession, sfDir: String): DataFrame = {
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir, 5000))
    t.append(orders(spark, sfDir, 1000))
    t.append(orders(spark, sfDir, 500))
    lineage(t)
  }

  val t03Oracle: String =
    s"""WITH c AS (SELECT
       |  (SELECT COUNT(*) FROM ${cappedSql(5000)}) AS a,
       |  (SELECT COUNT(*) FROM ${cappedSql(1000)}) AS b,
       |  (SELECT COUNT(*) FROM ${cappedSql(500)}) AS d)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(-1 AS BIGINT) AS parent_id,
       |    'append' AS operation, TRUE AS is_current_ancestor, CAST(a AS BIGINT) AS total_records FROM c
       |  UNION ALL SELECT 2, 1, 'append', TRUE, a + b FROM c
       |  UNION ALL SELECT 3, 2, 'append', TRUE, a + b + d FROM c)
       |ORDER BY snapshot_id""".stripMargin

  /** t04: time travel (FOR SYSTEM_TIME AS OF). */
  def t04TimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir, 5000))
    val s1 = t.meta.currentSnapshotId.get
    t.append(orders(spark, sfDir, 1000))
    val s2 = t.meta.currentSnapshotId.get
    Seq((1L, t.asOf(s1).count()), (2L, t.asOf(s2).count()))
      .toDF("snapshot_seq", "n_rows")
  }

  val t04Oracle: String =
    s"""WITH c AS (SELECT
       |  (SELECT COUNT(*) FROM ${cappedSql(5000)}) AS a,
       |  (SELECT COUNT(*) FROM ${cappedSql(1000)}) AS b)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS snapshot_seq, CAST(a AS BIGINT) AS n_rows FROM c
       |  UNION ALL SELECT 2, a + b FROM c)
       |ORDER BY snapshot_seq""".stripMargin

  /** t05: rollback (EXECUTE rollback) — abandoned snapshot leaves the
    * current-ancestor chain; the rollback commit restores the old count.
    */
  def t05Rollback(spark: SparkSession, sfDir: String): DataFrame = {
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir, 5000))
    val s1 = t.meta.currentSnapshotId.get
    t.append(orders(spark, sfDir, 1000))
    t.rollback(s1)
    lineage(t)
  }

  val t05Oracle: String =
    s"""WITH c AS (SELECT
       |  (SELECT COUNT(*) FROM ${cappedSql(5000)}) AS a,
       |  (SELECT COUNT(*) FROM ${cappedSql(1000)}) AS b)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(-1 AS BIGINT) AS parent_id,
       |    'append' AS operation, TRUE AS is_current_ancestor, CAST(a AS BIGINT) AS total_records FROM c
       |  UNION ALL SELECT 2, 1, 'append', FALSE, a + b FROM c
       |  UNION ALL SELECT 3, 1, 'rollback', TRUE, a FROM c)
       |ORDER BY snapshot_id""".stripMargin

  /** t06: expire_snapshots + orphan file cleanup. */
  def t06Expire(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir, 5000))
    t.truncate()
    t.append(orders(spark, sfDir, 1000))
    val before = t.meta.snapshots.size.toLong
    t.expireSnapshots(System.currentTimeMillis() + 1000)
    Seq((before, t.meta.snapshots.size.toLong, t.toDF().count()))
      .toDF("snapshots_before", "snapshots_after", "n_rows")
  }

  val t06Oracle: String =
    s"""SELECT CAST(3 AS BIGINT) AS snapshots_before, CAST(1 AS BIGINT) AS snapshots_after,
       |  (SELECT COUNT(*) FROM ${cappedSql(1000)}) AS n_rows""".stripMargin

  /** t07: MERGE INTO (reference update_iceberg_v2_examples.sql): the 100
    * lowest-keyed orders get updated, 50 shifted copies get inserted.
    */
  def t07Merge(spark: SparkSession, sfDir: String): DataFrame = {
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir))
    val source = orders(spark, sfDir, 100).withColumn("o_orderpriority", lit("0-MERGED"))
      .unionAll(orders(spark, sfDir, 50)
        .withColumn("o_orderkey", col("o_orderkey") + 900000000L)
        .withColumn("o_orderpriority", lit("0-INSERTED")))
    t.mergeInto(source, Seq("o_orderkey"))
    t.toDF().groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  val t07Oracle: String =
    s"""WITH base AS (SELECT * FROM ${cappedSql()}),
       |u AS (SELECT o_orderkey FROM ${cappedSql(100)}),
       |merged AS (
       |  SELECT CASE WHEN b.o_orderkey IN (SELECT o_orderkey FROM u)
       |    THEN '0-MERGED' ELSE b.o_orderpriority END AS o_orderpriority FROM base b
       |  UNION ALL
       |  SELECT '0-INSERTED' AS o_orderpriority FROM ${cappedSql(50)})
       |SELECT o_orderpriority, COUNT(*) AS n FROM merged
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** t08: copy-on-write DELETE / UPDATE. */
  def t08DeleteUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir))
    t.delete("o_orderstatus = 'O'")
    t.update("o_totalprice > 300000", Map("o_orderpriority" -> "'0-HIGH-VALUE'"))
    t.toDF().groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  val t08Oracle: String =
    s"""SELECT o_orderstatus,
       |  CASE WHEN o_totalprice > 300000 THEN '0-HIGH-VALUE' ELSE o_orderpriority END AS o_orderpriority,
       |  COUNT(*) AS n
       |FROM ${cappedSql()} WHERE o_orderstatus <> 'O'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** t09: identity partitioning (PARTITIONED BY) — hash write distribution
    * puts each partition value in exactly one task, so one file per value.
    */
  def t09IdentityPartition(spark: SparkSession, sfDir: String): DataFrame = {
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir),
      Seq(PartitionField("o_orderstatus", "identity", "status")))
    t.filesDf.groupBy(col("partition"))
      .agg(count(lit(1)).as("n_files"), sum(col("record_count")).as("n_rows"))
      .orderBy(col("partition"))
  }

  val t09Oracle: String =
    s"""SELECT 'status=' || o_orderstatus AS partition, CAST(1 AS BIGINT) AS n_files,
       |  COUNT(*) AS n_rows
       |FROM ${cappedSql()} GROUP BY o_orderstatus ORDER BY 1""".stripMargin

  /** t10: transform partitioning (years(ts)) + partition pruning — the
    * workshop's "1 file of 238 scanned" observability.
    */
  def t10TransformPartition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir),
      Seq(PartitionField("o_orderdate", "years", "order_year")))
    val filter = "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'"
    val planned = t.plannedFiles(filter)
    Seq((t.currentFiles().size.toLong, planned.size.toLong, t.toDF(Some(filter)).count()))
      .toDF("total_files", "scanned_files", "n_rows")
  }

  val t10Oracle: String =
    s"""WITH base AS (SELECT * FROM ${cappedSql()})
       |SELECT CAST((SELECT COUNT(DISTINCT year(o_orderdate)) FROM base) AS BIGINT) AS total_files,
       |  CAST(1 AS BIGINT) AS scanned_files,
       |  (SELECT COUNT(*) FROM base
       |   WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01') AS n_rows""".stripMargin

  /** t11: partition evolution — old files keep the old spec, new writes use
    * the new spec, one scan spans both.
    */
  def t11PartitionEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val base = orders(spark, sfDir)
    val t = GraftTable.createAs(spark, tmp(), base.filter(col("o_orderkey") % 2 === 0))
    t.setPartitionSpec(Seq(PartitionField("o_orderdate", "years", "order_year")))
    t.append(base.filter(col("o_orderkey") % 2 === 1))
    t.filesDf.groupBy(col("spec_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("record_count")).as("n_rows"))
      .orderBy(col("spec_id"))
  }

  val t11Oracle: String =
    s"""WITH base AS (SELECT * FROM ${cappedSql()}),
       |evens AS (SELECT * FROM base WHERE o_orderkey % 2 = 0),
       |odds  AS (SELECT * FROM base WHERE o_orderkey % 2 = 1)
       |SELECT * FROM (
       |  SELECT CAST(0 AS INT) AS spec_id, CAST(1 AS BIGINT) AS n_files,
       |    (SELECT COUNT(*) FROM evens) AS n_rows
       |  UNION ALL
       |  SELECT 1, (SELECT COUNT(DISTINCT year(o_orderdate)) FROM odds),
       |    (SELECT COUNT(*) FROM odds))
       |ORDER BY spec_id""".stripMargin

  /** t12: min/max file skipping on a NON-partitioned table (reference
    * "Predicate pushdown and file pruning without partitioning"). The
    * exact surviving-file count depends on range-sampling, so the oracle
    * checks that pruning skipped at least one file and the scan is exact.
    */
  def t12StatsPruning(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(),
      orders(spark, sfDir).repartitionByRange(8, col("o_orderkey")))
    val filter = "o_orderkey <= 1000"
    val planned = t.plannedFiles(filter)
    Seq((t.currentFiles().size.toLong, planned.size < t.currentFiles().size,
        t.toDF(Some(filter)).count()))
      .toDF("total_files", "pruned", "n_rows")
  }

  val t12Oracle: String =
    s"""SELECT CAST(8 AS BIGINT) AS total_files, TRUE AS pruned,
       |  (SELECT COUNT(*) FROM ${cappedSql()} WHERE o_orderkey <= 1000) AS n_rows""".stripMargin

  /** t13: rewrite_data_files bin-pack compaction: 16 small files → 1. */
  def t13Compaction(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir).repartition(16))
    val before = t.currentFiles().size.toLong
    t.compact(64L << 20)
    Seq((before, t.currentFiles().size.toLong, t.toDF().count(),
        t.meta.currentSnapshot.get.operation))
      .toDF("files_before", "files_after", "n_rows", "operation")
  }

  val t13Oracle: String =
    s"""SELECT CAST(16 AS BIGINT) AS files_before, CAST(1 AS BIGINT) AS files_after,
       |  COUNT(*) AS n_rows, 'replace' AS operation FROM ${cappedSql()}""".stripMargin

  /** t14: schema evolution (ADD COLUMN) + metadata retention property. */
  def t14SchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir, 5000),
      properties = Map(TableFormat.PrevVersionsMax -> "2",
        TableFormat.DeleteAfterCommit -> "true"))
    t.addColumn("quality_score", DoubleType)
    t.append(t.toDF().limit(100).withColumn("quality_score", lit(0.9)))
    Seq((t.toDF().filter(col("quality_score").isNull).count(),
        t.toDF().filter(col("quality_score").isNotNull).count()))
      .toDF("rows_null_newcol", "rows_with_newcol")
  }

  val t14Oracle: String =
    s"""SELECT (SELECT COUNT(*) FROM ${cappedSql(5000)}) AS rows_null_newcol,
       |  CAST(100 AS BIGINT) AS rows_with_newcol""".stripMargin

  /** t15: merge-on-read delete — metadata-only delete commit (file set
    * unchanged), correct reads, then materialization (Iceberg v2 delete-
    * file semantics).
    */
  def t15MergeOnRead(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir).repartition(8))
    val filesBefore = t.currentFiles().size.toLong
    t.deleteMergeOnRead("o_orderstatus = 'O'")
    val morMetadataOnly = t.currentFiles().size.toLong == filesBefore
    val rowsAfterMor = t.toDF().count()
    t.materializeDeletes()
    Seq((filesBefore, morMetadataOnly, rowsAfterMor, t.toDF().count(),
        t.currentDeletes().size.toLong))
      .toDF("files_before", "mor_metadata_only", "rows_after_mor", "rows_after_rewrite",
        "remaining_predicates")
  }

  val t15Oracle: String =
    s"""WITH base AS (SELECT * FROM ${cappedSql()})
       |SELECT CAST(8 AS BIGINT) AS files_before, TRUE AS mor_metadata_only,
       |  (SELECT COUNT(*) FROM base WHERE o_orderstatus <> 'O') AS rows_after_mor,
       |  (SELECT COUNT(*) FROM base WHERE o_orderstatus <> 'O') AS rows_after_rewrite,
       |  CAST(0 AS BIGINT) AS remaining_predicates""".stripMargin

  /** t16: the workshop's SQL surface end-to-end through the GraftSql
    * facade — CTAS, DELETE, INSERT INTO ... SELECT, FOR SYSTEM_VERSION AS
    * OF, DESCRIBE HISTORY — one statement-driven lifecycle, counts only.
    */
  def t16SqlFacade(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.sources.Catalog.registerAll(spark, sfDir)
    val g = new graft.sources.GraftSql(spark,
      Files.createTempDirectory("graft_sqlf").toString)
    g.sql(s"CREATE TABLE f_orders AS SELECT * FROM ${cappedSql()} AS __base")
    g.sql("DELETE FROM f_orders WHERE o_orderstatus = 'P'")
    g.sql(s"INSERT INTO f_orders SELECT o_orderkey + 900000000, o_custkey, " +
      s"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM ${cappedSql(100)} AS __ins")
    val nV1 = g.sql("SELECT COUNT(*) AS n FROM f_orders FOR SYSTEM_VERSION AS OF 1").head().getLong(0)
    val nCur = g.sql("SELECT COUNT(*) AS n FROM f_orders").head().getLong(0)
    val nSnaps = g.sql("DESCRIBE HISTORY f_orders").count()
    Seq((nV1, nCur, nSnaps)).toDF("n_v1", "n_current", "n_snapshots")
  }

  val t16Oracle: String =
    s"""WITH base AS (SELECT * FROM ${cappedSql()})
       |SELECT (SELECT COUNT(*) FROM base) AS n_v1,
       |  (SELECT COUNT(*) FROM base WHERE o_orderstatus <> 'P') + 100 AS n_current,
       |  CAST(3 AS BIGINT) AS n_snapshots""".stripMargin

  /** t29: the airlines.sql CSV staging flow statement-for-statement
    * through GraftSql — DROP/CREATE DATABASE, CREATE EXTERNAL TABLE over a
    * delimited TEXTFILE location with a header-skip property (reference
    * sql/airlines.sql:1-46), CTAS into parquet, then an aggregate over the
    * staged table. The CSV is derived deterministically from `orders` at a
    * path keyed by the sf name so the static DuckDB oracle can read the
    * very same files via read_csv.
    */
  def t29CsvExternal(spark: SparkSession, sfDir: String): DataFrame = {
    graft.sources.Catalog.registerAll(spark, sfDir)
    val stage = s"/tmp/graft_csv_stage/${new java.io.File(sfDir).getName}"
    t29StagedPath = stage
    spark.sql(
      s"""SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
         |  o_orderpriority FROM ${cappedSql(5000)} AS __c""".stripMargin)
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$stage/orders")
    val g = new graft.sources.GraftSql(spark,
      Files.createTempDirectory("graft_csvext").toString)
    g.setVar("bucket", stage)
    g.sql("DROP DATABASE IF EXISTS staging CASCADE")
    g.sql("CREATE DATABASE staging")
    g.sql("""CREATE EXTERNAL TABLE staging.orders_csv (
            |  o_orderkey BIGINT,
            |  o_custkey BIGINT,
            |  o_totalprice DECIMAL(12,2),
            |  o_orderpriority STRING
            |)
            |ROW FORMAT DELIMITED FIELDS TERMINATED BY ',' LINES TERMINATED BY '\n'
            |STORED AS TEXTFILE
            |LOCATION '${bucket}/orders/'
            |TBLPROPERTIES("skip.header.line.count"="1")""".stripMargin)
    g.sql("CREATE EXTERNAL TABLE staging.orders_parquet STORED AS PARQUET AS SELECT * FROM staging.orders_csv")
    g.sql("""SELECT o_orderpriority, COUNT(*) AS n,
            |  CAST(SUM(o_totalprice) AS DOUBLE) AS total
            |FROM staging.orders_parquet
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** The stage dir of the LAST t29 run in this JVM. Oracle thunks are
    * evaluated at dump time (Verify runs every query, THEN dumps
    * [[SparkEntry.oracleSql]]), so binding the path through this var —
    * instead of a literal — makes the gate scale-factor-agnostic: the
    * oracle always reads exactly the files the gate just staged, at
    * sf0.001/0.01/0.1 alike (VERDICT r16 "what's wrong" #2). The sf0.01
    * initial value keeps the thunk total for enumeration-only contexts
    * (InitSmokeSpec forces thunks without running queries).
    */
  @volatile private var t29StagedPath: String = "/tmp/graft_csv_stage/sf0.01"

  /** Reads the gate's own staged CSV (byte-identical decimal rendering —
    * re-deriving the double→DECIMAL(12,2) cast in DuckDB would race
    * Spark's HALF_UP rounding on representable half-cent ties).
    */
  def t29Oracle: String =
    s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(o_totalprice) AS DOUBLE) AS total
      |FROM read_csv('$t29StagedPath/orders/*.csv', header=true,
      |  columns={'o_orderkey':'BIGINT','o_custkey':'BIGINT',
      |           'o_totalprice':'DECIMAL(12,2)','o_orderpriority':'VARCHAR'})
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Reusable staged fixture: `build` runs once per (sfDir, version),
    * marker-gated, exactly the m09 reuse shape — repeated gate/bench runs
    * pay the read, not the rewrite.
    */
  private def stagedFixture(dir: java.io.File, key: String)(build: => Unit): Unit = {
    val marker = new java.io.File(dir, "_GRAFT_FIXTURE")
    val fresh = !(marker.exists() &&
      scala.util.Try(new String(java.nio.file.Files.readAllBytes(marker.toPath)))
        .toOption.contains(key))
    if (fresh) {
      if (dir.exists()) {
        def wipe(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(wipe)); f.delete(); ()
        }
        wipe(dir)
      }
      dir.mkdirs()
      build
      java.nio.file.Files.write(marker.toPath, key.getBytes); ()
    }
  }

  /** t53: AVRO ingestion — Spark's own `avro` format is an external
    * module this environment doesn't ship, so an Avro corpus enters the
    * engine through [[graft.sources.GraftAvro]] riding the from-scratch
    * [[graft.formats.Avro]] codec (the same one the Iceberg manifest
    * interop referees against Apache Avro). Fixture: a deterministic
    * orders subset widened to exercise the whole type envelope — long,
    * string, boolean, a NULLABLE string (the [null, T] union), an array
    * column, and raw doubles — written DISTRIBUTED (one container per
    * partition chunk, executors write), read back through the
    * one-root-path `binaryFile` listing + parallel per-file decode.
    * Aggregates stick to order-independent exactness: counts, long sums,
    * double min/max (never double sums — IEEE order drift would poison
    * the oracle hash).
    */
  def t53AvroExternal(spark: SparkSession, sfDir: String): DataFrame = {
    val stage = new java.io.File(
      s"/tmp/graft_avro_stage/${new java.io.File(sfDir).getName}")
    def src = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(
        col("o_orderkey"),
        col("o_orderpriority"),
        col("o_custkey"),
        col("o_totalprice"),
        (col("o_orderkey") % 2 === 0).as("even"),
        when(col("o_orderkey") % 2 === 0, col("o_orderstatus")).as("status_even"),
        split(col("o_orderpriority"), "-").as("prio_parts"),
        // the Avro LOGICAL-TYPE envelope (r14): date built by tz-free day
        // arithmetic (both engines agree bit-for-bit), the parquet
        // timestamp column as-is (UTC micros through `timestamp-micros`),
        // the price as decimal(18,2) unscaled bytes, and a string-keyed map
        date_add(to_date(lit("1992-01-01")),
          (col("o_orderkey") % 2557).cast("int")).as("o_date"),
        col("o_orderdate").as("o_ts"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("o_dec"),
        map(lit("cust"), col("o_custkey"), lit("ord"), col("o_orderkey")).as("o_tags"))
    stagedFixture(stage, s"$sfDir:avro:v2-logical") {
      val files = graft.sources.GraftAvro.write(
        src.repartition(8), stage.getAbsolutePath)
      require(files > 0, "avro stage produced no files")
    }
    val back = graft.sources.GraftAvro.read(spark, stage.getAbsolutePath)
    back.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_custkey")).as("sum_cust"),
        count(col("status_even")).as("n_even_status"),
        sum(size(col("prio_parts")).cast("long")).as("n_parts"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        // rendered as strings: pandas materializes a Spark DATE as
        // datetime.date but a DuckDB DATE as datetime64 — same value,
        // different dtype, and the driver's compare is dtype-sensitive
        date_format(min(col("o_date")), "yyyy-MM-dd").as("min_date"),
        date_format(max(col("o_date")), "yyyy-MM-dd").as("max_date"),
        min(col("o_ts")).as("min_ts"),
        max(col("o_ts")).as("max_ts"),
        sum(col("o_dec")).cast("double").as("sum_dec"),
        sum(element_at(col("o_tags"), lit("cust"))).as("sum_tag_cust"))
      .orderBy(col("o_orderpriority"))
  }

  val t53Oracle: String =
    """WITH src AS (
      |  SELECT o_orderkey, o_orderpriority, o_custkey, o_totalprice,
      |    (o_orderkey % 2 = 0) AS even,
      |    CASE WHEN o_orderkey % 2 = 0 THEN o_orderstatus END AS status_even,
      |    string_split(o_orderpriority, '-') AS prio_parts,
      |    DATE '1992-01-01' + CAST(o_orderkey % 2557 AS INT) AS o_date,
      |    o_orderdate AS o_ts,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS o_dec
      |  FROM orders WHERE o_orderkey % 3 = 0)
      |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
      |  CAST(COUNT(status_even) AS BIGINT) AS n_even_status,
      |  CAST(SUM(len(prio_parts)) AS BIGINT) AS n_parts,
      |  MIN(o_totalprice) AS min_price,
      |  MAX(o_totalprice) AS max_price,
      |  strftime(MIN(o_date), '%Y-%m-%d') AS min_date,
      |  strftime(MAX(o_date), '%Y-%m-%d') AS max_date,
      |  MIN(o_ts) AS min_ts,
      |  MAX(o_ts) AS max_ts,
      |  CAST(SUM(o_dec) AS DOUBLE) AS sum_dec,
      |  CAST(SUM(o_custkey) AS BIGINT) AS sum_tag_cust
      |FROM src GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** t54: ORC ingestion — the third columnar lake format, through
    * Spark's BUILT-IN orc source (unlike avro, the jars ship). The gate
    * pins the full external-table flow: stage a deterministic lineitem
    * subset as ORC (distributed write, marker-cached), read it back with
    * a filter + projection that must reach the ORC reader as
    * PushedFilters/ReadSchema (plan-pinned in TableOpsSpec), aggregate
    * with order-independent exactness.
    */
  def t54OrcExternal(spark: SparkSession, sfDir: String): DataFrame = {
    val stage = new java.io.File(
      s"/tmp/graft_orc_stage/${new java.io.File(sfDir).getName}")
    stagedFixture(stage, s"$sfDir:orc:v1") {
      Tables.lineitem(spark, sfDir)
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_linestatus"), col("l_extendedprice"))
        .repartition(4)
        .write.mode("overwrite").orc(stage.getAbsolutePath + "/lineitem")
    }
    spark.read.orc(stage.getAbsolutePath + "/lineitem")
      .filter(col("l_returnflag") =!= "R")
      .groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_orderkey")).as("sum_okey"),
        sum(col("l_linenumber").cast("long")).as("sum_line"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy(col("l_linestatus"))
  }

  val t54Oracle: String =
    """SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
      |  CAST(SUM(l_linenumber) AS BIGINT) AS sum_line,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price
      |FROM lineitem
      |WHERE l_orderkey % 5 = 0 AND l_returnflag <> 'R'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  val entries: Map[String, graft.Gate.Entry] = Map(
    "t16_sql_facade"           -> graft.Gate(t16SqlFacade _, t16Oracle),
    "t29_csv_external"         -> graft.Gate(t29CsvExternal _, t29Oracle),
    "t53_avro_external"        -> graft.Gate(t53AvroExternal _, t53Oracle),
    "t54_orc_external"         -> graft.Gate(t54OrcExternal _, t54Oracle),
    "t15_merge_on_read"        -> graft.Gate(t15MergeOnRead _, t15Oracle),
    "t01_ctas_import"          -> graft.Gate(t01Ctas _, t01Oracle),
    "t02_inplace_migrate"      -> graft.Gate(t02Migrate _, t02Oracle),
    "t03_snapshots_history"    -> graft.Gate(t03History _, t03Oracle),
    "t04_time_travel"          -> graft.Gate(t04TimeTravel _, t04Oracle),
    "t05_rollback"             -> graft.Gate(t05Rollback _, t05Oracle),
    "t06_expire_snapshots"     -> graft.Gate(t06Expire _, t06Oracle),
    "t07_merge_into"           -> graft.Gate(t07Merge _, t07Oracle),
    "t08_delete_update"        -> graft.Gate(t08DeleteUpdate _, t08Oracle),
    "t09_identity_partitioning" -> graft.Gate(t09IdentityPartition _, t09Oracle),
    "t10_transform_partitioning" -> graft.Gate(t10TransformPartition _, t10Oracle),
    "t11_partition_evolution"  -> graft.Gate(t11PartitionEvolution _, t11Oracle),
    "t12_file_pruning_stats"   -> graft.Gate(t12StatsPruning _, t12Oracle),
    "t13_compaction"           -> graft.Gate(t13Compaction _, t13Oracle),
    "t14_schema_evolution"     -> graft.Gate(t14SchemaEvolution _, t14Oracle),
  )
}
