package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Settings chosen for the driver's local[32] harness but expressed so the
  * same code scales to a multi-executor cluster: AQE owns runtime shuffle
  * sizing (coalescing + skew splitting), broadcast threshold covers the
  * dimension tables, and parquet pushdown/pruning stay on.
  */
object GraftSession {

  /** Apply graft's tuning to an arbitrary builder (used by Verify/Bench
    * which pick their own master/parallelism). `SPARK_GRAFT_CONF`
    * (semicolon-separated k=v pairs) overrides individual settings for
    * A/B profiling runs without a rebuild.
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder = {
    val base = tuneBase(b)
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).filter(_.contains('='))
      .foldLeft(base) { (bb, kv) =>
        // split at the FIRST '=' only: conf values legitimately contain
        // '=' (e.g. -Dfoo=bar in extraJavaOptions)
        val Array(k, v) = kv.split("=", 2).map(_.trim)
        bb.config(k, v)
      }
  }

  private def tuneBase(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    // INT64 timestamps: INT96 footers carry no trustworthy min/max, so
    // stats-pruning (and in-place migration of graft-written dirs) would
    // silently lose timestamp bounds — the reference's own Hive
    // limitation (limitations.md #3)
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // Parquet field-id resolution (SPARK-38094): inert for schemas without
    // `parquet.field.id` metadata (all graft-native tables — reads stay
    // name-based), but lets tables imported from REAL Iceberg metadata
    // (IcebergImport, no name-mapping → files carry ids) resolve renamed
    // columns by field id exactly as an Iceberg reader would, instead of
    // silently reading NULLs by name. Writes stamp ids whenever the
    // schema carries them so graft's own appends to such a table stay
    // id-resolvable. `ignoreMissing` stays false: an id-less file under
    // an id-carrying schema is a LOUD error, never silent nulls.
    .config("spark.sql.parquet.fieldId.read.enabled", "true")
    .config("spark.sql.parquet.fieldId.write.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
    .config("spark.sql.shuffle.partitions", "32")
    // AQE stringifies the plan on every update; at 10^2+ scan branches an
    // unbounded plan string is a driver OOM. 4M chars bounds the DEBUG
    // artifact without touching planning itself.
    .config("spark.sql.maxPlanStringLength", (4 << 20).toString)
    // CBO is off by default in Spark because catalog stats are usually
    // absent or stale; graft serves LIVE per-snapshot stats (rowCount,
    // footer min/max/nullCount, sketch NDV) on every read, so estimation
    // always has current inputs. Relations without rowCount (plain
    // parquet reads) keep size-only estimation unchanged.
    .config("spark.sql.cbo.enabled", "true")
    .config("spark.sql.cbo.joinReorder.enabled", "true")
    .config("spark.ui.enabled", "false")
    // Long-lived-session posture: the app/SQL status stores retain
    // per-execution plan strings and per-stage task metrics IN DRIVER
    // HEAP even with the UI off (measured r18: ~2 MB/gate forced-GC
    // retained across a 72-gate sf100 session, linear in executions
    // until the default 1000-execution cap). A continuously-running
    // lake service executes unbounded queries; bound the stores to a
    // debugging-useful tail instead of letting them pin ~GBs at the
    // 4M-char plan-string ceiling. Cluster history lives in the event
    // log, not driver heap.
    .config("spark.sql.ui.retainedExecutions", "50")
    .config("spark.ui.retainedJobs", "100")
    .config("spark.ui.retainedStages", "100")
    .config("spark.ui.retainedTasks", "10000")
    // ObjectHashAggregate falls back to SORT-BASED aggregation past this
    // many distinct keys per task (default 128) — the fallback sorts the
    // remaining INPUT stream, which for graft's bounded-state aggregates
    // (TopKSimPairs: k entries/key; CappedCollectLongs: cap ids/key)
    // reintroduces the exact unbounded pair-sort they exist to avoid
    // (s09's 8×10^10-pair ENOSPC at sf100). With O(small) state per key,
    // a million in-map keys is ~tens of MB per task — keep hashing.
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 20).toString)

  /** Standalone session (tests, ad-hoc mains). */
  def local(threads: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$threads]").appName("graft"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
