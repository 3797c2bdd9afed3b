package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Loaders for the driver's test tables (TPC-H-ish star schema + events /
  * documents / embeddings). One parquet file per table under `sfDir`.
  *
  * Loads go through [[Pq.readStable]]: plain parquet reads (full pushdown
  * and column-pruning freedom — no row or result caching), but the footer
  * schema is inferred once per (path, mtime) instead of on every load, so
  * repeated table loads across gates skip the per-read schema-inference
  * Spark job (r20 profiling: `SchemaMergeUtils.mergeSchemasInParallel` on
  * the driver's hot path of nearly every gate).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else Pq.readStable(spark, s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across data drops:
    * parquet TIMESTAMP(NANOS) (unmapped by Spark 4 — read as a nanos long
    * under the legacy conf and truncated to micros here; truncation
    * composes, so floor-style derivatives match full-nanos engines) and
    * parquet timestamp[us] without the UTC flag (read as TIMESTAMP_NTZ —
    * under this project's fixed UTC session the wall clock IS the UTC
    * instant, so the cast to TimestampType is value-preserving).
    *
    * The branch is driven by the file's footer schema, never assumed, and
    * an unrecognized encoding fails loudly — a mis-decoded timeline that
    * collapses to ~1970 would otherwise poison every window/join result
    * downstream while keeping row counts plausible (VERDICT r9).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // the legacy conf only affects footer→catalyst conversion of
    // TIMESTAMP(NANOS) columns; restore the prior value when this footer
    // has none, so the loader stops mutating session conf for the common
    // (non-nanos) drops (VERDICT r10 nit). Once ANY nanos corpus has
    // loaded in this JVM the conf stays set for good — its queries
    // re-convert the footer at execution, and a later non-nanos load
    // restoring the conf out from under them would break a
    // previously-working frame (the restore is scoped to the probe lock,
    // concurrent loads serialize on the cheap footer read only).
    // footer-probe schema cached per (path, mtime) like every corpus load
    // (Pq.readStable discipline): a cache hit means this exact file was
    // probed before in this JVM — if it was a nanos corpus the legacy conf
    // is already set for good (see below), so replaying the probed schema
    // is conf-correct without re-entering the lock.
    val eventsPath = s"$d/events.parquet"
    val mt = Pq.mtime(s, eventsPath)
    val cachedRaw = rawEventsSchema.get(eventsPath)
    val raw = if (cachedRaw != null && cachedRaw._1 == mt)
      s.read.schema(cachedRaw._2).parquet(eventsPath)
    else nanosProbeLock.synchronized {
      val prevNanos = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val r = s.read.parquet(eventsPath)
      if (r.schema("ts").dataType == LongType) nanosCorpusSeen = true
      else if (!nanosCorpusSeen) prevNanos match {
        case Some(v) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None    => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
      rawEventsSchema.put(eventsPath, (mt, r.schema))
      r
    }
    val normalized = raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet encoding $other — add a normalization branch")
    }
    // Once per corpus CONTENT per JVM: the LongType branch ASSUMES nanos —
    // a future micros-as-long drop would divide by 1000 and silently put
    // every BATCH query in ~1970 (streaming stagers have their own
    // guard). One tiny aggregate closes that hole; empty tables pass
    // (nothing to mis-decode). Two subtleties (ADVICE/VERDICT r10): the
    // key carries the file mtime so a same-dir data swap mid-JVM
    // re-validates, and the key is recorded only AFTER the require
    // passes — a failed validation must stay loud on every retry, not
    // just the first.
    val key = s"$d@${eventsMtime(s, d)}"
    if (!timelineChecked.contains(key)) {
      val row = normalized.agg(min(year(col("ts"))), max(year(col("ts")))).head()
      if (!row.isNullAt(0)) {
        val (lo, hi) = (row.getInt(0), row.getInt(1))
        require(lo >= 2000 && hi <= 2100,
          s"events timeline insane: year range [$lo, $hi] outside [2000, 2100] — ts mis-decoded?")
      }
      timelineChecked.add(key)
    }
    normalized
  }

  /** Latest modification time under `d`/events.parquet (file or directory
    * of part files) — the guard's swap-detection key. Unreadable paths
    * key as 0 and let the read itself produce the real error.
    */
  private def eventsMtime(s: SparkSession, d: String): Long =
    scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).map(_.getModificationTime).foldLeft(st.getModificationTime)(_ max _)
      else st.getModificationTime
    }.getOrElse(0L)

  private val timelineChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val nanosProbeLock = new Object
  @volatile private var nanosCorpusSeen = false
  private val rawEventsSchema =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, StructType)]()

  /** Timeline sanity guard: one cheap aggregate proving the loaded events
    * span plausible years. Gate stagers call this so a future encoding
    * drift fails loudly at staging instead of silently degenerating (the
    * r9 failure mode: micros divided as if nanos → every ts ≈ 1970 →
    * windows/sessions/joins all wrong with healthy-looking row counts).
    */
  def assertSaneTimeline(events: DataFrame): Unit = {
    val row = events.agg(min(year(col("ts"))), max(year(col("ts")))).head()
    require(!row.isNullAt(0) && !row.isNullAt(1),
      "events table is empty (or ts all NULL) — cannot validate its timeline")
    val (lo, hi) = (row.getInt(0), row.getInt(1))
    require(lo >= 2000 && hi <= 2100,
      s"events timeline insane: year range [$lo, $hi] outside [2000, 2100] — ts mis-decoded?")
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** CSV import with an explicit schema (the workshop's staging→columnar
    * path; cf. reference sql/airlines.sql:1-55). Header row skipped, types
    * enforced at read — no inference pass over 100 TB.
    */
  def importCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)
}
