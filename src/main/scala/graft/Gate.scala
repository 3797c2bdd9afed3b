package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness gate: the Spark query plus its DuckDB oracle SQL,
  * held BY NAME. Oracle SQL that derives from a shipped resource (the
  * BPE merge table, the bigram-LM table, the subword vocab) must not be
  * forced while gate maps are merely enumerated: a malformed resource
  * should fail exactly the gates that consume it — never the module's
  * `<clinit>`, which would erase every gate's signal at once (the r15
  * failure mode). [[SparkEntry.oracleSql]] evaluates the thunks one gate
  * at a time and degrades a failing oracle to the driver's rows-only
  * check instead of crashing the dump.
  */
object Gate {
  type Fn = (SparkSession, String) => DataFrame

  /** (query, oracle-SQL thunk) — the module gate-map value type. */
  type Entry = (Fn, () => String)

  def apply(fn: Fn, oracle: => String): Entry = (fn, () => oracle)
}
