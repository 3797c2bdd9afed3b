package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Eager DISK_ONLY local checkpoints for iterative operators.
  *
  * `localCheckpoint(true)` defaults to a memory-backed storage level, and
  * checkpoint blocks count as STORAGE memory: under the unified memory
  * manager, execution can never evict storage below
  * `spark.memory.storageFraction`, so a converged round's (now garbage)
  * blocks keep squatting in the protected half of the heap until the
  * async ContextCleaner happens to collect the dropped Dataset. Across a
  * long session of iterative gates sharing one JVM the accumulation
  * strangles shuffle buffers into `UNABLE_TO_ACQUIRE_MEMORY` — observed
  * at the ×1000 corpus, where four dedup gates in one JVM died while
  * each alone passed. DISK_ONLY keeps the two properties the iterations
  * actually need — lineage truncation and O(1) re-planning — while
  * pinning ZERO heap: round data streams back from executor-local disk
  * with the same cost profile as the shuffle output the round just paid
  * for anyway. On a cluster this is executor-local disk, not a
  * distributed FS write (that trade is `checkpoint()`'s).
  */
object Checkpoints {
  implicit class DiskCheckpointOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Eager local checkpoint at DISK_ONLY (see [[Checkpoints]]). */
    def diskCheckpoint(): Dataset[T] =
      ds.localCheckpoint(eager = true, storageLevel = StorageLevel.DISK_ONLY)
  }
}
