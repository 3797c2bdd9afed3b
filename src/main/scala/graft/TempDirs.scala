package graft

/** JVM-exit sweeper for operator-created local temp dirs: ONE shutdown
  * hook deleting every registered directory — a hook per call would stack
  * threads, and no hook at all leaks a written table per gate/bench run
  * (the r8 d10 fingerprint-index leak).
  */
object TempDirs {
  private val dirs = scala.collection.mutable.Set.empty[java.nio.file.Path]

  /** Recursive best-effort delete; true iff the dir is GONE afterwards.
    * The walk stream is closed explicitly (try-with-resources shape) —
    * an unclosed Files.walk pins directory file descriptors until GC.
    */
  private[graft] def deleteTree(dir: java.nio.file.Path): Boolean = {
    import scala.jdk.CollectionConverters._
    try {
      if (java.nio.file.Files.exists(dir)) {
        val walk = java.nio.file.Files.walk(dir)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
    } catch { case _: java.io.IOException => () } // best-effort sweep
    !java.nio.file.Files.exists(dir)
  }

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.synchronized(dirs.toSeq).foreach(deleteTree)
    }))
  }

  /** Create a temp directory registered for deletion at JVM exit. */
  def create(prefix: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    hook
    dirs.synchronized { dirs += dir; () }
    dir
  }

  /** Delete a registered dir NOW (recursively, best-effort) and drop it
    * from the exit sweep — for fixtures a long-lived JVM must release
    * eagerly (e.g. q23's ~30 GB bucket pair at sf100) instead of pinning
    * disk until exit while later gates spill against it.
    *
    * A dir that could NOT be fully deleted (IOException mid-walk) stays
    * registered so the JVM-exit sweep retries it — deregistering on a
    * failed delete would leak the partial dir permanently.
    */
  def deleteNow(dir: java.nio.file.Path): Unit =
    if (deleteTree(dir)) dirs.synchronized { dirs -= dir; () }
}
