package graft.core

/** Scratch directories for declared queries whose evaluation
  * materializes a per-run index (q134's banded near-dup bootstrap,
  * q135's generational IVFADC): the result DataFrame reads LAZILY from
  * the directory, so it cannot be deleted eagerly — instead every
  * scratch dir registers for recursive delete at JVM exit, bounding the
  * temp-space leak of repeated suite/bench runs to one process
  * lifetime.
  *
  * ONE shared shutdown hook drains a concurrent path list (ADVICE r13:
  * a hook per [[tempDir]] call leaked an unstarted Thread per q134/q135
  * evaluation in a long-lived bench JVM — unbounded within the process;
  * the dirs themselves are still deferred to exit by design, since the
  * lazy readers outlive the call).
  */
object Scratch {

  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  // registered at most once, on the first tempDir call
  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = pending.poll()
      while (p != null) {
        deleteRecursively(p.toFile)
        p = pending.poll()
      }
    }))
    ()
  }

  /** Create a temp directory removed recursively when the JVM exits. */
  def tempDir(prefix: String): String = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    pending.add(p)
    p.toString
  }

  /** How many directories are queued for exit-time deletion (spec hook). */
  private[graft] def pendingCount: Int = pending.size()

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
