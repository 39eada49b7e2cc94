package graft.core

/** Scratch directories for declared queries whose evaluation
  * materializes a per-run index (q134's banded near-dup bootstrap,
  * q135's generational IVFADC): the result DataFrame reads LAZILY from
  * the directory, so it cannot be deleted eagerly — instead every
  * scratch dir registers a recursive delete at JVM exit, bounding the
  * temp-space leak of repeated suite/bench runs to one process
  * lifetime.
  */
object Scratch {

  /** Create a temp directory removed recursively when the JVM exits. */
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p.toFile)))
    p.toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
