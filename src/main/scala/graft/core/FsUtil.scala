package graft.core

/** Shared filesystem helper (one definition for the five call sites that
  * previously each inlined the recursion). */
object FsUtil {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
