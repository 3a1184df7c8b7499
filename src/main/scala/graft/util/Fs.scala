package graft.util

/** The ONE recursive temp-dir delete (review r6: three verbatim copies had
  * grown in StreamingOps / TableLayout / Queries). Best-effort by design —
  * staged corpora and scratch dirs are disposable, and a racing delete or
  * late-closing handle must never fail the query that staged them.
  */
object Fs {
  def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach { f => java.nio.file.Files.deleteIfExists(f); () }
        finally walk.close()
      }
    } catch { case _: java.io.IOException => () }
}
