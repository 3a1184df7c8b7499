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

  /** Scratch parquet dirs backing LAZY frames still in flight — deleted at
    * JVM exit only. The durable sibling of [[deleteRecursively]] for
    * [[materialize]]'s big branch.
    */
  private val deferred =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  locally {
    val _ = sys.addShutdownHook { deferred.forEach(deleteRecursively(_)) }
  }
  def deferDelete(p: java.nio.file.Path): Unit = { deferred.add(p); () }

  /** A materialized frame plus the scratch dir (if any) backing it.
    * Iterative loops call [[free]] on round k's handle once round k+1 has
    * been WRITTEN (the write inside [[materializeTracked]] is eager, so the
    * old data is no longer an input to anything) — without this, a loop of
    * R rounds at the 1000× decade accumulates R full-frame disk copies
    * until JVM exit (r6 ADVICE). Exit-time deletion stays as the fallback
    * for handles never freed.
    */
  final case class Materialized(
      df: org.apache.spark.sql.DataFrame,
      scratch: Option[java.nio.file.Path]) {
    def free(): Unit = scratch.foreach { p =>
      deferred.remove(p)
      deleteRecursively(p)
    }
  }

  /** Materialize an intermediate frame that multiple downstream consumers
    * re-read. `localCheckpoint` is the cheap default, but its blocks live
    * in the CACHING layer: under memory pressure an evicted checkpoint
    * block is UNRECOVERABLE (the lineage is severed) and big intermediates
    * pin gigabytes of storage memory against execution — the
    * graph-at-1000× OOM class. Past `bigRows`, spill the frame to a
    * scratch PARQUET dir instead (columnar, compressed, read back lazily;
    * the cluster-filesystem shape of a checkpoint) and keep the dir until
    * JVM exit (or until the caller frees the [[Materialized]] handle). The
    * threshold is a row-count hint the caller already has (typically a
    * parquet footer count — no extra scan).
    */
  def materialize(df: org.apache.spark.sql.DataFrame, rowsHint: Long,
      bigRows: Long = 20000000L): org.apache.spark.sql.DataFrame =
    materializeTracked(df, rowsHint, bigRows).df

  def materializeTracked(df: org.apache.spark.sql.DataFrame, rowsHint: Long,
      bigRows: Long = 20000000L): Materialized =
    if (rowsHint < bigRows) Materialized(df.localCheckpoint(), None)
    else {
      val tmp = java.nio.file.Files.createTempDirectory("graft_mat")
      deferDelete(tmp)
      df.write.parquet(tmp.resolve("d").toString)
      Materialized(df.sparkSession.read.parquet(tmp.resolve("d").toString), Some(tmp))
    }
}
